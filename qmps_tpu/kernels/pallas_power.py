"""Pallas TPU kernel: batched dominant eigenpair of small transfer matrices.

The environment solve at D=2 is a dominant-eigenpair problem for a batch of
4x4 complex transfer matrices — the inner kernel of vmapped TDVP sweeps
(one solve per objective evaluation per sweep point).  This kernel runs the
whole power iteration in VMEM: one HBM read of the batch, ``iters`` fused
VPU sweeps, one HBM write.

TPU-native layout (the thing that matters): complex is two real planes and
the matrix is stored COMPONENT-MAJOR, shape (16, B/128, 128), so every
arithmetic op in the kernel is an elementwise (rows, 128) tile op — no
tiny trailing dims, no relayouts.  (The naive (B, 4, 4) layout compiles
for >9 minutes on this backend; this one compiles in seconds.)
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

N = 4  # matrix dimension (D^2 for D = 2)
LANE = 128


def _power_kernel(iters: int, mre_ref, mim_ref, lre_ref, lim_ref, vre_ref, vim_ref):
    # refs: m*(16, TR, LANE); outputs l*(TR, LANE), v*(4, TR, LANE)
    m_re = [mre_ref[k] for k in range(N * N)]  # each (TR, LANE)
    m_im = [mim_ref[k] for k in range(N * N)]

    # data-dependent start: column 0 of M plus a small dither
    dither = (0.37, -0.21, 0.11, 0.05)
    vre = [m_re[i * N + 0] + dither[i] for i in range(N)]
    vim = [m_im[i * N + 0] for i in range(N)]

    def matvec(vre, vim):
        wre, wim = [], []
        for i in range(N):
            are = jnp.zeros_like(vre[0])
            aim = jnp.zeros_like(vre[0])
            for j in range(N):
                mr, mi = m_re[i * N + j], m_im[i * N + j]
                are = are + mr * vre[j] - mi * vim[j]
                aim = aim + mr * vim[j] + mi * vre[j]
            wre.append(are)
            wim.append(aim)
        return wre, wim

    def body(_, carry):
        vre = list(carry[:N])
        vim = list(carry[N:])
        wre, wim = matvec(vre, vim)
        nrm2 = sum(wre[i] * wre[i] + wim[i] * wim[i] for i in range(N))
        inv = jax.lax.rsqrt(jnp.maximum(nrm2, 1e-30))
        return tuple(w * inv for w in wre) + tuple(w * inv for w in wim)

    carry = jax.lax.fori_loop(0, iters, body, tuple(vre) + tuple(vim))
    vre, vim = list(carry[:N]), list(carry[N:])

    # Rayleigh quotient lam = v^dag (M v) (v unit norm)
    wre, wim = matvec(vre, vim)
    lre = sum(vre[i] * wre[i] + vim[i] * wim[i] for i in range(N))
    lim = sum(vre[i] * wim[i] - vim[i] * wre[i] for i in range(N))
    lre_ref[:] = lre
    lim_ref[:] = lim
    for i in range(N):
        vre_ref[i] = vre[i]
        vim_ref[i] = vim[i]


def dominant_eig_batched_pallas(
    Mre: jnp.ndarray,
    Mim: jnp.ndarray,
    iters: int = 48,
    tile_rows: int = 8,
    interpret: bool = False,
):
    """(lam_re, lam_im, v_re, v_im) for component-major real-pair batches.

    Mre, Mim: (16, R, 128) with component k = flattened (i, j) = 4 i + j and
    R * 128 the batch size.  Returns lam (R, 128) planes and v (4, R, 128).
    """
    _, R, lane = Mre.shape
    assert lane == LANE and R % tile_rows == 0
    grid = (R // tile_rows,)
    kernel = functools.partial(_power_kernel, iters)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((N * N, tile_rows, LANE), lambda i: (0, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((N * N, tile_rows, LANE), lambda i: (0, i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((tile_rows, LANE), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_rows, LANE), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((N, tile_rows, LANE), lambda i: (0, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((N, tile_rows, LANE), lambda i: (0, i, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((R, LANE), Mre.dtype),
            jax.ShapeDtypeStruct((R, LANE), Mre.dtype),
            jax.ShapeDtypeStruct((N, R, LANE), Mre.dtype),
            jax.ShapeDtypeStruct((N, R, LANE), Mre.dtype),
        ],
        interpret=interpret,
    )(Mre, Mim)


def dominant_eig_batched(E: jnp.ndarray, iters: int = 48, interpret: bool = False):
    """Complex convenience wrapper: (B, 4, 4) complex -> (lam, v) complex.

    Handles the component-major relayout and padding internally.
    """
    B = E.shape[0]
    pad = (-B) % (LANE * 8)  # 8-row tiles of 128 lanes
    if pad:
        eye = jnp.broadcast_to(jnp.eye(N, dtype=E.dtype), (pad, N, N))
        E = jnp.concatenate([E, eye], axis=0)
    Bp = E.shape[0]
    R = Bp // LANE
    # (B, 4, 4) -> (16, R, 128) component-major
    comp = E.reshape(Bp, N * N).T.reshape(N * N, R, LANE)
    lre, lim, vre, vim = dominant_eig_batched_pallas(
        jnp.real(comp).astype(jnp.float32),
        jnp.imag(comp).astype(jnp.float32),
        iters=iters,
        interpret=interpret,
    )
    lam = (lre + 1j * lim).reshape(Bp)[:B]
    v = (vre + 1j * vim).reshape(N, Bp).T[:B]
    return lam, v
