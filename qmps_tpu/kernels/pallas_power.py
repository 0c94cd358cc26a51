"""Pallas TPU kernel: batched dominant eigenpair of small transfer matrices.

The environment solve at D=2 is a dominant-eigenpair problem for a batch of
4x4 complex transfer matrices — the inner kernel of vmapped TDVP sweeps
(one solve per objective evaluation per sweep point).  This kernel runs the
whole power iteration in VMEM: one HBM read of the batch, ``iters`` fused
VPU sweeps, one HBM write, with complex arithmetic as real pairs (this TPU
backend has no complex type in Mosaic).

Batch layout: (B, 4, 4) split into TILE-sized blocks on the grid; every
arithmetic op is an elementwise (TILE,)-vector FMA, so the batch rides the
hardware lanes.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

N = 4  # matrix dimension (D^2 for D = 2)


def _power_kernel(iters: int, mre_ref, mim_ref, lre_ref, lim_ref, vre_ref, vim_ref):
    mre = mre_ref[:]  # (TILE, N, N)
    mim = mim_ref[:]
    t = mre.shape[0]
    # data-dependent start: column 0 of M plus an asymmetric dither — one
    # M-application ahead of a fixed vector, generically non-orthogonal to
    # the dominant eigenspace
    # (no scatter ops in Mosaic: build (TILE, N) arrays by stacking columns)
    dither = (0.37, -0.21, 0.11, 0.05)
    vre = jnp.stack([mre[:, k, 0] + dither[k] for k in range(N)], axis=1)
    vim = mim[:, :, 0]

    def matvec(vre, vim):
        # w_i = sum_j M_ij v_j, complex in real pairs
        res, ims = [], []
        for i in range(N):
            are = jnp.zeros((t,), mre.dtype)
            aim = jnp.zeros((t,), mre.dtype)
            for j in range(N):
                are = are + mre[:, i, j] * vre[:, j] - mim[:, i, j] * vim[:, j]
                aim = aim + mre[:, i, j] * vim[:, j] + mim[:, i, j] * vre[:, j]
            res.append(are)
            ims.append(aim)
        return jnp.stack(res, axis=1), jnp.stack(ims, axis=1)

    def body(_, carry):
        vre, vim = carry
        wre, wim = matvec(vre, vim)
        nrm = jnp.sqrt(jnp.sum(wre * wre + wim * wim, axis=1, keepdims=True))
        inv = 1.0 / jnp.maximum(nrm, 1e-30)
        return wre * inv, wim * inv

    vre, vim = jax.lax.fori_loop(0, iters, body, (vre, vim))

    # Rayleigh quotient lam = v^dag (M v) (v is unit norm)
    wre, wim = matvec(vre, vim)
    lre = jnp.sum(vre * wre + vim * wim, axis=1)
    lim = jnp.sum(vre * wim - vim * wre, axis=1)
    lre_ref[:] = lre
    lim_ref[:] = lim
    vre_ref[:] = vre
    vim_ref[:] = vim


def dominant_eig_batched_pallas(
    Mre: jnp.ndarray,
    Mim: jnp.ndarray,
    iters: int = 48,
    tile: int = 1024,
    interpret: bool = False,
):
    """(lam_re, lam_im, v_re, v_im) for a batch of (B, 4, 4) real-pair
    matrices.  B must be a multiple of ``tile`` (pad with identity blocks)."""
    B = Mre.shape[0]
    assert B % tile == 0, f"pad batch to a multiple of {tile}"
    grid = (B // tile,)
    kernel = functools.partial(_power_kernel, iters)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((tile, N, N), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, N, N), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((tile,), lambda i: (i,), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile,), lambda i: (i,), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, N), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, N), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B,), Mre.dtype),
            jax.ShapeDtypeStruct((B,), Mre.dtype),
            jax.ShapeDtypeStruct((B, N), Mre.dtype),
            jax.ShapeDtypeStruct((B, N), Mre.dtype),
        ],
        interpret=interpret,
    )(Mre, Mim)


def dominant_eig_batched(E: jnp.ndarray, iters: int = 48, tile: int = 1024, interpret: bool = False):
    """Complex convenience wrapper: (B, 4, 4) complex -> (lam, v) complex."""
    B = E.shape[0]
    pad = (-B) % tile
    if pad:
        eye = jnp.broadcast_to(jnp.eye(N, dtype=E.dtype), (pad, N, N))
        E = jnp.concatenate([E, eye], axis=0)
    lre, lim, vre, vim = dominant_eig_batched_pallas(
        jnp.real(E).astype(jnp.float32),
        jnp.imag(E).astype(jnp.float32),
        iters=iters,
        tile=tile,
        interpret=interpret,
    )
    lam = lre[:B] + 1j * lim[:B]
    v = vre[:B] + 1j * vim[:B]
    return lam, v
