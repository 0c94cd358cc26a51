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


def _squaring_kernel(iters: int, mre_ref, mim_ref, lre_ref, lim_ref, vre_ref, vim_ref):
    """Repeated squaring in VMEM: E -> E^(2^iters) (Frobenius-normalized
    each squaring), eigenvector from the dominant column, eigenvalue from
    the Rayleigh quotient with the ORIGINAL matrix.

    Converges like the dense squaring path (error ~ |lam2/lam1|^(2^k): machine
    precision for any nontrivial gap) — unlike plain power iteration, which
    stalls on near-degenerate spectra — while keeping the whole batch
    resident in VMEM for the entire solve (one HBM read, one write)."""
    m_re = [mre_ref[k] for k in range(N * N)]
    m_im = [mim_ref[k] for k in range(N * N)]

    def body(_, carry):
        e_re = list(carry[: N * N])
        e_im = list(carry[N * N :])
        r_re, r_im = [], []
        for a in range(N):
            for b in range(N):
                sre = jnp.zeros_like(e_re[0])
                sim = jnp.zeros_like(e_re[0])
                for k in range(N):
                    x, y = e_re[a * N + k], e_im[a * N + k]
                    u, v = e_re[k * N + b], e_im[k * N + b]
                    sre = sre + x * u - y * v
                    sim = sim + x * v + y * u
                r_re.append(sre)
                r_im.append(sim)
        n2 = sum(rr * rr + ii * ii for rr, ii in zip(r_re, r_im))
        inv = jax.lax.rsqrt(jnp.maximum(n2, 1e-30))
        return tuple(rr * inv for rr in r_re) + tuple(ii * inv for ii in r_im)

    carry = jax.lax.fori_loop(0, iters, body, tuple(m_re) + tuple(m_im))
    e_re, e_im = list(carry[: N * N]), list(carry[N * N :])

    # E^(2^k) ~ lam^(2^k) v w^dag: every column is ~ v.  Tournament-select
    # the largest-norm column per lane (elementwise where, no gathers).
    coln = [
        sum(e_re[i * N + j] ** 2 + e_im[i * N + j] ** 2 for i in range(N))
        for j in range(N)
    ]
    a01 = coln[0] >= coln[1]
    a23 = coln[2] >= coln[3]
    nA = jnp.where(a01, coln[0], coln[1])
    nB = jnp.where(a23, coln[2], coln[3])
    aAB = nA >= nB
    vre, vim = [], []
    for i in range(N):
        rA = jnp.where(a01, e_re[i * N + 0], e_re[i * N + 1])
        iA = jnp.where(a01, e_im[i * N + 0], e_im[i * N + 1])
        rB = jnp.where(a23, e_re[i * N + 2], e_re[i * N + 3])
        iB = jnp.where(a23, e_im[i * N + 2], e_im[i * N + 3])
        vre.append(jnp.where(aAB, rA, rB))
        vim.append(jnp.where(aAB, iA, iB))
    nrm2 = sum(vre[i] * vre[i] + vim[i] * vim[i] for i in range(N))
    inv = jax.lax.rsqrt(jnp.maximum(nrm2, 1e-30))
    vre = [r * inv for r in vre]
    vim = [i2 * inv for i2 in vim]

    # Rayleigh quotient with the original E (v unit norm): exact at the
    # converged eigenvector
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
    lre_ref[:] = sum(vre[i] * wre[i] + vim[i] * wim[i] for i in range(N))
    lim_ref[:] = sum(vre[i] * wim[i] - vim[i] * wre[i] for i in range(N))
    for i in range(N):
        vre_ref[i] = vre[i]
        vim_ref[i] = vim[i]


def dominant_eig_batched_pallas(
    Mre: jnp.ndarray,
    Mim: jnp.ndarray,
    iters: int = 48,
    tile_rows: int = 8,
    interpret: bool = False,
    method: str = "squaring",
):
    """(lam_re, lam_im, v_re, v_im) for component-major real-pair batches.

    Mre, Mim: (16, R, 128) with component k = flattened (i, j) = 4 i + j and
    R * 128 the batch size.  Returns lam (R, 128) planes and v (4, R, 128).
    method="squaring" (default, log2-convergent for any gap) or "power"
    (cheaper per iteration, needs a healthy spectral gap).
    """
    _, R, lane = Mre.shape
    assert lane == LANE and R % tile_rows == 0
    grid = (R // tile_rows,)
    if method == "squaring":
        kernel = functools.partial(_squaring_kernel, iters)
    elif method == "power":
        kernel = functools.partial(_power_kernel, iters)
    else:
        raise ValueError(f"method must be 'squaring' or 'power', got {method!r}")
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


def dominant_eig_batched(
    E: jnp.ndarray,
    iters: int = 48,
    interpret: bool = False,
    method: str = "squaring",
):
    """Complex convenience wrapper: (B, 4, 4) complex -> (lam, v) complex.

    Handles the component-major relayout and padding internally.  With the
    default method="squaring", iters is the number of squarings (~40 reaches
    f32 machine precision for any nontrivial gap, error ~ |l2/l1|^(2^iters)).
    """
    B = E.shape[0]
    pad = (-B) % (LANE * 8)  # 8-row tiles of 128 lanes
    Bp = B + pad
    R = Bp // LANE
    # (B, 4, 4) -> (16, B) component-major, split into REAL planes before
    # padding/reconstruction: a complex constant in the program (1j scalar,
    # broadcast complex eye) hits this TPU backend's unimplemented complex
    # constant path at RUNTIME (executes-then-poisons the output buffers).
    comp = E.reshape(B, N * N).T
    cre = jnp.real(comp).astype(jnp.float32)
    cim = jnp.imag(comp).astype(jnp.float32)
    if pad:
        # zero-pad: pad rows converge to lam = 0 harmlessly (rsqrt is
        # clamped in-kernel) and are sliced off below
        cre = jnp.pad(cre, ((0, 0), (0, pad)))
        cim = jnp.pad(cim, ((0, 0), (0, pad)))
    lre, lim, vre, vim = dominant_eig_batched_pallas(
        cre.reshape(N * N, R, LANE),
        cim.reshape(N * N, R, LANE),
        iters=iters,
        interpret=interpret,
        method=method,
    )
    lam = jax.lax.complex(lre, lim).reshape(Bp)[:B]
    v = jax.lax.complex(vre, vim).reshape(N, Bp).T[:B]
    return lam, v


# ---------------------------------------------------------------------------
# Gradient-capable batched eigensolve (Pallas forward, implicit adjoint back)
# ---------------------------------------------------------------------------
#
# The rank-1 eigenvalue adjoint dlam = (w^dag dE v)/(w^dag v) needs BOTH the
# right eigenvector v (of E) and the left eigenvector w (dominant right
# eigenvector of E^dag).  One kernel launch on concat(E, E^dag) computes both
# halves in the same grid — the backward pass is then a pure rank-1 outer
# product, no extra solves and no differentiation through the power loop.
# The phase arbitrariness of v, w cancels in the quotient, so the kernel's
# un-gauged eigenvectors are fine here (unlike the eigen*pair* adjoint, which
# needs the c-gauge — see mps/transfer.dominant_eigpair_cgauge).


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2))
def dominant_eigval_batched(E: jnp.ndarray, iters: int = 48, interpret: bool = False):
    """Dominant eigenvalues of a (B, 4, 4) complex batch, differentiable.

    Forward: the component-major Pallas power kernel.  Backward: the exact
    implicit-function adjoint (one rank-1 outer product per batch element).
    This is the gradient-capable face of the kernel — use it inside batched
    TDVP objectives; `dominant_eig_batched` stays the raw (non-diff) face.
    """
    lam, _ = dominant_eig_batched(E, iters=iters, interpret=interpret)
    return lam


def _dom_eigval_batched_fwd(E, iters, interpret):
    B = E.shape[0]
    both = jnp.concatenate([E, jnp.swapaxes(E, -1, -2).conj()], axis=0)
    lam_both, v_both = dominant_eig_batched(both, iters=iters, interpret=interpret)
    lam, v = lam_both[:B], v_both[:B]
    w = v_both[B:]  # E^dag w = conj(lam) w
    return lam, (v, w, jnp.zeros((), E.dtype))


def _dom_eigval_batched_bwd(iters, interpret, res, lam_ct):
    v, w, dtype_marker = res  # marker carries the primal dtype (kernel is f32)
    denom = jnp.einsum("bi,bi->b", w.conj(), v)
    Ebar = (lam_ct / denom)[:, None, None] * w.conj()[:, :, None] * v[:, None, :]
    return (Ebar.astype(dtype_marker.dtype),)


dominant_eigval_batched.defvjp(_dom_eigval_batched_fwd, _dom_eigval_batched_bwd)
