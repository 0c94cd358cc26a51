"""Pallas TPU kernels: batched dominant eigenpair of small transfer matrices.

The environment solve is a dominant-eigenpair problem for a batch of N x N
complex transfer matrices, N = D^2 — the inner kernel of vmapped TDVP
sweeps (one solve per objective evaluation per sweep point).  These kernels
run the whole solve in VMEM: one HBM read of the batch, ``iters`` fused
sweeps, one HBM write.  Two regimes:

- **component-major VPU kernel (N = 4, i.e. D = 2)**: complex is two real
  planes and the matrix is stored COMPONENT-MAJOR, shape (16, B/128, 128),
  so every arithmetic op is an elementwise (rows, 128) tile op — no tiny
  trailing dims, no relayouts.  (The naive (B, 4, 4) layout compiles for
  >9 minutes on this backend; this one compiles in seconds.  The same
  unrolled-plane-ops trick at N = 16 is a 4096-op loop body that itself
  stalls compilation — hence the cutover below.)
- **MXU squaring kernel (N >= 16, i.e. D = 4+)**: per batch element the
  (N, N) matrix is squared in VMEM with real 2D matmuls on the MXU; the
  kernel returns the converged power E^(2^iters) and the (cheap, one-pass)
  eigenpair extraction happens in XLA outside.

Replaces the reference's per-point dense ``scipy.linalg.eig`` environment
solve (new_tdvp/ClassicalTDVPStripped.py:424-431).
"""
from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANE = 128
#: largest N handled by the component-major VPU kernels (unrolled at N=4,
#: contraction-looped above — the unrolled N^3 body at N=16 is 4096 ops and
#: stalls both Mosaic and interpret-mode XLA compile); beyond this the MXU
#: squaring kernel takes over.
MAX_COMPONENT_N = 16


def _chirps(N: int):
    """Two fixed pseudo-random start vectors as python scalar pairs
    (Mosaic forbids captured constant arrays; scalars inline fine)."""
    c1 = [(math.cos(0.7 * j + 0.3), math.sin(1.3 * j + 1.1)) for j in range(N)]
    c2 = [(math.cos(1.9 * j + 0.8), math.sin(0.5 * j + 2.0)) for j in range(N)]
    return c1, c2


def _power_kernel(N, iters, mre_ref, mim_ref, lre_ref, lim_ref, vre_ref, vim_ref):
    # refs: m*(N*N, TR, LANE); outputs l*(TR, LANE), v*(N, TR, LANE)
    m_re = [mre_ref[k] for k in range(N * N)]  # each (TR, LANE)
    m_im = [mim_ref[k] for k in range(N * N)]

    # data-dependent start: column 0 of M plus a small dither
    vre = [m_re[i * N + 0] + 0.37 * math.cos(1.7 * i + 0.3) for i in range(N)]
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
    lre_ref[:] = sum(vre[i] * wre[i] + vim[i] * wim[i] for i in range(N))
    lim_ref[:] = sum(vre[i] * wim[i] - vim[i] * wre[i] for i in range(N))
    for i in range(N):
        vre_ref[i] = vre[i]
        vim_ref[i] = vim[i]


def _solve_planes(N, iters, m_re, m_im):
    """Squaring eigensolve on component-plane lists (the _squaring_kernel
    body, shared with the fused TDVP-objective kernel): given N*N re/im
    planes of a batch of (N, N) matrices, return (lre, lim, vre, vim)
    plane values — dominant eigenvalue + unit right eigenvector."""

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

    # E^(2^k) ~ lam^(2^k) v w^dag: applying it to any vector not orthogonal
    # to w yields v.  Use two fixed chirps and keep the larger result.
    c1, c2 = _chirps(N)

    def apply_chirp(c):
        vre, vim = [], []
        for i in range(N):
            are = jnp.zeros_like(e_re[0])
            aim = jnp.zeros_like(e_re[0])
            for j in range(N):
                cr, ci = c[j]
                x, y = e_re[i * N + j], e_im[i * N + j]
                are = are + x * cr - y * ci
                aim = aim + x * ci + y * cr
            vre.append(are)
            vim.append(aim)
        return vre, vim

    v1re, v1im = apply_chirp(c1)
    v2re, v2im = apply_chirp(c2)
    n1 = sum(r * r + i2 * i2 for r, i2 in zip(v1re, v1im))
    n2 = sum(r * r + i2 * i2 for r, i2 in zip(v2re, v2im))
    use1 = n1 >= n2
    vre = [jnp.where(use1, a, b) for a, b in zip(v1re, v2re)]
    vim = [jnp.where(use1, a, b) for a, b in zip(v1im, v2im)]
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
    lre = sum(vre[i] * wre[i] + vim[i] * wim[i] for i in range(N))
    lim = sum(vre[i] * wim[i] - vim[i] * wre[i] for i in range(N))
    return lre, lim, vre, vim


def _squaring_kernel(N, iters, mre_ref, mim_ref, lre_ref, lim_ref, vre_ref, vim_ref):
    """Repeated squaring in VMEM: E -> E^(2^iters) (Frobenius-normalized
    each squaring), eigenvector by applying the converged power to two fixed
    chirp vectors (pick the larger per lane — elementwise, no gathers),
    eigenvalue from the Rayleigh quotient with the ORIGINAL matrix.

    Converges like the dense squaring path (error ~ |lam2/lam1|^(2^k):
    machine precision for any nontrivial gap) — unlike plain power
    iteration, which stalls on near-degenerate spectra — while keeping the
    whole batch resident in VMEM for the entire solve."""
    m_re = [mre_ref[k] for k in range(N * N)]
    m_im = [mim_ref[k] for k in range(N * N)]
    lre, lim, vre, vim = _solve_planes(N, iters, m_re, m_im)
    lre_ref[:] = lre
    lim_ref[:] = lim
    for i in range(N):
        vre_ref[i] = vre[i]
        vim_ref[i] = vim[i]


def dominant_eig_batched_pallas(
    Mre: jnp.ndarray,
    Mim: jnp.ndarray,
    iters: int = 48,
    tile_rows: int | None = None,
    interpret: bool = False,
    method: str = "squaring",
):
    """(lam_re, lam_im, v_re, v_im) for component-major real-pair batches.

    Mre, Mim: (N^2, R, 128) with component k = flattened (i, j) = N i + j and
    R * 128 the batch size.  Returns lam (R, 128) planes and v (N, R, 128).
    method="squaring" (default, log2-convergent for any gap) or "power"
    (cheaper per iteration, needs a healthy spectral gap).
    """
    NN, R, lane = Mre.shape
    N = int(NN**0.5 + 0.5)
    assert N * N == NN and N <= 4, "in-kernel extraction kernels are N=4 only"
    if tile_rows is None:
        tile_rows = _default_tile_rows(N)
    assert lane == LANE and R % tile_rows == 0
    grid = (R // tile_rows,)
    if method == "squaring":
        kernel = functools.partial(_squaring_kernel, N, iters)
    elif method == "power":
        kernel = functools.partial(_power_kernel, N, iters)
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


def _default_tile_rows(N: int) -> int:
    # Mosaic requires the sublane dim divisible by 8; VMEM working set is
    # ~3 copies of N^2 planes of (8, 128) f32 pairs (4 MB/copy at N=16).
    return 8


def _matpow_kernel_looped(N, iters, mre_ref, mim_ref, ore_ref, oim_ref, ar_ref, ai_ref):
    """Component-major repeated squaring with a fori_loop over the
    contraction index: the loop body is ONE broadcast complex FMA on
    (N, N, TR, LANE) planes instead of N^3 unrolled ops — compile time is
    O(1) in N.  Used for 4 < N <= 16 (D = 3..4), where the unrolled body
    stalls compilation but the matrices are too small to feed the MXU.

    The OUTPUT refs double as the squaring carry (VMEM economy: in + out +
    one scratch accumulator); eigenpair extraction from the converged power
    happens outside in XLA (one matvec per element — see _extract_eigpair).
    All dynamic indexing is on REFS via pl.ds (Mosaic cannot lower
    dynamic_slice on loaded arrays)."""
    # Per-ELEMENT Frobenius normalization each squaring (axis (0, 1) over
    # the component planes, keeping the (TR, LANE) batch lanes): a scale
    # shared across batch elements would underflow every non-max element
    # after the ^(2^iters) amplification.
    r0 = mre_ref[...]
    i0 = mim_ref[...]
    n2 = jnp.sum(r0 * r0 + i0 * i0, axis=(0, 1), keepdims=True)
    inv = jax.lax.rsqrt(jnp.maximum(n2, 1e-30))
    ore_ref[...] = r0 * inv
    oim_ref[...] = i0 * inv

    def outer(_, carry):
        ar_ref[...] = jnp.zeros_like(ar_ref)
        ai_ref[...] = jnp.zeros_like(ai_ref)

        def inner(k, c):
            lr = ore_ref[:, pl.ds(k, 1)]  # E[:, k] -> (N, 1, TR, LANE)
            li = oim_ref[:, pl.ds(k, 1)]
            rr = ore_ref[pl.ds(k, 1)]  # E[k, :] -> (1, N, TR, LANE)
            ri = oim_ref[pl.ds(k, 1)]
            ar_ref[...] += lr * rr - li * ri
            ai_ref[...] += lr * ri + li * rr
            return c

        jax.lax.fori_loop(0, N, inner, 0)
        rr = ar_ref[...]
        ri = ai_ref[...]
        n2 = jnp.sum(rr * rr + ri * ri, axis=(0, 1), keepdims=True)
        inv = jax.lax.rsqrt(jnp.maximum(n2, 1e-30))
        ore_ref[...] = rr * inv
        oim_ref[...] = ri * inv
        return carry

    jax.lax.fori_loop(0, iters, outer, 0)


def _matrix_power_batched_component(
    Ere: jnp.ndarray, Eim: jnp.ndarray, iters: int, tile_rows: int = 8, interpret: bool = False
):
    """(N, N, R, 128) real planes -> normalized E^(2^iters) planes via the
    looped component-major kernel.  One grid step per tile_rows batch rows;
    normalization is per batch element (per lane)."""
    N = Ere.shape[0]
    R = Ere.shape[2]
    grid = (R // tile_rows,)
    kernel = functools.partial(_matpow_kernel_looped, N, iters)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((N, N, tile_rows, LANE), lambda i: (0, 0, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((N, N, tile_rows, LANE), lambda i: (0, 0, i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((N, N, tile_rows, LANE), lambda i: (0, 0, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((N, N, tile_rows, LANE), lambda i: (0, 0, i, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct(Ere.shape, Ere.dtype),
            jax.ShapeDtypeStruct(Ere.shape, Ere.dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((N, N, tile_rows, LANE), Ere.dtype),
            pltpu.VMEM((N, N, tile_rows, LANE), Ere.dtype),
        ],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(Ere, Eim)


# ---------------------------------------------------------------------------
# MXU squaring kernel for N >= 32 (D >= 8 blocked transfers)
# ---------------------------------------------------------------------------


def _squaring_kernel_mxu(bt, p, iters, mre_ref, mim_ref, ore_ref, oim_ref):
    """Repeated squaring of (N, N) complex matrices as real MXU matmuls,
    all iterations resident in VMEM.  Outputs the Frobenius-normalized
    converged power E^(2^iters); eigenpair extraction (one matvec) happens
    outside in XLA.

    refs are (bt, M, M) planes with M = p * n_block: each element is a
    BLOCK-DIAGONAL PACK of p = 128 // n_block independent (n_block, n_block)
    matrices, assembled cheaply in XLA (pad + concat — ~25 us HBM copies;
    jax.scipy block_diag lowers to scatters and measured ~25% slower
    end-to-end).  Blockdiag squares block-wise (the off-diagonal zero
    blocks stay exactly zero through real matmuls), so one full-width
    systolic pass advances p elements at once — the zero blocks cost
    exactly the padding waste a lone (n_block, n_block) matmul pays anyway
    on the 128-wide MXU.

    Three measured wins over the naive per-element form (N=64, batch 4096,
    all readback-validated — on this backend an unvalidated timing loop can
    be timing silently-failed dispatches): packing 95 -> 66 ms, interleaved
    chains 66 -> 56 ms, Karatsuba squaring (3 matmuls, not 4) 56 -> 47 ms.

    Normalization is per BLOCK (a shared scale would underflow the non-max
    blocks under the ^(2^iters) amplification), as a row scaling (rows of
    block k belong only to block k), and only every SECOND squaring: after
    a block-norm the next unnormalized square stays in f32 range unless
    |lam|/||E||_F < 1e-19 (essentially nilpotent — the rsqrt clamp still
    yields finite output)."""
    n_block = mre_ref.shape[-1] // p

    def block_normalize(rr, ri):
        if p == 1:
            n2 = jnp.sum(rr * rr + ri * ri)
            inv = jax.lax.rsqrt(jnp.maximum(n2, 1e-30))
            return rr * inv, ri * inv
        rows = []
        for k in range(p):
            sl = slice(k * n_block, (k + 1) * n_block)
            blk_r, blk_i = rr[sl], ri[sl]
            n2 = jnp.sum(blk_r * blk_r + blk_i * blk_i)
            inv = jax.lax.rsqrt(jnp.maximum(n2, 1e-30))
            rows.append(jnp.full((n_block, 1), 1.0, rr.dtype) * inv)
        scale = jnp.concatenate(rows, axis=0)  # (M, 1) per-row block scale
        return rr * scale, ri * scale

    def square(re, im):
        # Karatsuba complex squaring: 3 MXU matmuls instead of 4
        # (re2 = R^2 - I^2, im2 = (R+I)^2 - R^2 - I^2 = RI + IR).
        # Entries are block-normalized to ||.||_F = 1, so the extra
        # cancellation is benign (validated to ~1e-7 against numpy eig).
        p1 = jnp.dot(re, re, preferred_element_type=jnp.float32)
        p2 = jnp.dot(im, im, preferred_element_type=jnp.float32)
        s = re + im
        p3 = jnp.dot(s, s, preferred_element_type=jnp.float32)
        return p1 - p2, p3 - p1 - p2

    # One fori_loop advancing all bt elements jointly (tuple carry of 2*bt
    # planes): each trip issues bt independent squaring chains back-to-back,
    # giving the MXU independent work to pipeline.  Two squarings per trip,
    # one block-normalization (see docstring); an odd ``iters`` gets its
    # final single squaring after the loop so the total is EXACTLY iters
    # squarings (matching the component-major paths' meaning of the knob).
    state = []
    for t in range(bt):
        re, im = block_normalize(mre_ref[t], mim_ref[t])
        state += [re, im]

    def body(_, carry):
        out = []
        for t in range(bt):
            rr, ri = square(carry[2 * t], carry[2 * t + 1])
            rr, ri = square(rr, ri)
            out += list(block_normalize(rr, ri))
        return tuple(out)

    state = jax.lax.fori_loop(0, iters // 2, body, tuple(state))
    state = list(state)
    if iters % 2:
        for t in range(bt):
            rr, ri = square(state[2 * t], state[2 * t + 1])
            state[2 * t], state[2 * t + 1] = block_normalize(rr, ri)
    for t in range(bt):
        ore_ref[t] = state[2 * t]
        oim_ref[t] = state[2 * t + 1]


def _matrix_power_batched_mxu(
    Ere: jnp.ndarray,
    Eim: jnp.ndarray,
    iters: int,
    bt: int = 8,
    p: int = 1,
    interpret: bool = False,
):
    """(B, N, N) real planes -> normalized E^(2^iters) planes via the MXU
    kernel, packing p elements per block-diagonal (pN, pN) systolic pass.
    B must be a multiple of bt * p.  The pack (pad + concat) and unpack
    (strided slices) are plain XLA HBM copies."""
    B, N, _ = Ere.shape

    def pack(X):
        if p == 1:
            return X
        Xg = X.reshape(B // p, p, N, N)
        cols = [
            jnp.pad(Xg[:, k], ((0, 0), (0, 0), (k * N, (p - 1 - k) * N)))
            for k in range(p)
        ]
        return jnp.concatenate(cols, axis=1)  # (B/p, pN, pN)

    G, M = B // p, p * N
    grid = (G // bt,)
    kernel = functools.partial(_squaring_kernel_mxu, bt, p, iters)
    spec = pl.BlockSpec((bt, M, M), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    Pre, Pim = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[spec, spec],
        out_specs=[spec, spec],
        out_shape=[
            jax.ShapeDtypeStruct((G, M, M), Ere.dtype),
            jax.ShapeDtypeStruct((G, M, M), Ere.dtype),
        ],
        interpret=interpret,
    )(pack(Ere), pack(Eim))

    def unpack(X):
        if p == 1:
            return X
        blocks = [X[:, k * N : (k + 1) * N, k * N : (k + 1) * N] for k in range(p)]
        return jnp.stack(blocks, axis=1).reshape(B, N, N)

    return unpack(Pre), unpack(Pim)


def _np_chirp(N: int) -> tuple[np.ndarray, np.ndarray]:
    c1, c2 = _chirps(N)
    return np.array(c1, np.float32), np.array(c2, np.float32)  # each (N, 2)


def _extract_eigpair(E: jnp.ndarray, Mre: jnp.ndarray, Mim: jnp.ndarray):
    """XLA-side eigenpair extraction from the converged power M = E^(2^k):
    v = M c (two chirp candidates, larger norm wins), lam = v^dag E v."""
    N = E.shape[-1]
    c1, c2 = _np_chirp(N)

    def apply(cre_cim):
        cre, cim = cre_cim[:, 0], cre_cim[:, 1]
        vre = Mre @ cre - Mim @ cim
        vim = Mre @ cim + Mim @ cre
        return jax.lax.complex(vre, vim)

    v1 = apply(c1)
    v2 = apply(c2)
    n1 = jnp.sum(jnp.abs(v1) ** 2, axis=-1, keepdims=True)
    n2 = jnp.sum(jnp.abs(v2) ** 2, axis=-1, keepdims=True)
    v = jnp.where(n1 >= n2, v1, v2)
    v = v / jnp.linalg.norm(v, axis=-1, keepdims=True)
    lam = jnp.einsum("bi,bij,bj->b", v.conj(), E, v)
    return lam, v


def dominant_eig_batched(
    E: jnp.ndarray,
    iters: int = 48,
    interpret: bool = False,
    method: str = "squaring",
):
    """Complex convenience wrapper: (B, N, N) complex -> (lam, v) complex.

    N = 4 dispatches to the component-major VPU kernel (handles the
    relayout and padding internally); larger N to the MXU squaring kernel.
    With the default method="squaring", iters is the number of squarings
    (~40 reaches f32 machine precision for any nontrivial gap, error ~
    |l2/l1|^(2^iters)).
    """
    B, N = E.shape[0], E.shape[-1]
    if N > 4:
        if method != "squaring":
            raise ValueError("the N > 4 paths implement method='squaring' only")
        if N > MAX_COMPONENT_N:
            # MXU squaring, batch-major; p = 128 // N elements are packed
            # per block-diagonal systolic pass (see _squaring_kernel_mxu).
            # Measured at batch 4096, readback-validated: N=64 95 -> 47
            # ms/call (3.2x vs XLA dense squaring), N=32 25 ms (2.2x) via
            # packing + interleaved chains + Karatsuba squaring.
            bt = 8
            p = max(1, 128 // N)
            pad = (-B) % (bt * p)
            Ere = jnp.real(E).astype(jnp.float32)
            Eim = jnp.imag(E).astype(jnp.float32)
            if pad:
                Ere = jnp.pad(Ere, ((0, pad), (0, 0), (0, 0)))
                Eim = jnp.pad(Eim, ((0, pad), (0, 0), (0, 0)))
            Mre, Mim = _matrix_power_batched_mxu(
                Ere, Eim, iters, bt=bt, p=p, interpret=interpret
            )
            return _extract_eigpair(E, Mre[:B], Mim[:B])
        # looped component-major squaring (4 < N <= 16)
        tile_rows = _default_tile_rows(N)
        pad = (-B) % (LANE * tile_rows)
        Bp = B + pad
        R = Bp // LANE
        comp = E.reshape(B, N * N).T
        cre = jnp.real(comp).astype(jnp.float32)
        cim = jnp.imag(comp).astype(jnp.float32)
        if pad:
            cre = jnp.pad(cre, ((0, 0), (0, pad)))
            cim = jnp.pad(cim, ((0, 0), (0, pad)))
        Mre4, Mim4 = _matrix_power_batched_component(
            cre.reshape(N, N, R, LANE),
            cim.reshape(N, N, R, LANE),
            iters,
            tile_rows=tile_rows,
            interpret=interpret,
        )
        Mre = Mre4.reshape(N * N, Bp).T[:B].reshape(B, N, N)
        Mim = Mim4.reshape(N * N, Bp).T[:B].reshape(B, N, N)
        return _extract_eigpair(E, Mre, Mim)

    tile_rows = _default_tile_rows(N)
    pad = (-B) % (LANE * tile_rows)
    Bp = B + pad
    R = Bp // LANE
    # (B, N, N) -> (N^2, B) component-major, split into REAL planes before
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
        tile_rows=tile_rows,
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
    """Dominant eigenvalues of a (B, N, N) complex batch, differentiable.

    Forward: the Pallas eigensolver (component-major kernel for N <= 16,
    MXU squaring for larger).  Backward: the exact implicit-function adjoint
    (one rank-1 outer product per batch element).  This is the
    gradient-capable face of the kernel — use it inside batched TDVP
    objectives; `dominant_eig_batched` stays the raw (non-diff) face.
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
