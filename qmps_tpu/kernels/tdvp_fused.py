"""Fully fused batched TDVP objective: transfer-matrix build + eigensolve
in one Pallas kernel (D = 2).

The batched fast TDVP objective -|x|, x = dominant eigval of
E = Map(W (A (x) A), B (x) B), previously built E with vmapped XLA
contractions feeding the Pallas eigensolver — and that build was 99.6% of
the forward at batch 65536 (26.1 of 26.2 ms): ~10 separately-lowered
tiny-contraction stages, each a full HBM round trip.  Here the whole
objective is ONE kernel: read the A/B component planes once, build
AA -> W AA -> BB -> E entirely in VMEM (~200 broadcast complex FMAs),
and run the squaring eigensolve (kernels/pallas_power._solve_planes) on
the freshly built planes.  In gradient mode the same launch also solves
E^dag (free transpose of the in-VMEM planes) for the left eigenvector,
so the backward pass is the exact rank-1 implicit adjoint pushed through
the TRANSPOSED build — no differentiation through the power loop.

The contraction being fused is the reference's canonical TDVP cost
(qmps/new_time_evolve.py:193-221; the same mixed transfer operator as
new_tdvp/ClassicalTDVPStripped.py:239-283).  Numerics match
objectives.overlap.tdvp_objective_pallas (tested to ~1e-6).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .pallas_power import _solve_planes

LANE = 128


def _cmul(ar, ai, br, bi):
    return ar * br - ai * bi, ar * bi + ai * br


def _wget_smem(wre_ref, wim_ref):
    """Gate accessor for a shared W in SMEM (scalar table)."""
    return lambda s, t: (wre_ref[s, t], wim_ref[s, t])


def _wget_vmem(wre_ref, wim_ref):
    """Gate accessor for a per-trajectory W in VMEM (16 component planes,
    comp index s*4 + t) — same arithmetic, plane ops instead of
    scalar-broadcast FMAs."""
    return lambda s, t: (wre_ref[s * 4 + t], wim_ref[s * 4 + t])


def _plane_AA(are, aim):
    """AA[(s1 s2), i, j] = sum_k A[s1, i, k] A[s2, k, j] as a plane dict
    (the two-site blocking; shared by the TDVP and energy kernels)."""
    aa = {}
    for s1 in range(2):
        for s2 in range(2):
            for i in range(2):
                for j in range(2):
                    sr = si = None
                    for k in range(2):
                        pr, pi = _cmul(
                            are[s1 * 4 + i * 2 + k], aim[s1 * 4 + i * 2 + k],
                            are[s2 * 4 + k * 2 + j], aim[s2 * 4 + k * 2 + j],
                        )
                        sr = pr if sr is None else sr + pr
                        si = pi if si is None else si + pi
                    aa[(s1 * 2 + s2, i, j)] = (sr, si)
    return aa


def _build_E_planes(are, aim, bre, bim, wget):
    """In-VMEM transfer-matrix build from A/B component planes.

    a/b comps indexed s*4 + i*2 + j for tensor X[s, i, j] (s physical,
    i row, j col bond).  ``wget(s, t)`` yields the gate entry as either
    SMEM scalars (shared W) or VMEM planes (batched W).  Returns
    (e_re, e_im, aa, waa, bb) where e comps are row (i j), col (k l) of
    the 16-component E; aa/waa/bb feed the backward side.
    """
    aa = _plane_AA(are, aim)

    # WAA[s, i, j] = sum_t W[s, t] AA[t, i, j]
    waa = {}
    for s in range(4):
        for i in range(2):
            for j in range(2):
                sr = None
                for t in range(4):
                    wr, wi = wget(s, t)
                    ar_, ai_ = aa[(t, i, j)]
                    pr = wr * ar_ - wi * ai_
                    pi = wr * ai_ + wi * ar_
                    sr = pr if sr is None else sr + pr
                    si = pi if t == 0 else si + pi
                waa[(s, i, j)] = (sr, si)

    # BB[(s1 s2), j, l] = sum_m B[s1, j, m] B[s2, m, l]
    bb = _plane_AA(bre, bim)

    # E[(i j), (k l)] = sum_s WAA[s, i, k] conj(BB[s, j, l])
    e_re = [None] * 16
    e_im = [None] * 16
    for i in range(2):
        for j in range(2):
            for k in range(2):
                for l in range(2):
                    sr = None
                    for s in range(4):
                        wr, wi = waa[(s, i, k)]
                        br_, bi_ = bb[(s, j, l)]
                        pr, pi = _cmul(wr, wi, br_, -bi_)
                        sr = pr if sr is None else sr + pr
                        si = pi if s == 0 else si + pi
                    idx = (i * 2 + j) * 4 + (k * 2 + l)
                    e_re[idx] = sr
                    e_im[idx] = si
    return e_re, e_im, aa, waa, bb


def _tdvp_fused_kernel(
    iters, with_left, w_batched,
    are_ref, aim_ref, bre_ref, bim_ref, wre_ref, wim_ref,
    *out_refs,
):
    are = [are_ref[k] for k in range(8)]
    aim = [aim_ref[k] for k in range(8)]
    bre = [bre_ref[k] for k in range(8)]
    bim = [bim_ref[k] for k in range(8)]
    wget = (_wget_vmem if w_batched else _wget_smem)(wre_ref, wim_ref)

    e_re, e_im, _, _, _ = _build_E_planes(are, aim, bre, bim, wget)

    lre, lim, vre, vim = _solve_planes(4, iters, e_re, e_im)
    lre_ref, lim_ref, vre_ref, vim_ref = out_refs[:4]
    lre_ref[:] = lre
    lim_ref[:] = lim
    for i in range(4):
        vre_ref[i] = vre[i]
        vim_ref[i] = vim[i]

    if with_left:
        # E^dag[(kl), (ij)] = conj(E[(ij), (kl)]) — a free in-VMEM
        # transpose of the freshly built planes; its dominant right
        # eigenvector is the LEFT eigenvector w of E (E^dag w = conj(x) w)
        ed_re = [e_re[c * 4 + r] for r in range(4) for c in range(4)]
        ed_im = [-e_im[c * 4 + r] for r in range(4) for c in range(4)]
        _, _, wre_out, wim_out = _solve_planes(4, iters, ed_re, ed_im)
        wre_ref_o, wim_ref_o = out_refs[4:6]
        for i in range(4):
            wre_ref_o[i] = wre_out[i]
            wim_ref_o[i] = wim_out[i]


def _comp_planes(x, ncomp, B, pad, R):
    """(B, ...ncomp total...) complex -> component-major (ncomp, R, LANE)
    real plane pairs (the pallas_power layout)."""
    flat = x.reshape(B, ncomp).T
    fre = jnp.real(flat).astype(jnp.float32)
    fim = jnp.imag(flat).astype(jnp.float32)
    if pad:
        fre = jnp.pad(fre, ((0, 0), (0, pad)))
        fim = jnp.pad(fim, ((0, 0), (0, pad)))
    return fre.reshape(ncomp, R, LANE), fim.reshape(ncomp, R, LANE)


def _fused_forward(As, Bs, W, iters, with_left, tile_rows=8, interpret=False):
    """Launch the fused kernel.  As, Bs (B, 2, 2, 2) complex; W (4, 4)
    shared or (B, 4, 4) per-trajectory.  Returns (lam, v[, w])."""
    B = As.shape[0]
    pad = (-B) % (tile_rows * LANE)
    Bp = B + pad
    R = Bp // LANE
    w_batched = W.ndim == 3

    are, aim = _comp_planes(As, 8, B, pad, R)
    bre, bim = _comp_planes(Bs, 8, B, pad, R)
    if w_batched:
        wre, wim = _comp_planes(W, 16, B, pad, R)
    else:
        wre = jnp.real(W).astype(jnp.float32)
        wim = jnp.imag(W).astype(jnp.float32)

    grid = (R // tile_rows,)

    def vspec(n):
        return pl.BlockSpec(
            (n, tile_rows, LANE), lambda i: (0, i, 0), memory_space=pltpu.VMEM
        )

    wspec = vspec(16) if w_batched else pl.BlockSpec(memory_space=pltpu.SMEM)
    lspec = pl.BlockSpec((tile_rows, LANE), lambda i: (i, 0), memory_space=pltpu.VMEM)

    out_specs = [lspec, lspec, vspec(4), vspec(4)]
    out_shape = [
        jax.ShapeDtypeStruct((R, LANE), jnp.float32),
        jax.ShapeDtypeStruct((R, LANE), jnp.float32),
        jax.ShapeDtypeStruct((4, R, LANE), jnp.float32),
        jax.ShapeDtypeStruct((4, R, LANE), jnp.float32),
    ]
    if with_left:
        out_specs += [vspec(4), vspec(4)]
        out_shape += [
            jax.ShapeDtypeStruct((4, R, LANE), jnp.float32),
            jax.ShapeDtypeStruct((4, R, LANE), jnp.float32),
        ]

    kernel = functools.partial(_tdvp_fused_kernel, iters, with_left, w_batched)
    outs = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[vspec(8), vspec(8), vspec(8), vspec(8), wspec, wspec],
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=interpret,
    )(are, aim, bre, bim, wre, wim)

    lam = jax.lax.complex(outs[0], outs[1]).reshape(Bp)[:B]
    v = jax.lax.complex(outs[2], outs[3]).reshape(4, Bp).T[:B]
    if with_left:
        w = jax.lax.complex(outs[4], outs[5]).reshape(4, Bp).T[:B]
        return lam, v, w
    return lam, v


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def tdvp_objective_fused(
    As: jnp.ndarray,
    Bs: jnp.ndarray,
    W: jnp.ndarray,
    iters: int = 48,
    interpret: bool = False,
) -> jnp.ndarray:
    """Batched fast TDVP objective, fully fused: (B, 2, 2, 2) x 2 + W ->
    (B,) of -|x|.  W is either a shared (4, 4) gate (SMEM scalar table)
    or per-trajectory (B, 4, 4) (VMEM planes — the MC-trajectory noise
    and per-time-slice quench sweeps).  Forward AND backward are one
    kernel launch each (the backward launch also computes the left
    eigenvectors; the transposed-build contractions are closed-form
    einsums on the rank-1 adjoint).  Matches tdvp_objective_pallas to
    solver precision.
    """
    lam, _ = _fused_forward(As, Bs, W, iters, with_left=False, interpret=interpret)
    return -jnp.abs(lam)


def _tdvp_bwd_kernel(
    w_batched,
    are_ref, aim_ref, bre_ref, bim_ref,
    vre_ref, vim_ref, ure_ref, uim_ref,
    lre_ref, lim_ref, ct_ref,
    wre_ref, wim_ref,
    oar, oai, obr, obi, owr, owi,
):
    """Transposed build: rank-1 adjoint -> (Abar, Bbar, per-batch Wbar)
    planes, all in VMEM.  u = left eigenvector w of E (renamed to avoid
    the gate-W collision).

    Derivation (validated against jax.grad of the unfused XLA objective,
    tests/test_tdvp_fused.py): g = -|x|, dx = (u^dag dE v)/(u^dag v),
    E = einsum(WAA[s,i,k], conj(BB[s,j,l])).  With pairing coefficients
    (de = Re sum T dz for each complex leaf z):

      K[(ij),(kl)] = -(conj(x)/|x|) u*_(ij) v_(kl) / (u^dag v)
      P[s,i,k] = sum_jl K conj(BB[s,j,l])      (pairs dWAA)
      C[s,j,l] = conj(sum_ik K WAA[s,i,k])     (pairs dBB)
      Q[t,i,k] = sum_s P[s,i,k] W[s,t]         (pairs dAA)
      T_A[s,a,b] = sum_{t,j} Q[(s t),a,j] A[t,b,j]
                 + sum_{t,i} Q[(t s),i,b] A[t,i,a]
      T_B analogous from C and B;  T_W[s,t] = sum_{i,k} P AA
      (per-batch for batched W; batch-summed for shared W).
    """
    are = [are_ref[k] for k in range(8)]
    aim = [aim_ref[k] for k in range(8)]
    bre = [bre_ref[k] for k in range(8)]
    bim = [bim_ref[k] for k in range(8)]
    v = [(vre_ref[i], vim_ref[i]) for i in range(4)]
    u = [(ure_ref[i], uim_ref[i]) for i in range(4)]
    lre, lim = lre_ref[...], lim_ref[...]
    ct = ct_ref[...]
    wget = (_wget_vmem if w_batched else _wget_smem)(wre_ref, wim_ref)

    _, _, aa, waa, bb = _build_E_planes(are, aim, bre, bim, wget)

    # coef = -ct (conj(lam)/|lam|) / (u^dag v)
    dre = sum(u[i][0] * v[i][0] + u[i][1] * v[i][1] for i in range(4))
    dim = sum(u[i][0] * v[i][1] - u[i][1] * v[i][0] for i in range(4))
    mag = jax.lax.rsqrt(jnp.maximum(lre * lre + lim * lim, 1e-30))
    nre, nim = lre * mag, -lim * mag
    dn = 1.0 / jnp.maximum(dre * dre + dim * dim, 1e-30)
    qre = (nre * dre + nim * dim) * dn
    qim = (nim * dre - nre * dim) * dn
    cre, cim = -ct * qre, -ct * qim

    # K[(ij),(kl)] = coef conj(u_(ij)) v_(kl)
    K = {}
    for r in range(4):
        ar_, ai_ = _cmul(cre, cim, u[r][0], -u[r][1])
        for c in range(4):
            K[(r, c)] = _cmul(ar_, ai_, v[c][0], v[c][1])

    # P[s,i,k] = sum_jl K[(ij),(kl)] conj(BB[s,j,l])
    P = {}
    for s in range(4):
        for i in range(2):
            for k in range(2):
                sr = si = None
                for j in range(2):
                    for l in range(2):
                        kr, ki = K[(i * 2 + j, k * 2 + l)]
                        br_, bi_ = bb[(s, j, l)]
                        pr, pi = _cmul(kr, ki, br_, -bi_)
                        sr = pr if sr is None else sr + pr
                        si = pi if si is None else si + pi
                P[(s, i, k)] = (sr, si)

    # C[s,j,l] = conj(sum_ik K[(ij),(kl)] WAA[s,i,k])
    C = {}
    for s in range(4):
        for j in range(2):
            for l in range(2):
                sr = si = None
                for i in range(2):
                    for k in range(2):
                        kr, ki = K[(i * 2 + j, k * 2 + l)]
                        wr_, wi_ = waa[(s, i, k)]
                        pr, pi = _cmul(kr, ki, wr_, wi_)
                        sr = pr if sr is None else sr + pr
                        si = pi if si is None else si + pi
                C[(s, j, l)] = (sr, -si)

    # Q[(s1 s2),i,k] = sum_s P[s,i,k] W[s, s1*2+s2]
    Q = {}
    for t in range(4):
        for i in range(2):
            for k in range(2):
                sr = si = None
                for s in range(4):
                    wr_, wi_ = wget(s, t)
                    pr_, pi_ = P[(s, i, k)]
                    xr = pr_ * wr_ - pi_ * wi_
                    xi = pr_ * wi_ + pi_ * wr_
                    sr = xr if sr is None else sr + xr
                    si = xi if si is None else si + xi
                Q[(t, i, k)] = (sr, si)

    def transposed_pair(G, xre, xim, out_r, out_i):
        """T[s,a,b] = sum_{t,j} G[(s t),a,j] X[t,b,j]
                    + sum_{t,i} G[(t s),i,b] X[t,i,a]  for X comps x."""
        for s in range(2):
            for a in range(2):
                for b in range(2):
                    sr = si = None
                    for t in range(2):
                        for j in range(2):
                            gr, gi = G[(s * 2 + t, a, j)]
                            pr, pi = _cmul(gr, gi, xre[t * 4 + b * 2 + j], xim[t * 4 + b * 2 + j])
                            sr = pr if sr is None else sr + pr
                            si = pi if si is None else si + pi
                        for i in range(2):
                            gr, gi = G[(t * 2 + s, i, b)]
                            pr, pi = _cmul(gr, gi, xre[t * 4 + i * 2 + a], xim[t * 4 + i * 2 + a])
                            sr = sr + pr
                            si = si + pi
                    out_r[s * 4 + a * 2 + b] = sr
                    out_i[s * 4 + a * 2 + b] = si

    transposed_pair(Q, are, aim, oar, oai)
    transposed_pair(C, bre, bim, obr, obi)

    # per-batch Wbar[s,t] = sum_ik P[s,i,k] AA[t,i,k] (summed over the
    # batch outside — a trivial XLA reduction over the output planes)
    for s in range(4):
        for t in range(4):
            sr = si = None
            for i in range(2):
                for k in range(2):
                    pr_, pi_ = P[(s, i, k)]
                    ar_, ai_ = aa[(t, i, k)]
                    xr, xi = _cmul(pr_, pi_, ar_, ai_)
                    sr = xr if sr is None else sr + xr
                    si = xi if si is None else si + xi
            owr[s * 4 + t] = sr
            owi[s * 4 + t] = si


def _fused_backward_pallas(As, Bs, W, lam, v, w, ct, tile_rows=8, interpret=False):
    """Launch the backward kernel; returns (Abar, Bbar, Wbar).  Wbar is
    (4, 4) (batch-summed) for shared W, (B, 4, 4) for per-trajectory W."""
    B = As.shape[0]
    pad = (-B) % (tile_rows * LANE)
    Bp = B + pad
    R = Bp // LANE
    w_batched = W.ndim == 3

    are, aim = _comp_planes(As, 8, B, pad, R)
    bre, bim = _comp_planes(Bs, 8, B, pad, R)
    vre, vim = _comp_planes(v, 4, B, pad, R)
    ure, uim = _comp_planes(w, 4, B, pad, R)
    lre, lim = _comp_planes(lam, 1, B, pad, R)
    ctp, _ = _comp_planes(ct.astype(jnp.complex64), 1, B, pad, R)
    if w_batched:
        wre, wim = _comp_planes(W, 16, B, pad, R)
    else:
        wre = jnp.real(W).astype(jnp.float32)
        wim = jnp.imag(W).astype(jnp.float32)

    grid = (R // tile_rows,)

    def vspec(n):
        return pl.BlockSpec(
            (n, tile_rows, LANE), lambda i: (0, i, 0), memory_space=pltpu.VMEM
        )

    lspec = pl.BlockSpec((tile_rows, LANE), lambda i: (i, 0), memory_space=pltpu.VMEM)
    wspec = vspec(16) if w_batched else pl.BlockSpec(memory_space=pltpu.SMEM)

    outs = pl.pallas_call(
        functools.partial(_tdvp_bwd_kernel, w_batched),
        grid=grid,
        in_specs=[vspec(8)] * 4 + [vspec(4)] * 4 + [lspec] * 3 + [wspec] * 2,
        out_specs=[vspec(8)] * 4 + [vspec(16)] * 2,
        out_shape=[jax.ShapeDtypeStruct((8, R, LANE), jnp.float32)] * 4
        + [jax.ShapeDtypeStruct((16, R, LANE), jnp.float32)] * 2,
        interpret=interpret,
    )(
        are, aim, bre, bim, vre, vim, ure, uim,
        lre.reshape(R, LANE), lim.reshape(R, LANE), ctp.reshape(R, LANE),
        wre, wim,
    )

    def reassemble(re, im, ncomp, shape):
        z = jax.lax.complex(re, im).reshape(ncomp, Bp).T[:B]
        return z.reshape((B,) + shape).astype(As.dtype)

    Abar = reassemble(outs[0], outs[1], 8, (2, 2, 2))
    Bbar = reassemble(outs[2], outs[3], 8, (2, 2, 2))
    Wbar_pb = reassemble(outs[4], outs[5], 16, (4, 4))
    if w_batched:
        return Abar, Bbar, Wbar_pb.astype(W.dtype)
    return Abar, Bbar, jnp.sum(Wbar_pb, axis=0).astype(W.dtype)


def _fused_fwd(As, Bs, W, iters, interpret):
    lam, v, w = _fused_forward(As, Bs, W, iters, with_left=True, interpret=interpret)
    return -jnp.abs(lam), (As, Bs, W, lam, v, w)


def _fused_bwd(iters, interpret, res, ct):
    As, Bs, W, lam, v, w = res
    return _fused_backward_pallas(As, Bs, W, lam, v, w, ct, interpret=interpret)


tdvp_objective_fused.defvjp(_fused_fwd, _fused_bwd)
