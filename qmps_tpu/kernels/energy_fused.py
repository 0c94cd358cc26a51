"""Fully fused batched D = 2 ground-state ENERGY objective.

The config-4 phase-diagram sweep's per-step cost is value_and_grad of
energy_exact_env(ansatz(p), h(g)) per point (objectives/energy.py:30-42;
the reference's per-point optimization is
/root/reference/scripts/ground_state_finding.py:100-154).  The
energy-from-tensor pipeline — blocked transfer build, right fixed point,
<h> contraction, and the fixed point's implicit adjoint — is a dozen
separately-lowered tiny-contraction XLA stages per step, each an HBM
round trip of (B, ...) intermediates: the same pathology the fused TDVP
objective kernel removed (kernels/tdvp_fused.py).  This module fuses the
whole objective for D = 2: forward AND backward are one Pallas launch
each over component-major planes.

Math (per element; A left-canonical by construction — it comes from
unitary_to_tensor of a unitary, so sum_s A_s^dag A_s = I exactly):

  AA[(s1 s2)] = A_s1 A_s2                        (2x2 bond blocks)
  E[(i j), (k l)] = sum_s AA[s, i, k] conj(AA[s, j, l])
  (lam, v) = dominant right eigenpair of E       (lam = 1 analytically)
  r = herm(v) / tr(herm(v)),  herm(M) = (M + M^dag)/2
  e = Re sum_{t,s} h[t, s] tr_bond( AA_s r AA_t^dag )

Backward: e depends on A directly (three AA slots) and through r.  The
eigenVECTOR adjoint is NOT rank-1 (unlike the eigenvalue-only TDVP
objective): with T = lam I - E singular along (v, u^dag), u = vec(I)
exactly (left-canonicality gives u^dag E = lam u^dag), the cotangent
back through v = eig(E) is

  Ebar = z v^T,   T^T z = P^T vbar   (P deflates the gauge direction)

solved in LOG time by the product-form geometric series
  (I - X)^{-1} = prod_k (I + X^(2^k)),  X = (E^T - lam w v^T/(v^T w))/lam
(w = conj(u); spectral radius |lam_2/lam| < 1 for injective MPS, so K
doublings cover 2^K series terms — near-critical gaps ~0.99 converge at
K ~ 24 where a plain Neumann sum needs thousands of terms).  All chain
pieces (trace-normalization quotient, hermitization projector, the
transposed E-build, the transposed AA-build) are closed-form plane
contractions; validated against jax.grad of objectives.energy
.energy_exact_env to 1e-10 (tests/test_energy_fused.py).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .pallas_power import _solve_planes
from .tdvp_fused import (
    LANE,
    _cmul,
    _comp_planes,
    _plane_AA,
    _wget_smem,
    _wget_vmem,
)

__all__ = ["energy_objective_fused"]


# ---------------------------------------------------------------------------
# XLA reference implementation (the kernel's specification; also the
# fallback path and the test oracle glue)
# ---------------------------------------------------------------------------


def _build(As):
    """(B, 2, 2, 2) -> AA (B, 4, 2, 2), E (B, 4, 4)."""
    AA = jnp.einsum("bsik,btkj->bstij", As, As).reshape(-1, 4, 2, 2)
    E = jnp.einsum("bsik,bsjl->bijkl", AA, AA.conj()).reshape(-1, 4, 4)
    return AA, E


def _energy_from_parts(AA, r2, hs):
    """e = Re sum h[t,s] AA[s,i,j] r2[j,k] conj(AA[t,i,k])."""
    T = jnp.einsum("bsij,bjk,btik->bts", AA, r2, AA.conj())
    return jnp.einsum("bts,bts->b", hs.astype(T.dtype), T).real


def _r_chain(v):
    """v (B, 4) raw eigenvector -> r2 (B, 2, 2) hermitized trace-1."""
    r0 = v.reshape(-1, 2, 2)
    r1 = (r0 + jnp.swapaxes(r0, -1, -2).conj()) / 2.0
    tau = jnp.trace(r1, axis1=-2, axis2=-1)
    return r1 / tau[:, None, None]


def _eig_right_xla(E, iters):
    """Dominant right eigenpair by normalized repeated squaring (the same
    algorithm as the Pallas solve; jittable, any backend)."""
    def step(M, _):
        M2 = M @ M
        n = jnp.sqrt(jnp.sum(jnp.abs(M2) ** 2, axis=(-2, -1), keepdims=True))
        return M2 / jnp.maximum(n, 1e-30), None

    Mk, _ = jax.lax.scan(step, E / 2.0, None, length=iters)
    # dominant column (E^(2^k) -> lam^(2^k) v u^dag): pick the largest
    j = jnp.argmax(jnp.sum(jnp.abs(Mk), axis=-2), axis=-1)
    v = jnp.take_along_axis(Mk, j[:, None, None], axis=-1)[..., 0]
    v = v / jnp.linalg.norm(v, axis=-1, keepdims=True)
    lam = jnp.einsum("bi,bij,bj->b", v.conj(), E, v)  # Rayleigh (v normed)
    return lam, v


def _energy_fwd_xla(As, hs, iters):
    AA, E = _build(As)
    lam, v = _eig_right_xla(E, iters)
    r2 = _r_chain(v)
    e = _energy_from_parts(AA, r2, hs)
    return e, lam, v


def _series_apply_T(E, lam, v, q, K):
    """z = (lam I - E^T + lam w v^T/(v^T w))^{-1} P^T q via the
    product-form geometric series; w = vec(I) (left-canonical A).

    P^T projects q onto the solvable subspace (v^T q = 0 after
    projection): q <- q - w (v^T q)/(v^T w).
    """
    B = q.shape[0]
    w = jnp.zeros((4,), q.dtype).at[0].set(1.0).at[3].set(1.0)  # vec(I)
    vw = jnp.einsum("bi,i->b", v, w)
    q = q - jnp.einsum("bi,bi->b", v, q)[:, None] / vw[:, None] * w[None, :]
    # X = (E^T - lam w v^T / (v^T w)) / lam ;  z = (1/lam) sum X^k q
    X = (
        jnp.swapaxes(E, -1, -2)
        - lam[:, None, None] * w[None, :, None] * v[:, None, :] / vw[:, None, None]
    ) / lam[:, None, None]

    def step(carry, _):
        x, M = carry
        return (x + jnp.einsum("bij,bj->bi", M, x), M @ M), None

    (z, _), _ = jax.lax.scan(step, (q, X), None, length=K)
    return z / lam[:, None]


def _energy_bwd_xla(As, hs, lam, v, ct, K=24):
    """Hand-derived adjoint: returns (Abar, hbar) in the JAX pairing
    convention (de = Re sum Abar dA for the complex leaf)."""
    AA, E = _build(As)
    r0 = v.reshape(-1, 2, 2)
    r1 = (r0 + jnp.swapaxes(r0, -1, -2).conj()) / 2.0
    tau = jnp.trace(r1, axis1=-2, axis2=-1)
    r2 = r1 / tau[:, None, None]
    ctc = ct.astype(As.dtype)

    # ---- direct energy-contraction terms ----
    # e = Re S, S = sum h[t,s] AA[s,i,j] r2[j,k] conj(AA[t,i,k])
    T = jnp.einsum("bsij,bjk,btik->bts", AA, r2, AA.conj())
    hbar = T * ctc[:, None, None]
    h_ = hs.astype(As.dtype)
    # pairs dAA (ket slot):
    AAbar_d = jnp.einsum("b,bts,bjk,btik->bsij", ctc, h_, r2, AA.conj())
    # pairs conj(dAA) (bra slot) -> conjugate partner:
    AAbar_d = AAbar_d + jnp.einsum(
        "b,bts,bsij,bjk->btik", ctc, h_, AA, r2
    ).conj()
    # pairs dr2:
    r2bar = jnp.einsum("b,bts,bsij,btik->bjk", ctc, h_, AA, AA.conj())

    # ---- r2 = r1 / tau ----
    inner = jnp.einsum("bjk,bjk->b", r2bar, r1)
    r1bar = r2bar / tau[:, None, None] - (inner / tau**2)[:, None, None] * jnp.eye(
        2, dtype=As.dtype
    )[None]
    # ---- r1 = (r0 + r0^dag)/2 ----
    r0bar = (r1bar + jnp.swapaxes(r1bar, -1, -2).conj()) / 2.0
    vbar = r0bar.reshape(-1, 4)

    # ---- v = dominant eigvec of E (implicit adjoint, deflated series) ----
    z = _series_apply_T(E, lam, v, vbar, K)
    Ebar = z[:, :, None] * v[:, None, :]  # Ebar[(ij),(kl)] = z_(ij) v_(kl)

    # ---- E build: E = sum_s AA[s,i,k] conj(AA[s,j,l]) ----
    Eb = Ebar.reshape(-1, 2, 2, 2, 2)  # (B, i, j, k, l)
    AAbar_E = jnp.einsum("bijkl,bsjl->bsik", Eb, AA.conj())
    AAbar_E = AAbar_E + jnp.einsum("bijkl,bsik->bsjl", Eb, AA).conj()

    # ---- AA build: AA[(s1 s2), i, j] = sum_k A[s1,i,k] A[s2,k,j] ----
    G = (AAbar_d + AAbar_E).reshape(-1, 2, 2, 2, 2)  # (B, s1, s2, i, j)
    Abar = jnp.einsum("zstaj,ztbj->zsab", G, As) + jnp.einsum(
        "ztsib,ztia->zsab", G, As
    )
    return Abar, hbar


# ---------------------------------------------------------------------------
# Pallas kernels: the same math on component-major planes, whole objective
# (and whole adjoint) each in ONE launch
# ---------------------------------------------------------------------------


def _plane_E(aa):
    """E[(i j),(k l)] = sum_s AA[s,i,k] conj(AA[s,j,l]): 16 plane pairs."""
    e_re = [None] * 16
    e_im = [None] * 16
    for i in range(2):
        for j in range(2):
            for k in range(2):
                for l in range(2):
                    sr = si = None
                    for s in range(4):
                        xr, xi = aa[(s, i, k)]
                        yr, yi = aa[(s, j, l)]
                        pr, pi = _cmul(xr, xi, yr, -yi)
                        sr = pr if sr is None else sr + pr
                        si = pi if si is None else si + pi
                    e_re[(i * 2 + j) * 4 + (k * 2 + l)] = sr
                    e_im[(i * 2 + j) * 4 + (k * 2 + l)] = si
    return e_re, e_im


def _plane_r_chain(vre, vim):
    """v (4 plane pairs) -> r2 dict[(a, b)], tau (re, im), den=1/|tau|^2."""
    r1 = {}
    for a in range(2):
        for b in range(2):
            # r1[a,b] = (r0[a,b] + conj(r0[b,a])) / 2
            r1[(a, b)] = (
                (vre[a * 2 + b] + vre[b * 2 + a]) * 0.5,
                (vim[a * 2 + b] - vim[b * 2 + a]) * 0.5,
            )
    tre = r1[(0, 0)][0] + r1[(1, 1)][0]
    tim = r1[(0, 0)][1] + r1[(1, 1)][1]
    den = 1.0 / jnp.maximum(tre * tre + tim * tim, 1e-30)
    r2 = {}
    for a in range(2):
        for b in range(2):
            xr, xi = r1[(a, b)]
            r2[(a, b)] = (
                (xr * tre + xi * tim) * den,
                (xi * tre - xr * tim) * den,
            )
    return r1, r2, (tre, tim), den


def _plane_M_T(aa, r2):
    """M[s,i,k] = sum_j AA[s,i,j] r2[j,k]; T[t,s] = sum_ik M[s,i,k]
    conj(AA[t,i,k])."""
    M = {}
    for s in range(4):
        for i in range(2):
            for k in range(2):
                sr = si = None
                for j in range(2):
                    ar, ai = aa[(s, i, j)]
                    rr, ri = r2[(j, k)]
                    pr, pi = _cmul(ar, ai, rr, ri)
                    sr = pr if sr is None else sr + pr
                    si = pi if si is None else si + pi
                M[(s, i, k)] = (sr, si)
    T = {}
    for t in range(4):
        for s in range(4):
            sr = si = None
            for i in range(2):
                for k in range(2):
                    mr, mi = M[(s, i, k)]
                    ar, ai = aa[(t, i, k)]
                    pr, pi = _cmul(mr, mi, ar, -ai)
                    sr = pr if sr is None else sr + pr
                    si = pi if si is None else si + pi
            T[(t, s)] = (sr, si)
    return M, T


def _energy_fwd_kernel(
    iters, h_batched, with_v,
    are_ref, aim_ref, hre_ref, him_ref,
    *out_refs,
):
    are = [are_ref[k] for k in range(8)]
    aim = [aim_ref[k] for k in range(8)]
    hget = (_wget_vmem if h_batched else _wget_smem)(hre_ref, him_ref)

    aa = _plane_AA(are, aim)
    e_re, e_im = _plane_E(aa)
    lre, lim, vre, vim = _solve_planes(4, iters, e_re, e_im)
    _, r2, _, _ = _plane_r_chain(vre, vim)
    _, T = _plane_M_T(aa, r2)

    e = None
    for t in range(4):
        for s in range(4):
            hr, hi = hget(t, s)
            tr_, ti_ = T[(t, s)]
            term = hr * tr_ - hi * ti_
            e = term if e is None else e + term

    out_refs[0][:] = e
    if with_v:
        out_refs[1][:] = lre
        out_refs[2][:] = lim
        for i in range(4):
            out_refs[3][i] = vre[i]
            out_refs[4][i] = vim[i]


def _energy_bwd_kernel(
    K, h_batched,
    are_ref, aim_ref, hre_ref, him_ref,
    vre_ref, vim_ref, lre_ref, lim_ref, ct_ref,
    oar, oai, ohr, ohi,
):
    are = [are_ref[k] for k in range(8)]
    aim = [aim_ref[k] for k in range(8)]
    hget = (_wget_vmem if h_batched else _wget_smem)(hre_ref, him_ref)
    vre = [vre_ref[i] for i in range(4)]
    vim = [vim_ref[i] for i in range(4)]
    lre, lim = lre_ref[...], lim_ref[...]
    ct = ct_ref[...]

    aa = _plane_AA(are, aim)
    e_re, e_im = _plane_E(aa)
    r1, r2, (tre, tim), den = _plane_r_chain(vre, vim)
    M, T = _plane_M_T(aa, r2)

    # hbar[t, s] = ct * T[t, s]  (complex; real-h consumers take the real
    # plane — the XLA side casts)
    for t in range(4):
        for s in range(4):
            tr_, ti_ = T[(t, s)]
            ohr[t * 4 + s] = ct * tr_
            ohi[t * 4 + s] = ct * ti_

    # ---- direct AA pullbacks ----
    # C1[t,i,j] = sum_k r2[j,k] conj(AA[t,i,k]);
    # AAbar_d1[s,i,j] = ct sum_t h[t,s] C1[t,i,j]
    # AAbar_d2[t,i,k] = ct conj( sum_s h[t,s] M[s,i,k] )
    G = {}
    for s in range(4):
        for i in range(2):
            for j in range(2):
                sr = si = None
                for t in range(4):
                    hr, hi = hget(t, s)
                    c1r = c1i = None
                    for k in range(2):
                        rr, ri = r2[(j, k)]
                        ar, ai = aa[(t, i, k)]
                        pr, pi = _cmul(rr, ri, ar, -ai)
                        c1r = pr if c1r is None else c1r + pr
                        c1i = pi if c1i is None else c1i + pi
                    pr, pi = _cmul(hr, hi, c1r, c1i)
                    sr = pr if sr is None else sr + pr
                    si = pi if si is None else si + pi
                G[(s, i, j)] = (ct * sr, ct * si)
    for t in range(4):
        for i in range(2):
            for k in range(2):
                sr = si = None
                for s in range(4):
                    hr, hi = hget(t, s)
                    mr, mi = M[(s, i, k)]
                    pr, pi = _cmul(hr, hi, mr, mi)
                    sr = pr if sr is None else sr + pr
                    si = pi if si is None else si + pi
                gr, gi = G[(t, i, k)]
                G[(t, i, k)] = (gr + ct * sr, gi - ct * si)  # + conj

    # ---- r2bar[j,k] = ct sum_{s,t,i} h[t,s] AA[s,i,j] conj(AA[t,i,k]) ----
    r2bar = {}
    for j in range(2):
        for k in range(2):
            sr = si = None
            for s in range(4):
                for t in range(4):
                    hr, hi = hget(t, s)
                    for i in range(2):
                        xr, xi = aa[(s, i, j)]
                        yr, yi = aa[(t, i, k)]
                        pr, pi = _cmul(xr, xi, yr, -yi)
                        qr, qi = _cmul(hr, hi, pr, pi)
                        sr = qr if sr is None else sr + qr
                        si = qi if si is None else si + qi
            r2bar[(j, k)] = (ct * sr, ct * si)

    # ---- r1bar = r2bar / tau - (sum r2bar*r1)/tau^2 * I ----
    inr = ini = None
    for a in range(2):
        for b in range(2):
            br, bi = r2bar[(a, b)]
            xr, xi = r1[(a, b)]
            pr, pi = _cmul(br, bi, xr, xi)
            inr = pr if inr is None else inr + pr
            ini = pi if ini is None else ini + pi
    # inner / tau^2 = inner * conj(tau)^2 * den^2
    t2r, t2i = _cmul(tre, -tim, tre, -tim)
    c2r, c2i = _cmul(inr, ini, t2r * den * den, t2i * den * den)
    r1bar = {}
    for a in range(2):
        for b in range(2):
            br, bi = r2bar[(a, b)]
            # divide by tau: * conj(tau) * den
            dr = (br * tre + bi * tim) * den
            di = (bi * tre - br * tim) * den
            if a == b:
                dr = dr - c2r
                di = di - c2i
            r1bar[(a, b)] = (dr, di)

    # ---- r0bar = (r1bar + conj(r1bar^T))/2 -> vbar (4 comps) ----
    vbar = [None] * 4
    for a in range(2):
        for b in range(2):
            xr, xi = r1bar[(a, b)]
            yr, yi = r1bar[(b, a)]
            vbar[a * 2 + b] = ((xr + yr) * 0.5, (xi - yi) * 0.5)

    # ---- project onto the solvable subspace: q = vbar - (v.q)/(v.w) w,
    # w = vec(I) (comps 0 and 3) ----
    vqr = vqi = None
    for i in range(4):
        pr, pi = _cmul(vre[i], vim[i], vbar[i][0], vbar[i][1])
        vqr = pr if vqr is None else vqr + pr
        vqi = pi if vqi is None else vqi + pi
    vwr = vre[0] + vre[3]
    vwi = vim[0] + vim[3]
    wden = 1.0 / jnp.maximum(vwr * vwr + vwi * vwi, 1e-30)
    # alpha = (v.q)/(v.w)
    ar_ = (vqr * vwr + vqi * vwi) * wden
    ai_ = (vqi * vwr - vqr * vwi) * wden
    q = list(vbar)
    for i in (0, 3):
        q[i] = (q[i][0] - ar_, q[i][1] - ai_)

    # ---- X = (E^T - lam w v^T/(v.w)) / lam ;  z = (1/lam) sum_k X^k q ----
    lden = 1.0 / jnp.maximum(lre * lre + lim * lim, 1e-30)
    X_re = [None] * 16
    X_im = [None] * 16
    for i in range(4):
        for j in range(4):
            xr = e_re[j * 4 + i]  # E^T
            xi = e_im[j * 4 + i]
            if i in (0, 3):
                # minus lam * v_j / (v.w): lam cancels with the outer /lam
                # only partially — keep explicit: s_ij = lam * w_i v_j / vw
                pr, pi = _cmul(lre, lim, vre[j], vim[j])
                qr = (pr * vwr + pi * vwi) * wden
                qi = (pi * vwr - pr * vwi) * wden
                xr = xr - qr
                xi = xi - qi
            # divide by lam
            X_re[i * 4 + j] = (xr * lre + xi * lim) * lden
            X_im[i * 4 + j] = (xi * lre - xr * lim) * lden

    def body(_, carry):
        x_re = list(carry[:4])
        x_im = list(carry[4:8])
        m_re = list(carry[8:24])
        m_im = list(carry[24:40])
        nx_re, nx_im = [], []
        for i in range(4):
            sr, si = x_re[i], x_im[i]
            for j in range(4):
                pr, pi = _cmul(m_re[i * 4 + j], m_im[i * 4 + j], x_re[j], x_im[j])
                sr = sr + pr
                si = si + pi
            nx_re.append(sr)
            nx_im.append(si)
        nm_re, nm_im = [], []
        for a in range(4):
            for b in range(4):
                sr = si = None
                for k in range(4):
                    pr, pi = _cmul(
                        m_re[a * 4 + k], m_im[a * 4 + k],
                        m_re[k * 4 + b], m_im[k * 4 + b],
                    )
                    sr = pr if sr is None else sr + pr
                    si = pi if si is None else si + pi
                nm_re.append(sr)
                nm_im.append(si)
        return tuple(nx_re) + tuple(nx_im) + tuple(nm_re) + tuple(nm_im)

    carry = (
        tuple(p[0] for p in q) + tuple(p[1] for p in q)
        + tuple(X_re) + tuple(X_im)
    )
    carry = jax.lax.fori_loop(0, K, body, carry)
    z = []
    for i in range(4):
        xr, xi = carry[i], carry[4 + i]
        z.append(((xr * lre + xi * lim) * lden, (xi * lre - xr * lim) * lden))

    # ---- Ebar = z v^T ;  pull back through the E build ----
    Eb = {}
    for r in range(4):
        for c in range(4):
            Eb[(r, c)] = _cmul(z[r][0], z[r][1], vre[c], vim[c])
    # AAbar_E1[s,i,k] = sum_{j,l} Ebar[(ij),(kl)] conj(AA[s,j,l])
    for s in range(4):
        for i in range(2):
            for k in range(2):
                sr = si = None
                for j in range(2):
                    for l in range(2):
                        er, ei = Eb[(i * 2 + j, k * 2 + l)]
                        ar2, ai2 = aa[(s, j, l)]
                        pr, pi = _cmul(er, ei, ar2, -ai2)
                        sr = pr if sr is None else sr + pr
                        si = pi if si is None else si + pi
                gr, gi = G[(s, i, k)]
                G[(s, i, k)] = (gr + sr, gi + si)
    # AAbar_E2[s,j,l] = conj( sum_{i,k} Ebar[(ij),(kl)] AA[s,i,k] )
    for s in range(4):
        for j in range(2):
            for l in range(2):
                sr = si = None
                for i in range(2):
                    for k in range(2):
                        er, ei = Eb[(i * 2 + j, k * 2 + l)]
                        ar2, ai2 = aa[(s, i, k)]
                        pr, pi = _cmul(er, ei, ar2, ai2)
                        sr = pr if sr is None else sr + pr
                        si = pi if si is None else si + pi
                gr, gi = G[(s, j, l)]
                G[(s, j, l)] = (gr + sr, gi - si)  # + conj

    # ---- AA build pullback: Abar[s,a,b] = sum_{t,j} G[(s t),a,j] A[t,b,j]
    #                                    + sum_{t,i} G[(t s),i,b] A[t,i,a] --
    for s in range(2):
        for a in range(2):
            for b in range(2):
                sr = si = None
                for t in range(2):
                    for j in range(2):
                        gr, gi = G[(s * 2 + t, a, j)]
                        pr, pi = _cmul(gr, gi, are[t * 4 + b * 2 + j], aim[t * 4 + b * 2 + j])
                        sr = pr if sr is None else sr + pr
                        si = pi if si is None else si + pi
                    for i in range(2):
                        gr, gi = G[(t * 2 + s, i, b)]
                        pr, pi = _cmul(gr, gi, are[t * 4 + i * 2 + a], aim[t * 4 + i * 2 + a])
                        sr = sr + pr
                        si = si + pi
                oar[s * 4 + a * 2 + b] = sr
                oai[s * 4 + a * 2 + b] = si


def _fwd_pallas(As, hs, iters, with_v, tile_rows=8, interpret=False):
    """Launch the forward kernel.  As (B, 2, 2, 2); hs (4, 4) shared or
    (B, 4, 4).  Returns e [, lam, v]."""
    B = As.shape[0]
    pad = (-B) % (tile_rows * LANE)
    Bp = B + pad
    R = Bp // LANE
    h_batched = hs.ndim == 3

    are, aim = _comp_planes(As, 8, B, pad, R)
    if h_batched:
        hre, him = _comp_planes(hs.astype(As.dtype), 16, B, pad, R)
    else:
        hre = jnp.real(hs).astype(jnp.float32)
        him = jnp.imag(hs).astype(jnp.float32)

    grid = (R // tile_rows,)

    def vspec(n):
        return pl.BlockSpec(
            (n, tile_rows, LANE), lambda i: (0, i, 0), memory_space=pltpu.VMEM
        )

    hspec = vspec(16) if h_batched else pl.BlockSpec(memory_space=pltpu.SMEM)
    lspec = pl.BlockSpec((tile_rows, LANE), lambda i: (i, 0), memory_space=pltpu.VMEM)

    out_specs = [lspec]
    out_shape = [jax.ShapeDtypeStruct((R, LANE), jnp.float32)]
    if with_v:
        out_specs += [lspec, lspec, vspec(4), vspec(4)]
        out_shape += [
            jax.ShapeDtypeStruct((R, LANE), jnp.float32),
            jax.ShapeDtypeStruct((R, LANE), jnp.float32),
            jax.ShapeDtypeStruct((4, R, LANE), jnp.float32),
            jax.ShapeDtypeStruct((4, R, LANE), jnp.float32),
        ]

    outs = pl.pallas_call(
        functools.partial(_energy_fwd_kernel, iters, h_batched, with_v),
        grid=grid,
        in_specs=[vspec(8), vspec(8), hspec, hspec],
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=interpret,
    )(are, aim, hre, him)

    e = outs[0].reshape(Bp)[:B]
    if not with_v:
        return e
    lam = jax.lax.complex(outs[1], outs[2]).reshape(Bp)[:B]
    v = jax.lax.complex(outs[3], outs[4]).reshape(4, Bp).T[:B]
    return e, lam, v


def _bwd_pallas(As, hs, lam, v, ct, K=24, tile_rows=8, interpret=False):
    """Launch the backward kernel; returns (Abar, hbar_complex (B,4,4))."""
    B = As.shape[0]
    pad = (-B) % (tile_rows * LANE)
    Bp = B + pad
    R = Bp // LANE
    h_batched = hs.ndim == 3

    are, aim = _comp_planes(As, 8, B, pad, R)
    if h_batched:
        hre, him = _comp_planes(hs.astype(As.dtype), 16, B, pad, R)
    else:
        hre = jnp.real(hs).astype(jnp.float32)
        him = jnp.imag(hs).astype(jnp.float32)
    vre, vim = _comp_planes(v, 4, B, pad, R)
    lre, lim = _comp_planes(lam, 1, B, pad, R)
    ctp, _ = _comp_planes(ct.astype(jnp.complex64), 1, B, pad, R)

    grid = (R // tile_rows,)

    def vspec(n):
        return pl.BlockSpec(
            (n, tile_rows, LANE), lambda i: (0, i, 0), memory_space=pltpu.VMEM
        )

    hspec = vspec(16) if h_batched else pl.BlockSpec(memory_space=pltpu.SMEM)
    lspec = pl.BlockSpec((tile_rows, LANE), lambda i: (i, 0), memory_space=pltpu.VMEM)

    outs = pl.pallas_call(
        functools.partial(_energy_bwd_kernel, K, h_batched),
        grid=grid,
        in_specs=[vspec(8), vspec(8), hspec, hspec, vspec(4), vspec(4)]
        + [lspec] * 3,
        out_specs=[vspec(8), vspec(8), vspec(16), vspec(16)],
        out_shape=[jax.ShapeDtypeStruct((8, R, LANE), jnp.float32)] * 2
        + [jax.ShapeDtypeStruct((16, R, LANE), jnp.float32)] * 2,
        interpret=interpret,
    )(
        are, aim, hre, him, vre, vim,
        lre.reshape(R, LANE), lim.reshape(R, LANE), ctp.reshape(R, LANE),
    )

    def reassemble(re, im, ncomp, shape):
        zz = jax.lax.complex(re, im).reshape(ncomp, Bp).T[:B]
        return zz.reshape((B,) + shape).astype(As.dtype)

    Abar = reassemble(outs[0], outs[1], 8, (2, 2, 2))
    hbar = reassemble(outs[2], outs[3], 16, (4, 4))
    return Abar, hbar


# ---------------------------------------------------------------------------
# public face (XLA path for now; the Pallas kernels plug in behind the
# same custom_vjp without changing semantics)
# ---------------------------------------------------------------------------


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4))
def energy_objective_fused(
    As: jnp.ndarray,
    hs: jnp.ndarray,
    iters: int = 48,
    interpret: bool = False,
    engine: str = "pallas",
) -> jnp.ndarray:
    """Batched D = 2 uMPS energy with exact environments: (B, 2, 2, 2)
    left-canonical tensors + per-point (B, 4, 4) (or shared (4, 4))
    two-site Hamiltonian matrices -> (B,) energies.

    Equals objectives.energy.energy_exact_env(tensor_to_unitary-inverse)
    elementwise; the gradient is the hand-derived implicit adjoint (one
    deflated log-time series solve instead of differentiating the
    fixed-point iteration).  REQUIRES left-canonical As (true for any
    unitary_to_tensor output): the left fixed point is hardcoded to the
    identity.

    engine="pallas" (default): whole objective one kernel launch, whole
    adjoint a second (f32 component planes).  engine="xla": the same math
    as traced XLA in the caller's precision — the kernel's specification
    and the x64 test oracle.
    """
    hs = jnp.asarray(hs)
    if engine == "pallas":
        return _fwd_pallas(As, hs, iters, with_v=False, interpret=interpret)
    e, _, _ = _energy_fwd_xla(As, _broadcast_h(hs, As.shape[0]), iters)
    return e


def _broadcast_h(hs, B):
    hs = jnp.asarray(hs)
    if hs.ndim == 2:
        hs = jnp.broadcast_to(hs[None], (B, 4, 4))
    return hs


def _fwd(As, hs, iters, interpret, engine):
    hs = jnp.asarray(hs)
    if engine == "pallas":
        e, lam, v = _fwd_pallas(As, hs, iters, with_v=True, interpret=interpret)
    else:
        e, lam, v = _energy_fwd_xla(As, _broadcast_h(hs, As.shape[0]), iters)
    return e, (As, hs, lam, v)


def _bwd(iters, interpret, engine, res, ct):
    As, hs, lam, v = res
    if engine == "pallas":
        Abar, hbar = _bwd_pallas(As, hs, lam, v, ct, interpret=interpret)
    else:
        Abar, hbar = _energy_bwd_xla(As, _broadcast_h(hs, As.shape[0]), lam, v, ct)
    if hs.ndim == 2:
        hbar = jnp.sum(hbar, axis=0)
    if not jnp.iscomplexobj(hs):
        hbar = hbar.real
    return Abar, hbar.astype(hs.dtype)


energy_objective_fused.defvjp(_fwd, _bwd)
