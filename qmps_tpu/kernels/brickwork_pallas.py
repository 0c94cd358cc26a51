"""Fused Pallas kernel for the gen-2 brickwork TDVP overlap.

The XLA flat-matmul form (`brickwork_fast.manifold_overlap_batched`) is a
pipeline of ~12 separately-lowered stages, each a full HBM round trip of
the (B, ...) intermediates — measured 27.5 ms/call at batch 65536 on one
v5e chip, ~50x off the bandwidth bound.  This kernel fuses the whole
contraction: one HBM read of the component-major input planes, every
intermediate in VMEM, one HBM write of the (B,) overlap planes.

Layout (the pallas_power trick): batch on (rows, 128) lanes, every
per-element tensor component a separate (rows, 128) plane, so each
arithmetic op is an aligned full-width VPU tile op.  The two-sided
(U1 x U1) transforms run in the kron-free factorized form (two 4x4
matvec sweeps) — optimal here because in-kernel there is no tiny-matmul
lowering problem, just broadcast FMAs.  W (shared across the batch) lives
in SMEM and is applied as a 16x16 scalar-coefficient sweep.

Citations: the contraction is ManifoldOverlap.circuit / mcircuit,
/root/reference/new_tdvp/ClassicalTDVPStripped.py:239-283; numerics match
`circuits.brickwork.manifold_overlap` (tested).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANE = 128


def _overlap_kernel(
    tr,
    u1re, u1im, c2re, c2im, p1re, p1im, r2re, r2im,
    mlre, mlim, mrre, mrim, wre_ref, wim_ref,
    ore, oim,
    v_re, v_im, t_re, t_im,
):
    """One grid step: (tr, LANE) lanes of the batch.

    Inputs (VMEM): u1*/p1* (16, tr, L) U1 / conj-side U1' components;
    c2*/r2* (4, tr, L) U2 column-0 / U2'^dag row-0 components;
    ml*/mr* (4, tr, L) left/right mid-bond environments.
    wre/wim (SMEM, (16, 16)): the shared Trotter gate.
    Outputs: (tr, L) overlap planes.  Scratch v/t: (2, 4, 4, 2, tr, L).

    Index convention (brickwork_fast): 64 = (q0)(q1 q2 q3 q4)(q5); the
    slab axes are [a=(q0), j=(q1 q2), l=(q3 q4), c=(q5)]; the kron factor
    on (q3 q4) is the SECOND factor (verified against the flat-matmul
    form to 1e-7 on hardware).
    """

    def cmul(ar, ai, br, bi):
        return ar * br - ai * bi, ar * bi + ai * br

    # ------------------------------------------------------------------
    # v[a, j, l, c] = c2[(a j0)] c2[(j1 l0)] c2[(l1 c)]  — the outer cube
    # of the U2 layer column, regrouped (q0)(q1q2)(q3q4)(q5).  Build with
    # static python loops (64 iterations, traced once; bodies are tile
    # ops).  i1 = (q0 q1), i2 = (q2 q3), i3 = (q4 q5).
    # ------------------------------------------------------------------
    for i1 in range(4):
        for i2 in range(4):
            for i3 in range(4):
                ar, ai = cmul(c2re[i1], c2im[i1], c2re[i2], c2im[i2])
                br, bi = cmul(ar, ai, c2re[i3], c2im[i3])
                q = (i1 << 4) | (i2 << 2) | i3  # 6-bit flat index
                a, j, l, c = (q >> 5) & 1, (q >> 3) & 3, (q >> 1) & 3, q & 1
                v_re[a, j, l, c] = br
                v_im[a, j, l, c] = bi

    # ------------------------------------------------------------------
    # two-sided kron apply: v <- (U1 (x) U1) v on (j, l), second factor on
    # the low pair l (verified convention).  Factorized:
    #   t[a, j, k, c] = sum_l U1[k, l] v[a, j, l, c]
    #   v[a, i, k, c] = sum_j U1[i, j] t[a, j, k, c]
    # ------------------------------------------------------------------
    def kron_apply(ure, uim, conj):
        sgn = -1.0 if conj else 1.0
        for k in range(4):
            accr = None
            for l in range(4):
                # conj-transpose: U^dag[k, l] = conj(U[l, k])
                comp = (l * 4 + k) if conj else (k * 4 + l)
                wr_, wi_ = ure[comp], sgn * uim[comp]
                pr, pi = cmul(wr_, wi_, v_re[:, :, l, :], v_im[:, :, l, :])
                accr = pr if accr is None else accr + pr
                acci = pi if l == 0 else acci + pi
            t_re[:, :, k, :] = accr
            t_im[:, :, k, :] = acci
        for i in range(4):
            accr = None
            for j in range(4):
                comp = (j * 4 + i) if conj else (i * 4 + j)
                wr_, wi_ = ure[comp], sgn * uim[comp]
                pr, pi = cmul(wr_, wi_, t_re[:, j, :, :], t_im[:, j, :, :])
                accr = pr if accr is None else accr + pr
                acci = pi if j == 0 else acci + pi
            v_re[:, i, :, :] = accr
            v_im[:, i, :, :] = acci

    kron_apply(u1re, u1im, conj=False)

    # ------------------------------------------------------------------
    # W on the middle 16 = (j l): v[a, i16, c] = sum_j16 W[i, j] v[a, j16, c]
    # W is an SMEM scalar table, so each term is a scalar * tile FMA.
    # ------------------------------------------------------------------
    for i16 in range(16):
        accr = None
        for j16 in range(16):
            wr_ = wre_ref[i16, j16]
            wi_ = wim_ref[i16, j16]
            jr = v_re[:, j16 >> 2, j16 & 3, :]
            ji = v_im[:, j16 >> 2, j16 & 3, :]
            pr = wr_ * jr - wi_ * ji
            pi = wr_ * ji + wi_ * jr
            accr = pr if accr is None else accr + pr
            acci = pi if j16 == 0 else acci + pi
        t_re[:, i16 >> 2, i16 & 3, :] = accr
        t_im[:, i16 >> 2, i16 & 3, :] = acci

    # Ml on a (q0), Mr on c (q5): v[x, jl, y] = Ml[x, a] Mr[y, c] t[a, jl, c]
    for x in range(2):
        for y in range(2):
            accr = None
            first = True
            for a in range(2):
                for c in range(2):
                    mr_, mi_ = cmul(
                        mlre[x * 2 + a], mlim[x * 2 + a],
                        mrre[y * 2 + c], mrim[y * 2 + c],
                    )
                    pr, pi = cmul(mr_, mi_, t_re[a, :, :, c], t_im[a, :, :, c])
                    accr = pr if first else accr + pr
                    acci = pi if first else acci + pi
                    first = False
            v_re[x, :, :, y] = accr
            v_im[x, :, :, y] = acci

    # conj-transposed kron apply for the U1' side
    kron_apply(p1re, p1im, conj=True)

    # ------------------------------------------------------------------
    # final contraction with r2 = conj(U2'[:, 0]) outer^3 over
    # (q0 q1)(q2 q3)(q4 q5)
    # ------------------------------------------------------------------
    sr = None
    for i1 in range(4):
        for i2 in range(4):
            for i3 in range(4):
                ar, ai = cmul(r2re[i1], r2im[i1], r2re[i2], r2im[i2])
                br, bi = cmul(ar, ai, r2re[i3], r2im[i3])
                q = (i1 << 4) | (i2 << 2) | i3
                a, j, l, c = (q >> 5) & 1, (q >> 3) & 3, (q >> 1) & 3, q & 1
                pr, pi = cmul(br, bi, v_re[a, j, l, c], v_im[a, j, l, c])
                sr = pr if sr is None else sr + pr
                si = pi if (i1 | i2 | i3) == 0 else si + pi
    ore[:] = sr
    oim[:] = si


def manifold_overlap_pallas(
    U1, U2, U1p, U2p, Mr, Ml, W, tile_rows: int = 8, interpret: bool = False
):
    """Fused batched <psi(U1', U2')| Ml (x) W (x) Mr |psi(U1, U2)>.

    Same contract as brickwork_fast.manifold_overlap_batched: U1, U2,
    U1p, U2p (B, 4, 4) complex; Mr, Ml (B, 2, 2); W (16, 16) shared.
    Returns (B,) complex overlaps.  B is padded to a multiple of
    tile_rows * 128 internally.
    """
    B = U1.shape[0]
    pad = (-B) % (tile_rows * LANE)
    Bp = B + pad
    R = Bp // LANE

    def comp(x, n):
        # (B, n, n) -> components (n*n, R, LANE) real planes
        flat = x.reshape(B, n * n).T
        fre = jnp.real(flat).astype(jnp.float32)
        fim = jnp.imag(flat).astype(jnp.float32)
        if pad:
            fre = jnp.pad(fre, ((0, 0), (0, pad)))
            fim = jnp.pad(fim, ((0, 0), (0, pad)))
        return fre.reshape(n * n, R, LANE), fim.reshape(n * n, R, LANE)

    def compv(x):
        # (B, 4) vector -> (4, R, LANE) planes
        flat = x.T
        fre = jnp.real(flat).astype(jnp.float32)
        fim = jnp.imag(flat).astype(jnp.float32)
        if pad:
            fre = jnp.pad(fre, ((0, 0), (0, pad)))
            fim = jnp.pad(fim, ((0, 0), (0, pad)))
        return fre.reshape(4, R, LANE), fim.reshape(4, R, LANE)

    u1re, u1im = comp(U1, 4)
    c2re, c2im = compv(U2[:, :, 0])
    p1re, p1im = comp(U1p, 4)
    r2re, r2im = compv(U2p[:, :, 0].conj())
    mlre, mlim = comp(Ml, 2)
    mrre, mrim = comp(Mr, 2)
    wre = jnp.real(W).astype(jnp.float32)
    wim = jnp.imag(W).astype(jnp.float32)

    grid = (R // tile_rows,)

    def vspec(n):
        return pl.BlockSpec(
            (n, tile_rows, LANE), lambda i: (0, i, 0), memory_space=pltpu.VMEM
        )

    wspec = pl.BlockSpec(memory_space=pltpu.SMEM)
    ospec = pl.BlockSpec((tile_rows, LANE), lambda i: (i, 0), memory_space=pltpu.VMEM)

    kernel = functools.partial(_overlap_kernel, tile_rows)
    ore, oim = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            vspec(16), vspec(16), vspec(4), vspec(4),
            vspec(16), vspec(16), vspec(4), vspec(4),
            vspec(4), vspec(4), vspec(4), vspec(4),
            wspec, wspec,
        ],
        out_specs=[ospec, ospec],
        out_shape=[
            jax.ShapeDtypeStruct((R, LANE), jnp.float32),
            jax.ShapeDtypeStruct((R, LANE), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((2, 4, 4, 2, tile_rows, LANE), jnp.float32)
            for _ in range(4)
        ],
        interpret=interpret,
    )(
        u1re, u1im, c2re, c2im, p1re, p1im, r2re, r2im,
        mlre, mlim, mrre, mrim, wre, wim,
    )
    return jax.lax.complex(ore, oim).reshape(Bp)[:B]
