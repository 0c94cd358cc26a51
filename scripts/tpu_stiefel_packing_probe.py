"""MXU block-diagonal packing for the Stiefel sweep's warm power matvecs.

VERDICT r4 item 8: at D=16 the sweep's hot loop is recycle_iters
batched matvecs r <- sum_s A_s r A_s^dag on (D, D) operands — (32, 16)
against the 128x128 systolic array, so each MXU pass is ~1/8 occupied
and sweep MFU sits at 0.35%.  kernels/pallas_power.py already packs
p = 128 // N independent matrices into one block-diagonal (pN, pN)
operand for its squaring chains; this probe measures the same pack
applied to the power ITERATION (the sweep's actual hot loop, including
its unrolled adjoint):

  plain   vmapped right_matvec over B points, per-point normalization
  packed  B/p block-diagonal (pD, pD) operands, per-BLOCK row
          normalization (a single shared scale would underflow the
          non-dominant blocks); off-diagonal zero blocks stay exactly
          zero through sum_s A_s r A_s^dag, so block results equal the
          per-point results bit-for-bit up to reassociation

The packed form inflates FLOPs by p^2/... (the zero blocks) but feeds
the MXU full 128-lane operands; whether that trades well is exactly
what must be measured, at BOTH matmul-precision tiers (the production
two-phase schedule runs descent at "default").  Forward AND
value_and_grad are timed — the sweep differentiates through the
iterations (transfer.right_eigpair_warm_unroll).

Run: python scripts/tpu_stiefel_packing_probe.py [D] [iters] [B]
"""
import os
import sys
import time

os.environ.setdefault("QMPS_TPU_X64", "0")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

D = int(sys.argv[1]) if len(sys.argv) > 1 else 16
iters = int(sys.argv[2]) if len(sys.argv) > 2 else 96
B = int(sys.argv[3]) if len(sys.argv) > 3 else 4096
p = max(128 // D, 1)
G = B // p

key = jax.random.PRNGKey(0)
k1, k2 = jax.random.split(key)
V, _ = jnp.linalg.qr(
    jax.lax.complex(
        jax.random.normal(k1, (B, 2 * D, D), jnp.float32),
        jax.random.normal(k2, (B, 2 * D, D), jnp.float32),
    )
)
A = V.reshape(B, D, 2, D).transpose(0, 2, 1, 3)  # (B, 2, D, D)
Are, Aim = jnp.real(A), jnp.imag(A)
r0 = jnp.broadcast_to(jnp.eye(D, dtype=jnp.complex64) / np.sqrt(D), (B, D, D))
r0re, r0im = jnp.real(r0), jnp.imag(r0)


def matvec(A, r):
    return jnp.einsum("sij,jk,slk->il", A, r, A.conj())


def fwd_plain(Are, Aim, rre, rim):
    A = jax.lax.complex(Are, Aim)
    r = jax.lax.complex(rre, rim)

    def one(A, r):
        def it(r, _):
            w = matvec(A, r)
            return w / jnp.linalg.norm(w), None

        r, _ = jax.lax.scan(it, r, None, length=iters)
        return jnp.einsum("ij,ij->", r.conj(), matvec(A, r))

    lam = jax.vmap(one)(A, r)
    return jnp.sum(lam.real)


def _pack(X):
    # (B, ..., D, D) -> (G, ..., pD, pD) block-diagonal, same pad+concat
    # assembly as kernels/pallas_power (scatter-free)
    lead = X.shape[1:-2]
    Xg = X.reshape((G, p) + lead + (D, D))
    cols = [
        jnp.pad(
            Xg[(slice(None), k)],
            ((0, 0),) * (1 + len(lead)) + ((0, 0), (k * D, (p - 1 - k) * D)),
        )
        for k in range(p)
    ]
    return jnp.concatenate(cols, axis=-2)


def fwd_packed(Are, Aim, rre, rim):
    # jax.checkpoint on the iteration: the packed carry is p x larger
    # than the per-point form (the zero blocks are materialized), so
    # saving every iterate for the backward OOMs at D=16 B=4096 ri=96
    # (~6.4 GB of residuals); remat trades that for a second forward
    A = _pack(jax.lax.complex(Are, Aim))       # (G, 2, pD, pD)
    r = _pack(jax.lax.complex(rre, rim))       # (G, pD, pD)

    def blknorm(r):
        # off-diagonal blocks are exactly zero, so a row-wise sum of
        # squares over each block's D rows is that block's Frobenius n2
        n2 = jnp.sum(jnp.abs(r.reshape(p, D, p * D)) ** 2, axis=(1, 2))
        inv = jax.lax.rsqrt(jnp.maximum(n2, 1e-30))
        return r * jnp.repeat(inv, D)[:, None]

    def one(A, r):
        @jax.checkpoint
        def it(r, _):
            return blknorm(matvec(A, r)), None

        r, _ = jax.lax.scan(it, blknorm(r), None, length=iters)
        w = matvec(A, r)
        lam = jnp.sum((r.conj() * w).reshape(p, D, p * D), axis=(1, 2))
        return lam

    lam = jax.vmap(one)(A, r)
    return jnp.sum(lam.real)


def timeit(fn, *args, reps=5):
    out = fn(*args)
    jax.block_until_ready(out)  # compile
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    val = jax.tree_util.tree_map(np.asarray, out)  # honest readback barrier
    dt = (time.perf_counter() - t0) / reps
    leaves = jax.tree_util.tree_leaves(val)
    assert all(np.all(np.isfinite(v)) for v in leaves)
    return dt, leaves[0]


for prec in (None, "default"):
    import contextlib

    ctx = (jax.default_matmul_precision(prec) if prec
           else contextlib.nullcontext())
    with ctx:
        for tag, fn in (
            ("fwd plain ", jax.jit(fwd_plain)),
            ("fwd packed", jax.jit(fwd_packed)),
            ("vg  plain ", jax.jit(jax.value_and_grad(fwd_plain,
                                                      argnums=(0, 1)))),
            ("vg  packed", jax.jit(jax.value_and_grad(fwd_packed,
                                                      argnums=(0, 1)))),
        ):
            try:
                t, v = timeit(fn, Are, Aim, r0re, r0im)
            except Exception as exc:  # noqa: BLE001 — OOM is a result here
                print(f"D={D} p={p} B={B} iters={iters} prec={prec} "
                      f"{tag}: FAILED {type(exc).__name__}", flush=True)
                continue
            print(
                f"D={D} p={p} B={B} iters={iters} prec={prec} {tag}: "
                f"{t * 1e3:.2f} ms, lam_sum={float(v):.6f}",
                flush=True,
            )
