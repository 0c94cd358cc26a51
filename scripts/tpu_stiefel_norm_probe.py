"""Is per-iteration normalization the Stiefel sweep's pass-independent cost?

The two-phase probe fit time(passes) = a + b*passes at D=32/240 steps:
b = 4.2 s/pass (the MXU share) and a = 20.7 s that no precision tier
touches.  Candidate: the power iteration normalizes EVERY matvec
(w / ||w|| — a full reduction + broadcast divide + its adjoint, and a
fusion barrier between matvecs).  But the sweep's V is polar-retracted
LEFT-ISOMETRIC, so the right transfer action has spectral radius
exactly 1 (sum_s A_s^dag A_s = I) and the iterate cannot blow up or
vanish: normalizing once at the END is mathematically the same loss
(the energy readout normalizes rh by its trace anyway) and removes
96 reductions + adjoints per optimizer step.

This probe times the sweep's actual hot object — value_and_grad of the
warm-power energy, vmapped over the batch — with (a) per-iteration
normalization (current _power_forward), (b) end-only normalization,
at both matmul tiers, and reports the gradient agreement.

Run: python scripts/tpu_stiefel_norm_probe.py [D] [iters] [B]
"""
import contextlib
import os
import sys
import time

os.environ.setdefault("QMPS_TPU_X64", "0")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

D = int(sys.argv[1]) if len(sys.argv) > 1 else 32
iters = int(sys.argv[2]) if len(sys.argv) > 2 else 96
B = int(sys.argv[3]) if len(sys.argv) > 3 else 1024

key = jax.random.PRNGKey(0)
k1, k2 = jax.random.split(key)
V, _ = jnp.linalg.qr(
    jax.lax.complex(
        jax.random.normal(k1, (B, 2 * D, D), jnp.float32),
        jax.random.normal(k2, (B, 2 * D, D), jnp.float32),
    )
)
Vre, Vim = jnp.real(V), jnp.imag(V)
r0 = jnp.broadcast_to(jnp.eye(D, dtype=jnp.complex64) / np.sqrt(D), (B, D, D))
r0re, r0im = jnp.real(r0), jnp.imag(r0)
# one TFIM h for all points (the h-dependence is not what's timed) —
# built on the HOST: closing over a device array bakes it in as an MLIR
# constant, which the axon backend cannot materialize (rule 6)
from qmps_tpu.ham import tfim

h = np.asarray(tfim(1.0).to_matrix().real, np.float32)


def energy(V, r, h, normalize_every: bool):
    A = V.reshape(D, 2, D).transpose(1, 0, 2)

    def it(r, _):
        w = jnp.einsum("sij,jk,slk->il", A, r, A.conj())
        if normalize_every:
            w = w / jnp.linalg.norm(w)
        return w, None

    r, _ = jax.lax.scan(it, r, None, length=iters)
    r = (r + jnp.swapaxes(r, -1, -2).conj()) / 2
    r = r / jnp.trace(r)
    A2 = jnp.einsum("sij,tjk->stik", A, A).reshape(4, D, D)
    return jnp.einsum(
        "ts,sij,jk,tik->", h.astype(A.dtype), A2, r, A2.conj()
    ).real


def make(normalize_every, prec):
    def loss(Vre, Vim, rre, rim):
        V = jax.lax.complex(Vre, Vim)
        r = jax.lax.complex(rre, rim)
        es = jax.vmap(lambda v, rb: energy(v, rb, h, normalize_every))(V, r)
        return jnp.sum(es)

    def run(Vre, Vim, rre, rim):
        ctx = (jax.default_matmul_precision(prec) if prec
               else contextlib.nullcontext())
        with ctx:
            return jax.value_and_grad(loss, argnums=(0, 1))(
                Vre, Vim, rre, rim
            )

    return jax.jit(run)


def timeit(fn, reps=10):
    out = fn(Vre, Vim, r0re, r0im)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(Vre, Vim, r0re, r0im)
    val, (gre, gim) = jax.tree_util.tree_map(np.asarray, out)
    dt = (time.perf_counter() - t0) / reps
    assert np.isfinite(val) and np.all(np.isfinite(gre))
    return dt, float(val), gre


for prec in (None, "default"):
    t_norm, v_norm, g_norm = timeit(make(True, prec))
    t_free, v_free, g_free = timeit(make(False, prec))
    gd = float(np.max(np.abs(g_norm - g_free)) / np.max(np.abs(g_norm)))
    print(
        f"D={D} B={B} iters={iters} prec={prec}: "
        f"norm-every {t_norm * 1e3:.2f} ms, norm-end {t_free * 1e3:.2f} ms "
        f"({t_norm / t_free:.2f}x), |dE|={abs(v_norm - v_free):.2e}, "
        f"rel grad diff={gd:.2e}",
        flush=True,
    )
