"""Decompose the Stiefel sweep's pass-count-independent ~20 s at D=32.

Steady-state end-to-end (tpu_stiefel_remeasure): highest 47.75 s,
default+polish60 30.67 s, pure-default ~24.9 s; per-pass descent cost
~0.019 s/step leaves ~20.3 s that no precision tier touches.  The
candidates are the two highest-tier readout programs: init (batched
complex QR of (B, 2D, D)) and finish (final_iters = 200 warm power
matvecs + energy + argmin-restart gather).  This probe times each
program alone (steady state: 3 reps after two executions), then times
finish variants: final_iters 200 vs 50, and the same loss evaluated
with the matvec loop's per-iteration normalization dropped (V is
polar-retracted left-isometric, spectral radius exactly 1).

Run: python scripts/tpu_stiefel_finish_probe.py [D] [B]
"""
import os
import sys
import time

os.environ.setdefault("QMPS_TPU_X64", "0")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from qmps_tpu.parallel.sweep import _stiefel_sweep_programs

D = int(sys.argv[1]) if len(sys.argv) > 1 else 32
B = int(sys.argv[2]) if len(sys.argv) > 2 else 1024

gvals = np.linspace(0.1, 2.0, B).astype(np.float64)
gs = jnp.asarray(gvals, jnp.float32)
key = jax.random.PRNGKey(0)

init, make_advance, finish = _stiefel_sweep_programs(
    D, 0.08, 0.9, 1, 96, 200, jnp.float32, None
)
xre = jax.random.normal(key, (B, 2 * D, D), jnp.float32)
xim = jax.random.normal(jax.random.fold_in(key, 1), (B, 2 * D, D),
                        jnp.float32)


def timeit(tag, fn, *args, reps=3):
    out = fn(*args)  # compile + exec 1
    jax.block_until_ready(out)
    out = fn(*args)  # exec 2 (the backend's slow second execution)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    leaves = jax.tree_util.tree_leaves(out)
    v = np.asarray(leaves[0])  # honest readback
    dt = (time.perf_counter() - t0) / reps
    assert np.all(np.isfinite(v)), tag
    print(f"{tag}: {dt * 1e3:.1f} ms", flush=True)
    return out


hs, V, M, r = timeit("init (batched QR)", init, gs, xre, xim, None)
adv = make_advance(50, "default")
V, M, r = timeit("advance 50 steps @default", adv, V, M, r, hs)
timeit("finish (final_iters=200, highest)", finish, V, r, hs)

# finish cost decomposition: final_iters and normalization
from qmps_tpu.mps import transfer as tr
from qmps_tpu.mps.imps import merge


def finish_like(iters, normalize):
    def one(Vb, rb, hb):
        A = Vb.reshape(D, 2, D).transpose(1, 0, 2)

        def it(rc, _):
            w = tr.right_matvec(A, A, rc)
            if normalize:
                w = w / jnp.linalg.norm(w)
            return w, None

        rb, _ = jax.lax.scan(it, rb, None, length=iters)
        rh = (rb + jnp.swapaxes(rb, -1, -2).conj()) / 2
        rh = rh / jnp.trace(rh)
        A2 = merge(A, A)
        e = jnp.einsum("ts,sij,jk,tik->", hb.astype(A.dtype), A2, rh,
                       A2.conj()).real
        return e

    @jax.jit
    def run(V, r, hs):
        return jax.vmap(one)(V, r, hs)

    return run

for iters in (200, 50):
    for normalize in (True, False):
        timeit(f"finish-loss iters={iters} norm={normalize} (highest)",
               finish_like(iters, normalize), V, r, hs)
