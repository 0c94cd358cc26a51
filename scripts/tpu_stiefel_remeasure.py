"""Settle the 47.7 s vs 215 s discrepancy on the D=32 highest sweep.

BENCH r4 and r5 both measured sweep_stiefel_D32 at 47.7 s (bit-identical
energies), while tpu_stiefel_twophase_probe measured the SAME call at
215 s as its first variant — and the packing probe's first-in-process
fwd-plain-highest runs were similarly inflated (19.3 s / 14.5 s) while
a later-in-process vg-highest of the same inner loop ran 617 ms.
Hypothesis: the first executions of a heavy program in a fresh process
run slow on this backend (autotuning / executable paging through the
axon tunnel), and probes that time variant #1 first eat it.

This script times each variant TWICE in one process, in both orders.

Run: python scripts/tpu_stiefel_remeasure.py [D] [steps]
"""
import os
import sys
import time

os.environ.setdefault("QMPS_TPU_X64", "0")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from qmps_tpu.parallel.sweep import sweep_ground_states_stiefel

D = int(sys.argv[1]) if len(sys.argv) > 1 else 32
steps = int(sys.argv[2]) if len(sys.argv) > 2 else 240
n_points = 1024

gvals = np.linspace(0.1, 2.0, n_points).astype(np.float64)
gs = jnp.asarray(gvals, jnp.float32)

# Optional argv[3]: comma-separated prec:polish variants, e.g.
# "none:0,high:0,default:60" (each timed twice; list is run in order,
# so put the steady-state comparison AFTER the first-execution victim).
if len(sys.argv) > 3:
    VARIANTS = []
    for spec in sys.argv[3].split(","):
        p, n = spec.split(":")
        VARIANTS.append((None if p == "none" else p, int(n)))
    VARIANTS = VARIANTS * 2
else:
    VARIANTS = [(None, 0), ("default", 60), (None, 0), ("default", 60)]

for i, (prec, polish) in enumerate(VARIANTS):
    kw = dict(D=D, steps=steps, precision=prec, polish_steps=polish)
    es, _, _ = sweep_ground_states_stiefel(gs, **kw)  # compile
    jax.block_until_ready(es)
    for rep in range(2):
        t0 = time.perf_counter()
        es, As, rs = sweep_ground_states_stiefel(gs + 1e-3, **kw)
        es = np.asarray(es)
        dt = time.perf_counter() - t0
        assert np.all(np.isfinite(es))
        print(f"[{i}.{rep}] prec={prec} polish={polish}: {dt:.3f} s",
              flush=True)
