"""TPU probe: bond-growth continuation sweep at D = 16/32 vs random starts.

The random-start D=32 sweep leaves a ~5-point attractive bad-basin
cluster near g ~ 1.85 (max err 0.13) that adiabatic-continuation refine
passes cannot heal.  This probe runs sweep_ground_states_grown up the
ladder D_start -> ... -> D on the full 1024-point grid and reports each
rung's error profile (f32 on-chip boosted readout, the same column the
bench's suN rows use), validated against the exact TFIM integral after
timing (axon rule 7).

Usage: python tpu_grown_sweep_probe.py [D] [n_points] [steps] [D_start]
"""
import os
import sys
import time

import numpy as np

os.environ.setdefault("QMPS_TPU_X64", "0")
sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

D = int(sys.argv[1]) if len(sys.argv) > 1 else 32
n_points = int(sys.argv[2]) if len(sys.argv) > 2 else 1024
steps = int(sys.argv[3]) if len(sys.argv) > 3 else 300
D_start = int(sys.argv[4]) if len(sys.argv) > 4 else 2

from qmps_tpu.ham import tfim_gs_energy
from qmps_tpu.parallel.sweep import sweep_ground_states_grown

gvals = np.linspace(0.1, 2.0, n_points).astype(np.float64)
gs = jnp.asarray(gvals, jnp.float32)
exact = np.asarray(tfim_gs_energy(gvals))

t0 = time.perf_counter()
es, ps, stages = sweep_ground_states_grown(
    gs, D=D, steps=steps, stage_steps=steps, D_start=D_start, return_stages=True
)
jax.block_until_ready(es)
dt_total = time.perf_counter() - t0

for d in sorted(stages):
    err = np.asarray(stages[d][0], np.float64) - exact
    assert np.all(np.isfinite(err)), d
    print(
        f"rung D={d}: median_err={np.median(err):.2e}  "
        f"max_err={np.max(err):.2e}  min_err={np.min(err):.2e}  "
        f"n(err>5e-3)={int(np.sum(err > 5e-3))}",
        flush=True,
    )
print(f"total (incl. compiles): {dt_total:.1f}s for the whole ladder", flush=True)

# timed warm re-run of the full ladder on a shifted grid (every rung's
# program is now compiled; this is the number a production phase-diagram
# study pays)
exact2 = np.asarray(tfim_gs_energy(gvals + 1e-3))
t0 = time.perf_counter()
es2, _ = sweep_ground_states_grown(
    gs + 1e-3, D=D, steps=steps, stage_steps=steps, D_start=D_start
)
jax.block_until_ready(es2)
dt = time.perf_counter() - t0
err2 = np.asarray(es2, np.float64) - exact2
assert np.all(np.isfinite(err2))
print(
    f"grown D={D} warm: {dt:.3f}s ({n_points / dt:.1f} opts/s)  "
    f"median_err={np.median(err2):.2e}  max_err={np.max(err2):.2e}  "
    f"min_err={np.min(err2):.2e}  n(err>5e-3)={int(np.sum(err2 > 5e-3))}",
    flush=True,
)
