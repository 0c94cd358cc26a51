"""Is block_until_ready an honest barrier on the axon backend?

Evidence so far (tpu_stiefel_precision_probe): the D=32 1024-point
Stiefel sweep timed 47.8 s when the window ends at
jax.block_until_ready(es) but 142.3 s when it ends at np.asarray(es) in
a process whose prior (compile) call was never drained.  Three possible
worlds:

  (a) block_until_ready is honest; 142 s included the undrained compile
      call's execution leaking into the window -> steady-state reps with
      full drains will show ~48 s per sweep and drain ~ 0.
  (b) block_until_ready returns early (resolves on scheduling, not
      completion) -> dispatch/block windows are small, the drain window
      carries the real time, and the honest per-sweep number is the
      total.
  (c) something in between (per-chunk backpressure).

This probe prints all three windows for 4 reps with a FULL host drain of
every output between reps, so rep >= 2 is steady state.

Run: python scripts/tpu_timing_semantics_probe.py [D] [steps] [n]
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
n = int(sys.argv[3]) if len(sys.argv) > 3 else 1024

gvals = np.linspace(0.1, 2.0, n).astype(np.float64)

for rep in range(4):
    gs = jnp.asarray(gvals + 1e-4 * rep, jnp.float32)
    t0 = time.perf_counter()
    es, As, rs = sweep_ground_states_stiefel(gs, D=D, steps=steps)
    t1 = time.perf_counter()
    jax.block_until_ready(es)
    t2 = time.perf_counter()
    e = np.asarray(es)
    A = np.asarray(As)
    r = np.asarray(rs)
    t3 = time.perf_counter()
    assert np.all(np.isfinite(e)) and np.all(np.isfinite(A))
    print(
        f"rep={rep}: dispatch={t1 - t0:.3f} s, block={t2 - t1:.3f} s, "
        f"drain={t3 - t2:.3f} s, total={t3 - t0:.3f} s, "
        f"medE={np.median(e):.6f}",
        flush=True,
    )
