"""End-to-end decomposition of the D=32 sweep's fixed ~20 s.

tpu_stiefel_finish_probe tried to time init/finish as isolated
programs and hit two backend artifacts (serial-queue timing, complex
readback poisoning).  This probe only measures FULL
sweep_ground_states_stiefel calls — the same honest plumbing as the
bench row — varying (steps, final_iters) to difference out the parts:

  T(240, 200) - T(1, 200)  ~ descent cost (239 steps)
  T(1, 200)   - T(1, 1)    ~ finish's 199 extra warm power iters
  T(1, 1)                  ~ init (batched complex QR) + dispatch floor

Run: python scripts/tpu_stiefel_fixedcost_probe.py [D] [prec]
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
prec = sys.argv[2] if len(sys.argv) > 2 else "default"
if prec == "none":
    prec = None
n_points = 1024

gvals = np.linspace(0.1, 2.0, n_points).astype(np.float64)
gs = jnp.asarray(gvals, jnp.float32)

for steps, final in ((240, 200), (1, 200), (1, 1), (240, 200)):
    kw = dict(D=D, steps=steps, final_iters=final, precision=prec)
    es, _, _ = sweep_ground_states_stiefel(gs, **kw)  # compile + exec 1
    jax.block_until_ready(es)
    es, _, _ = sweep_ground_states_stiefel(gs, **kw)  # exec 2 (slow-exec)
    jax.block_until_ready(es)
    t0 = time.perf_counter()
    es, As, rs = sweep_ground_states_stiefel(gs + 1e-3, **kw)
    es = np.asarray(es)
    dt = time.perf_counter() - t0
    assert np.all(np.isfinite(es))
    print(f"D={D} prec={prec} steps={steps} final_iters={final}: {dt:.3f} s",
          flush=True)
