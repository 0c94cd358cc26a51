"""How deep does f32 VUMPS converge at D=32/64 given more iterations?

bench_vumps runs 150 iterations at D=32 (7.5 s at 20 it/s) and lands at
grad_norm 3e-3 / f64-re-eval error 9.4e-6 — the window stops the solver,
not an f32 plateau (error ~ grad^2 predicts ~1e-7 once grad ~ 3e-4).
This probe maps iters -> (grad_norm, f64 error) to find the knee, so the
bench rows can report a CONVERGED large-D number instead of a truncated
one.

Run: python scripts/tpu_vumps_depth_probe.py [D] [env_solver]
"""
import os
import sys
import time

os.environ.setdefault("QMPS_TPU_X64", "0")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np

from qmps_tpu.ham import tfim, tfim_gs_energy_f64
from qmps_tpu.mps.tdvp import vumps_ground_state
from qmps_tpu.utils.host_eval import host_energy_gauge_free

D = int(sys.argv[1]) if len(sys.argv) > 1 else 32
solver = sys.argv[2] if len(sys.argv) > 2 else "gmres"

h = np.asarray(tfim(1.0).to_matrix().real, np.float32)
h64 = np.asarray(tfim(1.0).to_matrix().real, np.float64)
e_exact = float(tfim_gs_energy_f64(1.0))

for iters in (150, 300, 600):
    t0 = time.perf_counter()
    AL, _, e, info = vumps_ground_state(
        h, D, iters=iters, k=24, env_solver=solver, key=jax.random.PRNGKey(2)
    )
    gn = float(np.asarray(info["grad_norms"][-1]))
    dt = time.perf_counter() - t0
    e64 = host_energy_gauge_free(AL, h64)
    print(
        f"D={D} iters={iters}: {dt:.1f} s (incl compile), grad={gn:.3e}, "
        f"f64 err={e64 - e_exact:.3e}, f32 err={float(e) - e_exact:.3e}",
        flush=True,
    )
