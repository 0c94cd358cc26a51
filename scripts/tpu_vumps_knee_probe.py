"""What sets the f32 VUMPS gradient floor at D=32/64?

BENCH r5 baseline run: vumps_ground_state_converged at D=32 (k=24,
gmres, 6 warm-restarted chunks of 150) ran 900 iterations and ended at
grad 4.5e-3 / f64 err 3.2e-5 — ABOVE the single 150-iteration k=32 run
of round 4 (grad 3.1e-3 / err 9.4e-6).  More iterations made it worse,
so the floor is not the window: it is one of

  (a) Lanczos depth k (24 vs 32 vs 48) — the per-iteration eigensolve
      residual re-injected each step;
  (b) the GMRES environment residual (k=48 x 8 restarts, fixed shape)
      vs the exact dense O(D^6) solve;
  (c) f32 roundoff itself (the true plateau).

This probe separates them on one chip: fixed single-program runs over
(iters, k, env_solver), then the warm-restart chunking itself at fixed
(k, env) to see if re-entry through mixed_gauge loses ground.

Run: python scripts/tpu_vumps_knee_probe.py [D]
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

h = np.asarray(tfim(1.0).to_matrix().real, np.float32)
h64 = np.asarray(tfim(1.0).to_matrix().real, np.float64)
e_exact = float(tfim_gs_energy_f64(1.0))
key = jax.random.PRNGKey(2)


def report(tag, AL, e, info, dt):
    gn = float(np.asarray(info["grad_norms"][-1]))
    gmin = float(np.min(np.asarray(info["grad_norms"])))
    e64 = host_energy_gauge_free(AL, h64)
    print(
        f"{tag}: {dt:.1f} s, grad_last={gn:.3e} grad_min={gmin:.3e} "
        f"err_f64={e64 - e_exact:.3e} err_f32={float(e) - e_exact:.3e}",
        flush=True,
    )


# axis 1+2: single fixed-window runs over (k, env, iters)
for env in ("gmres", "dense"):
    for k in (24, 32, 48):
        for iters in (150, 450):
            t0 = time.perf_counter()
            AL, _, e, info = vumps_ground_state(
                h, D, iters=iters, k=k, env_solver=env, key=key
            )
            dt = time.perf_counter() - t0
            report(f"D={D} env={env} k={k} iters={iters}", AL, e, info, dt)

# axis 3: warm-restart chunking at the best fixed config — does
# re-entering through mixed_gauge(A0) lose ground vs one long program?
from qmps_tpu.mps.tdvp import vumps_ground_state_converged

for k in (32,):
    t0 = time.perf_counter()
    AL, _, e, info = vumps_ground_state_converged(
        h, D, tol=3e-4, chunk_iters=150, max_iters=450, k=k,
        env_solver="gmres", key=key,
    )
    dt = time.perf_counter() - t0
    report(
        f"D={D} chunked 3x150 k={k} gmres (knee={info['iters_to_knee']})",
        AL, e, info, dt,
    )
