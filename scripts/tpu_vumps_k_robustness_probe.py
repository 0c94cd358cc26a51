"""Two follow-ups to the D=32 knee attribution grid.

tpu_vumps_knee_probe (D=32 f32, key=2) measured: k=24 stuck at grad
~5e-4 / err ~1e-5, k=48 through the knee (grad 1.3e-4, f64 err 1.8e-7,
150 iters, both env solvers) — and k=32 DIVERGING outright (err ~1.0).
Questions this probe answers on chip:

  1. Is the k=32 divergence structural or basin luck?  Same config
     across keys 0/1/2 — if any key converges, it is a seed-dependent
     basin (f32 Lanczos between the two regimes can lock onto a wrong
     fixed point) and the production answer stays "use k=48"; if all
     diverge, something is wrong at exactly k=32 (suspect: breakdown /
     reorthogonalization interaction at that basis size).
  2. Does k=48 also carry D=64 through the knee, or does the deeper
     spectrum need k=64?  (BENCH r5 baseline: D=64 k=24 stuck at grad
     7.6e-3 / err 2.8e-5.)

Run: python scripts/tpu_vumps_k_robustness_probe.py
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

h = np.asarray(tfim(1.0).to_matrix().real, np.float32)
h64 = np.asarray(tfim(1.0).to_matrix().real, np.float64)
e_exact = float(tfim_gs_energy_f64(1.0))


def run(D, k, iters, seed):
    t0 = time.perf_counter()
    AL, _, e, info = vumps_ground_state(
        h, D, iters=iters, k=k, env_solver="gmres",
        key=jax.random.PRNGKey(seed),
    )
    dt = time.perf_counter() - t0
    gn = float(np.asarray(info["grad_norms"][-1]))
    gmin = float(np.min(np.asarray(info["grad_norms"])))
    e64 = host_energy_gauge_free(AL, h64)
    print(
        f"D={D} k={k} iters={iters} key={seed}: {dt:.1f} s, "
        f"grad_last={gn:.3e} grad_min={gmin:.3e} "
        f"err_f64={e64 - e_exact:.3e}",
        flush=True,
    )


# axis 1: k=32 across seeds (one compile, three executions)
for seed in (0, 1, 2):
    run(32, 32, 150, seed)
# control at the same seeds: k=48 should be seed-robust
for seed in (0, 1):
    run(32, 48, 150, seed)
# axis 2: D=64 Lanczos depth
for k in (48, 64):
    run(64, k, 150, 2)
