"""Deep-brickwork 6-8e-4 plateau: expressivity or optimization?

BENCH_r04: gs_deep_bw_energy_error_D32 = 8.1e-4, D64 = 6.1e-4 — ~50x
worse than Stiefel descent / VUMPS at the same D.  Two hypotheses:

  (a) EXPRESSIVITY: the depth-(n+1) KAK wall (~330 params at D=32) is a
      tiny submanifold of the ~4096-real-dim D=32 uMPS manifold and
      cannot represent the D-optimal state -> deeper walls keep helping,
      seeds cluster tightly at each depth.
  (b) OPTIMIZATION: the wall could express a better state but adam gets
      stuck -> seeds scatter widely, more steps/restarts close the gap.

This probe runs a (depth x seed x steps) grid and reports the f32 chip
energy, the f64 host re-evaluation of the returned tensor, and the
energy-variance certificate sigma^2 (|E - E_0| <= sigma^2 / gap) per
run, so the attribution is measured, not guessed.

Run: python scripts/tpu_deepbw_plateau_probe.py [D] [steps]
"""
import os
import sys
import time

os.environ.setdefault("QMPS_TPU_X64", "0")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np

from qmps_tpu.algorithms import ground_state_deep_brickwork
from qmps_tpu.circuits.brickwork_deep import _n_qubits, n_brick_params
from qmps_tpu.ham import tfim, tfim_gs_energy_f64
from qmps_tpu.mps.tdvp import variance_certificate
from qmps_tpu.utils.host_eval import host_energy_gauge_free

D = int(sys.argv[1]) if len(sys.argv) > 1 else 32
steps = int(sys.argv[2]) if len(sys.argv) > 2 else 500

H = tfim(1.0)
h32 = np.asarray(H.to_matrix().real, np.float32)
h64 = np.asarray(H.to_matrix().real, np.float64)
e_exact = float(tfim_gs_energy_f64(1.0))
n = _n_qubits(D)

for depth in (n + 1, n + 2, n + 3):
    for seed in range(3):
        t0 = time.perf_counter()
        gs = ground_state_deep_brickwork(
            H, D=D, depth=depth, steps=steps, key=jax.random.PRNGKey(seed)
        )
        dt = time.perf_counter() - t0
        e64 = host_energy_gauge_free(gs.A, h64, f32_ref=float(gs.energy))
        var = variance_certificate(gs.A, h32,
                                   env_solver="dense" if D <= 24 else "gmres")
        print(
            f"D={D} depth={depth} params={n_brick_params(n, depth)} "
            f"seed={seed} steps={steps}: {dt:.1f} s, "
            f"err_f32={gs.energy - e_exact:.3e} err_f64={e64 - e_exact:.3e} "
            f"var={var:.3e}",
            flush=True,
        )

# steps study at the default depth: is the default-window run converged?
for steps2 in (steps * 2, steps * 3):
    gs = ground_state_deep_brickwork(
        H, D=D, depth=n + 1, steps=steps2, key=jax.random.PRNGKey(0)
    )
    e64 = host_energy_gauge_free(gs.A, h64, f32_ref=float(gs.energy))
    print(
        f"D={D} depth={n + 1} seed=0 steps={steps2}: "
        f"err_f64={e64 - e_exact:.3e}",
        flush=True,
    )
