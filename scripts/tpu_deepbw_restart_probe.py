"""Deep-brickwork plateau, part 2: is ~7e-4 a floor or seed variance?

The plateau probe (tpu_deepbw_plateau_probe.py) measured at D=32:
depth-7 seeds scatter 8.2e-4..1.8e-3 at 500 steps and reach 6.8e-4 at
1000; depth-9 seeds cluster at 7.0-7.6e-4 at 500; depth-8 is
reproducibly WORSE (1.6-3.6e-3).  Two readings remain possible:

  (a) the KAK-wall class floors near ~7e-4 at D=32 (expressivity)
  (b) the basin distribution has a long good tail and best-of-N
      restarts keep paying (optimization)

This probe separates them: N seeds at the converged window
(depth 7 and 9, 1000 steps) — if the best of 8 sits well below 7e-4
the floor is optimization variance; if all 8 cluster at it, the wall
class itself floors there and DESIGN.md 4d says so.

Long windows are run as CHAINED 500-step segments (params warm-start
the next call, each segment its own cosine-decay cycle): a cold
1000-step recycled scan at D=32 is the long-scan pathology's fourth
instance (FAILED_PRECONDITION at first readback in a fresh process —
the same class as the 1024x300 sweep crash in docs/DESIGN.md), and
SGDR-style segment restarts are how long optimizations run in
production anyway.

Run: python scripts/tpu_deepbw_restart_probe.py [D] [segments] [n_seeds]
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
segments = int(sys.argv[2]) if len(sys.argv) > 2 else 2
n_seeds = int(sys.argv[3]) if len(sys.argv) > 3 else 8
SEG_STEPS = 500

H = tfim(1.0)
h32 = np.asarray(H.to_matrix().real, np.float32)
h64 = np.asarray(H.to_matrix().real, np.float64)
e_exact = float(tfim_gs_energy_f64(1.0))
n = _n_qubits(D)

for depth in (n + 1, n + 3):
    errs = []
    for seed in range(n_seeds):
        t0 = time.perf_counter()
        gs = ground_state_deep_brickwork(
            H, D=D, depth=depth, steps=SEG_STEPS, key=jax.random.PRNGKey(seed)
        )
        for _ in range(segments - 1):
            gs = ground_state_deep_brickwork(
                H, D=D, depth=depth, steps=SEG_STEPS,
                initial_guess=gs.params,
            )
        dt = time.perf_counter() - t0
        e64 = host_energy_gauge_free(gs.A, h64, f32_ref=float(gs.energy))
        var = variance_certificate(gs.A, h32,
                                   env_solver="dense" if D <= 24 else "gmres")
        err = e64 - e_exact if np.isfinite(e64) else gs.energy - e_exact
        errs.append(err)
        print(
            f"D={D} depth={depth} params={n_brick_params(n, depth)} "
            f"seed={seed} steps={segments}x{SEG_STEPS}: {dt:.1f} s "
            f"err_f64={e64 - e_exact:.3e} err_f32={gs.energy - e_exact:.3e} "
            f"var={var:.3e}",
            flush=True,
        )
    errs = np.array(errs)
    print(
        f"SUMMARY D={D} depth={depth} steps={segments}x{SEG_STEPS}: "
        f"best-of-{n_seeds}={errs.min():.3e} median={np.median(errs):.3e} "
        f"worst={errs.max():.3e}",
        flush=True,
    )
