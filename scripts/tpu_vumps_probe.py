"""TPU probe: VUMPS at large bond dimension (BASELINE config 5 flagship).

Times vumps_ground_state with the GMRES environment path at D = 32/64 on
chip and reports the achieved energy error vs the exact TFIM integral —
computed by an f64 HOST re-evaluation of the returned tensor (ARPACK
fixed points of the transfer map in operator form; the on-chip f32
readout resolves only ~1e-7 relative, far above the D=32 truncation
error).

Usage: python tpu_vumps_probe.py [D] [iters] [k]
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
iters = int(sys.argv[2]) if len(sys.argv) > 2 else 150
k = int(sys.argv[3]) if len(sys.argv) > 3 else 24

from qmps_tpu.ham import tfim, tfim_gs_energy_f64
from qmps_tpu.mps.tdvp import vumps_ground_state


from qmps_tpu.utils.host_eval import (  # shared with bench.py
    host_energy_gauge_free as host_energy_f64,
)


h = np.asarray(tfim(1.0).to_matrix().real, np.float32)
h64 = np.asarray(tfim(1.0).to_matrix().real, np.float64)
e_exact = float(tfim_gs_energy_f64(1.0))

t0 = time.perf_counter()
AL, C, e, info = vumps_ground_state(h, D, iters=iters, k=k,
                                    env_solver="gmres")
print(f"cold (incl. compile): {time.perf_counter() - t0:.1f}s", flush=True)

t0 = time.perf_counter()
AL, C, e, info = vumps_ground_state(h, D, iters=iters, k=k,
                                    env_solver="gmres",
                                    key=jax.random.PRNGKey(2))
dt = time.perf_counter() - t0
gn = float(np.asarray(info["grad_norms"][-1]))
assert np.isfinite(gn), gn
print(f"vumps D={D} warm: {dt:.3f}s ({iters / dt:.1f} iters/s), "
      f"grad_norm={gn:.2e}", flush=True)

t0 = time.perf_counter()
e64 = host_energy_f64(AL, h64)
print(f"f64 host energy ({time.perf_counter() - t0:.1f}s): "
      f"err={e64 - e_exact:.3e} (on-chip f32 err={float(e) - e_exact:.3e})",
      flush=True)
