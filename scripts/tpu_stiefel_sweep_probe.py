"""TPU probe: direct-Stiefel phase-diagram sweep at large D.

Times the 1024-point sweep through sweep_ground_states_stiefel (no expm
chart; Newton-Schulz polar retraction; warm GMRES-adjoint environments)
and reports the f32 on-chip error profile plus an f64 HOST re-evaluation
of the returned tensors (power iterations warm-started from the returned
environments), validated against the exact TFIM integral after timing
(axon rule 7).

Usage: python tpu_stiefel_sweep_probe.py [D] [n_points] [steps] [restarts]
           [point_chunk]
"""
import os
import sys
import time

import numpy as np

os.environ.setdefault("QMPS_TPU_X64", "0")
sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

D = int(sys.argv[1]) if len(sys.argv) > 1 else 16
n_points = int(sys.argv[2]) if len(sys.argv) > 2 else 1024
steps = int(sys.argv[3]) if len(sys.argv) > 3 else 300
restarts = int(sys.argv[4]) if len(sys.argv) > 4 else 1
point_chunk = int(sys.argv[5]) if len(sys.argv) > 5 else None

from qmps_tpu.ham import tfim_gs_energy_f64
from qmps_tpu.parallel.sweep import sweep_ground_states_stiefel

gvals = np.linspace(0.1, 2.0, n_points).astype(np.float64)
gs = jnp.asarray(gvals, jnp.float32)
exact = tfim_gs_energy_f64(gvals)


def report(tag, es, As, rs, exact):
    err = np.asarray(es, np.float64) - exact
    assert np.all(np.isfinite(err)), tag
    print(
        f"{tag}: median={np.median(err):.2e} max={np.max(err):.2e} "
        f"min={np.min(err):.2e} n(>5e-3)={int(np.sum(err > 5e-3))}",
        flush=True,
    )


t0 = time.perf_counter()
es, As, rs = sweep_ground_states_stiefel(gs, D=D, steps=steps, restarts=restarts, point_chunk=point_chunk)
jax.block_until_ready(es)
print(f"cold (incl. compile): {time.perf_counter() - t0:.1f}s", flush=True)
report("cold f32", es, As, rs, exact)

exact2 = tfim_gs_energy_f64(gvals + 1e-3)
t0 = time.perf_counter()
es2, As2, rs2 = sweep_ground_states_stiefel(
    gs + 1e-3, D=D, steps=steps, restarts=restarts, point_chunk=point_chunk
)
jax.block_until_ready(es2)
dt = time.perf_counter() - t0
report("warm f32", es2, As2, rs2, exact2)
print(
    f"stiefel D={D} warm: {dt:.3f}s ({n_points / dt:.1f} opts/s)", flush=True
)

# f64 host re-evaluation of the returned tensors (error-budget column);
# shared implementation with bench.py: qmps_tpu/utils/host_eval.py
from qmps_tpu.utils.host_eval import host_f64_sweep_energies, tfim_h64_batch

t0 = time.perf_counter()
e64, lam = host_f64_sweep_energies(As2, rs2, tfim_h64_batch(gvals + 1e-3))
err64 = e64 - exact2
print(
    f"f64 re-eval ({time.perf_counter() - t0:.1f}s): "
    f"median={np.median(err64):.2e} max={np.max(err64):.2e} "
    f"min={np.min(err64):.2e} lam_dev={np.abs(lam - 1).max():.1e}",
    flush=True,
)
