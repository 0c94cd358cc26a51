"""Matmul-precision tier vs the Stiefel sweep's time/accuracy trade.

The package pins jax_default_matmul_precision="highest" (6 bf16 MXU
passes per f32 matmul).  The D=32 step decomposition
(tpu_stiefel_timing_probe) shows the warm power matvecs + unrolled
adjoint dominate (~0.23 ms per recycle iteration vs ~3.6 ms fixed), so
the precision tier is the one untested multiplier: "default" (1 pass)
could be up to ~6x on the matvec share, IF descent quality survives
bf16 products.  Accuracy readout is the honest one — f64 HOST
re-evaluation of the returned tensors vs the exact TFIM integral —
same as bench_sweep_stiefel.

Run (one precision per process; the global config is trace-context):
    python scripts/tpu_stiefel_precision_probe.py default 32 240
    python scripts/tpu_stiefel_precision_probe.py high    32 240
"""
import os
import sys
import time

os.environ.setdefault("QMPS_TPU_X64", "0")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

import qmps_tpu  # noqa: F401  (pins highest; overridden below)

prec = sys.argv[1] if len(sys.argv) > 1 else "default"
D = int(sys.argv[2]) if len(sys.argv) > 2 else 32
steps = int(sys.argv[3]) if len(sys.argv) > 3 else 240
n_points = int(sys.argv[4]) if len(sys.argv) > 4 else 1024

jax.config.update("jax_default_matmul_precision", prec)

from qmps_tpu.ham import tfim_gs_energy_f64
from qmps_tpu.parallel.sweep import sweep_ground_states_stiefel
from qmps_tpu.utils.host_eval import host_f64_sweep_energies, tfim_h64_batch

gvals = np.linspace(0.1, 2.0, n_points).astype(np.float64)
gs = jnp.asarray(gvals, jnp.float32)

es, _, _ = sweep_ground_states_stiefel(gs, D=D, steps=steps)  # compile
jax.block_until_ready(es)

exact = tfim_gs_energy_f64(gvals + 1e-3)
t0 = time.perf_counter()
es, As, rs = sweep_ground_states_stiefel(gs + 1e-3, D=D, steps=steps)
# full host readback INSIDE the window: under the axon tunnel,
# block_until_ready on the leading output has been observed returning
# before the chunked dispatch chain finishes (0.089 s for a 1024-point
# D=32 sweep — physically impossible); np.asarray is the honest barrier
es = np.asarray(es)
dt = time.perf_counter() - t0

e64, _ = host_f64_sweep_energies(As, rs, tfim_h64_batch(gvals + 1e-3))
err = e64 - exact
assert np.all(np.isfinite(err))
print(
    f"prec={prec} D={D} steps={steps} n={n_points}: {dt:.3f} s, "
    f"median={np.median(err):.3e} max={np.max(err):.3e} "
    f"min={np.min(err):.3e} n>5e-3={int(np.sum(err > 5e-3))}",
    flush=True,
)
