"""TPU probe: the fused Riemannian D=2 sweep vs the suN-chart sweep.

Times sweep_ground_states_fused (two Pallas launches per optimizer step,
no expm) against sweep_ground_states (the suN/adam path) on the same
1024-point grid, and validates BOTH against the exact TFIM integral
after timing (axon rule 7: ground-truth readback after every timed loop).

Usage: python tpu_fused_sweep_probe.py [n_points] [steps] [restarts]
"""
import os
import sys
import time

import numpy as np

os.environ.setdefault("QMPS_TPU_X64", "0")
sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

n_points = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
steps = int(sys.argv[2]) if len(sys.argv) > 2 else 300
restarts = int(sys.argv[3]) if len(sys.argv) > 3 else 4

from qmps_tpu.ham import tfim_gs_energy
from qmps_tpu.parallel.sweep import sweep_ground_states, sweep_ground_states_fused

gs = jnp.linspace(0.1, 2.0, n_points)
exact = np.asarray(tfim_gs_energy(np.linspace(0.1, 2.0, n_points).astype(np.float64)))
exact2 = np.asarray(
    tfim_gs_energy(np.linspace(0.1, 2.0, n_points).astype(np.float64) + 1e-3)
)


def report(tag, es, dt, ex):
    err = np.asarray(es, np.float64) - ex
    assert np.all(np.isfinite(err)), tag
    print(
        f"{tag}: {dt:.3f}s  ({n_points / dt:.1f} opts/s)  "
        f"median_err={np.median(err):.2e}  max_err={np.max(err):.2e}  "
        f"min_err={np.min(err):.2e}",
        flush=True,
    )


# fused path: compile + timed second call on a shifted grid
t0 = time.perf_counter()
es, _ = sweep_ground_states_fused(gs, steps=steps, restarts=restarts, chunk=50)
jax.block_until_ready(es)
print(f"fused compile+run: {time.perf_counter() - t0:.1f}s", flush=True)
t0 = time.perf_counter()
es2, As2 = sweep_ground_states_fused(gs + 1e-3, steps=steps, restarts=restarts, chunk=50)
jax.block_until_ready(es2)
dt_f = time.perf_counter() - t0
report("fused", es2, dt_f, exact2)


@jax.jit
def _split(A):  # complex D2H transfer is unimplemented here: float planes
    return jnp.real(A).astype(jnp.float32), jnp.imag(A).astype(jnp.float32)


def np_energy_states(A, gvals):
    """f64 host energies of returned tensors — the honest error column
    (the on-chip f32 energy READOUT can dip below exact by ~2e-4 on
    near-critical points; the states themselves must not)."""
    from qmps_tpu.ham.classical_baselines import host_energy_d2

    ar, ai = _split(A)
    A = np.asarray(ar).astype(np.complex128) + 1j * np.asarray(ai)
    X = np.array([[0.0, 1.0], [1.0, 0.0]])
    Z = np.diag([1.0, -1.0])
    I2 = np.eye(2)
    out = np.empty(A.shape[0])
    for b in range(A.shape[0]):
        h = -np.kron(Z, Z) + gvals[b] / 2 * (np.kron(X, I2) + np.kron(I2, X))
        out[b] = host_energy_d2(A[b], h)
    return out


e64 = np_energy_states(As2, np.linspace(0.1, 2.0, n_points) + 1e-3)
err64 = e64 - exact2
print(
    f"fused f64 returned-state errors: median={np.median(err64):.2e}  "
    f"max={np.max(err64):.2e}  min={np.min(err64):.2e}",
    flush=True,
)

# suN path (same workload shape as bench_sweep)
es, _ = sweep_ground_states(gs, D=2, steps=steps, restarts=restarts)
es.block_until_ready()
t0 = time.perf_counter()
es3, _ = sweep_ground_states(gs + 1e-3, D=2, steps=steps, restarts=restarts)
es3.block_until_ready()
dt_s = time.perf_counter() - t0
report("suN", es3, dt_s, exact2)

print(f"SPEEDUP: {dt_s / dt_f:.1f}x", flush=True)
