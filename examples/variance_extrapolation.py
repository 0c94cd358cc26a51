"""Variance-extrapolated energies: E(sigma^2) -> 0 across bond dimension.

The flagship use of the oracle-free certificate
(`mps/tdvp.energy_variance_density`): for a variational uMPS family the
energy error and the energy variance both vanish as the state approaches
the true ground state, and to leading order E(sigma^2) is LINEAR — so a
fit through the (sigma^2_D, E_D) points of a D-ladder and its sigma^2 = 0
intercept gives an energy estimate 1-2 digits better than the largest-D
point alone, with NO exact solution in the loop.  (Second-order energy
extrapolation; standard DMRG/MPS practice the reference has no analogue
of — it only ever compares against closed-form oracles,
scripts/ground_state_finding.py:70-72.)

Run:  python examples/variance_extrapolation.py        (~1 min, CPU f64)
"""
import os
import sys

os.environ.setdefault("QMPS_TPU_X64", "1")
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

from qmps_tpu.ham import tfim, tfim_gs_energy
from qmps_tpu.mps.tdvp import energy_variance_density, vumps_ground_state


def ladder(g: float, Ds=(2, 3, 4, 6, 8), iters: int = 300):
    """(E_D, sigma^2_D) pairs from VUMPS-converged states."""
    h = jnp.asarray(np.asarray(tfim(g).to_matrix()), jnp.complex128)
    rows = []
    for D in Ds:
        AL, C, e, info = vumps_ground_state(
            h, D=D, iters=iters, key=jax.random.PRNGKey(D)
        )
        r = C @ C.conj().T
        r = r / jnp.trace(r)
        var = float(energy_variance_density(AL, r, h))
        rows.append((D, float(e), var, float(info["grad_norms"][-1])))
    return rows


def extrapolate(rows):
    """Linear fit E = E0 + a sigma^2 through the ladder points, weighted
    toward the small-variance end (the asymptotic regime)."""
    v = np.array([r[2] for r in rows])
    e = np.array([r[1] for r in rows])
    w = 1.0 / np.maximum(v, 1e-14)  # weight ~ 1/sigma^2
    A = np.stack([np.ones_like(v), v], axis=1)
    Aw = A * w[:, None]
    coef, *_ = np.linalg.lstsq(Aw, e * w, rcond=None)
    return coef[0], coef[1]


def main():
    g = 1.0  # critical point: slowest D-convergence, extrapolation shines
    e_exact = float(tfim_gs_energy(g))
    rows = ladder(g)
    print(f"TFIM g={g}  exact E0 = {e_exact:.10f}")
    print(f"{'D':>3} {'energy':>15} {'error':>10} {'sigma^2':>10} {'|grad|':>9}")
    for D, e, var, gn in rows:
        print(f"{D:>3} {e:>15.10f} {e - e_exact:>10.2e} {var:>10.2e} {gn:>9.1e}")

    e0, slope = extrapolate(rows)
    best = rows[-1][1]
    print(f"\nlinear fit E(sigma^2): intercept {e0:.10f}, slope {slope:+.3f}")
    print(f"largest-D error:      {best - e_exact:+.2e}")
    print(f"extrapolated error:   {e0 - e_exact:+.2e}  "
          f"({abs(best - e_exact) / max(abs(e0 - e_exact), 1e-16):.0f}x closer)")
    assert abs(e0 - e_exact) < abs(best - e_exact), "extrapolation must help"


if __name__ == "__main__":
    main()
