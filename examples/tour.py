"""Guided tour: represent -> optimize -> evolve (the qmps.ipynb walkthrough).

Run:  python examples/tour.py         (CPU, float64)
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

from qmps_tpu.algorithms import MPSTimeEvolve, RepresentMPS, find_ground_state
from qmps_tpu.embed import environment_from_unitary, unitary_to_tensor
from qmps_tpu.env.variational import tomography_env_objective
from qmps_tpu.ham import tfim, tfim_gs_energy
from qmps_tpu.mps.imps import iMPS


def main():
    print("== 1. Represent: the environment of a state unitary ==")
    from qmps_tpu.core.linalg import random_unitary

    U = random_unitary(jax.random.PRNGKey(0), 4)
    for strategy in ("exact", "variational", "power"):
        V = RepresentMPS(U, strategy).get_env()
        err = float(tomography_env_objective(U, V))
        print(f"   {strategy:12s}: tomography mismatch {err:.2e}")

    print("== 2. Optimize: TFIM ground state at criticality ==")
    for D in (2, 4):
        res = find_ground_state(tfim(1.0), D=D, method="lbfgs", steps=250)
        e = float(tfim_gs_energy(1.0))
        print(f"   D={D}: E = {res.energy:.8f}  (exact {e:.8f}, err {res.energy - e:.2e})")

    print("== 3. Evolve: TDVP stationarity of the ground state ==")
    gs = find_ground_state(tfim(1.0), D=2, ansatz="full15", method="lbfgs", steps=250)
    ev = MPSTimeEvolve(tfim(1.0), dt=0.02, inner_steps=80)
    rec = ev.evolve(gs.params, 5)
    print("   |<psi_0|psi_t>|^2 per site:", np.round(np.asarray(rec.loschmidt), 6))


if __name__ == "__main__":
    main()
