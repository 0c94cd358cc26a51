"""Post-quench entanglement dynamics — the physics that sets the bond
dimension budget.

After a global quench the half-chain entanglement entropy S(t) is the
quantity that strains the manifold: the state is faithful only while
S(t) stays under the ceiling log(D).  This is WHY time evolution is the
hard workload of this framework (and of the reference): a D=2 circuit
state runs out of capacity at S = log 2, which is when its variational
quench rate starts deviating from the exact free-fermion curve.

For the production quench g 1.5 -> 0.2 (into the ferromagnetic phase)
S(t) OSCILLATES, peaking in sync with the dynamical-phase-transition
structure of the Loschmidt rate — measured peak ~0.72 at D=8, well under
log 8, which is why the D=8 classical trajectory tracks the exact rate
through the DPTs while D=2 strains at its log 2 ceiling.

Run:  python examples/entanglement_growth.py
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import jax

if os.environ.get("QMPS_TPU_X64", "1") == "1":
    jax.config.update("jax_platforms", "cpu")

import numpy as np

from qmps_tpu.algorithms import find_ground_state
from qmps_tpu.ham import tfim
from qmps_tpu.mps.imps import iMPS
from qmps_tpu.mps.tdvp import Trajectory

D, T_MAX, N_STEPS = 8, 3.0, 300


def main():
    gs = find_ground_state(tfim(1.5), D=D, ansatz="suN", method="lbfgs", steps=400)
    S0 = float(iMPS([gs.A]).entanglement_entropy())
    print(f"ground state at g=1.5, D={D}: S0 = {S0:.4f}")

    traj = Trajectory(gs.A, tfim(0.2).to_matrix()).rk4int(T_MAX, N_STEPS)
    ceiling = np.log(D)
    print(f"{'t':>5} {'S(t)':>8}   ceiling log(D) = {ceiling:.3f}")
    for t in np.linspace(0.0, T_MAX, 13):
        k = min(int(round(t / T_MAX * N_STEPS)), N_STEPS)
        S = float(iMPS([traj.ALs[k]]).entanglement_entropy())
        bar = "#" * int(40 * S / ceiling)
        print(f"{t:>5.2f} {S:>8.4f}   {bar}")


if __name__ == "__main__":
    main()
