"""TFIM quench Loschmidt echoes three ways: exact free-fermion rate,
classical TDVP (D=8), and circuit TDVP (D=2) — the production workload of
scripts/loschmidt.py, minutes instead of cluster-days.

Run:  python examples/loschmidt_quench.py
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

from qmps_tpu.algorithms import find_ground_state
from qmps_tpu.algorithms.evolve import loschmidt_echo_run
from qmps_tpu.ham import loschmidt_rate, tfim
from qmps_tpu.mps.tdvp import Trajectory

G0, G1, T_MAX = 1.5, 0.2, 1.6


def main():
    print("== exact rate function ==")
    ts = np.linspace(0.1, T_MAX, 8)
    exact = [float(loschmidt_rate(t, G0, G1)) for t in ts]

    print("== classical TDVP, D=8 ==")
    gs = find_ground_state(tfim(G0), D=8, ansatz="suN", method="lbfgs", steps=400)
    # rk4int: explicit Euler at this dt stalls at the first dynamical phase
    # transition (Schmidt degeneracy); RK4 tracks straight through it
    traj = Trajectory(gs.A, tfim(G1).to_matrix()).rk4int(T_MAX, 400)
    rates_c = -np.log(np.asarray(traj.loschmidts()))
    tc = np.linspace(T_MAX / 400, T_MAX, 400)

    print("== circuit TDVP, D=2 ==")
    tq, rates_q, _ = loschmidt_echo_run(G0, G1, T_MAX, 40, inner_steps=100)

    print(f"{'t':>6} {'exact':>9} {'classical':>10} {'circuit':>9}")
    for t, e in zip(ts, exact):
        ic = np.argmin(np.abs(tc - t))
        iq = np.argmin(np.abs(np.asarray(tq) - t))
        print(f"{t:6.2f} {e:9.5f} {rates_c[ic]:10.5f} {float(rates_q[iq]):9.5f}")


if __name__ == "__main__":
    main()
