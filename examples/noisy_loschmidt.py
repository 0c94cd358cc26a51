"""Noisy Loschmidt echoes: the reference's production noise sweep
(scripts/loschmidt.py:335-407) at laptop scale — depolarizing probability
vs rate-function degradation.

Run:  python examples/noisy_loschmidt.py
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np

from qmps_tpu.algorithms.evolve import noisy_loschmidt_echo_run
from qmps_tpu.ham import loschmidt_rate


def main():
    noises = [0.0, 1e-3, 5e-3]
    times, rates = noisy_loschmidt_echo_run(
        g0=1.5, g1=0.2, t_max=0.5, n_steps=10, noise_levels=noises,
        inner_steps=60, gs_steps=200,
    )
    exact = np.array([float(loschmidt_rate(t, 1.5, 0.2)) for t in np.asarray(times)])
    print(f"{'t':>6} {'exact':>8} " + " ".join(f"p={p:<7g}" for p in noises))
    R = np.asarray(rates)
    for i, t in enumerate(np.asarray(times)):
        print(f"{t:6.2f} {exact[i]:8.4f} " + " ".join(f"{R[j, i]:9.4f}" for j in range(len(noises))))


if __name__ == "__main__":
    main()
