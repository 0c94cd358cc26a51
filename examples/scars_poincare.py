"""PXP many-body scars: quantum-vs-classical TDVP and a Poincare section
(scars.py + poincare_map/2body_scars.py, joblib replaced by vmap).

Run:  python examples/scars_poincare.py
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

from qmps_tpu.algorithms.scars import (
    ScarsEvolver,
    classical_poincare_sweep,
    classical_trajectory,
    poincare_sections,
)

MU = 0.325


def main():
    p0 = jnp.array([0.6, 0.9, 1.1, 0.4])

    print("== quantum TDVP vs classical ODEs (short horizon) ==")
    dt, steps = 0.05, 10
    ev = ScarsEvolver(MU, dt, inner_steps=200, lr=1e-2)
    q = np.asarray(ev.simulate(p0, steps))
    c = np.mod(np.asarray(classical_trajectory(p0, jnp.arange(steps) * dt, MU)), 2 * np.pi)
    print("   max angle deviation:", np.abs(np.angle(np.exp(1j * (q - c)))).max())

    print("== classical Poincare sections (vmapped ensemble) ==")
    y0s = jax.random.uniform(jax.random.PRNGKey(0), (16, 4), minval=0.2, maxval=2.0)
    trajs = classical_poincare_sweep(y0s, jnp.linspace(0, 60, 2000), MU)
    secs = poincare_sections(np.mod(np.asarray(trajs), 2 * np.pi))
    print("   crossings per trajectory:", [len(s) for s in secs])


if __name__ == "__main__":
    main()
