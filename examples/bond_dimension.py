"""Bond-dimension scaling of the XY model with D -> 2D warm starts
(scripts/bond_dimension.py, xmps insu2N replaced by the Lie-algebra embed).

Run:  python examples/bond_dimension.py
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

from qmps_tpu.algorithms import find_ground_state
from qmps_tpu.core import lie
from qmps_tpu.ham import xy


def main():
    H = xy()
    guess = None
    print(f"{'D':>3} {'E':>12}")
    for D in (2, 4, 8):
        candidates = []
        for seed in (0, 1, 2):
            ig = guess if (guess is not None and seed == 0) else None
            candidates.append(
                find_ground_state(H, D=D, ansatz="suN", method="lbfgs",
                                  steps=300, initial_guess=ig,
                                  key=jax.random.PRNGKey(seed))
            )
        res = min(candidates, key=lambda r: r.energy)
        print(f"{D:3d} {res.energy:12.8f}")
        guess = jnp.asarray(lie.embed_su_params(np.asarray(res.params), eps=4e-2))
    # exact XY ground energy per site with these conventions: -4/pi
    print(f"     exact: {-4/np.pi:.8f}")


if __name__ == "__main__":
    main()
