"""Environment by power method: convergence in the number of transfer
applications (the Power Method.ipynb experiment).

Run:  python examples/power_method.py
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

from qmps_tpu.core.linalg import cT, random_unitary
from qmps_tpu.embed import unitary_to_tensor
from qmps_tpu.env.exact import power_method_env
from qmps_tpu.mps import transfer as tr


def main():
    U = random_unitary(jax.random.PRNGKey(3), 4)
    A = unitary_to_tensor(U)
    _, r_exact = tr.right_fixed_point(A, A)
    r_exact = (r_exact + cT(r_exact)) / 2
    r_exact = r_exact / jnp.trace(r_exact)
    print(f"{'k':>4} {'|r_k - r*|':>12}")
    for k in (1, 2, 4, 8, 16, 32, 64):
        r_k = power_method_env(U, k)
        print(f"{k:4d} {float(jnp.linalg.norm(r_k - r_exact)):12.3e}")


if __name__ == "__main__":
    main()
