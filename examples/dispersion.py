"""Quasiparticle dispersion of the transverse-field Ising chain.

VUMPS ground state + the tangent-space excitation ansatz
(mps/excitations.py) vs the exact free-fermion single-particle energy
epsilon(k) = 2 sqrt(1 + g^2 - 2 g cos k) — agreement to ~1e-10 at
D=8, g=1.5, including the gap 2|g-1| at k=0.  A capability beyond the
reference's surface (it has no excitation machinery at all).

Run on CPU x64 (~20 s).
"""
import jax

jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp
import numpy as np

from qmps_tpu.ham import tfim
from qmps_tpu.mps.excitations import dispersion

if __name__ == "__main__":
    g, D = 1.5, 8
    h = jnp.asarray(np.asarray(tfim(g).to_matrix()))
    ps = np.linspace(0.0, np.pi, 13)
    om = dispersion(h, D=D, ps=ps, n_levels=1)
    exact = 2.0 * np.sqrt(1.0 + g * g - 2.0 * g * np.cos(ps))
    print(f"TFIM g={g}, D={D}  (gap at k=0: exact 2|g-1| = {2*abs(g-1):.3f})")
    print(f"{'k':>7} {'omega(k)':>12} {'exact':>12} {'delta':>10}")
    for p, w, e in zip(ps, om[:, 0], exact):
        print(f"{p:>7.4f} {w:>12.8f} {e:>12.8f} {w - e:>10.2e}")
