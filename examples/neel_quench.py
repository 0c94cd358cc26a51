"""Neel quench under the Heisenberg chain: cell-blocked TDVP vs ED.

Prepare the Neel product state |up down up down ...> and evolve with
H = sum (XX + YY + ZZ).  The staggered magnetization m_s(t) relaxes
through a sign change and revival (the Barmettler et al. relaxation
scenario, PRL 102, 130603 (2009)) — a genuinely 2-periodic
nonequilibrium problem, run here through the SINGLE-site TDVP machinery
on blocked d=4 cells (ham.block_two_site): the cell chain is uniform
even though the state never is.

Validation: RK4 exact-state evolution of the same quench on an L=14
periodic ring (light cone reaches the ring scale only after the window
shown).  Blocked mixed-gauge TDVP at D=16 tracks the exact m_s(t)
to max |diff| ~1e-2 across t in [0, 0.8], including the sign change
near t ~ 0.33 and the minimum near t ~ 0.5.  The half-chain
entanglement entropy grows ~linearly after the quench, the expected
post-quench behavior (and the reason fixed-D TDVP eventually departs).

The product-state start is padded with eps-noise: an exactly rank-1
center matrix sits at the TDVP pseudo-inverse cutoff and the flow is
undefined there (the standard product-state pathology); eps = 1e-2
costs ~1e-4 in initial observables and regularizes the gauge.

Run on CPU x64 (~2 min).
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp
import numpy as np

from qmps_tpu.ham import block_two_site, heisenberg
from qmps_tpu.mps import iMPS
from qmps_tpu.mps.tdvp import Trajectory


def ed_staggered(h2, L=14, T=0.8, n=800, n_report=9):
    """m_s(t) of the Neel quench by RK4 on the full 2^L state vector."""
    h4 = np.asarray(h2, float).reshape(2, 2, 2, 2)
    bonds = [(i, i + 1) for i in range(L - 1)] + [(L - 1, 0)]

    def Hv(v):
        psi = v.reshape((2,) * L)
        w = np.zeros_like(psi)
        for i, j in bonds:
            t = np.moveaxis(psi, (i, j), (0, 1))
            t = np.tensordot(h4, t, axes=([2, 3], [0, 1]))
            w += np.moveaxis(t, (0, 1), (i, j))
        return w.reshape(-1)

    idx = int("".join(str(i % 2) for i in range(L)), 2)
    cur = np.zeros(2**L, complex)
    cur[idx] = 1.0
    bits = (np.arange(2**L)[:, None] >> np.arange(L - 1, -1, -1)) & 1
    stag = ((1 - 2 * bits) * ((-1) ** np.arange(L))).sum(1) / L
    dt = T / n
    every = n // (n_report - 1)
    out = [1.0]
    for s in range(n):
        k1 = -1j * Hv(cur)
        k2 = -1j * Hv(cur + 0.5 * dt * k1)
        k3 = -1j * Hv(cur + 0.5 * dt * k2)
        k4 = -1j * Hv(cur + dt * k3)
        cur = cur + (dt / 6) * (k1 + 2 * k2 + 2 * k3 + k4)
        if (s + 1) % every == 0:
            p = np.abs(cur) ** 2
            out.append(float((p * stag).sum() / p.sum()))
    return np.array(out)


def neel_cell_state(D, eps=1e-2, seed=0):
    """|up down> cell product tensor padded to bond D with eps noise."""
    A0 = np.zeros((4, D, D), complex)
    A0[1, 0, 0] = 1.0  # cell basis (s1 s2): index 1 = |0>|1> = |up down>
    rng = np.random.default_rng(seed)
    A0 += eps * (rng.standard_normal(A0.shape) + 1j * rng.standard_normal(A0.shape))
    return jnp.asarray(A0)


if __name__ == "__main__":
    T, n_steps, D = 0.8, 320, 16
    h2 = np.asarray(heisenberg().to_matrix()).real
    print("ED reference (L=14 ring, RK4)...")
    ms_ed = ed_staggered(h2, T=T)

    print(f"blocked TDVP at D={D}...")
    traj = Trajectory(neel_cell_state(D), jnp.asarray(block_two_site(h2)))
    traj.rk4int(T, n_steps)

    Z, I2 = np.diag([1.0, -1.0]), np.eye(2)
    op = jnp.asarray((np.kron(Z, I2) - np.kron(I2, Z)) / 2)
    sel = np.linspace(0, n_steps, len(ms_ed)).astype(int)
    print(f"{'t':>6} {'m_s TDVP':>10} {'m_s ED':>10} {'diff':>9} {'S_half':>8}")
    for k, i in enumerate(sel):
        st = iMPS([traj.ALs[i]])
        m = float(st.E(op).real)
        S = float(st.entanglement_entropy())
        t = T * i / n_steps
        print(f"{t:>6.2f} {m:>10.5f} {ms_ed[k]:>10.5f} {m - ms_ed[k]:>9.1e} {S:>8.4f}")
