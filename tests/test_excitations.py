"""Quasiparticle excitation ansatz (mps/excitations.py): dispersion
relations on a VUMPS ground state vs the exact free-fermion TFIM
single-particle energy 2 sqrt(1 + g^2 - 2 g cos k)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from qmps_tpu.ham import tfim
from qmps_tpu.mps.excitations import (
    dispersion,
    excitation_matrix,
    null_space_VL,
)
from qmps_tpu.mps.tdvp import mixed_gauge, vumps_ground_state


def _gs(g, D, iters=200):
    h = jnp.asarray(np.asarray(tfim(g).to_matrix()))
    AL, C, _, _ = vumps_ground_state(h, D, iters=iters, k=32)
    return h, mixed_gauge(AL)


def test_null_space_is_orthonormal_complement():
    h, (AL, AR, C) = _gs(1.5, 4, iters=100)
    VL = null_space_VL(AL)
    d, D, m = VL.shape
    assert m == (d - 1) * D
    M = VL.reshape(d * D, m)
    np.testing.assert_allclose(
        np.asarray(M.conj().T @ M), np.eye(m), atol=1e-12
    )
    # sum_s AL_s^dag VL_s = 0: B = VL X is left-gauge-fixed for any X
    ov = jnp.einsum("sia,sib->ab", AL.conj(), VL)
    assert float(jnp.max(jnp.abs(ov))) < 1e-12


def test_effective_matrix_is_hermitian():
    """The RAW diagram sum (symmetrize=False) must come out Hermitian on
    a converged ground state — a genuine cross-check of the diagram
    bookkeeping (the symmetrized return would make this vacuous)."""
    h, gs = _gs(1.5, 4, iters=150)
    HX = np.asarray(excitation_matrix(*gs, h, 0.7, symmetrize=False))
    np.testing.assert_allclose(HX, HX.conj().T, atol=1e-9)


def test_tfim_dispersion_matches_exact():
    """The quasiparticle energies reproduce the exact dispersion across
    the Brillouin zone — including the gap 2|g-1| at p=0 — to 1e-7
    (measured 2e-10 at g=1.5, D=8)."""
    g, D = 1.5, 8
    h = jnp.asarray(np.asarray(tfim(g).to_matrix()))
    ps = np.linspace(0.0, np.pi, 5)
    om = dispersion(h, D=D, ps=ps, n_levels=1, iters=200)
    exact = 2.0 * np.sqrt(1.0 + g * g - 2.0 * g * np.cos(ps))
    np.testing.assert_allclose(om[:, 0], exact, atol=1e-7)


@pytest.mark.slow
def test_dispersion_other_couplings():
    for g, D, tol in ((1.2, 8, 1e-6), (2.0, 4, 1e-6)):
        h = jnp.asarray(np.asarray(tfim(g).to_matrix()))
        ps = np.linspace(0.0, np.pi, 4)
        om = dispersion(h, D=D, ps=ps, n_levels=1, iters=200)
        exact = 2.0 * np.sqrt(1.0 + g * g - 2.0 * g * np.cos(ps))
        np.testing.assert_allclose(om[:, 0], exact, atol=tol)


def test_spectral_weights_sum_rule():
    """One-particle spectral weights |<Phi_p|Z_p|GS>|^2 saturate the
    static structure factor s(p) = C(0) + 2 sum_r cos(pr) C(r) to ~99%
    at g=1.5 (the remainder is the 3-particle continuum), with the
    lowest mode carrying essentially all of it."""
    from qmps_tpu.core.paulis import Z
    from qmps_tpu.mps.excitations import spectral_weights
    from qmps_tpu.mps.imps import iMPS

    g, D = 1.5, 8
    h, gs = _gs(g, D, iters=200)
    st = iMPS([gs[0]])
    Zj = jnp.asarray(np.asarray(Z))
    Cr = np.asarray(st.correlator(Zj, Zj, max_dist=60))
    ez = float(np.real(np.asarray(st.E(Zj))))
    for p in (0.5, 2.5):
        om, w = spectral_weights(*gs, h, Zj, p, n_levels=6)
        sp = (1.0 - ez ** 2) + 2 * np.sum(np.cos(p * np.arange(1, 61)) * Cr)
        # the public structure-factor API computes the same quantity
        np.testing.assert_allclose(
            float(st.static_structure_factor(Zj, p)), sp, atol=1e-10
        )
        exact = 2 * np.sqrt(1 + g * g - 2 * g * np.cos(p))
        assert abs(om[0] - exact) < 1e-6
        assert w[0] / np.sum(w) > 0.999      # single mode dominates
        assert 0.97 < np.sum(w) / sp <= 1.0  # sum rule (3-particle rest)


def test_domain_wall_dispersion_ordered_phase():
    """Topological (kink) excitations in the ordered phase (g < 1): the
    two-ground-state interpolating ansatz reproduces the exact fermion
    dispersion — the kinks ARE the fermions there — with the standard
    pi momentum offset of the domain-wall frame.  Gap 2|1-g| at p=pi."""
    from qmps_tpu.mps.excitations import domain_wall_dispersion

    g, D = 0.5, 8
    h = jnp.asarray(np.asarray(tfim(g).to_matrix()))
    ps = np.linspace(0.0, np.pi, 5)
    om = domain_wall_dispersion(h, D=D, ps=ps, n_levels=1, iters=200)
    exact = 2.0 * np.sqrt(1.0 + g * g - 2.0 * g * np.cos(ps + np.pi))
    np.testing.assert_allclose(om[:, 0], exact, atol=1e-6)


@pytest.mark.slow
def test_heisenberg_spinon_dispersion_via_cell2():
    """Des Cloizeaux-Pearson spinon edge from the BLOCKED Heisenberg
    chain: the quasiparticle ansatz on 2-site cells (ham.block_two_site,
    no sublattice rotation) at cell momentum kappa targets physical
    momentum k = kappa/2, and the lowest triplet branch approaches the
    exact two-spinon lower edge 2 pi |sin k| (dCP 1962; factor from the
    XX+YY+ZZ = 4 S.S normalization) FROM ABOVE — measured +0.7% at D=8."""
    from qmps_tpu.ham import block_two_site, heisenberg
    from qmps_tpu.mps.excitations import dispersion

    hb = jnp.asarray(block_two_site(np.asarray(heisenberg().to_matrix())))
    ps = np.array([np.pi / 2, np.pi, 3 * np.pi / 2])
    es = np.asarray(dispersion(hb, 8, ps, n_levels=1, iters=250)).ravel()
    exact = 2.0 * np.pi * np.abs(np.sin(ps / 2.0))
    # one-mode ansatz sits above the continuum edge, converging with D
    assert np.all(es >= exact - 1e-6)
    np.testing.assert_allclose(es, exact, rtol=2e-2)
    # the two dCP branches (k, k+pi) are degenerate: kappa and 2pi-kappa
    # must agree to solver precision
    assert abs(es[0] - es[2]) < 1e-6
