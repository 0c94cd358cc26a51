"""Correlation functions and correlation length (transfer-spectrum API)."""
import jax
import jax.numpy as jnp
import numpy as np

from qmps_tpu.core.paulis import Z
from qmps_tpu.mps.imps import iMPS, left_orthogonalise, random_tensor


def test_product_state_has_zero_connected_correlations():
    a = 0.4
    A = (
        jnp.zeros((2, 1, 1), jnp.complex128)
        .at[0, 0, 0]
        .set(jnp.cos(a))
        .at[1, 0, 0]
        .set(jnp.sin(a))
    )
    C = np.asarray(iMPS([A]).correlator(Z, Z, 5))
    np.testing.assert_allclose(C, 0.0, atol=1e-10)


def test_correlator_matches_brute_force(key):
    A = random_tensor(key, 2, 3)
    psi = iMPS([A])
    C = np.asarray(psi.correlator(Z, Z, 4))

    AL, _, _ = left_orthogonalise(A)
    ALn = np.asarray(AL)
    E = np.einsum("sik,sjl->ijkl", ALn, ALn.conj()).reshape(9, 9)
    w, V = np.linalg.eig(E)
    i = np.argmax(abs(w))
    r = V[:, i].reshape(3, 3)
    r = (r + r.conj().T) / 2
    r = r / np.trace(r)
    Zn = np.asarray(Z, complex)

    def site_op(op, Xm):
        return sum(
            op[s, t] * ALn[s] @ Xm @ ALn[t].conj().T
            for s in range(2)
            for t in range(2)
        )

    def transfer(Xm):
        return sum(ALn[s] @ Xm @ ALn[s].conj().T for s in range(2))

    T2 = site_op(Zn, r)
    e1 = np.trace(site_op(Zn, r))
    bf, T = [], T2
    for rdist in range(1, 5):
        if rdist > 1:
            T = transfer(T)
        bf.append((np.trace(site_op(Zn, T)) - e1 * e1).real)
    np.testing.assert_allclose(C, np.array(bf), atol=1e-9)


def test_correlation_length_matches_numpy_spectrum(key):
    A = random_tensor(key, 2, 4)
    psi = iMPS([A])
    xi = float(psi.correlation_length())

    AL, _, _ = left_orthogonalise(A)
    ALn = np.asarray(AL)
    E = np.einsum("sik,sjl->ijkl", ALn, ALn.conj()).reshape(16, 16)
    w = np.sort(np.abs(np.linalg.eigvals(E)))[::-1]
    xi_ref = -1.0 / np.log(w[1] / w[0])
    np.testing.assert_allclose(xi, xi_ref, rtol=1e-5)


def test_correlations_decay_at_least_as_fast_as_xi(key):
    """xi bounds the *slowest* decay channel: any particular correlator
    decays at a rate >= 1/xi (it may be faster when the operator does not
    couple to the subleading transfer eigenvector, and it may oscillate
    when that eigenvalue is complex) — so test the envelope bound."""
    A = random_tensor(key, 2, 2)
    psi = iMPS([A])
    C = np.abs(np.asarray(psi.correlator(Z, Z, 14)))
    xi = float(psi.correlation_length())
    rate = np.log(np.max(C[0:3]) / np.max(C[9:12])) / 9  # envelope decay
    assert rate >= (1 / xi) * 0.9


def test_schmidt_and_entropy():
    """Schmidt spectrum cross-checks: a product state has entropy 0; for a
    random state the squared Schmidt values equal the spectrum of l r (the
    product of the left/right transfer fixed points), the standard
    half-chain reduced-density-matrix identity for a uMPS."""
    from qmps_tpu.embed import unitary_to_tensor
    from qmps_tpu.mps import transfer as tr
    from qmps_tpu.mps.imps import iMPS

    # product state: |0...0> via the identity unitary
    prod = iMPS([unitary_to_tensor(jnp.eye(4, dtype=jnp.complex128))])
    assert float(prod.entanglement_entropy()) < 1e-10

    psi = iMPS.random(jax.random.PRNGKey(3), 2, 4)
    s = np.asarray(psi.schmidt_values())
    assert np.all(np.diff(s) <= 1e-12) and abs(np.sum(s**2) - 1) < 1e-10

    A = psi.left_canonicalise()[0]
    _, l = tr.left_fixed_point(A, A)
    _, r = tr.right_fixed_point(A, A)
    lr = np.asarray(l @ r, np.complex128)
    w = np.sort(np.abs(np.linalg.eigvals(lr)))[::-1]
    w = w / w.sum()
    np.testing.assert_allclose(s**2, w, atol=1e-10)

    S = float(psi.entanglement_entropy())
    assert 0 < S <= np.log(4) + 1e-12


def test_truncation():
    """Schmidt truncation: D_new = D is lossless (weight 1, unit overlap);
    the D=4 TFIM ground state truncated to D=2 stays a near-optimal D=2
    state (energy between the exact value and the known D=2 manifold
    gap)."""
    from qmps_tpu.algorithms import find_ground_state
    from qmps_tpu.ham import tfim, tfim_gs_energy
    from qmps_tpu.mps.imps import iMPS

    psi = iMPS.random(jax.random.PRNGKey(5), 2, 4)
    same, w = psi.truncated(4)
    assert abs(float(w) - 1) < 1e-10
    assert abs(abs(complex(same.overlap(psi))) - 1) < 1e-8

    gs4 = find_ground_state(tfim(1.0), D=4, ansatz="suN", method="lbfgs", steps=150)
    psi2, w2 = iMPS([gs4.A]).truncated(2)
    assert psi2.D == 2 and 0.9 < float(w2) <= 1.0 + 1e-12
    h = jnp.asarray(tfim(1.0).to_matrix())
    e_tr = float(psi2.energy(h).real)
    e_exact = float(tfim_gs_energy(1.0))
    assert e_tr >= e_exact - 1e-8
    assert e_tr - e_exact < 5e-3  # near the D=2 manifold optimum (~7e-4 gap)


def test_correlation_length_complex_subdominant():
    """xi must match numpy eig even when lambda_2 is a complex-conjugate
    pair (the generic oscillatory-correlation case, where a Rayleigh
    quotient on the deflated squared matrix underestimated |lambda_2| by
    up to 25x)."""
    from qmps_tpu.mps import transfer as tr
    from qmps_tpu.mps.imps import iMPS

    for seed in range(6):
        psi = iMPS.random(jax.random.PRNGKey(seed), 2, 3)
        A = psi.left_canonicalise()[0]
        E = np.asarray(tr.transfer_dense(A, A))
        w = np.sort(np.abs(np.linalg.eigvals(E)))[::-1]
        xi_true = -1.0 / np.log(w[1] / w[0])
        xi = float(psi.correlation_length())
        assert abs(xi - xi_true) / xi_true < 1e-5

    # engineered dominant complex pair for the radius helper itself
    th = 1.2
    R = 0.8 * np.array([[np.cos(th), -np.sin(th)], [np.sin(th), np.cos(th)]])
    M = np.zeros((4, 4))
    M[:2, :2] = R
    M[2, 2], M[3, 3] = 0.3, 0.1
    rho = float(tr.spectral_radius_dense(jnp.asarray(M, jnp.complex128)))
    np.testing.assert_allclose(rho, 0.8, atol=1e-8)
