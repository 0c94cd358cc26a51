"""Embedding round trips (reference: qmps/tools.py testing=True paths,
qmps/time_evolve_tools.py:133-166 self-tests, tests/test_tools.py)."""
import jax.numpy as jnp
import numpy as np

from qmps_tpu.embed import (
    environment_from_unitary,
    environment_to_unitary,
    get_env_off_left_site,
    get_env_off_right_site,
    put_env_on_left_site,
    put_env_on_right_site,
    tensor_to_unitary,
    unitary_to_tensor,
)
from qmps_tpu.mps.imps import iMPS, left_orthogonalise, random_tensor


def unitary_err(U):
    U = np.asarray(U)
    return np.linalg.norm(U.conj().T @ U - np.eye(U.shape[0]))


def test_tensor_unitary_roundtrip(key):
    """tests/test_tools.py:15-31 analogue."""
    for D in (2, 4, 8):
        A = random_tensor(key, 2, D)
        AL, _, _ = left_orthogonalise(A)
        U = tensor_to_unitary(AL)
        assert unitary_err(U) < 1e-10
        # first D columns are the isometry
        iso = np.asarray(jnp.transpose(AL, (1, 0, 2)).reshape(2 * D, D))
        np.testing.assert_allclose(np.asarray(U)[:, :D], iso, atol=1e-10)
        A2 = unitary_to_tensor(U)
        np.testing.assert_allclose(np.asarray(A2), np.asarray(AL), atol=1e-10)


def test_environment_unitary_roundtrip(rng):
    v = rng.standard_normal(4) + 1j * rng.standard_normal(4)
    U = environment_to_unitary(jnp.asarray(v))
    assert unitary_err(U) < 1e-10
    C = environment_from_unitary(U)
    np.testing.assert_allclose(np.asarray(C).reshape(-1), v / np.linalg.norm(v), atol=1e-10)


def test_put_env_roundtrips(rng):
    """qmps/new_time_evolve.py:58-65 battery."""
    for _ in range(20):
        q = rng.standard_normal((2, 2)) + 1j * rng.standard_normal((2, 2))
        qj = jnp.asarray(q)

        A, n = put_env_on_left_site(qj, ret_n=True)
        assert unitary_err(A) < 1e-10
        np.testing.assert_allclose(
            np.asarray(get_env_off_left_site(A * n)), q, atol=1e-10
        )

        B, n2 = put_env_on_right_site(qj, ret_n=True)
        assert unitary_err(B) < 1e-10
        np.testing.assert_allclose(
            np.asarray(get_env_off_right_site(B * n2)), q, atol=1e-10
        )


def test_put_env_differentiable(rng):
    import jax

    q0 = rng.standard_normal(8)

    def f(x):
        q = (x[:4] + 1j * x[4:]).reshape(2, 2)
        return jnp.real(jnp.sum(jnp.abs(put_env_on_left_site(q)) ** 2))

    g = jax.grad(f)(jnp.asarray(q0))
    assert np.all(np.isfinite(np.asarray(g)))
