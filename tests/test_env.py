"""Environment strategies: exact, power-method, variational, gen-2 M-ansatz
(reference: qmps/represent.py:18-53, qmps/ansatze.py tests,
new_tdvp Represent + loschmidt_classical bounded-eta)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from qmps_tpu.algorithms.represent import RepresentMPS
from qmps_tpu.core.linalg import random_unitary, cT
from qmps_tpu.embed import environment_from_unitary, unitary_to_tensor
from qmps_tpu.env.exact import get_env_exact, power_method_env
from qmps_tpu.env.variational import (
    represent_variational_M,
    tomography_env_objective,
    trace_distance_objective,
)
from qmps_tpu.mps import transfer as tr
from qmps_tpu.circuits.brickwork import (
    env_M,
    exact_right_env,
    param_bricks,
    right_env_map,
    right_env_matrix,
)


@pytest.fixture(scope="module")
def U():
    return random_unitary(jax.random.PRNGKey(5), 4)


class TestExactEnv:
    def test_env_unitary_reproduces_fixed_point(self, U):
        V = get_env_exact(U)
        C = environment_from_unitary(V)
        r = C @ cT(C)
        A = unitary_to_tensor(U)
        Er = tr.right_matvec(A, A, r)
        # r is the fixed point with eigenvalue 1 (A is left-canonical)
        np.testing.assert_allclose(np.asarray(Er), np.asarray(r), atol=1e-9)

    def test_exact_env_zeroes_tomography_objective(self, U):
        V = get_env_exact(U)
        assert float(tomography_env_objective(U, V)) < 1e-9

    def test_exact_env_zeroes_trace_distance(self, U):
        V = get_env_exact(U)
        assert float(trace_distance_objective(U, V)) < 1e-9

    def test_power_method_converges(self, U):
        A = unitary_to_tensor(U)
        _, r_exact = tr.right_fixed_point(A, A)
        r_exact = (r_exact + cT(r_exact)) / 2
        r_exact = r_exact / jnp.trace(r_exact)
        r_pm = power_method_env(U, 60)
        np.testing.assert_allclose(np.asarray(r_pm), np.asarray(r_exact), atol=1e-8)


class TestVariationalEnv:
    def test_variational_env_matches_exact(self, U):
        rep = RepresentMPS(U, "variational", steps=800)
        V = rep.get_env()
        assert float(tomography_env_objective(U, V)) < 1e-8

    def test_represent_strategies_api(self, U):
        for strategy in ("exact", "power"):
            V = RepresentMPS(U, strategy).get_env()
            err = np.linalg.norm(
                np.asarray(V).conj().T @ np.asarray(V) - np.eye(4)
            )
            assert err < 1e-9


class TestGen2Env:
    def test_right_env_map_matches_matrix(self, key):
        U1 = random_unitary(jax.random.fold_in(key, 1), 4)
        U2 = random_unitary(jax.random.fold_in(key, 2), 4)
        U1d, U2d = U1.conj().T, U2.conj().T
        M = env_M(jnp.array([0.3, 0.1, -0.2, 0.4, 0.0, 0.7]))
        EM = right_env_map(U1, U2, U1d, U2d, M)
        Mmat = right_env_matrix(U1, U2, U1d, U2d)
        EM2 = (Mmat @ M.reshape(-1)).reshape(2, 2)
        np.testing.assert_allclose(np.asarray(EM), np.asarray(EM2), atol=1e-10)
        # exact env is an eigenvector of the map
        eta, r = exact_right_env(U1, U2, U1d, U2d)
        Er = right_env_map(U1, U2, U1d, U2d, r)
        np.testing.assert_allclose(
            np.asarray(Er), np.asarray(eta * r), atol=1e-9
        )

    def test_variational_M_finds_fixed_point(self, key):
        """Represent.optimize analogue: |eta M - E M| -> small
        (ClassicalTDVPStripped.py:621-636)."""
        U1 = random_unitary(jax.random.fold_in(key, 3), 4)
        U2 = random_unitary(jax.random.fold_in(key, 4), 4)
        U1d, U2d = U1.conj().T, U2.conj().T
        eta_v, M_v, loss = represent_variational_M(U1, U2, U1d, U2d, steps=800)
        eta_e, r_e = exact_right_env(U1, U2, U1d, U2d)
        assert float(loss) < 5e-2
        # eigenvalues should roughly agree (variational ansatz is restricted)
        assert abs(abs(complex(eta_v)) - abs(complex(eta_e))) < 0.1
