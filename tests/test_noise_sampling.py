"""Noise channel and finite-shot sampling layers (reference:
NoisyNonSparse/NoisySparse optimizers, sampled bloch/Pauli/swap-test,
tests/test_tools.py:33-38, tests/test_ground_state.py:77-90)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from qmps_tpu.circuits.ansatze import shallow_cnot_state_ops, shallow_full_state_ops
from qmps_tpu.circuits.ir import circuit_state
from qmps_tpu.core.linalg import random_unitary
from qmps_tpu.env.exact import get_env_exact
from qmps_tpu.env.variational import reduced_density_matrix, state_circuit_psi
from qmps_tpu.ham import tfim
from qmps_tpu.objectives.energy import energy_circuit
from qmps_tpu.objectives.noise import (
    noisy_circuit_rho,
    noisy_energy,
    noisy_tdvp_objective,
)
from qmps_tpu.objectives.overlap import tdvp_objective
from qmps_tpu.objectives.sampling import (
    measure_energy,
    sampled_bloch_vector,
    sampled_trace_distance,
)


class TestNoise:
    def test_zero_noise_matches_pure_state(self, key):
        ops, n = shallow_full_state_ops(jax.random.normal(key, (15,)))
        rho = noisy_circuit_rho(ops, n, 0.0)
        psi = circuit_state(ops, n)
        np.testing.assert_allclose(
            np.asarray(rho), np.asarray(jnp.outer(psi, psi.conj())), atol=1e-10
        )

    def test_noisy_rho_is_valid_state(self, key):
        ops, n = shallow_full_state_ops(jax.random.normal(key, (15,)))
        rho = np.asarray(noisy_circuit_rho(ops, n, 0.01))
        np.testing.assert_allclose(np.trace(rho), 1.0, atol=1e-10)
        ev = np.linalg.eigvalsh(rho)
        assert ev.min() > -1e-12

    def test_noisy_energy_zero_noise_parity(self, key):
        """p=0 noisy optimizer == noiseless optimizer
        (tests/test_ground_state.py:135-148)."""
        h = tfim(1.0).to_matrix()
        p15 = jax.random.normal(key, (15,))
        ops, n = shallow_full_state_ops(p15)
        from qmps_tpu.circuits.ansatze import shallow_full_state

        U = shallow_full_state(p15)
        V = get_env_exact(U)
        e_noisy = float(noisy_energy(ops, n, V, h, 0.0))
        e_pure = float(energy_circuit(U, h, V))
        np.testing.assert_allclose(e_noisy, e_pure, atol=1e-9)

    @pytest.mark.slow
    def test_noise_raises_energy_of_ground_state(self):
        """Depolarization pushes the TFIM GS energy up."""
        from qmps_tpu.algorithms import find_ground_state
        from qmps_tpu.circuits.ansatze import shallow_full_state

        h = tfim(1.0).to_matrix()
        gs = find_ground_state(tfim(1.0), D=2, ansatz="full15", method="lbfgs", steps=150)
        ops, n = shallow_full_state_ops(gs.params)
        V = get_env_exact(gs.U)
        e0 = float(noisy_energy(ops, n, V, h, 0.0))
        e1 = float(noisy_energy(ops, n, V, h, 0.01))
        assert e1 > e0 + 1e-4

    def test_noisy_tdvp_objective_limits(self, key):
        from qmps_tpu.mps.imps import iMPS

        A = iMPS.random(key, 2, 2).left_canonicalise()[0]
        W = jnp.eye(4, dtype=jnp.complex128)
        v0 = float(noisy_tdvp_objective(A, A, W, 0.0))
        # p=0: -sqrt(2 sqrt(P0)) with P0 = |x|^2/4 = 1/4 -> -1
        np.testing.assert_allclose(v0, -1.0, atol=1e-8)
        v1 = float(noisy_tdvp_objective(A, A, W, 0.02))
        assert v1 > v0  # noise degrades the overlap


class TestSampling:
    def test_sampled_bloch_vector(self, key):
        """Sampled bloch vector within 0.1 of exact
        (tests/test_tools.py:33-38 tolerance)."""
        from qmps_tpu.env.variational import bloch_vector

        psi = circuit_state(shallow_full_state_ops(jax.random.normal(key, (15,)))[0], 2)
        exact = np.asarray(bloch_vector(reduced_density_matrix(psi, [0], 2)))
        got = np.asarray(sampled_bloch_vector(jax.random.PRNGKey(1), psi, 0, 2, shots=200000))
        assert np.max(np.abs(got - exact)) < 0.02

    def test_sampled_energy(self, key):
        """Sampled Pauli-string energy within 5e-2 of exact at 3e5 shots
        (tests/test_ground_state.py:77-90)."""
        H = tfim(1.0)
        U = random_unitary(key, 4)
        V = get_env_exact(U)
        psi = state_circuit_psi(U, V, 2)
        e_exact = float(energy_circuit(U, tfim(1.0).to_matrix(), V))
        e_sampled = float(
            measure_energy(jax.random.PRNGKey(2), H.strings, psi, qubits=(1, 2), shots=100000)
        )
        assert abs(e_exact - e_sampled) < 5e-2

    def test_sampled_trace_distance(self, key):
        U = random_unitary(key, 4)
        V = get_env_exact(U)
        # exact env: sampled trace distance ~ 0 within shot noise
        # 6e4 shots: per-component shot noise ~4e-3, >4 sigma inside both
        # margins below (was 2e5 — the extra shots only bought wall time)
        td = float(sampled_trace_distance(jax.random.PRNGKey(3), U, V, shots=60000))
        assert td < 2e-2
        # wrong env: clearly nonzero
        V_bad = random_unitary(jax.random.PRNGKey(9), 4)
        td_bad = float(sampled_trace_distance(jax.random.PRNGKey(4), U, V_bad, shots=60000))
        assert td_bad > td + 5e-2
