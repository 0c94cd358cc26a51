"""Ground-state search vs exact physics (reference: tests/test_ground_state.py,
scripts/ground_state_finding.py), with the oracle accuracy gates of
BASELINE.md."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from qmps_tpu.algorithms.ground_state import (
    NonSparseFullEnergyOptimizer,
    NonSparseFullTwoSiteEnergyOptimizer,
    SparseFullEnergyOptimizer,
    find_ground_state,
)
from qmps_tpu.ham import Hamiltonian, tfim, tfim_gs_energy
from qmps_tpu.objectives.energy import energy_circuit, energy_exact_env


class TestOracles:
    def test_tfim_energy_integral(self):
        """Known values: e(0) = -1 (classical Ising), e(1) = -4/pi."""
        np.testing.assert_allclose(float(tfim_gs_energy(0.0)), -1.0, atol=1e-12)
        np.testing.assert_allclose(
            float(tfim_gs_energy(1.0)), -4 / np.pi, atol=1e-10
        )

    def test_hamiltonian_matrix(self):
        h = tfim(1.0).to_matrix()
        # -ZZ + (X I + I X)/2
        Z = np.diag([1, -1])
        X = np.array([[0, 1], [1, 0]])
        expected = -np.kron(Z, Z) + 0.5 * (np.kron(X, np.eye(2)) + np.kron(np.eye(2), X))
        np.testing.assert_allclose(np.asarray(h), expected, atol=1e-12)

    def test_from_matrix_roundtrip(self):
        h = Hamiltonian({"ZZ": -1.0, "X": 0.7, "YY": 0.3})
        h2 = Hamiltonian.from_matrix(h.to_matrix())
        np.testing.assert_allclose(
            np.asarray(h2.to_matrix()), np.asarray(h.to_matrix()), atol=1e-10
        )


class TestEnergyObjectives:
    def test_contraction_equals_circuit(self, key):
        """1e-10 parity: the fast contraction path equals the reference's
        full State(U, V, 2) circuit evaluation."""
        from qmps_tpu.core.linalg import random_unitary

        h = tfim(1.2).to_matrix()
        for D in (2, 4):
            U = random_unitary(jax.random.fold_in(key, D), 2 * D)
            e_fast = float(energy_exact_env(U, h))
            e_circ = float(energy_circuit(U, h))
            np.testing.assert_allclose(e_fast, e_circ, atol=1e-10)


class TestGroundState:
    def test_tfim_d2_lbfgs(self):
        """D=2 variational energy within the reference's own accuracy gate
        (E >= E_exact - 1e-3 and close above; tests/test_ground_state.py:218)."""
        g = 1.0
        res = find_ground_state(tfim(g), D=2, ansatz="suN", method="lbfgs", steps=150)
        e_exact = float(tfim_gs_energy(g))
        assert res.energy >= e_exact - 1e-6
        assert res.energy - e_exact < 5e-3

    @pytest.mark.slow
    def test_tfim_d2_deep_in_phases(self):
        for g, tol in [(0.2, 2e-4), (2.0, 2e-3)]:
            res = find_ground_state(tfim(g), D=2, ansatz="suN", method="lbfgs", steps=150)
            e_exact = float(tfim_gs_energy(g))
            assert res.energy - e_exact < tol, (g, res.energy, e_exact)

    def test_optimizer_class_wrapper(self):
        opt = NonSparseFullEnergyOptimizer(tfim(1.5), D=2)
        opt.change_settings({"method": "lbfgs", "maxiter": 120})
        res = opt.optimize()
        assert res.fun - float(tfim_gs_energy(1.5)) < 5e-3
        assert opt.U.shape == (4, 4)

    def test_sparse_shallow_ansatz(self):
        opt = SparseFullEnergyOptimizer(tfim(1.0), D=2, depth=4, ansatz="cnot")
        opt.change_settings({"method": "adam", "maxiter": 400})
        res = opt.optimize()
        # shallow ansatz: looser gate, matching reference depth-4 behavior
        assert res.fun - float(tfim_gs_energy(1.0)) < 2e-2

    def test_two_site_optimizer(self):
        opt = NonSparseFullTwoSiteEnergyOptimizer(tfim(1.0))
        opt.change_settings({"method": "lbfgs", "maxiter": 150})
        res = opt.optimize()
        assert res.fun - float(tfim_gs_energy(1.0)) < 5e-3

    def test_joint_env_purity_objective(self):
        """Joint state+env optimization with the purity penalty converges to
        a comparable energy (qmps/ground_state.py:170-228)."""
        opt = SparseFullEnergyOptimizer(
            tfim(1.0), D=2, optimize_environment=True
        )
        opt.change_settings({"method": "adam", "maxiter": 800})
        res = opt.optimize()
        # the penalized objective at the optimum ~ energy (penalty ~ 0)
        assert res.fun - float(tfim_gs_energy(1.0)) < 3e-2

    @pytest.mark.slow
    def test_d4_ground_state(self):
        """D=4 beats the best D=2 energy at criticality."""
        g = 1.0
        res = find_ground_state(tfim(g), D=4, ansatz="suN", method="lbfgs", steps=300)
        e_exact = float(tfim_gs_energy(g))
        res2 = find_ground_state(tfim(g), D=2, ansatz="suN", method="lbfgs", steps=150)
        assert res.energy < res2.energy + 1e-8
        assert res.energy - e_exact < 5e-4


class TestExpectationConventions:
    def test_antisymmetric_hamiltonian_matrix(self, key):
        """<h> must match the circuit path for Hamiltonians whose 4x4
        matrix is NOT symmetric (h = XY + YX: hermitian, h^T = -h).  The
        fast contraction paths once computed <h^T> — an exact sign flip
        here — which every symmetric-matrix model (TFIM/XY/Heisenberg)
        silently masked."""
        from qmps_tpu.core.linalg import random_unitary
        from qmps_tpu.core.paulis import X, Y
        from qmps_tpu.objectives.energy import energy_circuit, energy_exact_env

        h = jnp.asarray(np.kron(X, Y) + np.kron(Y, X))
        U = random_unitary(key, 4)
        e_fast = float(energy_exact_env(U, h))
        e_circ = float(energy_circuit(U, h))
        assert abs(e_fast - e_circ) < 1e-10
        assert abs(e_fast) > 1e-3  # the probe state must actually see h

    def test_single_site_Y_expectation(self, key):
        """iMPS.E agrees with a brute-force contraction for Y (asymmetric
        matrix) — same transpose class as above."""
        from qmps_tpu.core.paulis import Y
        from qmps_tpu.mps import transfer as tr
        from qmps_tpu.mps.imps import iMPS

        psi = iMPS.random(key, 2, 3)
        can = psi.left_canonicalise()
        A = can[0]
        _, r = tr.right_fixed_point(A, A)
        r = (r + r.conj().T) / 2
        r = r / jnp.trace(r)
        A_, r_ = np.asarray(A), np.asarray(r)
        brute = sum(
            np.asarray(Y)[u, s] * np.trace(A_[s] @ r_ @ A_[u].conj().T)
            for u in range(2)
            for s in range(2)
        )
        np.testing.assert_allclose(complex(can.E(jnp.asarray(Y))), brute, atol=1e-10)
