"""Core layer: Lie parametrizations, gates, differentiable completions.

Mirrors the reference's parametrization self-tests
(new_tdvp/unitary_param.py:123-177, qmps/tools.py:123-137 testing=True path).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from qmps_tpu.core import gates, lie, linalg, paulis


def unitary_err(U):
    n = U.shape[0]
    return np.linalg.norm(np.asarray(U.conj().T @ U) - np.eye(n))


class TestGates:
    def test_rotations_match_expm(self):
        from scipy.linalg import expm

        for t in [0.3, -1.2, 2.7]:
            for g, P in [(gates.rx, paulis.X), (gates.ry, paulis.Y), (gates.rz, paulis.Z)]:
                np.testing.assert_allclose(
                    np.asarray(g(t)), expm(-1j * t * np.asarray(P) / 2), atol=1e-12
                )

    def test_pow_gates_cirq_convention(self):
        # X^1 = X, X^0 = I, X^0.5 has e^{i pi/4} global phase structure
        np.testing.assert_allclose(np.asarray(gates.x_pow(1.0)), np.asarray(paulis.X), atol=1e-12)
        np.testing.assert_allclose(np.asarray(gates.x_pow(0.0)), np.eye(2), atol=1e-12)
        # ZZ^t = diag(1, e^{i pi t}, e^{i pi t}, 1)
        t = 0.37
        np.testing.assert_allclose(
            np.asarray(gates.zz_pow(t)),
            np.diag([1, np.exp(1j * np.pi * t), np.exp(1j * np.pi * t), 1]),
            atol=1e-12,
        )

    def test_iswap_pow(self):
        # iSWAP^1 maps |01> -> i|10>
        U = np.asarray(gates.iswap_pow(1.0))
        expected = np.eye(4, dtype=complex)
        expected[1, 1] = expected[2, 2] = 0
        expected[1, 2] = expected[2, 1] = 1j
        np.testing.assert_allclose(U, expected, atol=1e-12)
        assert unitary_err(gates.iswap_pow(0.5)) < 1e-12

    def test_K_gate_compilation(self):
        """sqrt-iSWAP native K gate equals its closed form
        (experiments/Jamie.py:170-188)."""
        from qmps_tpu.circuits.hardware import K_gate

        for th in np.random.default_rng(0).uniform(size=4):
            exact = np.array(
                [
                    [1, 0, 0, 0],
                    [0, np.cos(th), -1j * np.sin(th), 0],
                    [0, -1j * np.sin(th), np.cos(th), 0],
                    [0, 0, 0, 1],
                ]
            )
            np.testing.assert_allclose(np.asarray(K_gate(th)), exact, atol=1e-10)

    def test_expYY_gate(self):
        """(experiments/Jamie.py:190-205)."""
        from qmps_tpu.circuits.hardware import expYY_gate

        for th in np.random.default_rng(1).uniform(size=4):
            exact = np.array(
                [
                    [np.cos(th), 0, 0, 1j * np.sin(th)],
                    [0, np.cos(th), -1j * np.sin(th), 0],
                    [0, -1j * np.sin(th), np.cos(th), 0],
                    [1j * np.sin(th), 0, 0, np.cos(th)],
                ]
            )
            np.testing.assert_allclose(np.asarray(expYY_gate(th)), exact, atol=1e-10)


class TestLie:
    def test_su_generators_orthonormal(self):
        for N in (2, 3, 4):
            G = np.asarray(lie.su_generators(N))
            assert G.shape == (N * N - 1, N, N)
            for g in G:
                np.testing.assert_allclose(g, g.conj().T, atol=1e-12)
                assert abs(np.trace(g)) < 1e-12
            gram = np.einsum("aij,bji->ab", G, G)
            np.testing.assert_allclose(gram, 2 * np.eye(N * N - 1), atol=1e-12)

    def test_SU_is_unitary(self):
        v = np.random.default_rng(3).standard_normal(15)
        U = lie.SU(jnp.asarray(v), 4)
        assert unitary_err(U) < 1e-10
        np.testing.assert_allclose(abs(np.linalg.det(np.asarray(U))), 1.0, atol=1e-10)

    def test_U2f_unitary(self):
        U = lie.U2f(0.3, 1.1, -0.7, 2.2)
        assert unitary_err(U) < 1e-12

    def test_U4_kak_unitary(self):
        p = np.random.default_rng(5).standard_normal(19)
        assert unitary_err(lie.U4_kak(jnp.asarray(p))) < 1e-10

    def test_U4_state_normalized(self):
        p = np.random.default_rng(6).standard_normal(9)
        psi = np.asarray(lie.U4_state(jnp.asarray(p)))
        np.testing.assert_allclose(np.linalg.norm(psi), 1.0, atol=1e-10)

    def test_first_column_unitary_reaches_targets(self):
        """Gradient-compile a random target state into the 7-param column
        (the reference does this with Powell; we use exact gradients)."""
        import optax

        rng = np.random.default_rng(7)
        target = rng.standard_normal(4) + 1j * rng.standard_normal(4)
        target /= np.linalg.norm(target)
        target = jnp.asarray(target)

        def loss(p):
            col = lie.first_column_unitary(p)[:, 0]
            return 1.0 - jnp.abs(jnp.vdot(col, target)) ** 2

        opt = optax.adam(0.1)
        p = jnp.asarray(rng.standard_normal(7) * 0.1)
        state = opt.init(p)
        for _ in range(300):
            g = jax.grad(loss)(p)
            up, state = opt.update(g, state)
            p = optax.apply_updates(p, up)
        assert loss(p) < 1e-6

    def test_extract_embed_roundtrip(self):
        v = np.random.default_rng(8).standard_normal(15) * 0.3
        U = np.asarray(lie.SU(jnp.asarray(v), 4))
        v2 = lie.extract_su_params(U)
        np.testing.assert_allclose(np.asarray(lie.SU(jnp.asarray(v2), 4)), U, atol=1e-8)


class TestLinalg:
    def test_unitary_completion(self):
        rng = np.random.default_rng(0)
        A = rng.standard_normal((8, 3)) + 1j * rng.standard_normal((8, 3))
        iso, _ = np.linalg.qr(A)
        U = np.asarray(linalg.unitary_completion(jnp.asarray(iso)))
        np.testing.assert_allclose(U[:, :3], iso, atol=1e-10)
        assert unitary_err(jnp.asarray(U)) < 1e-10

    def test_row_completion(self):
        rng = np.random.default_rng(1)
        A = rng.standard_normal((4, 2)) + 1j * rng.standard_normal((4, 2))
        iso, _ = np.linalg.qr(A)
        rows = iso.conj().T  # (2, 4) orthonormal rows
        U = np.asarray(linalg.row_completion(jnp.asarray(rows)))
        np.testing.assert_allclose(U[:2], rows, atol=1e-10)
        assert unitary_err(jnp.asarray(U)) < 1e-10

    def test_completion_is_differentiable(self):
        def f(x):
            iso = jnp.stack([jnp.cos(x), jnp.sin(x), jnp.zeros_like(x), jnp.zeros_like(x)]).reshape(4, 1)
            U = linalg.unitary_completion(iso.astype(jnp.complex128))
            return jnp.real(jnp.sum(U * U.conj()))

        g = jax.grad(f)(0.3)
        assert np.isfinite(g)

    def test_rotate_to_hermitian(self):
        rng = np.random.default_rng(2)
        h = rng.standard_normal((3, 3)) + 1j * rng.standard_normal((3, 3))
        h = h + h.conj().T
        h = h + 3 * np.eye(3)  # positive trace
        r = np.exp(1j * 1.234) * h
        out = np.asarray(linalg.rotate_to_hermitian(jnp.asarray(r)))
        np.testing.assert_allclose(out, h, atol=1e-10)

    def test_polar(self):
        rng = np.random.default_rng(3)
        A = rng.standard_normal((4, 4)) + 1j * rng.standard_normal((4, 4))
        U, P = linalg.polar(jnp.asarray(A))
        assert unitary_err(U) < 1e-10
        np.testing.assert_allclose(np.asarray(U @ P), A, atol=1e-10)


class TestNsphere:
    def test_matches_reference_recursion(self):
        """Cross-check the cumprod form against a direct transcription of the
        hyperspherical recursion (qmps/time_evolve_tools.py:25-36)."""
        rng = np.random.default_rng(7)
        for n in (1, 2, 5, 8):
            v = rng.uniform(0, np.pi, n)
            ref = np.array(
                [np.prod(np.sin(v[:k])) * np.cos(v[k]) for k in range(n)]
                + [np.prod(np.sin(v))]
            )
            out = np.asarray(linalg.nsphere(jnp.asarray(v)))
            np.testing.assert_allclose(out, ref, atol=1e-12)
            np.testing.assert_allclose(np.linalg.norm(out), 1.0, atol=1e-12)

    def test_jit_grad(self):
        g = jax.grad(lambda v: jnp.sum(linalg.nsphere(v) ** 2))(jnp.ones(4))
        np.testing.assert_allclose(np.asarray(g), 0.0, atol=1e-12)  # norm is constant

    def test_split_ns(self):
        out = np.asarray(linalg.split_ns(jnp.arange(6.0), 2))
        np.testing.assert_allclose(out, [[0, 1], [2, 3], [4, 5]])
        import pytest

        with pytest.raises(ValueError, match="multiple"):
            linalg.split_ns(jnp.arange(5.0), 2)
