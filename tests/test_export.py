"""OpenQASM export: unitary-vs-unitary round trips at 1e-10.

Every emitted circuit is parsed back by the module's own loader,
recompiled to a dense unitary by the IR compiler, and compared (with the
reported global phase) against the original — the reference's executable
-circuit capability (qmps/represent.py:188-265) re-expressed as a
serializer (SURVEY: no cirq in this stack; qasm is the interchange
format every external stack ingests).
"""
import math

import jax
import numpy as np
import pytest

from qmps_tpu.circuits.export import (
    kak_decompose,
    parse_openqasm,
    to_openqasm,
    zyz_angles,
    _u3,
)
from qmps_tpu.circuits.ir import circuit_unitary


def _rand_u(n, seed):
    rng = np.random.default_rng(seed)
    A = rng.standard_normal((n, n)) + 1j * rng.standard_normal((n, n))
    Q, _ = np.linalg.qr(A)
    return Q


def _assert_same_unitary(ops, n, atol=1e-10):
    qasm, gp = to_openqasm(ops, n)
    ops2, n2 = parse_openqasm(qasm)
    assert n2 == n
    U1 = np.asarray(circuit_unitary(ops, n, dtype=np.complex128))
    U2 = np.exp(1j * gp) * np.asarray(circuit_unitary(ops2, n, dtype=np.complex128))
    np.testing.assert_allclose(U1, U2, atol=atol)


def test_zyz_angles_reconstruct():
    for seed in range(30):
        U = _rand_u(2, seed)
        th, ph, la, gp = zyz_angles(U)
        np.testing.assert_allclose(
            U, np.exp(1j * gp) * _u3(th, ph, la), atol=1e-12
        )
    # special points: diagonal, antidiagonal, identity, paulis
    for U in (
        np.eye(2),
        np.diag([1, 1j]),
        np.array([[0, 1], [1, 0]]),
        np.array([[0, -1j], [1j, 0]]),
        np.diag([np.exp(0.3j), np.exp(-1.1j)]),
    ):
        th, ph, la, gp = zyz_angles(np.asarray(U, complex))
        np.testing.assert_allclose(
            np.asarray(U, complex), np.exp(1j * gp) * _u3(th, ph, la), atol=1e-12
        )


def test_kak_reconstructs_random_u4():
    from scipy.linalg import expm

    X = np.array([[0, 1], [1, 0]], dtype=complex)
    Y = np.array([[0, -1j], [1j, 0]])
    Z = np.diag([1.0, -1.0]).astype(complex)
    for seed in range(20):
        U = _rand_u(4, 100 + seed)
        gp, (g0, g1), (a, b, c), (g2, g3) = kak_decompose(U)
        canon = expm(
            1j * (a * np.kron(X, X) + b * np.kron(Y, Y) + c * np.kron(Z, Z))
        )
        rec = np.exp(1j * gp) * np.kron(g2, g3) @ canon @ np.kron(g0, g1)
        np.testing.assert_allclose(U, rec, atol=1e-10)


def test_export_roundtrip_random_gates():
    ops = [
        (_rand_u(4, 1), (0, 1)),
        (_rand_u(2, 2), (1,)),
        (_rand_u(4, 3), (1, 2)),
        (_rand_u(4, 4), (2, 0)),
        (_rand_u(2, 5), (0,)),
    ]
    _assert_same_unitary(ops, 3)


def test_export_roundtrip_special_gates():
    """CNOT / H / SWAP-like compositions hit the KAK degenerate corners."""
    from qmps_tpu.core import gates as g

    SWAP = np.eye(4)[[0, 2, 1, 3]].astype(complex)
    ops = [
        (np.asarray(g.H, complex), (0,)),
        (np.asarray(g.CNOT, complex), (0, 1)),
        (SWAP, (1, 2)),
        (np.asarray(g.CNOT, complex), (2, 1)),
        (np.eye(4, dtype=complex), (0, 2)),
    ]
    _assert_same_unitary(ops, 3)


def test_export_ansatz_circuit():
    """The 15-param SU(4) state-ansatz op list exports and round-trips."""
    from qmps_tpu.circuits.ansatze import shallow_full_state_ops

    params = jax.random.normal(jax.random.PRNGKey(0), (15,))
    ops, n = shallow_full_state_ops(params)
    ops = [(np.asarray(U, complex), w) for U, w in ops]
    _assert_same_unitary(ops, n, atol=1e-6)  # f32 gates -> f32-level parity


def test_export_tdvp_circuit():
    """The 6-qubit Bell-form TDVP circuit exports and round-trips."""
    from qmps_tpu.core import gates as g
    from qmps_tpu.circuits.ir import dagger_ops
    from qmps_tpu.embed.unitaries import (
        put_env_on_left_site,
        put_env_on_right_site,
        tensor_to_unitary,
    )
    from qmps_tpu.mps.imps import iMPS, random_tensor
    from qmps_tpu.mps import transfer as tr

    A = iMPS([random_tensor(jax.random.PRNGKey(1), 2, 2)]).left_canonicalise().data[0]
    B = iMPS([random_tensor(jax.random.PRNGKey(2), 2, 2)]).left_canonicalise().data[0]
    _, r = tr.right_fixed_point(A, B)
    U = tensor_to_unitary(A)
    Ud = tensor_to_unitary(B)
    R = put_env_on_left_site(r)
    L = put_env_on_right_site(np.asarray(r).conj().T)
    ops = [
        (g.H, (3,)),
        (g.CNOT, (3, 4)),
        (U, (2, 3)),
        (U, (1, 2)),
        (np.eye(4), (2, 3)),
        (L, (0, 1)),
        (R, (4, 5)),
    ]
    ops += dagger_ops([(Ud, (1, 2))])
    ops += [(g.CNOT, (3, 4)), (g.H, (3,))]
    ops = [(np.asarray(U_, complex), w) for U_, w in ops]
    _assert_same_unitary(ops, 6, atol=1e-9)


def test_export_rejects_wide_gates():
    with pytest.raises(ValueError):
        to_openqasm([(np.eye(8, dtype=complex), (0, 1, 2))], 3)
