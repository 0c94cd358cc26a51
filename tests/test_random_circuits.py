"""Random-circuit factories: unitarity, determinism, full-rank property,
and interoperability with the IR compiler + OpenQASM exporter."""
import numpy as np

from qmps_tpu.circuits.ir import circuit_state, circuit_unitary
from qmps_tpu.circuits.random import (
    random_circuit,
    random_full_rank_circuit,
    random_qaoa_circuit,
    random_sparse_circuit,
    su2_from_angles,
)


def _is_unitary(U, atol=1e-10):
    U = np.asarray(U)
    return np.allclose(U @ U.conj().T, np.eye(U.shape[0]), atol=atol)


def test_factories_compile_to_unitaries_and_are_seeded():
    for factory, kwargs in (
        (random_sparse_circuit, dict(length=4, depth=12, seed=3)),
        (random_circuit, dict(length=4, depth=3, seed=3)),
        (random_qaoa_circuit, dict(length=4, depth=2, seed=3)),
        (random_full_rank_circuit, dict(length=4, depth=2, seed=3)),
    ):
        ops = factory(**kwargs)
        assert all(_is_unitary(U) for U, _ in ops)
        U = np.asarray(circuit_unitary(ops, 4, dtype=np.complex128))
        assert _is_unitary(U)
        # same seed -> identical circuit; different seed -> different
        ops2 = factory(**kwargs)
        assert all(np.allclose(a[0], b[0]) for a, b in zip(ops, ops2))
        ops3 = factory(**{**kwargs, "seed": 4})
        U3 = np.asarray(circuit_unitary(ops3, 4, dtype=np.complex128))
        assert not np.allclose(U, U3)


def test_su2_from_angles_is_special_unitary():
    U = su2_from_angles(0.3, 1.2, 0.5)
    assert _is_unitary(U, 1e-12)
    np.testing.assert_allclose(np.linalg.det(U), 1.0, atol=1e-12)


def test_full_rank_circuit_has_full_middle_schmidt_rank():
    L = 4
    ops = random_full_rank_circuit(L, depth=3, seed=1)
    psi = np.asarray(circuit_state(ops, L, dtype=np.complex128))
    s = np.linalg.svd(psi.reshape(2 ** (L // 2), -1), compute_uv=False)
    assert np.min(s) > 1e-3, s  # all Schmidt values populated


def test_angles_hook_pins_layers():
    angles = [[(0.1, 0.2, 0.3)] * 4] * 2
    a = random_circuit(4, depth=2, seed=0, angles=angles)
    b = random_circuit(4, depth=2, seed=9, angles=angles)
    # single-qubit layers identical regardless of seed; ladders may differ
    ones_a = [U for U, w in a if len(w) == 1]
    ones_b = [U for U, w in b if len(w) == 1]
    assert all(np.allclose(x, y) for x, y in zip(ones_a, ones_b))


def test_random_circuit_exports_to_qasm():
    from qmps_tpu.circuits.export import parse_openqasm, to_openqasm

    ops = random_sparse_circuit(3, depth=10, seed=7)
    qasm, gp = to_openqasm(ops, 3)
    ops2, n = parse_openqasm(qasm)
    U1 = np.asarray(circuit_unitary(ops, 3, dtype=np.complex128))
    U2 = np.exp(1j * gp) * np.asarray(circuit_unitary(ops2, 3, dtype=np.complex128))
    np.testing.assert_allclose(U1, U2, atol=1e-10)
