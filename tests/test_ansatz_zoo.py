"""Every ansatz family produces a unitary of the right size, and ops/compiled
faces agree (qmps/represent.py:268-442 zoo coverage)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from qmps_tpu.circuits import ansatze
from qmps_tpu.circuits.ir import circuit_unitary


def unitary_err(U):
    U = np.asarray(U)
    return np.linalg.norm(U.conj().T @ U - np.eye(U.shape[0]))


CASES = [
    ("qaoa", 2, 4), ("qaoa", 4, 4),
    ("cnot", 2, 4), ("cnot", 4, 6),
    ("cnot_nonuniform", 2, 8), ("cnot3", 2, 6),
    ("exact_after_4", 2, 12),
    ("full15", 2, 15), ("su4", 2, 15), ("suN", 4, 63),
]


@pytest.mark.parametrize("name,D,n_par", CASES)
def test_state_ansatz_unitary(name, D, n_par):
    p = jax.random.normal(jax.random.PRNGKey(0), (n_par,)) * 0.4
    U = ansatze.STATE_ANSATZE[name](D, p)
    n_qubits = int(D).bit_length() - 1 + 1 if name not in ("suN",) else int(2 * D).bit_length() - 1
    assert U.shape[0] == U.shape[1]
    assert unitary_err(U) < 1e-9, name


def test_env_ansatze_unitary(key):
    p6 = jax.random.normal(key, (6,))
    assert unitary_err(ansatze.env_vr(p6)) < 1e-10
    p4 = jax.random.normal(key, (4,))
    assert unitary_err(ansatze.shallow_env(4, p4)) < 1e-10
    assert unitary_err(ansatze.state_gate(p6)) < 1e-10


def test_ops_faces_match_compiled(key):
    """The ops list compiles to the same unitary as the compiled face."""
    p = jax.random.normal(key, (15,)) * 0.3
    ops, n = ansatze.shallow_full_state_ops(p)
    np.testing.assert_allclose(
        np.asarray(circuit_unitary(ops, n)),
        np.asarray(ansatze.shallow_full_state(p)),
        atol=1e-12,
    )


def test_scars_gates_unitary(key):
    p = jax.random.normal(key, (4,))
    assert unitary_err(ansatze.scar_gate(p)) < 1e-9
    assert unitary_err(ansatze.scars_ansatz(p[:2])) < 1e-9


def test_hardware_gates_unitary(key):
    from qmps_tpu.circuits import hardware

    p3 = jax.random.normal(key, (3,))
    for U in (
        hardware.V_env_gate(p3),
        hardware.right_environment_gate(p3),
        hardware.CPHASE_gate(0.3, 0.2, 0.1, 0.4),
        hardware.TFIM_trotter_gate(0.5, 0.3, 0.1, 0.2, 0.15),
        hardware.ry_sqrtiswap_layer_gate(2, jax.random.normal(key, (4,))),
    ):
        assert unitary_err(U) < 1e-9
