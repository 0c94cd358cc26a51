"""The ansatz zoo — parametrized state/environment circuits.

Each ansatz has two faces:

- ``<name>_ops(...) -> [(gate, wires), ...]``: the elementary-gate circuit
  (one gate per moment), used by the noise layer, which inserts a
  depolarizing channel after every moment exactly like the reference's
  ConstantQubitNoiseModel loop (qmps/ground_state.py:372-377).
- ``<name>(...) -> dense unitary``: the compiled matrix for the fast
  contraction paths.

Parameter layouts match the reference cirq classes exactly
(qmps/represent.py:268-442, qmps/ansatze.py, scars.py:29-67).
"""
from __future__ import annotations

import jax.numpy as jnp

from ..config import CDTYPE
from ..core import gates as g
from ..core import lie
from ..core.paulis import X
from .ir import circuit_unitary


def _n_qubits_state(D: int) -> int:
    return int(D).bit_length() - 1 + 1  # log2(D) + 1


def _split(params, k):
    params = jnp.asarray(params)
    assert params.shape[0] % k == 0, f"need multiple of {k} params"
    return params.reshape(-1, k)


def _cnot_ladder_reversed(n):
    """CNOTs n-2 -> n-1 down to 0 -> 1, the reference's reversed ladder."""
    return [(g.CNOT, (i, i + 1)) for i in reversed(range(n - 1))]


# -- state ansatze ------------------------------------------------------------


def shallow_qaoa_state_ops(D: int, params):
    """QAOA-style: X^beta layer + ZZ^gamma ladder per (beta, gamma)
    (qmps/represent.py:268-285)."""
    n = _n_qubits_state(D)
    ops = []
    for beta, gamma in _split(params, 2):
        ops += [(g.x_pow(beta), (i,)) for i in range(n)]
        ops += [(g.zz_pow(gamma), (i, i + 1)) for i in range(n - 1)]
    return ops, n


def shallow_cnot_state_ops(D: int, params):
    """rz/rx + H + reversed CNOT ladder per (beta, gamma)
    (qmps/represent.py:288-310) — the production Loschmidt ansatz."""
    n = _n_qubits_state(D)
    ops = []
    for beta, gamma in _split(params, 2):
        ops += [(g.rz(beta), (i,)) for i in range(n)]
        ops += [(g.rx(gamma), (i,)) for i in range(n)]
        ops += [(g.H, (0,))]
        ops += _cnot_ladder_reversed(n)
    return ops, n


def shallow_cnot_state_nonuniform_ops(D: int, params):
    """Per-qubit-parametrized variant (qmps/represent.py:312-332)."""
    n = _n_qubits_state(D)
    ops = []
    for p in _split(params, 2 * n):
        ops += [(g.rz(p[i]), (i,)) for i in range(n)]
        ops += [(g.rx(p[i + n]), (i,)) for i in range(n)]
        ops += _cnot_ladder_reversed(n)
    return ops, n


def shallow_cnot_state3_ops(D: int, params):
    """Three-rotation variant (qmps/represent.py:334-354)."""
    n = _n_qubits_state(D)
    ops = []
    for beta, gamma, omega in _split(params, 3):
        ops += [(g.rz(beta), (i,)) for i in range(n)]
        ops += [(g.rx(gamma), (i,)) for i in range(n)]
        ops += [(g.rz(omega), (i,)) for i in range(n)]
        ops += [(g.H, (0,))]
        ops += _cnot_ladder_reversed(n)
    return ops, n


def exact_after_4_ops(D: int, params):
    """6-params-per-layer ansatz, exact at depth 4 (qmps/represent.py:356-380)."""
    n = _n_qubits_state(D)
    ops = []
    for a, b, c, d, e, f in _split(params, 6):
        ops += [(g.rz(a), (0,)), (g.rz(d), (1,))]
        ops += [(g.rx(b), (0,)), (g.rx(e), (1,))]
        ops += [(g.rz(c), (0,)), (g.rz(f), (1,))]
        ops += _cnot_ladder_reversed(n)
        ops += [(g.SWAP, (i, i + 1 if i != n - 1 else 0)) for i in range(n)]
    return ops, n


def shallow_full_state_ops(params):
    """15-param exact SU(4) circuit decomposition (qmps/represent.py:382-404)
    — the reference's workhorse D=2 state gate."""
    p = jnp.asarray(params)
    ops = [
        (g.rz(p[0]), (0,)), (g.rx(p[1]), (0,)), (g.rz(p[2]), (0,)),
        (g.rz(p[3]), (1,)), (g.rx(p[4]), (1,)), (g.rz(p[5]), (1,)),
        (g.CNOT, (0, 1)),
        (g.ry(p[6]), (0,)),
        (g.CNOT, (1, 0)),
        (g.ry(p[7]), (0,)), (g.rz(p[8]), (1,)),
        (g.CNOT, (0, 1)),
        (g.rz(p[9]), (0,)), (g.rx(p[10]), (0,)), (g.rz(p[11]), (0,)),
        (g.rz(p[12]), (1,)), (g.rx(p[13]), (1,)), (g.rz(p[14]), (1,)),
    ]
    return ops, 2


def state_gate_ops(params):
    """6-param XX/YY state gate (qmps/represent.py:406-423), the variational
    TDVP environment gate (new_time_evolve.py obj_state)."""
    p = jnp.asarray(params)
    ops = [
        (g.rx(p[0]), (0,)), (g.rx(p[1]), (1,)),
        (g.rz(p[2]), (0,)), (g.rz(p[3]), (1,)),
        (g.xx_pow(p[4]), (0, 1)), (g.yy_pow(p[5]), (0, 1)),
    ]
    return ops, 2


def shallow_env_ops(D: int, params):
    """QAOA-style environment on 2 log2(D) qubits (qmps/represent.py:425-442)."""
    n = 2 * (int(D).bit_length() - 1)
    ops = []
    for beta, gamma in _split(params, 2):
        ops += [(g.x_pow(beta), (i,)) for i in range(n)]
        ops += [(g.zz_pow(gamma), (i, i + 1)) for i in range(n - 1)]
    return ops, n


def env_vr_ops(params):
    """6-param 2-qubit environment ansatz Vr, the reference's EXACT
    decomposition (qmps/ansatze.py:9-25): params (gamma, psi, phi,
    omega, delta, xi) ->
    YY^gamma | X^psi Z^phi on qubit 0 | Z^-xi X^-omega Z^-delta on
    qubit 1 — convention-pinned bit-for-bit in
    tests/test_reference_parity.py."""
    p = jnp.asarray(params)
    gamma, psi, phi, omega, delta, xi = (p[i] for i in range(6))
    ops = [
        (g.yy_pow(gamma), (0, 1)),
        (g.x_pow(psi), (0,)), (g.z_pow(phi), (0,)),
        (g.z_pow(-xi), (1,)), (g.x_pow(-omega), (1,)),
        (g.z_pow(-delta), (1,)),
    ]
    return ops, 2


def scars_ansatz_ops(params):
    """2-qubit PXP scars ansatz, params = [theta, phi] (scars.py:29-48)."""
    th, ph = params[0], params[1]
    pi = jnp.pi
    ops = [
        (g.z_pow(0.5 - ph / pi), (1,)),
        (X, (0,)),
        (g.CNOT, (0, 1)),
        (X, (0,)),
        (g.cnot_pow(2 * th / pi), (1, 0)),  # control on qubit 1, target 0
        (g.S, (0,)),
        (g.z_pow(-th / pi), (1,)),
    ]
    return ops, 2


def scar_gate_ops(params):
    """3-qubit 2-site scars gate, params = [th1, ph1, ph2, th2]
    (scars.py:50-67)."""
    th1, ph1, ph2, th2 = params[0], params[1], params[2], params[3]
    o2, _ = scars_ansatz_ops(jnp.stack([th2, ph2]))
    o1, _ = scars_ansatz_ops(jnp.stack([th1, ph1]))
    ops = [(U, tuple(w + 1 for w in wires)) for U, wires in o2]
    ops += o1
    return ops, 3


# -- compiled-unitary faces ---------------------------------------------------


def _compiled(ops_fn):
    def build(*args):
        ops, n = ops_fn(*args)
        return circuit_unitary(ops, n)

    return build


shallow_qaoa_state = _compiled(shallow_qaoa_state_ops)
shallow_cnot_state = _compiled(shallow_cnot_state_ops)
shallow_cnot_state_nonuniform = _compiled(shallow_cnot_state_nonuniform_ops)
shallow_cnot_state3 = _compiled(shallow_cnot_state3_ops)
exact_after_4 = _compiled(exact_after_4_ops)
shallow_full_state = _compiled(shallow_full_state_ops)
state_gate = _compiled(state_gate_ops)
shallow_env = _compiled(shallow_env_ops)
env_vr = _compiled(env_vr_ops)
scars_ansatz = _compiled(scars_ansatz_ops)
scar_gate = _compiled(scar_gate_ops)


def full_state_su4(params) -> jnp.ndarray:
    """15-param dense SU(4) via the Lie exponential (xmps.spin.U4 path used
    by NonSparseFullEnergyOptimizer at D=2)."""
    return lie.U4(params)


def full_state_suN(params, D: int) -> jnp.ndarray:
    """(2D)^2 - 1 param dense SU(2D) state unitary for arbitrary D
    (qmps/ground_state.py:245-249)."""
    return lie.SU(params, 2 * D)


def scars_tensor(th, ph) -> jnp.ndarray:
    """Analytic MPS tensor A(theta, phi) for the scars ansatz (scars.py:69-72)."""
    z = jnp.zeros((), CDTYPE)
    row0 = jnp.stack([jnp.stack([z, 1j * jnp.exp(-1j * ph)]), jnp.stack([z, z])])
    row1 = jnp.stack(
        [jnp.stack([jnp.cos(th) + 0j, z]), jnp.stack([jnp.sin(th) + 0j, z])]
    )
    return jnp.stack([row0, row1])


#: registry: name -> builder taking (D, params)
STATE_ANSATZE = {
    "qaoa": shallow_qaoa_state,
    "cnot": shallow_cnot_state,
    "cnot_nonuniform": shallow_cnot_state_nonuniform,
    "cnot3": shallow_cnot_state3,
    "exact_after_4": exact_after_4,
    "full15": lambda D, p: shallow_full_state(p),
    "su4": lambda D, p: full_state_su4(p),
    "suN": lambda D, p: full_state_suN(p, D),
}

#: ops-level registry for the noise layer: name -> fn(D, params) -> (ops, n)
STATE_ANSATZE_OPS = {
    "qaoa": shallow_qaoa_state_ops,
    "cnot": shallow_cnot_state_ops,
    "cnot_nonuniform": shallow_cnot_state_nonuniform_ops,
    "cnot3": shallow_cnot_state3_ops,
    "exact_after_4": exact_after_4_ops,
    "full15": lambda D, p: shallow_full_state_ops(p),
}
