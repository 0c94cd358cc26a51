"""Dense gate set, cirq-convention (big-endian: qubit 0 = most significant).

These are the building blocks the circuit compiler (qmps_tpu.circuits) uses.
Matrix conventions are chosen to match cirq exactly so that ansatz unitaries
agree numerically with the reference circuits:

- ``rx/ry/rz(t) = expm(-i t P / 2)``             (cirq.rx etc.)
- ``pow_gate(P, t) = P_+ + e^{i pi t} P_-``      (cirq.XPowGate / ZZPowGate ...)
- ``iswap_pow(t)``: rotation by pi*t/2 in the {01, 10} block (cirq.ISwapPowGate)

Reference ansatz circuits: qmps/represent.py:268-442, experiments/Jamie.py.
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..config import CDTYPE, NP_CDTYPE
from .paulis import I2, X, Y, Z, kron_all

# host numpy constants (see config.py: device constants cannot be captured
# into jits on backends without complex device->host transfer)
H = np.array([[1, 1], [1, -1]], dtype=NP_CDTYPE) / np.sqrt(2.0)
S = np.array([[1, 0], [0, 1j]], dtype=NP_CDTYPE)
S_DAG = np.array([[1, 0], [0, -1j]], dtype=NP_CDTYPE)
T = np.array([[1, 0], [0, np.exp(1j * np.pi / 4)]], dtype=NP_CDTYPE)

CNOT = np.array(
    [[1, 0, 0, 0], [0, 1, 0, 0], [0, 0, 0, 1], [0, 0, 1, 0]], dtype=NP_CDTYPE
)
CZ = np.diag(np.array([1, 1, 1, -1], dtype=NP_CDTYPE))
SWAP = np.array(
    [[1, 0, 0, 0], [0, 0, 1, 0], [0, 1, 0, 0], [0, 0, 0, 1]], dtype=NP_CDTYPE
)


def rx(t):
    t = jnp.asarray(t, CDTYPE)
    return jnp.cos(t / 2) * I2 - 1j * jnp.sin(t / 2) * X


def ry(t):
    t = jnp.asarray(t, CDTYPE)
    return jnp.cos(t / 2) * I2 - 1j * jnp.sin(t / 2) * Y


def rz(t):
    t = jnp.asarray(t, CDTYPE)
    return jnp.cos(t / 2) * I2 - 1j * jnp.sin(t / 2) * Z


def rot(pauli_op, t):
    """expm(-i t P / 2) for any involutory Pauli-like operator P."""
    t = jnp.asarray(t, CDTYPE)
    n = pauli_op.shape[0]
    return jnp.cos(t / 2) * jnp.eye(n, dtype=CDTYPE) - 1j * jnp.sin(t / 2) * pauli_op


def pow_gate(P, t):
    """cirq PowGate semantics for an involutory P: P_+ + e^{i pi t} P_-.

    Equals e^{i pi t/2} (cos(pi t/2) I - i sin(pi t/2) P).
    """
    t = jnp.asarray(t, CDTYPE)
    n = P.shape[0]
    eye = jnp.eye(n, dtype=CDTYPE)
    return jnp.exp(1j * jnp.pi * t / 2) * (
        jnp.cos(jnp.pi * t / 2) * eye - 1j * jnp.sin(jnp.pi * t / 2) * P
    )


def x_pow(t):
    return pow_gate(X, t)


def z_pow(t):
    """cirq.ZPowGate: diag(1, e^{i pi t})."""
    t = jnp.asarray(t, CDTYPE)
    return jnp.array([[1, 0], [0, 0]], CDTYPE) + jnp.exp(1j * jnp.pi * t) * jnp.array(
        [[0, 0], [0, 1]], CDTYPE
    )


def xx_pow(t):
    return pow_gate(kron_all([X, X]), t)


def yy_pow(t):
    return pow_gate(kron_all([Y, Y]), t)


def zz_pow(t):
    return pow_gate(kron_all([Z, Z]), t)


def cnot_pow(t):
    """cirq.CNotPowGate: |0><0| (x) I + |1><1| (x) X^t."""
    P0 = jnp.array([[1, 0], [0, 0]], CDTYPE)
    P1 = jnp.array([[0, 0], [0, 1]], CDTYPE)
    return jnp.kron(P0, I2) + jnp.kron(P1, x_pow(t))


def cry(t):
    """Controlled-Ry(t) (xmps.spin.CRy analogue)."""
    P0 = jnp.array([[1, 0], [0, 0]], CDTYPE)
    P1 = jnp.array([[0, 0], [0, 1]], CDTYPE)
    return jnp.kron(P0, I2) + jnp.kron(P1, ry(t))


def iswap_pow(t):
    """cirq.ISwapPowGate(exponent=t): rotation in the {01, 10} block."""
    t = jnp.asarray(t, CDTYPE)
    c, s = jnp.cos(jnp.pi * t / 2), jnp.sin(jnp.pi * t / 2)
    U = jnp.eye(4, dtype=CDTYPE)
    U = U.at[1, 1].set(c)
    U = U.at[2, 2].set(c)
    U = U.at[1, 2].set(1j * s)
    U = U.at[2, 1].set(1j * s)
    return U


def _np_iswap_pow(t):
    c, s_ = np.cos(np.pi * t / 2), np.sin(np.pi * t / 2)
    U = np.eye(4, dtype=NP_CDTYPE)
    U[1, 1] = U[2, 2] = c
    U[1, 2] = U[2, 1] = 1j * s_
    return U


SQRT_ISWAP = _np_iswap_pow(0.5)
SQRT_ISWAP_INV = _np_iswap_pow(-0.5)
