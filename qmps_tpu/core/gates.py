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

from ..config import CDTYPE
from .paulis import I2, X, Y, Z, kron_all

H = jnp.array([[1, 1], [1, -1]], dtype=CDTYPE) / jnp.sqrt(2.0)
S = jnp.array([[1, 0], [0, 1j]], dtype=CDTYPE)
S_DAG = jnp.array([[1, 0], [0, -1j]], dtype=CDTYPE)
T = jnp.array([[1, 0], [0, jnp.exp(1j * jnp.pi / 4)]], dtype=CDTYPE)

CNOT = jnp.array(
    [[1, 0, 0, 0], [0, 1, 0, 0], [0, 0, 0, 1], [0, 0, 1, 0]], dtype=CDTYPE
)
CZ = jnp.diag(jnp.array([1, 1, 1, -1], dtype=CDTYPE))
SWAP = jnp.array(
    [[1, 0, 0, 0], [0, 0, 1, 0], [0, 1, 0, 0], [0, 0, 0, 1]], dtype=CDTYPE
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


SQRT_ISWAP = iswap_pow(0.5)
SQRT_ISWAP_INV = iswap_pow(-0.5)
