"""Pauli algebra and tensor-product helpers.

Conventions match the reference (which uses xmps.spin.paulis(0.5) == the full
Pauli sigma matrices; see /root/reference/scripts/ground_state_finding.py:16
where the TFIM built from these matches the full-Pauli exact energy integral).
"""
from __future__ import annotations

from functools import reduce
from typing import Sequence

import jax.numpy as jnp
import numpy as np

from ..config import NP_CDTYPE

# host numpy constants (device constants can't be captured into jits on
# backends without complex device->host transfer; see config.py)
I2 = np.eye(2, dtype=NP_CDTYPE)
X = np.array([[0, 1], [1, 0]], dtype=NP_CDTYPE)
Y = np.array([[0, -1j], [1j, 0]], dtype=NP_CDTYPE)
Z = np.array([[1, 0], [0, -1]], dtype=NP_CDTYPE)

#: single-qubit Pauli dict used by the Hamiltonian string builder
#: (reference: qmps/ground_state.py:29-30).
PAULI = {"I": I2, "X": X, "Y": Y, "Z": Z}


def paulis():
    """(X, Y, Z) — the trio the reference unpacks everywhere."""
    return X, Y, Z


def kron_all(ops: Sequence[jnp.ndarray]) -> jnp.ndarray:
    """Tensor product of a list of matrices (reference `mb`/`multi_tensor`)."""
    return reduce(jnp.kron, ops)


def pauli_string(s: str) -> jnp.ndarray:
    """'ZZ' -> Z (x) Z etc."""
    return kron_all([PAULI[c] for c in s])


def embed(op: jnp.ndarray, loc: int, n_qubits: int) -> jnp.ndarray:
    """I^loc (x) op (x) I^rest on n_qubits total (op may span several qubits).

    Shapes are static under jit, so the qubit count of ``op`` is a Python int.
    """
    k = int(op.shape[0]).bit_length() - 1
    ops = [I2] * loc + [op] + [I2] * (n_qubits - loc - k)
    return kron_all(ops)
