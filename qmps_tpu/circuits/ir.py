"""Circuit-to-tensor compiler.

The reference simulates every objective with cirq/qiskit statevector
simulators in the scipy optimization loop (SURVEY.md L6).  Here a circuit is
just a Python list of ``(U, wires)`` dense gate applications that trace into
one fused XLA computation: jit once, then grad/vmap/shard_map freely.

Conventions match cirq: qubit 0 is the most significant bit of the state
index; ops listed first are applied first.
"""
from __future__ import annotations

from typing import Iterable, Sequence, Tuple

import jax.numpy as jnp

from ..config import CDTYPE

Op = Tuple[jnp.ndarray, Sequence[int]]


def apply_unitary(psi: jnp.ndarray, U: jnp.ndarray, wires: Sequence[int], n: int) -> jnp.ndarray:
    """Apply a (2^k, 2^k) gate to qubits ``wires`` of an n-qubit state."""
    k = len(wires)
    psi = psi.reshape((2,) * n)
    Ut = U.reshape((2,) * (2 * k))
    psi = jnp.tensordot(Ut, psi, [list(range(k, 2 * k)), list(wires)])
    psi = jnp.moveaxis(psi, list(range(k)), list(wires))
    return psi.reshape(-1)


def circuit_state(
    ops: Iterable[Op], n: int, psi0: jnp.ndarray | None = None, dtype=CDTYPE
) -> jnp.ndarray:
    """Run the circuit on |0...0> (or psi0) and return the state vector."""
    if psi0 is None:
        psi = jnp.zeros((2**n,), dtype).at[0].set(1.0)
    else:
        psi = psi0.astype(dtype)
    for U, wires in ops:
        psi = apply_unitary(psi, U.astype(dtype), wires, n)
    return psi


def circuit_unitary(ops: Iterable[Op], n: int, dtype=CDTYPE) -> jnp.ndarray:
    """Compile the circuit to its dense (2^n, 2^n) unitary."""
    U = jnp.eye(2**n, dtype=dtype)
    # treat the unitary as 2^n states stacked along columns
    Ut = U.reshape((2,) * n + (2**n,))
    for g, wires in ops:
        k = len(wires)
        gt = g.astype(dtype).reshape((2,) * (2 * k))
        Ut = jnp.tensordot(gt, Ut, [list(range(k, 2 * k)), list(wires)])
        Ut = jnp.moveaxis(Ut, list(range(k)), list(wires))
    return Ut.reshape(2**n, 2**n)


def dagger_ops(ops: Sequence[Op]) -> list:
    """Inverse circuit: reversed order, conjugate-transposed gates."""
    return [(jnp.swapaxes(U.conj(), -1, -2), wires) for U, wires in reversed(list(ops))]
