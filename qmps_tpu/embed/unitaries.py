"""Tensor <-> unitary and environment <-> unitary embeddings.

Differentiable, jittable versions of the reference's null-space
constructions:

- tensor_to_unitary / unitary_to_tensor   (qmps/tools.py:123-154)
- environment_to_unitary / _from_unitary  (qmps/tools.py:97-120)
- put_env_on_left_site / right_site       (qmps/time_evolve_tools.py:38-74)

A left-canonical MPS tensor A (d, D, D) embeds as the isometry
iso[(i, s), j] = A[s, i, j] completed to a unitary whose first D columns are
iso; the state-preparation circuits only ever address those columns (fresh
qubits enter in |0>), so the choice of completion is gauge.
"""
from __future__ import annotations

import jax.numpy as jnp

from ..core.linalg import row_completion, unitary_completion
from ..core.gates import SWAP


def tensor_to_unitary(A: jnp.ndarray) -> jnp.ndarray:
    """Left-canonical (d, D, D) tensor -> (d D, d D) unitary, first D columns
    = the isometry (reference qmps/tools.py:123-148)."""
    d, D, _ = A.shape
    iso = jnp.transpose(A, (1, 0, 2)).reshape(D * d, D)
    return unitary_completion(iso)


def unitary_to_tensor(U: jnp.ndarray) -> jnp.ndarray:
    """(2^n, 2^n) unitary -> (2, 2^(n-1), 2^(n-1)) MPS tensor
    (reference qmps/tools.py:151-154): contract the first input qubit with
    |0> and split the remaining legs."""
    n = int(U.shape[0]).bit_length() - 1
    T = U.reshape((2,) * (2 * n))
    e0 = jnp.array([1.0, 0.0], U.dtype)
    T = jnp.tensordot(T, e0, [[n], [0]])  # kill first input index
    return T.reshape(2 ** (n - 1), 2, 2 ** (n - 1)).transpose(1, 0, 2)


def environment_to_unitary(v: jnp.ndarray) -> jnp.ndarray:
    """Vector -> unitary with first column v/|v| (qmps/tools.py:97-108):
    V|0..0> prepares the environment purification."""
    v = v.reshape(-1)
    v = v / jnp.linalg.norm(v)
    return unitary_completion(v[:, None])


def environment_from_unitary(u: jnp.ndarray) -> jnp.ndarray:
    """First column of u as a (2, 2) matrix C with rho = C C^dag
    (qmps/tools.py:111-120)."""
    return u[:, 0].reshape(2, 2)


def put_env_on_left_site(q: jnp.ndarray, ret_n: bool = False):
    """Embed an arbitrary 2x2 matrix q as a 2-qubit unitary such that the
    Bell-pair circuit reads off q_{ij}/|q|_F (qmps/time_evolve_tools.py:38-53).

    Row 0 of the result (the only row the post-selected circuits address)
    matches the reference construction exactly; the remaining rows are a
    differentiable QR completion.
    """
    qT = q.T
    a, b, c, d = qT.reshape(-1)
    n = jnp.sqrt(
        jnp.abs(a) ** 2 + jnp.abs(b) ** 2 + jnp.abs(c) ** 2 + jnp.abs(d) ** 2
    )
    guess = (
        jnp.stack(
            [
                jnp.stack([a, c.conj(), b, d.conj()]),
                jnp.stack([c, -a.conj(), d, -b.conj()]),
            ]
        )
        / n
    )
    A = row_completion(guess)
    A = SWAP.astype(A.dtype) @ A
    if ret_n:
        return A, n
    return A


def get_env_off_left_site(A: jnp.ndarray) -> jnp.ndarray:
    """Inverse of put_env_on_left_site (qmps/time_evolve_tools.py:55-57)."""
    z = jnp.array([1.0, 0.0], A.dtype)
    T = A.reshape(2, 2, 2, 2)
    return jnp.tensordot(jnp.tensordot(T, z, [[3], [0]]), z, [[1], [0]]).T


def put_env_on_right_site(q: jnp.ndarray, ret_n: bool = False):
    """Mirror embedding for the left environment
    (qmps/time_evolve_tools.py:59-70)."""
    a, b, c, d = q.reshape(-1)
    n = jnp.sqrt(
        jnp.abs(a) ** 2 + jnp.abs(b) ** 2 + jnp.abs(c) ** 2 + jnp.abs(d) ** 2
    )
    guess = (
        jnp.stack(
            [
                jnp.stack([a, b, d.conj(), -c.conj()]),
                jnp.stack([c, d, -b.conj(), a.conj()]),
            ]
        )
        / n
    )
    A = row_completion(guess)
    if ret_n:
        return A, n
    return A


def get_env_off_right_site(A: jnp.ndarray) -> jnp.ndarray:
    """Inverse of put_env_on_right_site (qmps/time_evolve_tools.py:72-74)."""
    z = jnp.array([1.0, 0.0], A.dtype)
    T = A.reshape(2, 2, 2, 2)
    return jnp.tensordot(jnp.tensordot(T, z, [[2], [0]]), z, [[0], [0]])
