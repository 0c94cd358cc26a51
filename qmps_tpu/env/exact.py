"""Exact environments from transfer-matrix fixed points.

Reference: qmps/tools.py:176-186 (dense scipy eig + cholesky).  Here the
fixed point comes from the differentiable solvers in mps.transfer, so
environment construction sits inside jit/grad/vmap.
"""
from __future__ import annotations

import jax.numpy as jnp

from ..core.linalg import cT
from ..embed.unitaries import environment_to_unitary, unitary_to_tensor
from ..mps import transfer as tr


def _env_C_from_tensor(A: jnp.ndarray) -> jnp.ndarray:
    """C with C C^dag = r, the right fixed point of A's transfer operator."""
    _, r = tr.right_fixed_point(A, A)
    r = (r + cT(r)) / 2
    r = r / jnp.trace(r)
    eps = 1e-14
    C = jnp.linalg.cholesky(r + eps * jnp.eye(r.shape[0], dtype=r.dtype))
    return C


def get_env_exact_C(U: jnp.ndarray) -> jnp.ndarray:
    """The environment 'square root' C for a state unitary U."""
    return _env_C_from_tensor(unitary_to_tensor(U))


def get_env_exact(U: jnp.ndarray) -> jnp.ndarray:
    """State unitary U -> environment unitary V with V|0..0> = vec(C),
    rho_top = C C^dag = r (reference get_env_exact, qmps/tools.py:176-182)."""
    C = get_env_exact_C(U)
    return environment_to_unitary(C.reshape(-1))


def power_method_env(U: jnp.ndarray, k: int, v0: jnp.ndarray | None = None):
    """Power-method environment: apply the transfer operator k times to an
    initial guess (the PowerCircuit capability, qmps/represent.py:235-248,
    done as a contraction instead of K stacked circuit copies)."""
    A = unitary_to_tensor(U)
    D = A.shape[1]
    r = jnp.eye(D, dtype=A.dtype) / D if v0 is None else v0
    for _ in range(k):
        r = tr.right_matvec(A, A, r)
        r = r / jnp.linalg.norm(r)
    from ..core.linalg import rotate_to_hermitian

    r = rotate_to_hermitian(r)
    return r / jnp.trace(r)
