"""Deep brick-wall uMPS ansatz: bond dimension D = 2^(n-1) from a
depth-d wall of parameterized SU(4) bricks on n qubits.

BASELINE config 5 ("D=32-64 deep brickwork"): instead of optimizing the
full (2D, D) Stiefel isometry (optim/riemann.py) or the su(2D) global
chart, the MPS unitary is a brick-wall circuit — depth layers of 2-qubit
KAK bricks at alternating even/odd offsets — so the parameter count grows
like depth * n * 19 instead of (2D)^2.  This is the deep-circuit analogue
of the reference's 2-brick gen-2 cell (new_tdvp/BrickWallMPS.py:16-43)
and of its ladder-circuit bond-dimension experiments
(qmps/tools.py:396-420, scripts/bond_dimension.py), rebuilt on the
op-list IR so the same wall compiles to a dense unitary for the energy
path and exports through ``circuits.export.to_openqasm`` unchanged.

The dense unitary build is a chain of (4 x 4) x (4, 4^(n-1)) gate
contractions — static shapes, fully fused by XLA; the energy itself runs
through the shared isometry path (optim/riemann.isometry_energy): dense
repeated-squaring environments at small D, the restarted-Arnoldi + GMRES
implicit-adjoint matvec path at D = 32-64.
"""
from __future__ import annotations

from typing import List, Sequence, Tuple

import jax
import jax.numpy as jnp

from ..core.lie import U4_kak

BRICK_PARAMS = 19  # per-brick KAK parameter count (core/lie.U4_kak)


def brick_layout(n_qubits: int, depth: int) -> List[Tuple[int, int]]:
    """Static wire pairs of the depth-layer brick wall: layer k applies
    bricks on (i, i+1) for i = k%2, k%2+2, ... — widest coverage with
    alternating offsets (the gen-2 cell is the n=2, depth=2 instance)."""
    pairs: List[Tuple[int, int]] = []
    for k in range(depth):
        pairs += [(i, i + 1) for i in range(k % 2, n_qubits - 1, 2)]
    return pairs


def n_brick_params(n_qubits: int, depth: int) -> int:
    return BRICK_PARAMS * len(brick_layout(n_qubits, depth))


def brick_wall_ops(params, n_qubits: int, depth: int):
    """``[(U, wires)]`` op list of the wall — the IR face, consumable by
    circuit_unitary/circuit_state, the noise layers, and the QASM export."""
    layout = brick_layout(n_qubits, depth)
    p = jnp.asarray(params).reshape(len(layout), BRICK_PARAMS)
    bricks = jax.vmap(U4_kak)(p)
    return [(bricks[b], layout[b]) for b in range(len(layout))]


def brick_wall_unitary(params, n_qubits: int, depth: int) -> jnp.ndarray:
    """Dense (2^n, 2^n) unitary of the wall."""
    from .ir import circuit_unitary

    return circuit_unitary(brick_wall_ops(params, n_qubits, depth), n_qubits)


def brick_wall_tensor(params, D: int, depth: int) -> jnp.ndarray:
    """(2, D, D) left-canonical uMPS tensor of the depth-d wall at bond
    dimension D = 2^(n-1) (D must be a power of two)."""
    from ..embed import unitary_to_tensor

    n = _n_qubits(D)
    return unitary_to_tensor(brick_wall_unitary(params, n, depth))


def _n_qubits(D: int) -> int:
    n = int(D).bit_length()  # 2D = 2^n  ->  n = log2(D) + 1
    if 2 ** (n - 1) != D:
        raise ValueError(f"deep brickwork needs a power-of-two D, got {D}")
    return n
