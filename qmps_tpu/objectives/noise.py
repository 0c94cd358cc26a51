"""Depolarizing-noise circuit semantics (density-matrix path).

The reference inserts a ConstantQubitNoiseModel(depolarize(p)) channel after
every circuit moment (qmps/ground_state.py:337-480, scripts/loschmidt.py:
241-318).  Here the density matrix of the elementary-gate circuit is
evolved exactly: after each gate-moment every qubit passes through the
depolarizing channel

    rho -> (1 - p) rho + (p/3)(X rho X + Y rho Y + Z rho Z).

Everything is a pure jitted function of (params, p) — differentiable in
both, so noisy optimization runs with gradients too (the reference could
only Nelder-Mead through its noisy objectives).
"""
from __future__ import annotations

from typing import Iterable, Sequence, Tuple

import jax.numpy as jnp

from ..config import CDTYPE
from ..core.paulis import X, Y, Z, kron_all

Op = Tuple[jnp.ndarray, Sequence[int]]


def _apply_gate_rho(rho, U, wires, n):
    """rho -> U rho U^dag on the given wires."""
    k = len(wires)
    Ut = U.reshape((2,) * (2 * k))
    rho = rho.reshape((2,) * (2 * n))
    # ket side
    rho = jnp.tensordot(Ut, rho, [list(range(k, 2 * k)), list(wires)])
    rho = jnp.moveaxis(rho, list(range(k)), list(wires))
    # bra side
    bra_wires = [n + w for w in wires]
    rho = jnp.tensordot(Ut.conj(), rho, [list(range(k, 2 * k)), bra_wires])
    rho = jnp.moveaxis(rho, list(range(k)), bra_wires)
    return rho.reshape(2**n, 2**n)


def depolarize_qubit(rho, q, n, p):
    """Single-qubit depolarizing channel on qubit q."""
    out = (1 - p) * rho
    for P in (X, Y, Z):
        out = out + (p / 3.0) * _apply_gate_rho(rho, P, (q,), n)
    return out


def noisy_circuit_rho(ops: Iterable[Op], n: int, p: float, rho0=None) -> jnp.ndarray:
    """Evolve |0..0><0..0| through the circuit, depolarizing every qubit
    after each gate-moment (cirq noisy_moment semantics with one gate per
    moment)."""
    if rho0 is None:
        rho = jnp.zeros((2**n, 2**n), CDTYPE).at[0, 0].set(1.0)
    else:
        rho = rho0.astype(CDTYPE)
    for U, wires in ops:
        rho = _apply_gate_rho(rho, U.astype(CDTYPE), wires, n)
        for q in range(n):
            rho = depolarize_qubit(rho, q, n, p)
    return rho


def noisy_energy(
    state_ops: Sequence[Op],
    n_state: int,
    V: jnp.ndarray,
    h: jnp.ndarray,
    p: float,
) -> jnp.ndarray:
    """Noisy State(U, V, 2) energy (NoisySparseFullEnergyOptimizer,
    qmps/ground_state.py:453-477): V at the bottom, two copies of the
    elementary-gate state circuit walking up, depolarization per moment,
    E = Tr[rho (I_D (x) h (x) I_D)]."""
    kv = int(V.shape[0]).bit_length() - 1
    n = 2 + kv
    D = 2 ** (kv // 2)
    ops = [(V, tuple(range(2, 2 + kv)))]
    ops += [(U, tuple(w + 1 for w in wires)) for U, wires in state_ops]
    ops += list(state_ops)
    rho = noisy_circuit_rho(ops, n, p)
    eye = jnp.eye(D, dtype=CDTYPE)
    H = kron_all([eye, h.astype(CDTYPE), eye])
    return jnp.trace(rho @ H).real


def noisy_tdvp_amplitude(
    A: jnp.ndarray, B: jnp.ndarray, W: jnp.ndarray, r: jnp.ndarray, p: float
) -> jnp.ndarray:
    """P(|0...0>) of the noisy 6-qubit Bell-form TDVP circuit
    (scripts/loschmidt.py:241-277 noisy_obj): returns rho[0, 0]."""
    from .overlap import bell_tdvp_ops

    rho = noisy_circuit_rho(bell_tdvp_ops(A, B, W, r), 6, p)
    return rho[0, 0].real


def noisy_sampled_tdvp_objective(A, B, W, p: float, key, shots: int = 5000) -> jnp.ndarray:
    """Noise + finite shots (scripts/loschmidt.py:279-318 noisy_sampled_obj):
    estimate P(|0...0>) of the noisy circuit from ``shots`` measurements,
    return -sqrt(2 sqrt(p0_hat))."""
    from ..mps import transfer as tr
    from .overlap import mixed_transfer_with_gate
    from .sampling import sampled_noisy_p0

    WAA, BB = mixed_transfer_with_gate(A, B, W)
    _, r = tr.right_fixed_point(WAA, BB)
    rho00 = noisy_tdvp_amplitude(A, B, W, r, p)
    import jax

    p0_hat = sampled_noisy_p0(key, jnp.array([[rho00]], CDTYPE), shots)
    return -jnp.sqrt(2.0 * jnp.sqrt(jnp.maximum(p0_hat, 0.0)))


def noisy_tdvp_objective(A, B, W, p: float) -> jnp.ndarray:
    """-sqrt(2 sqrt(P0)): the noisy Loschmidt TDVP cost
    (scripts/loschmidt.py:276-277 up to the monotone sqrt)."""
    from ..mps import transfer as tr
    from .overlap import mixed_transfer_with_gate

    WAA, BB = mixed_transfer_with_gate(A, B, W)
    _, r = tr.right_fixed_point(WAA, BB)
    p0 = noisy_tdvp_amplitude(A, B, W, r, p)
    return -jnp.sqrt(2.0 * jnp.sqrt(jnp.maximum(p0, 0.0)))
