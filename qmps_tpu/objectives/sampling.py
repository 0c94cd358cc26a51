"""Finite-shot (sampled) measurement layer.

Shot-noise emulation of the reference's sampled objectives: bloch-vector
tomography (qmps/tools.py:308-332), Pauli-string energy measurement
(qmps/ground_state.py:32-108), the destructive swap test
(qmps/qiskit_qmps.py:64-130) and sampled TDVP amplitudes
(scripts/loschmidt.py:279-318).  Sampling is jax.random.categorical over
the exact distribution — jit/vmap-friendly, reproducible by key.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..core import gates as g
from ..circuits.ir import apply_unitary, circuit_state


def sample_bitstrings(key, psi: jnp.ndarray, shots: int) -> jnp.ndarray:
    """(shots,) basis-state indices sampled from |psi|^2."""
    probs = jnp.abs(psi) ** 2
    return jax.random.categorical(key, jnp.log(probs + 1e-300), shape=(shots,))


def sampled_qubit_z(key, psi: jnp.ndarray, qubit: int, n: int, shots: int) -> jnp.ndarray:
    """Mean measured bit of one qubit (z basis)."""
    idx = sample_bitstrings(key, psi, shots)
    bits = (idx >> (n - 1 - qubit)) & 1
    return bits.mean()


def sampled_bloch_vector(key, psi: jnp.ndarray, qubit: int, n: int, shots: int = 10**6):
    """-2<bit> + 1 in the x/y/z bases (qmps/tools.py:308-332 conventions)."""
    kx, ky, kz = jax.random.split(key, 3)
    z = sampled_qubit_z(kz, psi, qubit, n, shots)
    psi_y = apply_unitary(apply_unitary(psi, g.S_DAG, (qubit,), n), g.H, (qubit,), n)
    y = sampled_qubit_z(ky, psi_y, qubit, n, shots)
    psi_x = apply_unitary(psi, g.H, (qubit,), n)
    x = sampled_qubit_z(kx, psi_x, qubit, n, shots)
    return -2 * jnp.stack([x, y, z]) + 1


def pauli_measure_ops(string: str):
    """Basis-change ops so that measuring qubit 0 in z reads the 2-qubit
    Pauli string (PauliMeasure gate, qmps/ground_state.py:32-64)."""
    assert len(string) == 2 and string != "II"
    i, j = string
    ops = []
    if i == "I":
        ops.append((g.SWAP, (0, 1)))
        i, j = j, i
    for ch, q in ((i, 0), (j, 1)):
        if ch == "X":
            ops.append((g.H, (q,)))
        elif ch == "Y":
            ops.append((g.S_DAG, (q,)))
            ops.append((g.H, (q,)))
    if i != "I" and j != "I":
        ops.append((g.CNOT, (1, 0)))
    return ops


def measure_energy(key, strings: dict, psi: jnp.ndarray, qubits=(1, 2), shots: int = 300000):
    """Sampled <H> for a Pauli-string Hamiltonian on two adjacent qubits of
    psi (Hamiltonian.measure_energy, qmps/ground_state.py:97-108)."""
    n = int(psi.shape[0]).bit_length() - 1
    ev = 0.0
    for string, coef in strings.items():
        key, sub = jax.random.split(key)
        phi = psi
        for U, wires in pauli_measure_ops(string):
            phi = apply_unitary(phi, U, tuple(qubits[w] for w in wires), n)
        b = sampled_qubit_z(sub, phi, qubits[0], n, shots)
        ev = ev + jnp.real(jnp.asarray(coef)) * (1 - 2 * b)
    return ev


def swap_test_p11(key, psi1: jnp.ndarray, psi2: jnp.ndarray, shots: int):
    """Destructive swap test: P(11) across the two single-qubit registers
    estimates (1 - Tr[rho sigma])/2 (qmps/qiskit_qmps.py:64-130)."""
    n1 = int(psi1.shape[0]).bit_length() - 1
    n2 = int(psi2.shape[0]).bit_length() - 1
    psi = jnp.kron(psi1, psi2)
    n = n1 + n2
    # compare qubit 0 of each register
    ops = [(g.CNOT, (0, n1)), (g.H, (0,))]
    for U, wires in ops:
        psi = apply_unitary(psi, U, wires, n)
    idx = sample_bitstrings(key, psi, shots)
    b0 = (idx >> (n - 1)) & 1
    b1 = (idx >> (n - 1 - n1)) & 1
    return jnp.mean(b0 * b1)


def sampled_trace_distance(key, U: jnp.ndarray, V: jnp.ndarray, shots: int = 10**5):
    """Sampled Tr[(rho-sigma)^2] via three destructive swap tests
    (trace_distance_cost_function, qmps/represent.py:116-175):
    r_s, r^2, s^2 from P(11) counts, score = r^2 + s^2 - 2 r_s."""
    from ..env.variational import state_circuit_psi

    kv = int(V.shape[0]).bit_length() - 1
    psi_state = state_circuit_psi(U, V, 1)
    psi_env = circuit_state([(V, tuple(range(kv)))], kv)
    k1, k2, k3 = jax.random.split(key, 3)
    rs = 1 - 2 * swap_test_p11(k1, psi_state, psi_env, shots)
    rr = 1 - 2 * swap_test_p11(k2, psi_state, psi_state, shots)
    ss = 1 - 2 * swap_test_p11(k3, psi_env, psi_env, shots)
    return jnp.abs(rr + ss - 2 * rs)


def sampled_p0(key, psi: jnp.ndarray, shots: int) -> jnp.ndarray:
    """Fraction of all-zero outcomes (the sampled TDVP amplitude estimator,
    scripts/loschmidt.py:315-317)."""
    idx = sample_bitstrings(key, psi, shots)
    return jnp.mean((idx == 0).astype(jnp.float64))


def sampled_noisy_p0(key, rho: jnp.ndarray, shots: int) -> jnp.ndarray:
    """Sampled P(0...0) from a density matrix (binomial shot noise on the
    exact probability)."""
    p0 = jnp.real(rho[0, 0])
    counts = jax.random.bernoulli(key, jnp.clip(p0, 0.0, 1.0), shape=(shots,))
    return counts.mean()
