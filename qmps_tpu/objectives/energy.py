"""Energy objectives as pure jitted functions of the circuit parameters.

The reference evaluates each energy by building a cirq circuit and
simulating the statevector inside a Nelder-Mead loop
(qmps/ground_state.py:150-335).  Here the fast path contracts the uniform
MPS directly (identical value, no 2^n state), and a circuit path reproduces
the reference's exact construction for parity/noise/sampling semantics.
"""
from __future__ import annotations

import jax.numpy as jnp

from ..config import CDTYPE
from ..core.linalg import cT
from ..core.paulis import kron_all
from ..circuits.ir import circuit_state
from ..embed.unitaries import unitary_to_tensor
from ..env.exact import get_env_exact
from ..env.variational import reduced_density_matrix, state_circuit_psi
from ..mps import transfer as tr
from ..mps.imps import merge


def _right_env(A):
    _, r = tr.right_fixed_point(A, A)
    r = (r + cT(r)) / 2
    return r / jnp.trace(r)


def energy_exact_env(U: jnp.ndarray, h: jnp.ndarray) -> jnp.ndarray:
    """<h> of the uMPS defined by state unitary U, exact environment.

    Fast path: U's isometry block is automatically left-canonical, so the
    energy is a single blocked-transfer contraction — no State(U,V,2)
    circuit, no environment unitary (they cancel exactly).
    """
    A = unitary_to_tensor(U)
    r = _right_env(A)
    A2 = merge(A, A)
    # h[t, s]: BRA index t on the conjugated tensor ("st" computed <h^T>,
    # wrong for Hamiltonians with asymmetric matrices, e.g. XY + YX terms)
    return jnp.einsum("ts,sij,jk,tik->", h.astype(A.dtype), A2, r, A2.conj()).real


def energy_circuit(U: jnp.ndarray, h: jnp.ndarray, V: jnp.ndarray | None = None) -> jnp.ndarray:
    """The reference's circuit evaluation: psi = State(U, V, 2)|0>,
    E = <psi| I_D (x) h (x) I_D |psi> (qmps/ground_state.py:159-167)."""
    if V is None:
        V = get_env_exact(U)
    D = U.shape[0] // 2
    psi = state_circuit_psi(U, V, 2)
    H = kron_all([jnp.eye(D, dtype=CDTYPE), h.astype(CDTYPE), jnp.eye(D, dtype=CDTYPE)])
    return jnp.real(psi.conj() @ (H @ psi))


def energy_two_site(U1: jnp.ndarray, U2: jnp.ndarray, h: jnp.ndarray) -> jnp.ndarray:
    """2-site unit cell energy, averaged over the two bond types
    (NonSparseFullTwoSiteEnergyOptimizer, qmps/ground_state.py:271-331)."""
    A1 = unitary_to_tensor(U1)
    A2 = unitary_to_tensor(U2)

    def bond_energy(Aa, Ab):
        A12 = merge(Aa, Ab)
        r = _right_env(A12)
        return jnp.einsum(
            "ts,sij,jk,tik->", h.astype(Aa.dtype), A12, r, A12.conj()
        ).real

    return (bond_energy(A1, A2) + bond_energy(A2, A1)) / 2


def energy_joint_env_purity(params, h: jnp.ndarray, k: float = 1.0, gate=None) -> jnp.ndarray:
    """Joint (state, environment) optimization with the swap-test purity
    penalty (SparseFullEnergyOptimizer.objective_function_opt_environment,
    qmps/ground_state.py:170-228):

        E + k (Tr rho_u^2 + Tr rho_v^2 - 2 Tr rho_u rho_v)

    where rho_u is the bond density matrix of the state column and rho_v of
    the environment column; the penalty vanishes iff the environment matches
    the state's fixed point.  params = [p_state(15), p_env(15)] by default.
    """
    from ..circuits.ansatze import shallow_full_state

    gate = shallow_full_state if gate is None else gate
    p2, p1 = params[: len(params) // 2], params[len(params) // 2 :]
    Uu, Uv = gate(p2), gate(p1)

    # energy circuit: V on qubits (2,3), U on (1,2), U on (0,1)
    psi_e = circuit_state([(Uv, (2, 3)), (Uu, (1, 2)), (Uu, (0, 1))], 4)
    H = kron_all([jnp.eye(2, dtype=CDTYPE), h.astype(CDTYPE), jnp.eye(2, dtype=CDTYPE)])
    energy = jnp.real(psi_e.conj() @ (H @ psi_e))

    # purities via reduced density matrices (equal to the reference's
    # swap-test circuit values)
    psi_v = circuit_state([(Uv, (0, 1))], 2)
    rho_v = reduced_density_matrix(psi_v, [0], 2)
    psi_u = circuit_state([(Uv, (1, 2)), (Uu, (0, 1))], 3)
    rho_u = reduced_density_matrix(psi_u, [0], 3)

    v_pur = jnp.trace(rho_v @ rho_v).real
    u_pur = jnp.trace(rho_u @ rho_u).real
    uv_pur = jnp.trace(rho_u @ rho_v).real
    return energy + k * u_pur + k * v_pur - 2 * k * uv_pur
