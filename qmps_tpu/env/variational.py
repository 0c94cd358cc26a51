"""Variational environments.

Three families, as in the reference:

1. Tomography matching (qmps/represent.py:18-114): minimize the bloch-vector
   distance between the top qubit of State(U, V) and of V alone.
2. Trace-distance / destructive-swap objective (qmps/represent.py:116-175):
   Tr[(rho - sigma)^2] from three swap-test circuits.
3. Gen-2 M-ansatz matching (ClassicalTDVPStripped.py:599-655): minimize
   |eta M(p) - E[M(p)]| over (eta, p); with the dt-bounded eta variant of
   loschmidt_classical.py:196-219.

All objectives are pure jitted functions, solved with gradient descent
(optax) instead of Nelder-Mead.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import optax

from ..circuits.brickwork import env_M, right_env_map
from ..circuits.ir import circuit_state
from ..core.linalg import from_real_vector
from ..core.paulis import X, Y, Z
from ..embed.unitaries import environment_to_unitary

env_M_ansatz = env_M


def reduced_density_matrix(psi: jnp.ndarray, keep, n: int) -> jnp.ndarray:
    """Partial trace keeping the qubits in ``keep`` (cirq big-endian order)."""
    keep = list(keep)
    rest = [q for q in range(n) if q not in keep]
    T = psi.reshape((2,) * n)
    T = jnp.transpose(T, keep + rest)
    T = T.reshape(2 ** len(keep), 2 ** len(rest))
    return T @ T.conj().T


def bloch_vector(rho: jnp.ndarray) -> jnp.ndarray:
    return jnp.stack(
        [jnp.trace(rho @ P).real for P in (X, Y, Z)]
    )


def state_circuit_psi(U: jnp.ndarray, V: jnp.ndarray, n_phys: int = 1) -> jnp.ndarray:
    """|psi> of the canonical State(U, V, n) preparation
    (qmps/represent.py:251-265): V on the bottom 2k qubits, then n copies of
    U walking up."""
    ku = int(U.shape[0]).bit_length() - 1
    kv = int(V.shape[0]).bit_length() - 1
    n = n_phys + kv
    ops = [(V, tuple(range(n_phys, n_phys + kv)))]
    ops += [(U, tuple(range(i, i + ku))) for i in reversed(range(n_phys))]
    return circuit_state(ops, n)


def tomography_env_objective(U: jnp.ndarray, V: jnp.ndarray) -> jnp.ndarray:
    """|bloch(q0; State(U,V)) - bloch(q0; V)| (qmps/represent.py:88-114)."""
    kv = int(V.shape[0]).bit_length() - 1
    psi1 = state_circuit_psi(U, V, 1)
    psi2 = circuit_state([(V, tuple(range(kv)))], kv)
    b1 = bloch_vector(reduced_density_matrix(psi1, [0], 1 + kv))
    b2 = bloch_vector(reduced_density_matrix(psi2, [0], kv))
    return jnp.linalg.norm(b1 - b2)


def get_env_variational(U: jnp.ndarray, key=None, steps: int = 600, lr: float = 5e-2):
    """Variational env for a 2-qubit state unitary: optimize the 8-real-param
    environment vector (qmps/represent.py:18-53) with adam + exact gradients."""
    if key is None:
        key = jax.random.PRNGKey(0)
    v0 = jax.random.normal(key, (8,))

    @jax.jit
    def loss(v):
        # squared bloch distance: smooth at the optimum (the reference's
        # norm objective has a gradient singularity at 0, fine for
        # Nelder-Mead but bad for gradient descent)
        V = environment_to_unitary(from_real_vector(v))
        kv = int(V.shape[0]).bit_length() - 1
        psi1 = state_circuit_psi(U, V, 1)
        psi2 = circuit_state([(V, tuple(range(kv)))], kv)
        b1 = bloch_vector(reduced_density_matrix(psi1, [0], 1 + kv))
        b2 = bloch_vector(reduced_density_matrix(psi2, [0], kv))
        return jnp.sum((b1 - b2) ** 2)

    opt = optax.adam(lr)

    @jax.jit
    def step(carry, _):
        v, state = carry
        g = jax.grad(loss)(v)
        up, state = opt.update(g, state)
        return (optax.apply_updates(v, up), state), None

    (v, _), _ = jax.lax.scan(step, (v0, opt.init(v0)), None, length=steps)
    return environment_to_unitary(from_real_vector(v)), loss(v)


def trace_distance_objective(U: jnp.ndarray, V: jnp.ndarray) -> jnp.ndarray:
    """Destructive-swap-test objective ~ Tr[(rho - sigma)^2]
    (qmps/represent.py:116-175): rho = top-bond state of State(U, V),
    sigma = top-bond state of V; computed exactly from the reduced density
    matrices (the sampled version lives in objectives.sampling)."""
    kv = int(V.shape[0]).bit_length() - 1
    aux = kv // 2
    psi_state = state_circuit_psi(U, V, 1)
    psi_env = circuit_state([(V, tuple(range(kv)))], kv)
    rho = reduced_density_matrix(psi_state, list(range(aux)), 1 + kv)
    sigma = reduced_density_matrix(psi_env, list(range(aux)), kv)
    d = rho - sigma
    return jnp.abs(jnp.trace(d @ d).real)


def variational_fixed_point(
    A: jnp.ndarray,
    B: jnp.ndarray,
    n_starts: int = 8,
    steps: int = 1000,
    lr: float = 1e-1,
    key=None,
):
    """Variational dominant eigenpair of the mixed transfer Map(A, B):
    minimize the residual |E v - lam v|^2 over (complex lam, complex unit
    vector v) — the gen-1 mixed-environment study
    (scripts/mixed_environment.py:34-209), gradient-based.

    Residual minimization has a global zero at EVERY eigenpair, so the
    solver multi-starts (the reference retries up to 20 Nelder-Mead runs
    until |lam| is large): one start is warmed by a few power steps, the
    rest are random; the winner is the largest |lam| among converged
    (residual < 1e-8) starts.  Returns (lam, r, residual) with r the (D, D)
    phase-unfixed eigenvector, unit Frobenius.
    """
    from ..core.linalg import to_real_vector
    from ..mps import transfer as tr

    key = jax.random.PRNGKey(0) if key is None else key
    E = tr.transfer_dense(A, B)
    n = E.shape[0]

    def loss(p):
        lam = jax.lax.complex(p[0], p[1])
        v = from_real_vector(p[2:])
        v = v / jnp.linalg.norm(v)
        return jnp.sum(jnp.abs(E @ v - lam * v) ** 2)

    opt = optax.adam(optax.exponential_decay(lr, max(steps // 2, 1), 0.03))

    def run(p0):
        def step(c, _):
            p, s = c
            g = jax.grad(loss)(p)
            up, s = opt.update(g, s)
            return (optax.apply_updates(p, up), s), None

        (p, _), _ = jax.lax.scan(step, (p0, opt.init(p0)), None, length=steps)
        return p, jnp.abs(jax.lax.complex(p[0], p[1])), loss(p)

    v = jnp.ones((n,), E.dtype)
    for _ in range(6):
        v = E @ v
        v = v / jnp.linalg.norm(v)
    lam0 = jnp.vdot(v, E @ v)
    warm = jnp.concatenate([jnp.stack([lam0.real, lam0.imag]), to_real_vector(v)])
    rand = (
        jax.random.normal(key, (n_starts - 1, 2 + 2 * n))
        .at[:, 0].set(1.0)
        .at[:, 1].set(0.0)
    )
    ps, lams, res = jax.vmap(run)(jnp.concatenate([warm[None], rand]))
    score = lams - 1e6 * (res > 1e-8)
    i = jnp.argmax(score)
    vbest = from_real_vector(ps[i][2:])
    vbest = vbest / jnp.linalg.norm(vbest)
    D1, D2 = A.shape[1], B.shape[1]
    return jax.lax.complex(ps[i][0], ps[i][1]), vbest.reshape(D1, D2), res[i]


def represent_variational_M(
    U1, U2, U1d, U2d, p0=None, steps: int = 400, lr: float = 5e-2,
    eta_bounds=None,
):
    """Gen-2 variational environment: minimize |eta M(p) - E[M(p)]|_F over
    (eta, 6 params) (Represent.cost_function,
    ClassicalTDVPStripped.py:614-636).

    ``eta_bounds=(lo, hi)`` activates the dt-bounded eta trick of
    loschmidt_classical.py:196-219 via a sigmoid reparametrization.
    """
    if p0 is None:
        p0 = jnp.array([1.0, jnp.pi / 4, 0, 0, 0, 0, 0])

    def eta_of(x):
        if eta_bounds is None:
            return x
        lo, hi = eta_bounds
        return lo + (hi - lo) * jax.nn.sigmoid(x)

    @jax.jit
    def loss(params):
        # SQUARED residual: the reference's norm objective has a gradient
        # singularity at the optimum (fine for Nelder-Mead, bad for adam)
        eta, p = eta_of(params[0]), params[1:]
        M = env_M(p)
        EM = right_env_map(U1, U2, U1d, U2d, M)
        return jnp.sum(jnp.abs(eta * M - EM) ** 2)

    opt = optax.adam(optax.exponential_decay(lr, max(steps // 2, 1), 0.03))

    @jax.jit
    def step(carry, _):
        v, state = carry
        g = jax.grad(loss)(v)
        up, state = opt.update(g, state)
        return (optax.apply_updates(v, up), state), None

    (v, _), _ = jax.lax.scan(step, (p0, opt.init(p0)), None, length=steps)
    return eta_of(v[0]), env_M(v[1:]), jnp.sqrt(loss(v))
