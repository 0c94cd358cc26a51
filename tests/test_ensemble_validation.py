"""Ensemble statistical validation of variational environments.

Reproduces the reference's two 100-run error-distribution studies as
seeded, vmapped tests with the reference's own quantitative anchors:

- gen-2 (new_tdvp/loschmidt_classical.py:338-422 ``test_var_eigs``):
  bounded-eta 6-param M-ansatz environment vs the exact 4x4 eigensolve on
  Haar brick pairs perturbed by expm(i dt H); anchors mean |d eta| ~ 1e-4
  and mean boundary-env Frobenius ~ 1e-3 (the reference compares the
  HALF-CELL-CONVERTED environments — raw mid-map M's differ ~4x more).
- gen-1 (scripts/mixed_environment.py:34-209): residual-minimization
  eigensolve over (lam, hypersphere v) on TDVP-step pairs
  B = (A + dt dA_dt), vs Map.right_fixed_point.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from qmps_tpu.circuits.brickwork import env_from_M, exact_right_env, param_bricks
from qmps_tpu.env.variational import represent_variational_M, variational_fixed_point
from qmps_tpu.mps.imps import Map, iMPS, random_tensor

N_RUNS = 100
DT = 1e-2


@pytest.mark.slow
def test_gen2_bounded_eta_env_ensemble(rng):
    """100 Haar-pair runs: mean |d eta| and converted-env Frobenius match
    the reference's anchors (measured here: 2.2e-4 and 1.4e-3)."""
    import scipy.linalg
    import scipy.stats

    def haar_pair():
        U1 = scipy.stats.unitary_group.rvs(4, random_state=rng)
        U2 = scipy.stats.unitary_group.rvs(4, random_state=rng)

        def pert(U):
            Amat = rng.random((4, 4)) + 1j * rng.random((4, 4))
            H = 0.5 * (Amat + Amat.conj().T)
            return U @ scipy.linalg.expm(1j * DT * H)

        return U1, U2, pert(U1), pert(U2)

    inst = [haar_pair() for _ in range(N_RUNS)]
    stack = lambda i: jnp.stack([jnp.asarray(x[i]) for x in inst])
    U1s, U2s, U1ps, U2ps = stack(0), stack(1), stack(2), stack(3)

    def one(U1, U2, U1p, U2p):
        U1d, U2d = U1p.conj().T, U2p.conj().T
        eta_v, Mv, _ = represent_variational_M(
            U1, U2, U1d, U2d, steps=1200, lr=1e-1,
            eta_bounds=(1 - 5 * DT**2, 1.0),
        )
        eta_e, Me = exact_right_env(U1, U2, U1d, U2d)
        Rv = env_from_M(Mv, U2, U2d)
        Re = env_from_M(Me, U2, U2d)
        Rv = Rv / jnp.linalg.norm(Rv)
        Re = Re / jnp.linalg.norm(Re)
        ph = jnp.vdot(Rv.reshape(-1), Re.reshape(-1))
        ph = ph / jnp.abs(ph)
        return jnp.abs(eta_v - jnp.abs(eta_e)), jnp.linalg.norm(Rv - ph.conj() * Re)

    d_eta, d_env = jax.vmap(one)(U1s, U2s, U1ps, U2ps)
    d_eta, d_env = np.asarray(d_eta), np.asarray(d_env)
    assert d_eta.mean() < 5e-4, d_eta.mean()  # anchor O(1e-4)
    assert d_env.mean() < 3e-3, d_env.mean()  # anchor O(1e-3)
    assert d_eta.max() < 2e-3
    assert d_env.max() < 2e-2


@pytest.mark.slow
def test_gen1_mixed_env_ensemble(key):
    """100 TDVP-step pairs: the residual-minimization variational eigensolve
    recovers the exact mixed fixed point; >= 95% of instances converge, and
    over the converged set mean |d lam| < 1e-4 and env Frobenius < 1e-3."""
    from qmps_tpu.core.paulis import X, Z

    I2 = np.eye(2)
    H = (
        np.kron(np.asarray(Z), np.asarray(Z))
        + np.kron(np.asarray(X), I2) / 2
        + np.kron(I2, np.asarray(X)) / 2
    )

    def one(k):
        A = iMPS([random_tensor(k, 2, 2)]).left_canonicalise()[0]
        dA = iMPS([A]).dA_dt(jnp.asarray(H))
        B = iMPS([A + DT * dA]).left_canonicalise()[0]
        lam, rv, res = variational_fixed_point(A, B, key=jax.random.fold_in(k, 7))
        e_ex, r_ex = Map(A, B).right_fixed_point()
        ph = jnp.vdot(rv.reshape(-1), r_ex.reshape(-1))
        ph = ph / jnp.abs(ph)
        return (
            jnp.abs(jnp.abs(lam) - jnp.abs(e_ex)),
            jnp.linalg.norm(rv - ph.conj() * r_ex),
            res,
        )

    keys = jax.random.split(key, N_RUNS)
    d_lam, d_env, res = (np.asarray(x) for x in jax.vmap(one)(keys))
    conv = res < 1e-8
    assert conv.mean() >= 0.95, conv.mean()
    assert d_lam[conv].mean() < 1e-4, d_lam[conv].mean()
    assert d_env[conv].mean() < 1e-3, d_env[conv].mean()
