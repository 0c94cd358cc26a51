"""MC-trajectory noise unraveling vs the exact density-matrix channel.

The unraveling is exact in expectation for ANY p (not just small p):
E[|psi><psi|] over trajectories equals the per-moment depolarizing
channel's rho.  Tests: exactness at p=0, statistical agreement of the
rho estimator / energy / TDVP objective with the density-matrix path,
and the optimizer-facing simulation flag.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from qmps_tpu.circuits.ir import circuit_state
from qmps_tpu.core import gates as g
from qmps_tpu.objectives.noise import (
    noisy_circuit_rho,
    noisy_energy,
    noisy_tdvp_objective,
)
from qmps_tpu.objectives.trajectories import (
    trajectory_circuit_state,
    trajectory_energy,
    trajectory_rho_estimate,
    trajectory_tdvp_objective,
)


def _ops(n=3):
    return [(g.H, (0,)), (g.CNOT, (0, 1)), (g.CNOT, (1, 2)), (g.H, (2,))]


def test_zero_noise_trajectory_is_pure_circuit():
    ops = _ops()
    psi = trajectory_circuit_state(ops, 3, 0.0, jax.random.PRNGKey(0))
    want = circuit_state(ops, 3)
    np.testing.assert_allclose(np.asarray(psi), np.asarray(want), atol=1e-12)


def test_rho_estimator_matches_density_matrix():
    ops = _ops()
    p = 0.05
    rho_exact = np.asarray(noisy_circuit_rho(ops, 3, p))
    rho_mc = np.asarray(
        trajectory_rho_estimate(ops, 3, p, jax.random.PRNGKey(1), 4096)
    )
    # elementwise MC error ~ 1/sqrt(n_traj); seeded, so deterministic
    assert np.max(np.abs(rho_mc - rho_exact)) < 0.04
    np.testing.assert_allclose(np.trace(rho_mc).real, 1.0, atol=1e-6)


def test_trajectory_energy_matches_density_matrix():
    from qmps_tpu.circuits.ansatze import shallow_full_state, shallow_full_state_ops
    from qmps_tpu.env.exact import get_env_exact
    from qmps_tpu.ham import tfim

    params = jax.random.normal(jax.random.PRNGKey(2), (15,)) * 0.5
    ops, n = shallow_full_state_ops(params)
    V = get_env_exact(shallow_full_state(params))
    h = np.asarray(tfim(1.0).to_matrix())
    p = 0.02
    e_dm = float(noisy_energy(ops, n, V, h, p))
    e_mc = float(trajectory_energy(ops, n, V, h, p, jax.random.PRNGKey(3), 512))
    assert abs(e_mc - e_dm) < 0.15, (e_mc, e_dm)


@pytest.mark.slow
def test_trajectory_tdvp_objective_matches_density_matrix():
    from qmps_tpu.mps.imps import random_tensor

    A = random_tensor(jax.random.PRNGKey(4), 2, 2)
    from qmps_tpu.mps.imps import iMPS

    A = iMPS([A]).left_canonicalise().data[0]
    B = A + 0.03 * random_tensor(jax.random.PRNGKey(5), 2, 2)
    B = iMPS([B]).left_canonicalise().data[0]
    W = jnp.eye(4, dtype=A.dtype)
    p = 0.01
    o_dm = float(noisy_tdvp_objective(A, B, W, p))
    o_mc = float(
        trajectory_tdvp_objective(A, B, W, p, jax.random.PRNGKey(6), 1024)
    )
    assert abs(o_mc - o_dm) < 0.03, (o_mc, o_dm)


def test_noisy_optimizer_trajectory_mode():
    from qmps_tpu.algorithms.ground_state import NoisyNonSparseFullEnergyOptimizer
    from qmps_tpu.ham import tfim

    H = tfim(1.0)
    p = 0.01
    opt_dm = NoisyNonSparseFullEnergyOptimizer(H, p)
    opt_mc = NoisyNonSparseFullEnergyOptimizer(
        H, p, simulation="trajectories", n_traj=256
    )
    params = opt_dm.initial_guess
    e_dm = float(opt_dm.objective_function(params))
    e_mc = float(opt_mc.objective_function(params))
    assert abs(e_mc - e_dm) < 0.2, (e_mc, e_dm)
    with pytest.raises(ValueError):
        NoisyNonSparseFullEnergyOptimizer(H, p, simulation="nope")
