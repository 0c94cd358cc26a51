"""Optimizer layer: adam/lbfgs scans, rotosolve exactness, scipy bridge,
bond-dimension warm start (scripts/bond_dimension.py analogue)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from qmps_tpu.core import lie
from qmps_tpu.optim.minimize import minimize_adam, minimize_lbfgs, minimize_scipy
from qmps_tpu.optim.rotosolve import double_rotosolve_step, rotosolve


def quad(x):
    return jnp.sum((x - jnp.arange(x.shape[0])) ** 2)


class TestMinimize:
    def test_adam(self):
        res = minimize_adam(quad, jnp.zeros(4), steps=500, lr=0.1)
        assert res.fun < 1e-6
        assert res.history.shape == (500,)

    def test_lbfgs(self):
        res = minimize_lbfgs(quad, jnp.zeros(4), steps=50)
        assert res.fun < 1e-10

    def test_scipy_bridge(self):
        res = minimize_scipy(quad, jnp.zeros(4), method="Nelder-Mead")
        assert res.fun < 1e-6
        res2 = minimize_scipy(quad, jnp.zeros(4), method="BFGS", with_grad=True)
        assert res2.fun < 1e-10


class TestRotosolve:
    def test_exact_on_sinusoid_cost(self):
        """Rotosolve is exact for 2-harmonic coordinate sections — one sweep
        lands each coordinate at its conditional optimum."""

        def loss(p):
            return (
                jnp.sin(2 * p[0] + 0.3)
                + 0.5 * jnp.sin(p[0] + 1.0)
                + jnp.cos(p[1])
                + 0.2 * jnp.sin(2 * p[1])
            )

        p = jnp.array([0.1, 0.2])
        p1 = double_rotosolve_step(loss, p)
        # each coordinate at a local minimum of its section
        for i in range(2):
            e = jnp.eye(2)[i]
            for d in (1e-3, -1e-3):
                assert float(loss(p1 + d * e)) >= float(loss(p1)) - 1e-9

    @pytest.mark.slow
    def test_rotosolve_on_joint_objective(self):
        """Rotosolve is exact only for trigonometric-polynomial costs: the
        reference drives it on the joint state+env circuit objectives
        (qmps/rotosolve.py), where every parameter enters through circuit
        amplitudes.  The exact-env energy is NOT such a cost (the
        environment fixed point is not sinusoidal in the parameters), so we
        test on the joint purity-penalized objective and only assert solid
        progress toward the TFIM ground energy."""
        from qmps_tpu.ham import tfim, tfim_gs_energy
        from qmps_tpu.objectives.energy import energy_joint_env_purity

        h = tfim(1.0).to_matrix()

        def loss(p):
            return energy_joint_env_purity(p, h)

        p0 = jax.random.normal(jax.random.PRNGKey(1), (30,)) * 0.3
        p, hist = rotosolve(loss, p0, n_sweeps=12)
        # hist[i] is the loss AFTER sweep i; compare to the initial loss
        assert float(hist[-1]) < float(loss(p0)) - 0.1
        assert float(hist[-1]) - float(tfim_gs_energy(1.0)) < 0.1


class TestWarmStart:
    @pytest.mark.slow
    def test_embed_su_params_preserves_energy(self):
        """D=2 -> D=4 warm start: the embedded unitary represents (nearly)
        the same physical state, so its energy is within eps-perturbation
        of the D=2 optimum (scripts/bond_dimension.py:24-50)."""
        from qmps_tpu.algorithms import find_ground_state
        from qmps_tpu.circuits.ansatze import full_state_suN
        from qmps_tpu.ham import tfim
        from qmps_tpu.objectives.energy import energy_exact_env

        h = tfim(1.0).to_matrix()
        gs2 = find_ground_state(tfim(1.0), D=2, ansatz="suN", method="lbfgs", steps=150)
        v4 = lie.embed_su_params(np.asarray(gs2.params), eps=1e-3)
        e4 = float(energy_exact_env(full_state_suN(jnp.asarray(v4), 4), h))
        assert abs(e4 - gs2.energy) < 5e-2
        # warm-started D=4 optimization should at least match D=2
        gs4 = find_ground_state(
            tfim(1.0), D=4, ansatz="suN", method="lbfgs", steps=150,
            initial_guess=jnp.asarray(v4),
        )
        assert gs4.energy <= gs2.energy + 1e-6


class TestCheckpoint:
    def test_roundtrip(self, tmp_path):
        from qmps_tpu.utils import load_checkpoint, save_checkpoint

        tree = {
            "params": jnp.arange(5.0),
            "state": [jnp.ones((2, 2)), jnp.asarray(3)],
            "key": jax.random.PRNGKey(1),
        }
        p = str(tmp_path / "ck.npz")
        save_checkpoint(p, tree)
        back = load_checkpoint(p, like=tree)
        for a, b in zip(
            jax.tree_util.tree_leaves(tree), jax.tree_util.tree_leaves(back)
        ):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_bayesian_minimize_quadratic(key):
    """The skopt gp_minimize hook (qmps/tools.py:259-260) via the built-in
    GP-EI fallback: finds the bowl minimum to ~5e-2 in 40 calls."""
    from qmps_tpu.optim.minimize import minimize_bayesian

    def loss(x):
        return jnp.sum((x - jnp.array([0.3, -0.6])) ** 2)

    res = minimize_bayesian(loss, [(-1.0, 1.0), (-1.0, 1.0)], n_calls=40, key=key)
    assert float(res.fun) < 5e-2
    np.testing.assert_allclose(np.asarray(res.x), [0.3, -0.6], atol=0.25)


def test_plot_convergence(tmp_path):
    from qmps_tpu.utils.logging import ConvergenceRecord, plot_convergence

    rec = ConvergenceRecord()
    for v in [3.0, 2.0, 1.5, 1.2, 1.1]:
        rec.append(v)
    out = plot_convergence(rec, path=str(tmp_path / "conv.png"))
    import os

    assert os.path.exists(out) and os.path.getsize(out) > 0


class TestXYLadder:
    @pytest.mark.slow
    def test_xy_ladder_approaches_free_fermion_oracle(self, key):
        """The reference's bond-dimension experiment (XY model, D -> 2D
        warm starts) pinned to its exact anchor: multi-seed variational
        energies stay above -4/pi (free fermions at half filling) and the
        warm-started D=4 result improves on D=2."""
        from qmps_tpu.algorithms import find_ground_state
        from qmps_tpu.ham import xy, xy_gs_energy

        e_exact = xy_gs_energy()
        gs2 = find_ground_state(xy(), D=2, ansatz="suN", method="lbfgs", steps=150, key=key)
        v4 = lie.embed_su_params(np.asarray(gs2.params), eps=1e-3)
        gs4 = find_ground_state(
            xy(), D=4, ansatz="suN", method="lbfgs", steps=150,
            initial_guess=jnp.asarray(v4),
        )
        assert gs2.energy >= e_exact - 1e-6
        assert gs4.energy >= e_exact - 1e-6
        assert gs4.energy <= gs2.energy + 1e-6  # D=4 at least matches D=2
        assert gs4.energy - e_exact < 0.05  # measured ~0.023 (see examples)
