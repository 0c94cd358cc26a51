"""Deep brick-wall uMPS ansatz (BASELINE config 5): wall algebra,
canonical form, and variational accuracy vs the exact TFIM integral."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from qmps_tpu.circuits.brickwork_deep import (
    brick_layout,
    brick_wall_ops,
    brick_wall_tensor,
    brick_wall_unitary,
    n_brick_params,
)
from qmps_tpu.algorithms import ground_state_deep_brickwork
from qmps_tpu.ham import tfim, tfim_gs_energy


def test_layout_alternates_and_covers():
    pairs = brick_layout(6, 6)
    # even layers start at wire 0, odd at wire 1; every wire is touched
    assert pairs[:3] == [(0, 1), (2, 3), (4, 5)]
    assert pairs[3:5] == [(1, 2), (3, 4)]
    assert {w for p in pairs for w in p} == set(range(6))
    assert n_brick_params(6, 6) == 19 * len(pairs)


def test_wall_is_unitary():
    n, depth = 4, 3
    p = jax.random.normal(jax.random.PRNGKey(1), (n_brick_params(n, depth),))
    U = brick_wall_unitary(p, n, depth)
    np.testing.assert_allclose(
        np.asarray(U.conj().T @ U), np.eye(2**n), atol=1e-10
    )


def test_tensor_left_canonical():
    D = 8
    depth = 4
    p = jax.random.normal(
        jax.random.PRNGKey(2), (n_brick_params(4, depth),)
    )
    A = brick_wall_tensor(p, D, depth)
    assert A.shape == (2, D, D)
    acc = sum(np.asarray(A[s]).conj().T @ np.asarray(A[s]) for s in range(2))
    np.testing.assert_allclose(acc, np.eye(D), atol=1e-10)


def test_ops_face_matches_dense():
    """The IR face and the dense build agree (same wall, two compilers)."""
    from qmps_tpu.circuits.ir import circuit_unitary

    n, depth = 3, 2
    p = jax.random.normal(jax.random.PRNGKey(3), (n_brick_params(n, depth),))
    ops = brick_wall_ops(p, n, depth)
    np.testing.assert_allclose(
        np.asarray(circuit_unitary(ops, n)),
        np.asarray(brick_wall_unitary(p, n, depth)),
        atol=1e-12,
    )


def test_non_power_of_two_D_rejected():
    with pytest.raises(ValueError):
        brick_wall_tensor(jnp.zeros((19,)), 6, 1)


def test_ground_state_D4():
    gs = ground_state_deep_brickwork(tfim(1.0), D=4, steps=300, lr=0.08)
    e_exact = float(tfim_gs_energy(1.0))
    assert gs.energy >= e_exact - 1e-6  # variational bound
    assert gs.energy - e_exact < 5e-3
    # reported energy is the returned state's energy
    assert abs(gs.energy - float(gs.history[-1])) < 1e-12
    # the returned tensor is a left-canonical (2, 4, 4) uMPS tensor
    acc = sum(np.asarray(gs.A[s]).conj().T @ np.asarray(gs.A[s]) for s in range(2))
    np.testing.assert_allclose(acc, np.eye(4), atol=1e-8)


@pytest.mark.slow
def test_ground_state_D8_krylov_path():
    """D=8 rides the matvec Krylov environment on CPU (the config-5 large-D
    path, backend-aware crossover in ground_state_deep_brickwork)."""
    gs = ground_state_deep_brickwork(
        tfim(0.8), D=8, steps=400, lr=0.06, key=jax.random.PRNGKey(5),
        recycle=False,      # the cold per-step solver is the path under test
        dense_env_max_D=4,  # force the Arnoldi/GMRES matvec environment
    )
    e_exact = float(tfim_gs_energy(0.8))
    assert gs.energy >= e_exact - 1e-6
    assert gs.energy - e_exact < 2e-3


def test_sweep_deep_bw_ansatz():
    """Config-4 sweep through the brick-wall ansatz at D=4: vmapped
    points track the exact integral (parallel/sweep.py 'deep_bw')."""
    from qmps_tpu.parallel import sweep_ground_states

    gs = jnp.linspace(0.4, 1.6, 6)
    es, params = sweep_ground_states(gs, D=4, ansatz="deep_bw", steps=200)
    exact = np.asarray(tfim_gs_energy(np.asarray(gs, np.float64)))
    err = np.asarray(es, np.float64) - exact
    assert np.all(err > -1e-6)  # variational
    assert np.max(err) < 5e-3


def test_ground_state_recycled_matches_cold_D4():
    """Environment recycling (the default) converges to the same energy as
    the cold per-step solver from the same start — the recycled fixed
    point is an accelerator, not an approximation
    (_deep_bw_program_recycled vs _deep_bw_program)."""
    H = tfim(1.0)
    gr = ground_state_deep_brickwork(
        H, D=4, steps=200, key=jax.random.PRNGKey(1), recycle=True
    )
    gc = ground_state_deep_brickwork(
        H, D=4, steps=200, key=jax.random.PRNGKey(1), recycle=False
    )
    assert abs(gr.energy - gc.energy) < 1e-7
    # the reported energy is the returned state's (boosted final solve)
    assert abs(gr.energy - float(gr.history[-1])) < 1e-12
    e_exact = float(tfim_gs_energy(1.0))
    assert gr.energy >= e_exact - 1e-9


def test_sweep_deep_bw_recycled_matches_cold():
    """The D >= 4 sweep default (_optimize_one_recycled) is as accurate as
    the cold per-point optimizer: both variational, both tracking the
    exact integral (mid-optimization trajectories differ at O(residual),
    so the comparison is against physics, not parameter paths)."""
    from qmps_tpu.parallel import sweep_ground_states

    gs = jnp.linspace(0.5, 1.5, 4)
    exact = np.asarray(tfim_gs_energy(np.asarray(gs, np.float64)))
    er, _ = sweep_ground_states(gs, D=4, ansatz="deep_bw", steps=200, refine_passes=1)
    ec, _ = sweep_ground_states(
        gs, D=4, ansatz="deep_bw", steps=200, refine_passes=1, recycle=False
    )
    for es in (er, ec):
        err = np.asarray(es, np.float64) - exact
        assert np.all(err > -1e-6)  # variational (boosted final solve)
        assert np.max(err) < 5e-3
    assert np.max(np.abs(np.asarray(er) - np.asarray(ec))) < 1e-3


@pytest.mark.slow
def test_sweep_deep_bw_D16_gmres_backward():
    """D >= 16 sweeps switch the warm adjoint to the matvec GMRES form
    (the vmapped LU branch would materialize a (D^2+1)^2 system per
    point); the path must trace, run, and stay variational."""
    from qmps_tpu.parallel import sweep_ground_states

    gs = jnp.asarray([0.7, 1.3])
    es, _ = sweep_ground_states(gs, D=16, ansatz="deep_bw", steps=60)
    err = np.asarray(es, np.float64) - np.asarray(
        tfim_gs_energy(np.asarray(gs, np.float64))
    )
    assert np.all(np.isfinite(err))
    assert np.all(err > -1e-6)  # variational
