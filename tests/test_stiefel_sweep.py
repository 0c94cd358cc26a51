"""Direct-Stiefel large-D phase-diagram sweep (BASELINE config 4 at D>2).

The engine under test is sweep_ground_states_stiefel: batched Riemannian
descent on the (2D, D) MPS isometry with Newton-Schulz polar retraction
and warm recycled environments (unroll adjoint: reverse-mode AD through
the warm power matvecs) —
the path that meets the "1024 points, D <= 32, under a minute" target
on chip (reference-scale anchor: scripts/ground_state_finding.py:130-163,
run as independent cluster jobs there).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from qmps_tpu.ham import tfim_gs_energy
from qmps_tpu.parallel import make_mesh
from qmps_tpu.parallel.sweep import (
    _polar_ns,
    grow_isometry,
    sweep_ground_states_stiefel,
)


def test_polar_ns_matches_svd_polar():
    """Newton-Schulz polar factor == the SVD polar factor (not merely
    *an* isometry: descent directions depend on the choice)."""
    rng = np.random.default_rng(0)
    W = rng.standard_normal((3, 8, 4)) + 1j * rng.standard_normal((3, 8, 4))
    # near-isometric regime (where the sweep lives): W = isometry + 0.1 X
    Q = np.linalg.qr(W)[0]
    W = Q + 0.1 * rng.standard_normal(Q.shape)
    V = np.asarray(_polar_ns(jnp.asarray(W), iters=18))
    u, _, vh = np.linalg.svd(W, full_matrices=False)
    np.testing.assert_allclose(V, u @ vh, atol=5e-6)
    eye = np.eye(4)
    for Vb in V:
        np.testing.assert_allclose(Vb.conj().T @ Vb, eye, atol=5e-6)


def test_stiefel_sweep_converges():
    gv = np.linspace(0.3, 1.8, 8)
    es, As, rs = sweep_ground_states_stiefel(
        jnp.asarray(gv), D=4, steps=200, chunk=100
    )
    err = np.asarray(es, np.float64) - np.asarray(tfim_gs_energy(gv))
    assert As.shape == (8, 2, 4, 4) and rs.shape == (8, 4, 4)
    assert np.all(np.isfinite(err))
    # direct descent targets the D-optimal manifold state: well under the
    # reference's own 1e-3 accuracy gate (tests/test_ground_state.py:218)
    assert np.median(err) < 5e-4
    assert np.max(err) < 5e-3
    # variational: never below the true ground state (beyond f32 noise)
    assert np.min(err) > -1e-4


def test_stiefel_sweep_returns_left_canonical_tensors():
    gv = np.array([1.0, 1.3])
    _, As, _ = sweep_ground_states_stiefel(jnp.asarray(gv), D=4, steps=120)
    A = np.asarray(As)
    gram = np.einsum("bsij,bsik->bjk", A.conj(), A)
    eye = np.broadcast_to(np.eye(4), gram.shape)
    np.testing.assert_allclose(gram, eye, atol=1e-5)


def test_stiefel_sweep_sharded_matches_local():
    assert len(jax.devices()) >= 8, "conftest must provide 8 virtual devices"
    gv = jnp.linspace(0.4, 1.6, 16)
    es_l, _, _ = sweep_ground_states_stiefel(gv, D=4, steps=80)
    es_s, _, _ = sweep_ground_states_stiefel(
        gv, D=4, steps=80, mesh=make_mesh(8)
    )
    np.testing.assert_allclose(np.asarray(es_s), np.asarray(es_l), atol=1e-9)


def test_grow_isometry_preserves_energy_and_feeds_warm_start():
    """grow_isometry embeds a converged D-state into 2D with O(eps)
    energy change (tensor-space analogue of core.lie.grow_su_params,
    reference scripts/bond_dimension.py:24-35), and the grown sweep
    starting from it only improves."""
    from qmps_tpu.mps import iMPS

    gv = np.array([0.9, 1.2])
    exact = np.asarray(tfim_gs_energy(gv))
    es4, As, _ = sweep_ground_states_stiefel(jnp.asarray(gv), D=4, steps=200)
    V8 = grow_isometry(As, eps=1e-4)
    assert V8.shape == (2, 16, 8)
    # embedded state reproduces the D=4 energy to O(eps)
    from qmps_tpu.parallel.sweep import tfim_matrix

    for b in range(2):
        A8 = jnp.asarray(V8[b]).reshape(8, 2, 8).transpose(1, 0, 2)
        e8 = float(iMPS([A8]).energy(tfim_matrix(float(gv[b]))).real)
        assert abs(e8 - float(es4[b])) < 5e-3
    es8, _, _ = sweep_ground_states_stiefel(
        jnp.asarray(gv), D=8, steps=120, warm_V=V8
    )
    err8 = np.asarray(es8, np.float64) - exact
    # warm-started growth never loses to the smaller-D optimum
    assert np.all(np.asarray(es8) <= np.asarray(es4) + 1e-4)
    assert np.all(err8 > -1e-4)


def test_stiefel_two_phase_schedule_matches_single_phase():
    """The two-phase matmul-precision schedule (precision/polish_steps)
    splits the descent into a cheap-tier program and a highest-tier
    polish tail.  On CPU the precision hint is numerically a no-op, so
    the schedule must reproduce the single-phase run exactly — any
    difference would mean the split changed the step SEQUENCE (state
    handoff between the two advance programs), not just the matmul
    tier.  polish_steps clamps to [0, steps]."""
    gv = jnp.asarray(np.array([0.7, 1.4]))
    es0, As0, _ = sweep_ground_states_stiefel(gv, D=4, steps=60)
    es2, As2, _ = sweep_ground_states_stiefel(
        gv, D=4, steps=60, precision="default", polish_steps=20
    )
    np.testing.assert_allclose(np.asarray(es2), np.asarray(es0), atol=1e-9)
    np.testing.assert_allclose(np.asarray(As2), np.asarray(As0), atol=1e-7)
    # polish_steps beyond steps clamps (all-highest), below 0 clamps to 0
    es3, _, _ = sweep_ground_states_stiefel(
        gv, D=4, steps=60, precision="default", polish_steps=999
    )
    np.testing.assert_allclose(np.asarray(es3), np.asarray(es0), atol=1e-9)


@pytest.mark.slow
def test_stiefel_restarts_pick_best_basin():
    gv = np.linspace(0.2, 2.0, 6)
    es1, _, _ = sweep_ground_states_stiefel(
        jnp.asarray(gv), D=4, steps=150, restarts=1
    )
    es3, _, _ = sweep_ground_states_stiefel(
        jnp.asarray(gv), D=4, steps=150, restarts=3
    )
    assert np.all(np.asarray(es3) <= np.asarray(es1) + 1e-6)
