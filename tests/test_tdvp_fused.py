"""Fused build+eigensolve TDVP objective kernel vs the unfused paths.

Forward: agreement with vmap(tdvp_objective) (dense XLA) and with
tdvp_objective_pallas (XLA build + Pallas eigensolve, interpret mode).
Backward: the hand-derived transposed-build adjoint vs jax.grad of the
unfused XLA objective — the convention-sensitive part.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from qmps_tpu.kernels.tdvp_fused import tdvp_objective_fused
from qmps_tpu.mps.imps import random_tensor
from qmps_tpu.objectives.overlap import tdvp_objective


def _batch(key, B=8):
    ks = jax.random.split(key, 2 * B)
    As = jnp.stack([random_tensor(ks[i], 2, 2) for i in range(B)])
    Bs = jnp.stack([random_tensor(ks[B + i], 2, 2) for i in range(B)])
    # normalize to healthy scale (the objective is scale-covariant in |x|
    # but keeps the test away from over/underflow)
    As = As / jnp.linalg.norm(As.reshape(B, -1), axis=1)[:, None, None, None] * 2
    Bs = Bs / jnp.linalg.norm(Bs.reshape(B, -1), axis=1)[:, None, None, None] * 2
    return As, Bs


def _W(key):
    import scipy.linalg

    H = np.asarray(jax.random.normal(key, (4, 4)))
    H = H + H.T
    return jnp.asarray(scipy.linalg.expm(-0.05j * H).astype(np.complex64))


def test_fused_forward_matches_unfused():
    As, Bs = _batch(jax.random.PRNGKey(0), B=2)
    W = _W(jax.random.PRNGKey(1))
    got = tdvp_objective_fused(As, Bs, W, 8, True)  # interpret mode
    want = jax.vmap(lambda a, b: tdvp_objective(a, b, W))(As, Bs)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=5e-5)


@pytest.mark.slow
def test_fused_gradient_matches_xla_grad():
    """Slow suite: the interpret-mode custom-vjp trace is ~35 s on one
    CPU; the same gradient agreement is asserted on-chip (vs numpy eig
    ground truth) every bench run, and the FD check below is independent."""
    As, Bs = _batch(jax.random.PRNGKey(2), B=2)
    W = _W(jax.random.PRNGKey(3))

    def loss_fused(As, Bs, W):
        return jnp.sum(tdvp_objective_fused(As, Bs, W, 12, True))

    def loss_ref(As, Bs, W):
        return jnp.sum(jax.vmap(lambda a, b: tdvp_objective(a, b, W))(As, Bs))

    g_fused = jax.grad(loss_fused, argnums=(0, 1, 2))(As, Bs, W)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(As, Bs, W)
    for gf, gr, name in zip(g_fused, g_ref, ("A", "B", "W")):
        np.testing.assert_allclose(
            np.asarray(gf), np.asarray(gr), atol=2e-4, err_msg=name
        )


def _W_batch(key, B):
    ks = jax.random.split(key, B)
    return jnp.stack([_W(k) for k in ks])


@pytest.mark.slow
def test_fused_forward_batched_W_matches_unfused():
    """Per-trajectory (B, 4, 4) gates (the MC-trajectory / per-time-slice
    path): every element agrees with its own unfused objective.  Slow
    suite: the interpret-mode batched-W trace is ~10 s on one CPU and the
    batched-W gradient test below covers the same kernel face."""
    As, Bs = _batch(jax.random.PRNGKey(7), B=3)
    Ws = _W_batch(jax.random.PRNGKey(8), 3)
    got = tdvp_objective_fused(As, Bs, Ws, 8, True)  # interpret mode
    want = jax.vmap(tdvp_objective)(As, Bs, Ws)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=5e-5)


@pytest.mark.slow
def test_fused_gradient_batched_W_matches_xla_grad():
    As, Bs = _batch(jax.random.PRNGKey(9), B=3)
    Ws = _W_batch(jax.random.PRNGKey(10), 3)

    def loss_fused(As, Bs, Ws):
        return jnp.sum(tdvp_objective_fused(As, Bs, Ws, 16, True))

    def loss_ref(As, Bs, Ws):
        return jnp.sum(jax.vmap(tdvp_objective)(As, Bs, Ws))

    g_fused = jax.grad(loss_fused, argnums=(0, 1, 2))(As, Bs, Ws)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(As, Bs, Ws)
    assert g_fused[2].shape == Ws.shape
    for gf, gr, name in zip(g_fused, g_ref, ("A", "B", "W")):
        np.testing.assert_allclose(
            np.asarray(gf), np.asarray(gr), atol=5e-5, err_msg=name
        )


@pytest.mark.slow
def test_fused_gradient_finite_differences():
    """Independent of both implementations: directional finite differences
    of the fused objective against its own reported gradient."""
    As, Bs = _batch(jax.random.PRNGKey(4), B=2)
    W = _W(jax.random.PRNGKey(5))

    def f(As):
        return jnp.sum(tdvp_objective_fused(As, Bs, W, 16, True))

    g = jax.grad(f)(As)
    key = jax.random.PRNGKey(6)
    dA = jax.random.normal(key, As.shape) + 1j * jax.random.normal(
        jax.random.fold_in(key, 1), As.shape
    )
    dA = dA.astype(As.dtype) * 1e-3
    fd = (f(As + dA) - f(As - dA)) / 2
    # JAX convention: df = 2 Re <conj(g)... for real loss of complex x,
    # df = sum Re(conj(grad) * dx) * 2? No: grad = d/dx - i d/dy, so
    # df = Re(sum grad * dx)  (pairing form, see tdvp_fused._fused_bwd)
    pred = jnp.sum(g * dA).real
    np.testing.assert_allclose(float(fd), float(pred), rtol=5e-3, atol=1e-8)
