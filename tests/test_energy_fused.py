"""Fused D = 2 energy objective vs the independent fixed-point path.

The reference energy is computed through mps.transfer.right_fixed_point
(its own custom implicit adjoint — an INDEPENDENT derivation), so value
and gradient agreement here cross-validates the fused objective's
hand-derived deflated-series eigenvector adjoint end to end.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from qmps_tpu.kernels.energy_fused import energy_objective_fused
from qmps_tpu.mps import transfer as tr
from qmps_tpu.mps.imps import iMPS


def _e_ref_one(A, h):
    AA = jnp.einsum("sik,tkj->stij", A, A).reshape(4, 2, 2)
    _, r = tr.right_fixed_point(AA, AA)
    r = (r + r.conj().T) / 2
    r = r / jnp.trace(r)
    return jnp.einsum("ts,sij,jk,tik->", h.astype(A.dtype), AA, r, AA.conj()).real


def test_host_energy_matches_jax_path():
    """ham.classical_baselines.host_energy_d2 (the bench/probe validation
    column) == the differentiable fixed-point path."""
    from qmps_tpu.ham.classical_baselines import host_energy_d2

    As, hs = _batch(3)
    for b in range(3):
        e_np = host_energy_d2(np.asarray(As[b]), np.asarray(hs[b]))
        e_jx = float(_e_ref_one(As[b], hs[b]))
        np.testing.assert_allclose(e_np, e_jx, atol=1e-12)


import functools


@functools.lru_cache(maxsize=4)
def _batch(B=5):
    ks = jax.random.split(jax.random.PRNGKey(0), B)
    As = jnp.stack([iMPS.random(k, 2, 2).left_canonicalise()[0] for k in ks])
    X = np.array([[0.0, 1.0], [1.0, 0.0]])
    Z = np.diag([1.0, -1.0])
    I2 = np.eye(2)
    hs = jnp.stack(
        [
            jnp.asarray(-np.kron(Z, Z) + g / 2 * (np.kron(X, I2) + np.kron(I2, X)))
            for g in np.linspace(0.3, 1.7, B)
        ]
    )
    return As, hs


def test_forward_matches_fixed_point_path():
    As, hs = _batch()
    e_f = energy_objective_fused(As, hs, 48, False, "xla")
    e_r = jax.vmap(_e_ref_one)(As, hs)
    np.testing.assert_allclose(np.asarray(e_f), np.asarray(e_r), atol=1e-12)


def test_gradient_matches_fixed_point_path():
    """The money test: the deflated product-form eigenvector adjoint vs
    jax.grad through right_fixed_point's independent implicit adjoint."""
    As, hs = _batch()
    gf = jax.grad(lambda a: jnp.sum(energy_objective_fused(a, hs, 48, False, "xla")))(As)
    gr = jax.grad(lambda a: jnp.sum(jax.vmap(_e_ref_one)(a, hs)))(As)
    np.testing.assert_allclose(np.asarray(gf), np.asarray(gr), atol=1e-10)
    gfh = jax.grad(lambda h: jnp.sum(energy_objective_fused(As, h, 48, False, "xla")))(hs)
    grh = jax.grad(lambda h: jnp.sum(jax.vmap(_e_ref_one)(As, h)))(hs)
    np.testing.assert_allclose(np.asarray(gfh), np.asarray(grh), atol=1e-10)


def test_shared_h_broadcast_and_sum():
    """Shared (4, 4) h broadcasts across the batch; its cotangent is the
    batch sum."""
    As, hs = _batch(3)
    h0 = hs[0]
    e = energy_objective_fused(As, h0, 48, False, "xla")
    e_b = energy_objective_fused(As, jnp.broadcast_to(h0, (3, 4, 4)), 48, False, "xla")
    np.testing.assert_allclose(np.asarray(e), np.asarray(e_b), atol=1e-13)
    g = jax.grad(lambda h: jnp.sum(energy_objective_fused(As, h, 48, False, "xla")))(h0)
    gb = jax.grad(
        lambda h: jnp.sum(energy_objective_fused(As, jnp.broadcast_to(h, (3, 4, 4)), 48, False, "xla"))
    )(h0)
    np.testing.assert_allclose(np.asarray(g), np.asarray(gb), atol=1e-12)


@pytest.mark.slow
def test_near_critical_gradient():
    """g ~ 1 states have subdominant transfer eigenvalues near 1 (long
    correlation length) — the log-time series must still converge where a
    plain Neumann sum would need thousands of terms."""
    from qmps_tpu.algorithms.ground_state import find_ground_state
    from qmps_tpu.circuits.ansatze import shallow_full_state
    from qmps_tpu.embed.unitaries import unitary_to_tensor
    from qmps_tpu.ham import Hamiltonian

    gs = find_ground_state(
        Hamiltonian({"ZZ": -1.0, "X": 1.0}), D=2, ansatz="full15",
        method="lbfgs", steps=200, key=jax.random.PRNGKey(3),
    )
    As = jnp.stack([unitary_to_tensor(shallow_full_state(gs.params))])
    X = np.array([[0.0, 1.0], [1.0, 0.0]])
    Z = np.diag([1.0, -1.0])
    I2 = np.eye(2)
    hs = jnp.asarray(-np.kron(Z, Z) + 0.5 * (np.kron(X, I2) + np.kron(I2, X)))[None]
    gf = jax.grad(lambda a: jnp.sum(energy_objective_fused(a, hs, 48, False, "xla")))(As)
    gr = jax.grad(lambda a: jnp.sum(jax.vmap(_e_ref_one)(a, hs)))(As)
    np.testing.assert_allclose(np.asarray(gf), np.asarray(gr), atol=1e-8)


def test_pallas_forward_matches_xla_engine():
    """The fused kernel (interpret mode, f32 planes) against the x64 XLA
    specification of the same math."""
    As, hs = _batch(3)
    e_k = energy_objective_fused(
        As.astype(jnp.complex64), hs.astype(jnp.float32), 32, True, "pallas"
    )
    e_x = energy_objective_fused(As, hs, 48, False, "xla")
    np.testing.assert_allclose(np.asarray(e_k), np.asarray(e_x), atol=2e-5)


@pytest.mark.slow
def test_pallas_gradient_matches_xla_engine():
    """Kernel adjoint (one launch: rebuild + deflated series + transposed
    builds) against the validated XLA adjoint.  Slow suite: interpret-mode
    custom-vjp traces are ~30s on one CPU; the same agreement is asserted
    on-chip in the bench."""
    As, hs = _batch(2)
    As32, hs32 = As.astype(jnp.complex64), hs.astype(jnp.float32)

    gk = jax.grad(
        lambda a: jnp.sum(energy_objective_fused(a, hs32, 32, True, "pallas"))
    )(As32)
    gx = jax.grad(
        lambda a: jnp.sum(energy_objective_fused(a, hs, 48, False, "xla"))
    )(As)
    np.testing.assert_allclose(np.asarray(gk), np.asarray(gx), atol=3e-4)

    ghk = jax.grad(
        lambda h: jnp.sum(energy_objective_fused(As32, h, 32, True, "pallas"))
    )(hs32)
    ghx = jax.grad(
        lambda h: jnp.sum(energy_objective_fused(As, h, 48, False, "xla"))
    )(hs)
    np.testing.assert_allclose(np.asarray(ghk), np.asarray(ghx), atol=3e-4)
