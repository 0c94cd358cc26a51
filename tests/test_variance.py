"""Energy-variance convergence certificate (mps/tdvp.energy_variance_density).

Cross-validation strategy (SURVEY.md section 4): every term of the
variance formula is checked against a brute-force numpy mirror that sums
explicit connected bond-bond correlators through transfer-matrix powers,
plus physics anchors (exact eigenstates have zero variance; VUMPS-converged
states certify their own energy error via |E - E0| <= sigma^2 / gap).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from qmps_tpu.core.paulis import I2, X, Z
from qmps_tpu.ham import tfim, tfim_gs_energy
from qmps_tpu.mps.imps import iMPS, left_orthogonalise
from qmps_tpu.mps import transfer as tr
from qmps_tpu.mps.tdvp import energy_variance_density


def _canonical_pair(key, D, d=2):
    A = iMPS.random(key, d, D)[0]
    AL, _, _ = left_orthogonalise(A)
    _, r = tr.right_fixed_point(AL, AL)
    r = (r + r.conj().T) / 2
    r = r / jnp.trace(r)
    return AL, r


def _variance_numpy(AL, r, h, K=400):
    """Brute-force mirror: sigma^2 = <h~^2> + 2 Re <h~_0 h~_1>
    + 2 Re sum_{d=2}^{K} <h~_0 h~_d> with explicit boundary propagation
    (converges geometrically in K through |lambda_2|^d)."""
    AL, r, h = np.asarray(AL), np.asarray(r), np.asarray(h)
    d, D, _ = AL.shape
    AL2 = np.einsum("sij,tjk->stik", AL, AL)
    h4 = h.reshape(d, d, d, d)
    e = np.einsum("uvia,stib,ba,uvst->", AL2.conj(), AL2, r, h4).real
    ht = h - e * np.eye(d * d)
    ht4 = ht.reshape(d, d, d, d)

    t0 = np.einsum(
        "uvia,stib,ba,uvst->", AL2.conj(), AL2, r,
        (ht @ ht).reshape(d, d, d, d),
    ).real

    AL3 = np.einsum("uvik,wkj->uvwij", AL2, AL)
    O3 = np.kron(ht, np.eye(d)) @ np.kron(np.eye(d), ht)
    t1 = np.einsum(
        "uvwia,stqib,ba,uvwstq->", AL3.conj(), AL3, r,
        O3.reshape((d,) * 6),
    ).real

    # left boundary after the first shifted window
    x = np.einsum("uvia,stib,uvst->ab", AL2.conj(), AL2, ht4)
    # right cap: shifted window against r, left indices open
    cap = np.einsum("uvia,stjb,ba,uvst->ij", AL2.conj(), AL2, r, ht4)
    tail = 0.0
    for _ in range(2, K + 1):
        tail += np.einsum("ij,ij->", x, cap).real
        x = np.einsum("sia,sjb,ij->ab", AL.conj(), AL, x)
    return t0 + 2.0 * t1 + 2.0 * tail


def test_matches_numpy_mirror_random_states():
    h = jnp.asarray(np.asarray(tfim(0.7).to_matrix()), jnp.complex128)
    for seed in range(4):
        AL, r = _canonical_pair(jax.random.PRNGKey(seed), D=3)
        got = float(energy_variance_density(AL, r, h))
        want = _variance_numpy(AL, r, np.asarray(h))
        assert abs(got - want) < 1e-8, (seed, got, want)


def test_gmres_solver_agrees_with_dense():
    h = jnp.asarray(np.asarray(tfim(1.3).to_matrix()), jnp.complex128)
    AL, r = _canonical_pair(jax.random.PRNGKey(7), D=4)
    dense = float(energy_variance_density(AL, r, h, env_solver="dense"))
    gm = float(energy_variance_density(AL, r, h, env_solver="gmres"))
    assert abs(dense - gm) < 1e-8 * max(1.0, abs(dense))


def test_eigenstate_has_zero_variance():
    # |000...> is an exact eigenstate of H = sum -Z Z (classical Ising)
    up = jnp.zeros((2, 1, 1), jnp.complex128).at[0, 0, 0].set(1.0)
    h = -jnp.kron(Z, Z)
    r = jnp.eye(1, dtype=jnp.complex128)
    assert abs(float(energy_variance_density(up, r, h))) < 1e-12
    # and through the iMPS wrapper at D=2 (padded embedding of the same
    # product state via a random gauge): X-polarized eigenstate of -XX
    plus = jnp.full((2, 1, 1), 1 / np.sqrt(2), jnp.complex128)
    hx = -jnp.kron(X, X)
    assert abs(float(energy_variance_density(plus, r, hx))) < 1e-12


def test_variance_positive_for_non_eigenstate():
    h = jnp.asarray(np.asarray(tfim(1.0).to_matrix()), jnp.complex128)
    AL, r = _canonical_pair(jax.random.PRNGKey(3), D=2)
    assert float(energy_variance_density(AL, r, h)) > 1e-3


def test_imps_wrapper():
    A = iMPS.random(jax.random.PRNGKey(11), 2, 3)[0]
    h = jnp.asarray(np.asarray(tfim(0.9).to_matrix()), jnp.complex128)
    psi = iMPS([A])
    v = float(psi.energy_variance(h))
    AL, _, _ = left_orthogonalise(psi.blocked)
    _, r = tr.right_fixed_point(AL, AL)
    r = (r + r.conj().T) / 2
    r = r / jnp.trace(r)
    want = _variance_numpy(AL, r, np.asarray(h))
    assert abs(v - want) < 1e-8


def test_sweep_certificates_flag_unconverged_points():
    """Batched sweep certificates: converged Stiefel points carry small
    variance, a near-unconverged sweep carries visibly larger ones, and
    the batched GMRES value matches the single-point dense solve."""
    from qmps_tpu.parallel.sweep import (
        sweep_ground_states_stiefel,
        sweep_variance_certificates,
    )

    gs = jnp.linspace(0.4, 1.6, 8)
    _, As, rs = sweep_ground_states_stiefel(gs, D=4, steps=250, chunk=50)
    var = np.asarray(sweep_variance_certificates(gs, As, rs))
    assert var.shape == (8,)
    assert np.all(var > -1e-9)
    assert np.max(var) < 5e-2, var  # converged: small variance

    _, As0, rs0 = sweep_ground_states_stiefel(gs, D=4, steps=3, chunk=3)
    var0 = np.asarray(sweep_variance_certificates(gs, As0, rs0))
    assert np.median(var0) > 5 * np.median(var), (var0, var)

    # batched GMRES certificate == single-point dense certificate
    from qmps_tpu.parallel.sweep import tfim_matrix

    i = 3
    A = As[i]
    r = rs[i]
    for _ in range(60):
        r = jnp.einsum("sai,ij,sbj->ab", A, r, A.conj())
        r = (r + r.conj().T) / 2
        r = r / jnp.linalg.norm(r)
    r = r / jnp.trace(r)
    h = tfim_matrix(gs[i]).astype(A.dtype)
    dense = float(energy_variance_density(A, r, h, env_solver="dense"))
    assert abs(dense - float(var[i])) < 1e-6 * max(1.0, abs(dense))


@pytest.mark.slow
def test_variance_extrapolation_beats_largest_D():
    """E(sigma^2) -> 0 linear extrapolation across a VUMPS D-ladder lands
    closer to the exact energy than the largest-D point itself
    (examples/variance_extrapolation.py; measured 24x at g=1 over
    D=2..8 — gate at 2x over the cheap D=2..4 ladder here)."""
    from qmps_tpu.mps.tdvp import vumps_ground_state

    g = 1.0
    h = jnp.asarray(np.asarray(tfim(g).to_matrix()), jnp.complex128)
    pts = []
    for D in (2, 3, 4):
        AL, C, e, _ = vumps_ground_state(
            h, D=D, iters=300, key=jax.random.PRNGKey(D)
        )
        r = C @ C.conj().T
        r = r / jnp.trace(r)
        pts.append((float(e), float(energy_variance_density(AL, r, h))))
    e_arr = np.array([p[0] for p in pts])
    v = np.array([p[1] for p in pts])
    w = 1.0 / np.maximum(v, 1e-14)
    A = np.stack([np.ones_like(v), v], axis=1) * w[:, None]
    (e0, _), *_ = np.linalg.lstsq(A, e_arr * w, rcond=None)
    exact = float(tfim_gs_energy(g))
    assert abs(e0 - exact) < 0.5 * abs(e_arr[-1] - exact), (e0, e_arr[-1], exact)


@pytest.mark.slow
def test_vumps_state_certifies_its_energy_error():
    """The certificate in action: for the VUMPS-converged TFIM state the
    variance bounds the energy error via |E - E0| <= sigma^2 / gap
    (gap(g=1.2) = 2|1 - g| = 0.4), with NO oracle in the loop."""
    from qmps_tpu.mps.tdvp import vumps_ground_state

    g = 1.2
    h = jnp.asarray(np.asarray(tfim(g).to_matrix()), jnp.complex128)
    AL, C, e, info = vumps_ground_state(
        h, D=8, iters=400, key=jax.random.PRNGKey(0)
    )
    r = C @ C.conj().T
    r = r / jnp.trace(r)
    var = float(energy_variance_density(AL, r, h))
    err = float(e) - float(tfim_gs_energy(g))
    gap = 2 * abs(1 - g)
    assert var >= -1e-10
    assert err <= var / gap + 1e-9, (err, var)
    # converged state: tiny variance, far below a random state's O(1)
    assert var < 1e-6
