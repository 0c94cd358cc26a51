"""Pallas TPU kernels, validated in interpreter mode on CPU.

Two in-kernel eigensolvers: method="squaring" (default; repeated squaring,
error ~ |l2/l1|^(2^iters) — machine precision for ANY nontrivial gap) and
method="power" (cheaper per iteration but needs a healthy spectral gap;
near-degenerate batches are out of its scope)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from qmps_tpu.circuits.brickwork import param_bricks, right_env_matrix
from qmps_tpu.kernels.pallas_power import dominant_eig_batched


def physical_batch(B, key):
    """Transfer matrices of random brickwork states vs slight deformations
    (the TDVP inner-loop workload)."""
    ks = jax.random.split(key, B)

    def one(k):
        p = jax.random.normal(k, (22,)) * 0.4
        U1, U2 = param_bricks(p)
        p2 = p + 0.05 * jax.random.normal(jax.random.fold_in(k, 1), (22,))
        U1p, U2p = param_bricks(p2)
        return right_env_matrix(U1, U2, U1p.conj().T, U2p.conj().T)

    return jax.vmap(one)(ks)


def test_power_kernel_matches_numpy_eig(key):
    B = 8
    E = np.asarray(physical_batch(B, key)).astype(np.complex64)
    lam, v = dominant_eig_batched(jnp.asarray(E), iters=96, interpret=True, method="power")
    for b in range(B):
        w, vecs = np.linalg.eig(E[b].astype(np.complex128))
        i = np.argmax(np.abs(w))
        np.testing.assert_allclose(complex(lam[b]), w[i], atol=2e-4)
        ov = abs(np.vdot(np.asarray(v[b]), vecs[:, i]))
        assert ov > 1 - 1e-3


def test_squaring_kernel_adversarial_random(key):
    """The squaring kernel converges even on near-degenerate random
    matrices where plain power iteration stalls (measured |lam| error 0.018
    at gap ratio 0.989 with 96 power iterations; squaring: ~1e-7)."""
    rng = np.random.default_rng(3)
    E = (rng.normal(size=(8, 4, 4)) + 1j * rng.normal(size=(8, 4, 4))).astype(
        np.complex64
    ) / 2
    lam, v = dominant_eig_batched(jnp.asarray(E), iters=40, interpret=True)
    for b in range(8):
        w, vecs = np.linalg.eig(E[b].astype(np.complex128))
        i = np.argmax(np.abs(w))
        np.testing.assert_allclose(complex(lam[b]), w[i], atol=5e-6)
        ov = abs(np.vdot(np.asarray(v[b]), vecs[:, i]))
        assert ov > 1 - 1e-6


def warm_start_pairs(B, key):
    """(As, Bs): left-canonical D=2 tensors with Bs a small deformation of
    As — the warm-started TDVP inner-loop regime, where the mixed transfer
    operator is gapped (the kernel's contract)."""
    from qmps_tpu.mps.imps import iMPS

    ks = jax.random.split(key, 2 * B)
    As = jnp.stack([iMPS.random(ks[i], 2, 2).left_canonicalise()[0] for i in range(B)])

    def perturb(a, k):
        d = 0.05 * (jax.random.normal(k, a.shape) + 1j * jax.random.normal(k, a.shape))
        return iMPS([a + d]).left_canonicalise()[0]

    Bs = jnp.stack([perturb(As[i], ks[B + i]) for i in range(B)])
    return As, Bs


@pytest.mark.slow
def test_eigval_custom_vjp_value_and_grad(key):
    """The gradient-capable face (Pallas forward + rank-1 implicit adjoint)
    matches the dense repeated-squaring path in value AND gradient to the
    float32 floor on the warm-started TDVP objective."""
    import scipy.linalg as sla

    from qmps_tpu.ham import tfim
    from qmps_tpu.objectives.overlap import tdvp_objective, tdvp_objective_pallas

    B = 8
    As, Bs = warm_start_pairs(B, key)
    W = np.asarray(sla.expm(-1j * 0.1 * np.asarray(tfim(1.0).to_matrix())))

    vals_p = tdvp_objective_pallas(As, Bs, W, iters=96, interpret=True)
    vals_d = jax.vmap(lambda a, b: tdvp_objective(a, b, W))(As, Bs)
    np.testing.assert_allclose(np.asarray(vals_p), np.asarray(vals_d), atol=5e-6)

    gp = jax.grad(lambda bs: jnp.sum(tdvp_objective_pallas(As, bs, W, 96, True)))(Bs)
    gd = jax.grad(
        lambda bs: jnp.sum(jax.vmap(lambda a, b: tdvp_objective(a, b, W))(As, bs))
    )(Bs)
    # cotangent dtype must match the (complex128 on CPU) primal
    assert gp.dtype == Bs.dtype
    np.testing.assert_allclose(np.asarray(gp), np.asarray(gd), atol=5e-6)


@pytest.mark.parametrize("N", [16, 32, 64])
def test_squaring_kernel_general_N(N):
    """The generalized kernels (component-major at N=16, MXU above — with
    block-diagonal packing of 128//N elements per systolic pass at N=32/64)
    match numpy eig on random batches (batch 6 is not a multiple of the
    pack size, so padding + unpacking order are exercised too)."""
    rng = np.random.default_rng(7)
    E = (rng.normal(size=(6, N, N)) + 1j * rng.normal(size=(6, N, N))).astype(
        np.complex64
    ) / np.sqrt(N)
    lam, v = dominant_eig_batched(jnp.asarray(E), iters=40, interpret=True)
    assert lam.shape == (6,) and v.shape == (6, N)
    for b in range(6):
        w, vecs = np.linalg.eig(E[b].astype(np.complex128))
        i = np.argmax(np.abs(w))
        np.testing.assert_allclose(complex(lam[b]), w[i], atol=2e-5)
        ov = abs(np.vdot(np.asarray(v[b]), vecs[:, i]))
        assert ov > 1 - 1e-5


@pytest.mark.parametrize(
    "D",
    [
        pytest.param(4, marks=pytest.mark.slow),
        pytest.param(8, marks=pytest.mark.slow),
    ],
)
def test_tdvp_objective_pallas_larger_D(key, D):
    """tdvp_objective_pallas matches the dense path in value and gradient at
    D=4 (component-major kernel) and D=8 (MXU kernel).  Slow suite: the
    interpret-mode gradient traces are ~15 s each on one CPU; the fast
    suite keeps the forward-only D=4 check below."""
    import scipy.linalg as sla

    from qmps_tpu.ham import tfim
    from qmps_tpu.mps.imps import iMPS
    from qmps_tpu.objectives.overlap import tdvp_objective, tdvp_objective_pallas

    B = 2
    ks = jax.random.split(key, 2 * B)
    As = jnp.stack(
        [iMPS.random(ks[i], 2, D).left_canonicalise()[0] for i in range(B)]
    )
    Bs = jnp.stack(
        [
            iMPS(
                [
                    As[i]
                    + 0.03
                    * (
                        jax.random.normal(ks[B + i], As[i].shape)
                        + 1j * jax.random.normal(jax.random.fold_in(ks[B + i], 1), As[i].shape)
                    )
                ]
            ).left_canonicalise()[0]
            for i in range(B)
        ]
    )
    W = np.asarray(sla.expm(-1j * 0.1 * np.asarray(tfim(1.0).to_matrix())))

    vals_p = tdvp_objective_pallas(As, Bs, W, iters=48, interpret=True)
    vals_d = jax.vmap(lambda a, b: tdvp_objective(a, b, W))(As, Bs)
    np.testing.assert_allclose(np.asarray(vals_p), np.asarray(vals_d), atol=5e-6)

    gp = jax.grad(lambda bs: jnp.sum(tdvp_objective_pallas(As, bs, W, 48, True)))(Bs)
    gd = jax.grad(
        lambda bs: jnp.sum(jax.vmap(lambda a, b: tdvp_objective(a, b, W))(As, bs))
    )(Bs)
    np.testing.assert_allclose(np.asarray(gp), np.asarray(gd), atol=5e-6)


def test_tdvp_objective_pallas_D4_forward(key):
    """Fast-suite forward-only parity of the D=4 component-major kernel
    path (full fwd+grad parity at D=4/8 lives in the slow variant above)."""
    import scipy.linalg as sla

    from qmps_tpu.ham import tfim
    from qmps_tpu.mps.imps import iMPS
    from qmps_tpu.objectives.overlap import tdvp_objective, tdvp_objective_pallas

    ks = jax.random.split(key, 2)
    As = jnp.stack([iMPS.random(ks[0], 2, 4).left_canonicalise()[0]])
    Bs = jnp.stack(
        [
            iMPS(
                [As[0] + 0.03 * jax.random.normal(ks[1], As[0].shape).astype(As.dtype)]
            ).left_canonicalise()[0]
        ]
    )
    W = np.asarray(sla.expm(-1j * 0.1 * np.asarray(tfim(1.0).to_matrix())))
    vals_p = tdvp_objective_pallas(As, Bs, W, iters=16, interpret=True)
    vals_d = jax.vmap(lambda a, b: tdvp_objective(a, b, W))(As, Bs)
    np.testing.assert_allclose(np.asarray(vals_p), np.asarray(vals_d), atol=5e-6)


def test_power_kernel_padding(key):
    """Batch not a multiple of the tile: identity padding is dropped."""
    B = 5
    E = np.asarray(physical_batch(B, key)).astype(np.complex64)
    lam, v = dominant_eig_batched(jnp.asarray(E), iters=10, interpret=True)
    assert lam.shape == (B,)
    for b in range(B):
        w = np.linalg.eigvals(E[b].astype(np.complex128))
        np.testing.assert_allclose(
            abs(complex(lam[b])), np.max(np.abs(w)), atol=2e-4
        )


@pytest.mark.slow
def test_manifold_overlap_pallas_matches_flat_matmul(key):
    """The fused brickwork-overlap kernel agrees with the XLA flat-matmul
    form (itself pinned to the reference einsum to 1e-12) on a batch that
    is not a multiple of the tile, exercising padding.  Slow suite: the
    interpret-mode sweep of the fused kernel is ~1 min on one CPU, and the
    same cross-kernel equality is asserted on-chip every bench run."""
    from qmps_tpu.kernels import manifold_overlap_batched, manifold_overlap_pallas

    B = 7
    ks = jax.random.split(key, 6)

    def hu(k, n):
        A = jax.random.normal(k, (B, n, n)) + 1j * jax.random.normal(
            jax.random.fold_in(k, 1), (B, n, n)
        )
        Q, _ = jnp.linalg.qr(A.astype(jnp.complex64))
        return Q

    U1, U2, U1p, U2p = (hu(ks[i], 4) for i in range(4))
    M = hu(ks[4], 2)
    W, _ = jnp.linalg.qr(
        (jax.random.normal(ks[5], (16, 16)) + 1j * jax.random.normal(jax.random.fold_in(ks[5], 1), (16, 16))).astype(jnp.complex64)
    )
    Ml = jnp.swapaxes(M, -1, -2).conj()
    a = manifold_overlap_batched(U1, U2, U1p, U2p, M, Ml, W)
    b = manifold_overlap_pallas(U1, U2, U1p, U2p, M, Ml, W, interpret=True)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-6)
