"""Pallas TPU kernels, validated in interpreter mode on CPU.

The power-iteration kernel's contract: dominant eigenpair of transfer-map
batches *with a spectral gap* (physical transfer operators near TDVP use
have one; adversarial near-degenerate random matrices do not and are out
of scope)."""
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
    lam, v = dominant_eig_batched(jnp.asarray(E), iters=96, interpret=True)
    for b in range(B):
        w, vecs = np.linalg.eig(E[b].astype(np.complex128))
        i = np.argmax(np.abs(w))
        np.testing.assert_allclose(complex(lam[b]), w[i], atol=2e-4)
        ov = abs(np.vdot(np.asarray(v[b]), vecs[:, i]))
        assert ov > 1 - 1e-3


def test_power_kernel_padding(key):
    """Batch not a multiple of the tile: identity padding is dropped."""
    B = 5
    E = np.asarray(physical_batch(B, key)).astype(np.complex64)
    lam, v = dominant_eig_batched(jnp.asarray(E), iters=96, interpret=True)
    assert lam.shape == (B,)
    for b in range(B):
        w = np.linalg.eigvals(E[b].astype(np.complex128))
        np.testing.assert_allclose(
            abs(complex(lam[b])), np.max(np.abs(w)), atol=2e-4
        )
