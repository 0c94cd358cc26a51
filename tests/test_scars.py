"""Many-body scars: ansatz/tensor identity, quantum-vs-classical TDVP
cross-validation (scars.py:171-199), Poincare machinery."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from qmps_tpu.algorithms.scars import (
    ScarsEvolver,
    blocked_tensor,
    classical_poincare_sweep,
    classical_trajectory,
    poincare_sections,
    scars_cost,
    scars_energy,
    scars_W,
)
from qmps_tpu.circuits.ansatze import scars_ansatz, scars_tensor
from qmps_tpu.embed import unitary_to_tensor
from qmps_tpu.mps.imps import iMPS


def test_scars_circuit_matches_analytic_tensor():
    """The 2-qubit scars circuit embeds the analytic A(theta, phi)
    (scars.py:29-48 vs :69-72) up to gauge: compare physical states."""
    th, ph = 0.7, 1.3
    U = scars_ansatz(jnp.array([th, ph]))
    A_circ = unitary_to_tensor(U)
    A_ref = scars_tensor(th, ph)
    # same physical state: unit mixed-transfer eigenvalue
    psi1, psi2 = iMPS([A_circ]), iMPS([A_ref])
    # normalize the analytic tensor's state (it is right-canonical-ish)
    ov = float(psi1.overlap(psi2))
    np.testing.assert_allclose(ov, 1.0, atol=1e-8)


def test_scars_cost_self_identity():
    """W = I, same params: perfect overlap."""
    p = jnp.array([0.6, 0.9, 1.1, 0.4])
    W = jnp.eye(16, dtype=jnp.complex128)
    np.testing.assert_allclose(float(scars_cost(p, p, W)), -1.0, atol=1e-8)


@pytest.mark.slow
def test_quantum_matches_classical_odes():
    """Short-horizon agreement of the variational quantum evolution with the
    classical TDVP ODEs (scars.py:171-199 'almost exactly recreate')."""
    mu = 0.325
    dt = 0.05
    steps = 12
    p0 = jnp.array([0.6, 0.9, 1.1, 0.4])
    ev = ScarsEvolver(mu, dt, inner_steps=200, lr=1e-2)
    qtraj = np.asarray(ev.simulate(p0, steps))
    ts = jnp.arange(steps) * dt
    ctraj = np.mod(np.asarray(classical_trajectory(p0, ts, mu)), 2 * np.pi)
    err = np.max(np.abs(np.angle(np.exp(1j * (qtraj - ctraj)))))
    assert err < 0.05, err


def test_classical_poincare_sweep_and_sections():
    mu = 0.325
    ts = jnp.linspace(0, 20, 400)
    y0s = jax.random.normal(jax.random.PRNGKey(0), (4, 4))
    trajs = classical_poincare_sweep(y0s, ts, mu)
    assert trajs.shape == (4, 400, 4)
    assert np.all(np.isfinite(np.asarray(trajs)))
    wrapped = jnp.mod(trajs, 2 * jnp.pi)
    secs = poincare_sections(wrapped)
    assert len(secs) == 4


def test_scars_energy_finite():
    p = jnp.array([0.6, 0.9, 1.1, 0.4])
    e = float(scars_energy(p, 0.325))
    assert np.isfinite(e)


def test_quantum_poincare_sweep_sharded_matches_vmap(key):
    """The sharded ensemble equals the plain vmapped ensemble (8-device
    virtual CPU mesh; trajectories are independent, so sharding must be a
    pure layout change)."""
    from qmps_tpu.algorithms.scars import quantum_poincare_sweep
    from qmps_tpu.parallel import make_mesh

    y0s = jax.random.uniform(key, (8, 4), minval=0.5, maxval=1.5)
    t_v = quantum_poincare_sweep(y0s, 0.4, 0.05, 3, inner_steps=10)
    t_s = quantum_poincare_sweep(y0s, 0.4, 0.05, 3, inner_steps=10, mesh=make_mesh())
    np.testing.assert_allclose(np.asarray(t_s), np.asarray(t_v), atol=1e-10)


def test_poincare_sections_seam_and_empty_shape():
    """No spurious crossings from the 0/2-pi wrap seam, and the empty case
    returns the documented (0, len(coords)) shape."""
    from qmps_tpu.algorithms.scars import poincare_sections

    ts = np.linspace(0, 20, 400)
    seam_orbit = np.stack(
        [0.5 + 0 * ts, np.mod(0.3 * np.sin(ts), 2 * np.pi), 1 + 0 * ts, 2 + 0 * ts],
        axis=1,
    )
    winding = np.stack(
        [0.5 + 0 * ts, np.mod(0.7 * ts, 2 * np.pi), 1 + 0 * ts, 2 + 0 * ts], axis=1
    )
    secs = poincare_sections(np.stack([seam_orbit, winding]))
    assert secs[0].shape == (0, 2)  # oscillates around 0, never reaches pi
    assert secs[1].shape == (2, 2)  # phase winds through pi twice in 14 rad
