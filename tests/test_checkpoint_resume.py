"""Checkpoint/resume wired into the evolution driver (SURVEY section 5:
the reference could only np.save trajectories mid-run, with no resume —
qmps/new_time_evolve.py:294)."""
import jax
import jax.numpy as jnp
import numpy as np

from qmps_tpu.algorithms.evolve import MPSTimeEvolve
from qmps_tpu.ham import tfim
from qmps_tpu.utils.logging import ConvergenceRecord


def test_evolve_checkpoint_kill_and_resume(tmp_path, key):
    """A trajectory killed mid-run resumes from the checkpoint and exactly
    reproduces the uninterrupted trajectory (deterministic stepper)."""
    ckpt = str(tmp_path / "traj.npz")
    p0 = jax.random.normal(key, (15,)) * 0.1
    stepper = MPSTimeEvolve(tfim(0.5), dt=0.05, inner_steps=8)

    # uninterrupted reference run
    ref = stepper.evolve(p0, 4)

    # "killed" run: 2 steps saved, then a FRESH stepper resumes to 4
    stepper.evolve(p0, 2, checkpoint_path=ckpt, checkpoint_every=1)
    stepper2 = MPSTimeEvolve(tfim(0.5), dt=0.05, inner_steps=8)
    rec = stepper2.evolve(p0, 4, checkpoint_path=ckpt, checkpoint_every=2)

    np.testing.assert_allclose(
        np.asarray(rec.params), np.asarray(ref.params), atol=1e-12
    )
    np.testing.assert_allclose(
        np.asarray(rec.loschmidt), np.asarray(ref.loschmidt), atol=1e-12
    )
    assert rec.params.shape == (5, 15)


def test_evolve_convergence_log(key):
    p0 = jax.random.normal(key, (15,)) * 0.1
    stepper = MPSTimeEvolve(tfim(0.5), dt=0.05, inner_steps=8)
    log = ConvergenceRecord()
    stepper.evolve(p0, 3, log=log)
    assert len(log.values) == 3
    assert all(np.isfinite(v) for v in log.values)
    assert log.steps_per_sec() > 0
