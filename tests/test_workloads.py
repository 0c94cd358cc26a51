"""BASELINE config-ladder workloads run and report sane metrics."""
import numpy as np
import pytest

from qmps_tpu.workloads import BrickworkConfig, GroundStateConfig, SweepConfig


def test_ground_state_config():
    m = GroundStateConfig(D=2, steps=150).run()
    assert m["error"] < 5e-3 and m["error"] > -1e-8


def test_brickwork_config():
    m = BrickworkConfig(batch=1024, iters=3).run()
    assert m["overlap_evals_per_sec"] > 0


@pytest.mark.slow
def test_sweep_config():
    m = SweepConfig(n_points=16, steps=300).run()
    assert m["max_error"] < 5e-2
    assert np.isfinite(m["opts_per_sec"])


def test_stiefel_sweep_config():
    from qmps_tpu.workloads import StiefelSweepConfig

    m = StiefelSweepConfig(n_points=4, D=4, steps=120).run()
    assert m["max_error"] < 5e-3
    assert m["median_error"] > -1e-6  # variational: never below exact
    assert np.isfinite(m["opts_per_sec"])


@pytest.mark.slow
def test_large_d_config():
    from qmps_tpu.workloads import LargeDConfig

    m = LargeDConfig(D=16, steps=200).run()
    assert m["error"] < 5e-3 and m["error"] > -1e-8


@pytest.mark.slow
def test_fused_sweep_config():
    """Slow: interpret-mode pallas inside the chunked scan (~1 min on one
    CPU); the config's on-chip behavior is the bench's sweep_fused row."""
    from qmps_tpu.workloads import FusedSweepConfig

    m = FusedSweepConfig(n_points=8, steps=60, restarts=1, chunk=30).run()
    assert np.isfinite(m["opts_per_sec"])
    assert m["max_error"] < 5e-2
