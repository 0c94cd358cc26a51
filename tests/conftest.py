"""Test harness config: run everything on an 8-device virtual CPU mesh so the
multi-chip sharding paths compile and execute without TPU hardware."""
import os

os.environ["JAX_PLATFORMS"] = "cpu"  # correctness suite runs on CPU x64
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# the container's sitecustomize registers the TPU backend at interpreter
# startup, before conftest can set env vars — override programmatically
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(42)


@pytest.fixture
def key():
    return jax.random.PRNGKey(0)
