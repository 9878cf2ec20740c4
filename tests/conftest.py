"""Test harness config: force a virtual 8-device CPU backend so multi-chip
sharding paths are exercised without TPUs.

Note: this image's sitecustomize imports jax at interpreter startup (to
register the TPU plugin), so JAX_PLATFORMS in os.environ is read before any
conftest runs. `jax.config.update` still works because the backend itself
initializes lazily on first device use; same for XLA_FLAGS.
"""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
