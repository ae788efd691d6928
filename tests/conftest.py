"""Test configuration: force an 8-device virtual CPU platform.

Multi-chip sharding is validated on CPU via
``--xla_force_host_platform_device_count`` (the standard JAX trick for
testing pjit/shard_map without hardware).  Must run before jax import.
"""

import os

# The container's sitecustomize force-registers the remote "axon" TPU
# platform (JAX_PLATFORMS=axon in the env); plain env overrides are
# ignored, so pin the platform through the config API instead.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
