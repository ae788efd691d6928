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


# ---------------------------------------------------------------------------
# Test tiers: `-m fast` selects a <2-min core for inner-loop iteration;
# the full suite (~20 min on this box) stays the round-end gate.
# VERDICT.md r1 Weak #3.
# ---------------------------------------------------------------------------

_FAST_MODULES = {
    "test_quantizer", "test_gptq", "test_packing", "test_kernels",
    "test_native", "test_task_contracts",
}
# one representative per structural class elsewhere
_FAST_TESTS = {
    "test_budget_matches_reference_formula",
    "test_packed_forward_matches_fake_quant",
    "test_checkpoint_roundtrip",
    "test_opt_parity",
    "test_llama_parity_gqa",
    "test_bloom_parity",
    "test_falcon_parity",
    "test_tp_forward_matches_single_device",
    "test_find_params_matches_reference",
    "test_gptq_matches_reference",
}


def pytest_collection_modifyitems(config, items):
    for item in items:
        mod = item.module.__name__.rsplit(".", 1)[-1]
        base = item.name.split("[")[0]
        if mod in _FAST_MODULES or base in _FAST_TESTS:
            item.add_marker(pytest.mark.fast)


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_between_modules():
    """Free compiled executables after each test module.

    The full suite compiles thousands of XLA:CPU programs; with the r2
    additions the accumulated JIT code crashed the process (segfault in
    libgcc unwind during a later compile, reproducibly at ~60% of the
    suite).  Dropping the caches at module boundaries keeps the resident
    executable set bounded; modules rarely share jit signatures anyway.
    """
    yield
    jax.clear_caches()
