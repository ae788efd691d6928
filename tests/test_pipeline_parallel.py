"""Naive pipeline parallelism: parity with single-device forward."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from owq_tpu.models import forward, import_hf_model
from owq_tpu.parallel.pipeline import stage_model
from owq_tpu.runtime.generate import generate
import hf_tiny


@pytest.fixture(scope="module")
def model4():
    model = hf_tiny.tiny_llama(hidden=32, inter=64, layers=4, heads=4,
                               kv_heads=2, max_pos=128)
    return import_hf_model(model)


def test_staged_forward_matches(rng, model4):
    params, cfg = model4
    ids = rng.integers(0, 97, size=(2, 10)).astype(np.int32)
    ref, _ = forward(params, cfg, jnp.asarray(ids))

    staged = stage_model(params, cfg, devices=jax.devices()[:3])
    assert len(staged.stages) == 2  # ceil(4/3)=2 per stage -> 2 stages
    got, _ = staged.forward(ids)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=2e-4, rtol=1e-3)


def test_staged_generate_matches(rng, model4):
    params, cfg = model4
    prompt = rng.integers(0, 97, size=(1, 6)).astype(np.int32)
    want = generate(params, cfg, prompt, 5, cache_dtype=jnp.float32)[0].tolist()
    staged = stage_model(params, cfg, devices=jax.devices()[:2])
    got = staged.generate_greedy(prompt, 5)
    assert got == want
