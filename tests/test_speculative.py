"""Prompt-lookup speculative decoding: exactness vs plain greedy decode."""

import numpy as np
import pytest

import jax.numpy as jnp

from owq_tpu.models import import_hf_model
from owq_tpu.runtime.generate import generate
from owq_tpu.runtime.speculative import generate_speculative, propose_ngram
import hf_tiny


@pytest.fixture(scope="module")
def llama():
    model = hf_tiny.tiny_llama(hidden=32, inter=56, layers=2, heads=4,
                               kv_heads=2, max_pos=256)
    return import_hf_model(model)


def test_propose_ngram_basic():
    # trailing bigram (5, 6) recurs; continuation after the earlier match
    ctx = np.array([1, 5, 6, 7, 8, 2, 5, 6], np.int32)
    d = propose_ngram(ctx, k=2, ngram_max=2)
    np.testing.assert_array_equal(d, [7, 8])


def test_propose_ngram_most_recent_match_wins():
    ctx = np.array([5, 6, 1, 5, 6, 2, 5, 6], np.int32)
    d = propose_ngram(ctx, k=1, ngram_max=2)
    np.testing.assert_array_equal(d, [2])  # match at idx 3, not idx 0


def test_propose_ngram_pads_short_continuation():
    ctx = np.array([1, 2, 3, 1, 2], np.int32)
    d = propose_ngram(ctx, k=4, ngram_max=2)
    assert len(d) == 4 and d[0] == 3


def test_propose_ngram_none_without_repeats():
    assert propose_ngram(np.arange(10, dtype=np.int32), k=4) is None


def test_speculative_matches_greedy_random_prompt(llama, rng):
    # low acceptance rate (random tokens) — output must still be exact
    params, cfg = llama
    prompt = rng.integers(0, 97, size=(1, 16)).astype(np.int32)
    ref = generate(params, cfg, prompt, 24, cache_dtype=jnp.float32)
    got = generate_speculative(params, cfg, prompt, 24, draft_len=4,
                               cache_dtype=jnp.float32)
    np.testing.assert_array_equal(got, ref)


def test_speculative_matches_greedy_and_accepts_on_repetitive_prompt(llama):
    # a cyclic prompt makes the model's own continuations repetitive, so
    # prompt-lookup drafts must actually be accepted (speedup > 1)
    params, cfg = llama
    prompt = np.tile(np.array([3, 17, 42, 8], np.int32), 8)[None, :]
    ref = generate(params, cfg, prompt, 40, cache_dtype=jnp.float32)
    got, stats = generate_speculative(params, cfg, prompt, 40, draft_len=6,
                                      cache_dtype=jnp.float32,
                                      return_stats=True)
    np.testing.assert_array_equal(got, ref)
    assert stats["accepted"] > 0
    # tokens per forward strictly beats one-token-per-step decode
    assert got.shape[1] / stats["forwards"] > 1.0


def test_speculative_quantized_packed_model(llama, rng):
    # the verify step must run through the packed (PackedLinear) path too
    from owq_tpu.models import arch_for_model
    from owq_tpu.recon.pipeline import quantize_model
    from owq_tpu.runtime.checkpoint import pack_model

    params, cfg = llama
    calib = rng.integers(0, 97, size=(4, 32)).astype(np.int32)
    import copy

    pq, quant = quantize_model(copy.deepcopy(params), cfg,
                               arch_for_model("llama"), calib, wbits=3,
                               target_rank=2, tuning="minmax", verbose=False)
    packed = pack_model(pq, quant, 3, weight_dtype=jnp.float32)
    prompt = np.tile(np.array([3, 17, 42, 8], np.int32), 4)[None, :]
    ref = generate(packed, cfg, prompt, 16, cache_dtype=jnp.float32)
    got = generate_speculative(packed, cfg, prompt, 16, draft_len=4,
                               cache_dtype=jnp.float32)
    np.testing.assert_array_equal(got, ref)


def test_speculative_eos_stops(llama):
    params, cfg = llama
    prompt = np.tile(np.array([3, 17, 42, 8], np.int32), 8)[None, :]
    full = generate_speculative(params, cfg, prompt, 30,
                                cache_dtype=jnp.float32)
    eos = int(full[0, 10])  # pretend some mid-sequence token is EOS
    got = generate_speculative(params, cfg, prompt, 30, eos_id=eos,
                               cache_dtype=jnp.float32)
    assert got.shape[1] <= full.shape[1]
    assert got[0, -1] == eos or got.shape[1] == 30
    # no tokens after the first eos
    hits = np.nonzero(got[0] == eos)[0]
    if len(hits):
        assert hits[0] == got.shape[1] - 1


@pytest.fixture(scope="module")
def llama_draft():
    # a SMALLER model with the same vocab as the llama fixture
    model = hf_tiny.tiny_llama(hidden=16, inter=32, layers=1, heads=2,
                               kv_heads=1, max_pos=256)
    return import_hf_model(model)


def test_draft_model_speculative_self_draft_accepts_all(llama, rng):
    # drafting with the target itself: every draft is the target's own
    # argmax, so all k drafts are accepted every round
    from owq_tpu.runtime.speculative import generate_speculative_draft

    params, cfg = llama
    prompt = rng.integers(0, 97, size=(1, 12)).astype(np.int32)
    ref = generate(params, cfg, prompt, 24, cache_dtype=jnp.float32)
    got, stats = generate_speculative_draft(
        params, cfg, params, cfg, prompt, 24, draft_len=4,
        cache_dtype=jnp.float32, return_stats=True)
    np.testing.assert_array_equal(got[0, :24], ref[0])
    assert stats["accepted"] == stats["drafted"]
    # 1 prefill + ceil(23/ (4+1)) verify rounds ≈ 6 target forwards
    assert stats["forwards"] <= 7


def test_draft_model_speculative_matches_greedy(llama, llama_draft, rng):
    # a different (smaller, differently-initialized) draft: low acceptance,
    # output must still be exactly the target's greedy tokens
    from owq_tpu.runtime.speculative import generate_speculative_draft

    params, cfg = llama
    dparams, dcfg = llama_draft
    prompt = rng.integers(0, 97, size=(1, 16)).astype(np.int32)
    ref = generate(params, cfg, prompt, 24, cache_dtype=jnp.float32)
    got, stats = generate_speculative_draft(
        params, cfg, dparams, dcfg, prompt, 24, draft_len=4,
        cache_dtype=jnp.float32, return_stats=True)
    np.testing.assert_array_equal(got[0, :24], ref[0])
    assert stats["drafted"] > 0


def test_draft_model_speculative_eos_stops(llama, llama_draft):
    from owq_tpu.runtime.speculative import generate_speculative_draft

    params, cfg = llama
    dparams, dcfg = llama_draft
    prompt = np.array([[3, 1, 4, 1, 5]], np.int32)
    ref = generate(params, cfg, prompt, 12, cache_dtype=jnp.float32)[0]
    eos = int(ref[3])  # pretend the 4th greedy token is EOS
    got = generate_speculative_draft(params, cfg, dparams, dcfg, prompt, 12,
                                     draft_len=4, cache_dtype=jnp.float32,
                                     eos_id=eos)
    np.testing.assert_array_equal(got[0], ref[:4])


def test_draft_model_speculative_rejects_hybrid():
    from owq_tpu.runtime.speculative import generate_speculative_draft

    params, cfg = import_hf_model(hf_tiny.tiny_bamba())
    with pytest.raises(ValueError, match="roll back"):
        generate_speculative_draft(params, cfg, params, cfg,
                                   np.array([[1, 2, 3]], np.int32), 4)
