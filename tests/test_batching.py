"""Continuous batching: per-slot decode must equal sequential generation."""

import numpy as np
import pytest

import jax.numpy as jnp

from owq_tpu.models import import_hf_model
from owq_tpu.runtime.batching import Engine
from owq_tpu.runtime.generate import generate
import hf_tiny


@pytest.fixture(scope="module")
def model_and_params():
    model = hf_tiny.tiny_llama(hidden=32, inter=64, layers=2, heads=4,
                               kv_heads=2, vocab=97, max_pos=128)
    params, cfg = import_hf_model(model)
    return params, cfg


def test_engine_matches_sequential_greedy(rng, model_and_params):
    params, cfg = model_and_params
    prompts = [rng.integers(0, 97, size=(n,)).astype(np.int32)
               for n in (5, 9, 3)]

    # sequential reference (batch=1 greedy each)
    want = []
    for p in prompts:
        toks = generate(params, cfg, p[None, :], 6, max_len=64,
                        cache_dtype=jnp.float32)
        want.append(toks[0].tolist())

    eng = Engine(params, cfg, max_batch=2, max_len=64,
                 cache_dtype=jnp.float32, compute_dtype=jnp.float32,
                 prompt_buckets=(16,))
    out = eng.run(prompts, max_new_tokens=6)
    got = [out[i] for i in sorted(out)]
    assert got == want
    assert eng.stats["generated_tokens"] == 18
    # 3 prompts through 2 slots -> batching actually interleaved
    assert eng.stats["prefills"] == 3


def test_engine_slot_reuse_and_queue(rng, model_and_params):
    params, cfg = model_and_params
    prompts = [rng.integers(0, 97, size=(4,)).astype(np.int32)
               for _ in range(5)]
    eng = Engine(params, cfg, max_batch=2, max_len=32,
                 cache_dtype=jnp.float32, compute_dtype=jnp.float32,
                 prompt_buckets=(8,))
    out = eng.run(prompts, max_new_tokens=3)
    assert len(out) == 5
    assert all(len(v) == 3 for v in out.values())


def test_engine_eos_stops(rng, model_and_params):
    params, cfg = model_and_params
    prompt = rng.integers(0, 97, size=(4,)).astype(np.int32)
    # find what greedy generates first, then use it as "EOS"
    first = generate(params, cfg, prompt[None, :], 1,
                     max_len=32, cache_dtype=jnp.float32)[0, 0]
    eng = Engine(params, cfg, max_batch=1, max_len=32,
                 cache_dtype=jnp.float32, compute_dtype=jnp.float32,
                 eos_token_id=int(first), prompt_buckets=(8,))
    out = eng.run([prompt], max_new_tokens=10)
    assert out[0][-1] == int(first)
    assert len(out[0]) == 1  # stopped immediately on EOS


def test_engine_gemma2_alternating_windows(rng):
    # alternating sliding/full per-layer masks must hold through the
    # engine's prefill-collect + per-slot decode path
    model = hf_tiny.tiny_gemma2(hidden=32, inter=48, layers=2, heads=4,
                                kv_heads=2, sliding_window=5, max_pos=128)
    params, cfg = import_hf_model(model)
    prompts = [rng.integers(0, 97, size=(n,)).astype(np.int32)
               for n in (9, 4)]
    want = [generate(params, cfg, p[None, :], 6, max_len=64,
                     cache_dtype=jnp.float32)[0].tolist() for p in prompts]
    eng = Engine(params, cfg, max_batch=2, max_len=64,
                 cache_dtype=jnp.float32, compute_dtype=jnp.float32,
                 prompt_buckets=(16,))
    out = eng.run(prompts, max_new_tokens=6)
    assert [out[i] for i in sorted(out)] == want


def test_engine_deepseek_mla(rng):
    # MLA caches per-head k at qk dim (12) and v at its own dim (8); the
    # engine's prefill-collect + slot insert + decode must carry both
    model = hf_tiny.tiny_deepseek_v3(layers=2, experts=4, n_group=2,
                                     topk_group=1)
    params, cfg = import_hf_model(model)
    prompts = [rng.integers(0, 97, size=(n,)).astype(np.int32)
               for n in (7, 4)]
    want = [generate(params, cfg, p[None, :], 5, max_len=64,
                     cache_dtype=jnp.float32)[0].tolist() for p in prompts]
    eng = Engine(params, cfg, max_batch=2, max_len=64,
                 cache_dtype=jnp.float32, compute_dtype=jnp.float32,
                 prompt_buckets=(16,))
    out = eng.run(prompts, max_new_tokens=5)
    assert [out[i] for i in sorted(out)] == want


def test_engine_bamba_hybrid(rng):
    # hybrid mamba2/attention through the engine: bucket-padded prefill
    # must leave exact conv/ssm states (pad steps freeze the recurrence,
    # conv state slices the last K REAL inputs), then per-slot decode
    model = hf_tiny.tiny_bamba()
    params, cfg = import_hf_model(model)
    prompts = [rng.integers(0, 97, size=(n,)).astype(np.int32)
               for n in (9, 5)]
    want = [generate(params, cfg, p[None, :], 6, max_len=64,
                     cache_dtype=jnp.float32)[0].tolist() for p in prompts]
    eng = Engine(params, cfg, max_batch=2, max_len=64,
                 cache_dtype=jnp.float32, compute_dtype=jnp.float32,
                 prompt_buckets=(16,))
    out = eng.run(prompts, max_new_tokens=6)
    assert [out[i] for i in sorted(out)] == want


def test_engine_jamba_mamba1(rng):
    # mamba-1 hybrid (jamba): ssm slot states are rank-3 [inner, d_state]
    # per layer, not mamba-2's [H, P, N] — insertion must be rank-agnostic
    model = hf_tiny.tiny_jamba()
    params, cfg = import_hf_model(model)
    prompts = [rng.integers(0, 97, size=(n,)).astype(np.int32)
               for n in (9, 5)]
    want = [generate(params, cfg, p[None, :], 6, max_len=64,
                     cache_dtype=jnp.float32)[0].tolist() for p in prompts]
    eng = Engine(params, cfg, max_batch=2, max_len=64,
                 cache_dtype=jnp.float32, compute_dtype=jnp.float32,
                 prompt_buckets=(16,))
    out = eng.run(prompts, max_new_tokens=6)
    assert [out[i] for i in sorted(out)] == want


def test_engine_mamba2_pure_ssm(rng):
    # attention-free mamba-2 LM through the engine: no kv bytes matter,
    # only the conv/ssm slot states carry the sequence
    model = hf_tiny.tiny_mamba2()
    params, cfg = import_hf_model(model)
    prompts = [rng.integers(0, 97, size=(n,)).astype(np.int32)
               for n in (7, 4)]
    want = [generate(params, cfg, p[None, :], 5, max_len=64,
                     cache_dtype=jnp.float32)[0].tolist() for p in prompts]
    eng = Engine(params, cfg, max_batch=2, max_len=64,
                 cache_dtype=jnp.float32, compute_dtype=jnp.float32,
                 prompt_buckets=(16,))
    out = eng.run(prompts, max_new_tokens=5)
    assert [out[i] for i in sorted(out)] == want


def test_engine_falcon_h1_dual(rng):
    # dual attention||mamba layers through the engine: both the kv slice
    # and the conv/ssm states must insert and decode per slot
    model = hf_tiny.tiny_falcon_h1()
    params, cfg = import_hf_model(model)
    prompts = [rng.integers(0, 97, size=(n,)).astype(np.int32)
               for n in (8, 5)]
    want = [generate(params, cfg, p[None, :], 5, max_len=64,
                     cache_dtype=jnp.float32)[0].tolist() for p in prompts]
    eng = Engine(params, cfg, max_batch=2, max_len=64,
                 cache_dtype=jnp.float32, compute_dtype=jnp.float32,
                 prompt_buckets=(16,))
    out = eng.run(prompts, max_new_tokens=5)
    assert [out[i] for i in sorted(out)] == want


def test_engine_qwen3_next_gdn(rng):
    # gated-delta-net layers through the engine slot pool
    model = hf_tiny.tiny_qwen3_next(layers=2)
    params, cfg = import_hf_model(model)
    prompts = [rng.integers(0, 97, size=(n,)).astype(np.int32)
               for n in (8, 5)]
    want = [generate(params, cfg, p[None, :], 5, max_len=64,
                     cache_dtype=jnp.float32)[0].tolist() for p in prompts]
    eng = Engine(params, cfg, max_batch=2, max_len=64,
                 cache_dtype=jnp.float32, compute_dtype=jnp.float32,
                 prompt_buckets=(16,))
    out = eng.run(prompts, max_new_tokens=5)
    assert [out[i] for i in sorted(out)] == want


def test_engine_minimax_lightning(rng):
    # lightning state through the engine: padded-bucket prefill rescales
    # the per-head decay exactly, then per-slot recurrent decode
    model = hf_tiny.tiny_minimax()
    params, cfg = import_hf_model(model)
    prompts = [rng.integers(0, 97, size=(n,)).astype(np.int32)
               for n in (9, 5)]
    want = [generate(params, cfg, p[None, :], 5, max_len=64,
                     cache_dtype=jnp.float32)[0].tolist() for p in prompts]
    eng = Engine(params, cfg, max_batch=2, max_len=64,
                 cache_dtype=jnp.float32, compute_dtype=jnp.float32,
                 prompt_buckets=(16,))
    out = eng.run(prompts, max_new_tokens=5)
    assert [out[i] for i in sorted(out)] == want


@pytest.mark.parametrize("family", ["llama", "bamba"])
def test_engine_tensor_parallel(rng, family):
    # TP serving: the engine shard_maps prefill/insert/decode over a 'tp'
    # mesh (KV pool sharded on the head axis, mixer states replicated) —
    # greedy outputs must match the single-device engine exactly
    import copy

    from owq_tpu.parallel import make_mesh

    makers = {
        "llama": lambda: hf_tiny.tiny_llama(hidden=32, inter=64, layers=2,
                                            heads=4, kv_heads=2, vocab=97,
                                            max_pos=128),
        "bamba": lambda: hf_tiny.tiny_bamba(),
    }
    params, cfg = import_hf_model(makers[family]())
    prompts = [rng.integers(0, 97, size=(n,)).astype(np.int32)
               for n in (9, 5, 3)]
    kw = dict(max_batch=2, max_len=64, cache_dtype=jnp.float32,
              compute_dtype=jnp.float32, prompt_buckets=(16,))
    want = Engine(params, cfg, **kw).run(prompts, max_new_tokens=6)
    mesh = make_mesh(dp=1, tp=2)
    eng = Engine(copy.deepcopy(params), cfg, mesh=mesh, **kw)
    got = eng.run(prompts, max_new_tokens=6)
    assert [got[i] for i in sorted(got)] == [want[i] for i in sorted(want)]


def test_engine_recurrentgemma_griffin(rng):
    # RG-LRU layers through the engine slot pool: rank-2 recurrent states,
    # pad-frozen bucket prefill, conv left-context continuation
    model = hf_tiny.tiny_recurrentgemma()
    params, cfg = import_hf_model(model)
    prompts = [rng.integers(0, 97, size=(n,)).astype(np.int32)
               for n in (9, 5)]
    want = [generate(params, cfg, p[None, :], 5, max_len=64,
                     cache_dtype=jnp.float32)[0].tolist() for p in prompts]
    eng = Engine(params, cfg, max_batch=2, max_len=64,
                 cache_dtype=jnp.float32, compute_dtype=jnp.float32,
                 prompt_buckets=(16,))
    out = eng.run(prompts, max_new_tokens=5)
    assert [out[i] for i in sorted(out)] == want


def test_batched_admission_matches_serial(rng, model_and_params):
    """The batched multi-slot admission (one prefill + one scatter insert
    per same-bucket burst, padded to a power of two) seats exactly the
    same first tokens and generations as the per-request path."""
    params, cfg = model_and_params
    prompts = [rng.integers(0, 97, size=(n,)).astype(np.int32)
               for n in (5, 9, 3, 7, 12, 2, 6)]  # 7 reqs -> padded bursts

    eng_b = Engine(params, cfg, max_batch=4, max_len=64,
                   cache_dtype=jnp.float32, compute_dtype=jnp.float32,
                   prompt_buckets=(8, 16))       # mixed buckets in a burst
    assert eng_b._bprefill is not None
    out_b = eng_b.run(prompts, max_new_tokens=5)

    eng_s = Engine(params, cfg, max_batch=4, max_len=64,
                   cache_dtype=jnp.float32, compute_dtype=jnp.float32,
                   prompt_buckets=(8, 16))
    eng_s._bprefill = None                        # force per-request path
    out_s = eng_s.run(prompts, max_new_tokens=5)
    assert [out_b[i] for i in sorted(out_b)] == \
           [out_s[i] for i in sorted(out_s)]
