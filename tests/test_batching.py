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


def test_engine_quant_kv_tensor_parallel(rng, model_and_params):
    """int8-KV serving composes with TP: the QuantKVCache pool (codes and
    per-row scales) shards on the head axis, each shard quantizes and
    patched-attends its local heads, and greedy outputs match the
    single-device quant_kv engine exactly (quantization is shard-local
    absmax over the head dim, so sharding cannot change the codes)."""
    import copy

    from owq_tpu.models.transformer import QuantKVCache
    from owq_tpu.parallel import make_mesh

    params, cfg = model_and_params
    prompts = [rng.integers(0, 97, size=(n,)).astype(np.int32)
               for n in (9, 5, 3)]
    kw = dict(max_batch=2, max_len=64, prompt_buckets=(16,), quant_kv=True)
    want = Engine(params, cfg, **kw).run(prompts, max_new_tokens=6)
    mesh = make_mesh(dp=1, tp=2)
    eng = Engine(copy.deepcopy(params), cfg, mesh=mesh, **kw)
    assert isinstance(eng.cache, QuantKVCache)
    got = eng.run(prompts, max_new_tokens=6)
    assert [got[i] for i in sorted(got)] == [want[i] for i in sorted(want)]


def test_engine_quant_kv_hybrid_raises(rng):
    model = hf_tiny.tiny_bamba()
    params, cfg = import_hf_model(model)
    with pytest.raises(ValueError, match="attention models only"):
        Engine(params, cfg, max_batch=2, max_len=32, quant_kv=True)


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


def test_engine_speculative_matches_plain(rng, model_and_params):
    """Engine(speculative=K) greedy outputs == plain engine outputs
    token-for-token (speculation is greedy-exact — only the dispatch
    count changes), and repetitive prompts actually accept drafts so the
    token/forward ratio beats one-token-per-step decode."""
    params, cfg = model_and_params
    pat = rng.integers(0, 97, size=(4,)).astype(np.int32)
    prompts = [np.tile(pat, 3), np.tile(pat[::-1].copy(), 2),
               rng.integers(0, 97, size=(5,)).astype(np.int32)]
    kw = dict(max_batch=2, max_len=96, cache_dtype=jnp.float32,
              compute_dtype=jnp.float32, prompt_buckets=(16,))
    want = Engine(params, cfg, **kw).run(prompts, max_new_tokens=20)
    eng = Engine(params, cfg, speculative=4, **kw)
    got = eng.run(prompts, max_new_tokens=20)
    assert [got[i] for i in sorted(got)] == [want[i] for i in sorted(want)]
    assert eng.stats["spec_forwards"] > 0
    assert eng.stats["spec_accepted"] > 0  # cyclic prompts must accept
    # dispatches strictly fewer than generated tokens (the point)
    assert eng.stats["spec_forwards"] < eng.stats["generated_tokens"]


def test_engine_speculative_eos_and_budget(rng, model_and_params):
    """EOS inside an accepted draft window truncates that slot exactly;
    token budgets never overshoot."""
    params, cfg = model_and_params
    pat = rng.integers(0, 97, size=(3,)).astype(np.int32)
    prompt = np.tile(pat, 4)
    ref = Engine(params, cfg, max_batch=1, max_len=96,
                 cache_dtype=jnp.float32, compute_dtype=jnp.float32,
                 prompt_buckets=(16,)).run([prompt], max_new_tokens=12)[0]
    eos = ref[len(ref) // 2]  # a token mid-stream becomes "EOS"
    kw = dict(max_batch=1, max_len=96, cache_dtype=jnp.float32,
              compute_dtype=jnp.float32, prompt_buckets=(16,),
              eos_token_id=int(eos))
    want = Engine(params, cfg, **kw).run([prompt], max_new_tokens=12)[0]
    got = Engine(params, cfg, speculative=4, **kw).run(
        [prompt], max_new_tokens=12)[0]
    assert got == want
    assert len(got) <= 12 and got[-1] == int(eos)


def test_engine_speculative_tensor_parallel(rng, model_and_params):
    """Speculative verify under a TP mesh: the [B, K+1] forward runs
    shard_map'd like the plain decode; outputs match single-device."""
    import copy

    from owq_tpu.parallel import make_mesh

    params, cfg = model_and_params
    pat = rng.integers(0, 97, size=(4,)).astype(np.int32)
    prompts = [np.tile(pat, 3), rng.integers(0, 97, size=(5,))
               .astype(np.int32)]
    kw = dict(max_batch=2, max_len=96, cache_dtype=jnp.float32,
              compute_dtype=jnp.float32, prompt_buckets=(16,),
              speculative=4)
    want = Engine(params, cfg, **kw).run(prompts, max_new_tokens=10)
    eng = Engine(copy.deepcopy(params), cfg, mesh=make_mesh(dp=1, tp=2),
                 **kw)
    got = eng.run(prompts, max_new_tokens=10)
    assert [got[i] for i in sorted(got)] == [want[i] for i in sorted(want)]


def test_engine_speculative_rejects_sampling_and_hybrid(rng):
    model = hf_tiny.tiny_bamba()
    params, cfg = import_hf_model(model)
    with pytest.raises(ValueError, match="attention models only"):
        Engine(params, cfg, max_batch=2, max_len=32, speculative=4)
    model2 = hf_tiny.tiny_llama(hidden=32, inter=64, layers=2, heads=4,
                                kv_heads=2, vocab=97, max_pos=128)
    params2, cfg2 = import_hf_model(model2)
    with pytest.raises(ValueError, match="greedy-exact"):
        Engine(params2, cfg2, max_batch=2, max_len=32, speculative=4,
               temperature=0.7)


def test_attention_core_q8_matches_dequant_patched(rng):
    """attention_core_q8 == dequantize-then-attention_core(kv_patch).

    Same math with the per-row scale factored out of the head-dim
    contraction (q.(codes*s/127) == (q.codes)*s/127), so the two paths
    must agree to fp tolerance — including the GQA repeat, the stale-row
    patch, and the exact-bf16 new-token value term.
    """
    import jax.numpy as jnp

    from owq_tpu.models.layers import attention_core, attention_core_q8
    from owq_tpu.models.transformer import _quantize_kv

    B, S, H, Hkv, hd = 3, 12, 4, 2, 8
    q = jnp.asarray(rng.standard_normal((B, 1, H, hd)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((B, S, Hkv, hd)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((B, S, Hkv, hd)), jnp.float32)
    kn = jnp.asarray(rng.standard_normal((B, 1, Hkv, hd)), jnp.float32)
    vn = jnp.asarray(rng.standard_normal((B, 1, Hkv, hd)), jnp.float32)
    pos = jnp.asarray([2, 0, S - 1], jnp.int32)  # stale-row edges
    bias = jnp.where(jnp.arange(S)[None, None, None, :]
                     <= pos[:, None, None, None], 0.0, -1e9)
    (kq, ks), (vq, vs) = _quantize_kv(k), _quantize_kv(v)
    k_deq = kq.astype(jnp.float32) * (ks[..., None] / 127.0)
    v_deq = vq.astype(jnp.float32) * (vs[..., None] / 127.0)

    want = attention_core(q, k_deq, v_deq, bias, scale=hd ** -0.5,
                          kv_patch=(kn, vn, pos))
    got = attention_core_q8(q, kq, vq, ks, vs, bias, scale=hd ** -0.5,
                            kv_patch=(kn, vn, pos))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-5, rtol=1e-4)


def test_quant_patched_decode_matches_generic_quant(rng, model_and_params,
                                                    monkeypatch):
    """The patched int8 decode branch vs the GENERIC quant-cache path.

    Same initial quantized cache, one decode step each way (the generic
    branch forced via transformer._QUANT_PATCHED_DECODE): the written
    cache — codes AND scale rows — must be BIT-EXACT (both quantize the
    same bf16 k/v slab), and the logits must agree within the
    quantize-the-new-row tolerance (the generic path attends the
    just-written QUANTIZED row; the patched path attends the exact bf16
    row — strictly more accurate).
    """
    import jax

    import owq_tpu.models.layers as L
    import owq_tpu.models.transformer as TR
    from owq_tpu.models.transformer import forward, init_quant_cache

    params, cfg = model_and_params
    ids = rng.integers(0, 97, size=(2, 6)).astype(np.int32)
    cache = init_quant_cache(cfg, batch=2, max_len=16)
    _, cache = forward(params, cfg, jnp.asarray(ids), cache=cache)

    step = rng.integers(0, 97, size=(2, 1)).astype(np.int32)
    # patched branch (the default for quantized T==1 decode) — spy that
    # it actually fires
    calls = []
    orig = L.attention_core_q8
    monkeypatch.setattr(L, "attention_core_q8",
                        lambda *a, **kw: calls.append(1) or orig(*a, **kw))
    with jax.disable_jit():
        lg_fast, c_fast = forward(params, cfg, jnp.asarray(step),
                                  cache=cache)
    assert calls, "patched int8 decode branch not active"

    # generic branch on the SAME cache state
    monkeypatch.setattr(TR, "_QUANT_PATCHED_DECODE", False)
    calls.clear()
    with jax.disable_jit():
        lg_gen, c_gen = forward(params, cfg, jnp.asarray(step), cache=cache)
    assert not calls, "generic branch still used attention_core_q8"

    # layer 0's written slab is bit-identical: both branches quantize the
    # SAME bf16 k/v (layers >= 1 see slightly different inputs because
    # the attended row differs — exact bf16 vs its int8 quantization —
    # so only the first layer's write is comparable bit-for-bit)
    pos = int(np.asarray(cache.length).reshape(-1)[0])
    for fld in ("k", "v", "k_scale", "v_scale"):
        np.testing.assert_array_equal(
            np.asarray(getattr(c_fast, fld))[0, :, pos],
            np.asarray(getattr(c_gen, fld))[0, :, pos])
    assert (np.asarray(c_fast.length) == np.asarray(cache.length) + 1).all()
    # the step's scale rows are finite and nonzero
    srow = np.asarray(c_fast.k_scale)[:, :, pos]
    assert np.isfinite(srow).all() and (srow > 0).all()
    # logits: only the just-written row is attended differently (exact
    # bf16 vs its int8 quantization) — tight tolerance, same argmax
    np.testing.assert_allclose(np.asarray(lg_fast), np.asarray(lg_gen),
                               atol=0.08, rtol=0.1)
    assert (np.argmax(np.asarray(lg_fast)[:, -1], -1)
            == np.argmax(np.asarray(lg_gen)[:, -1], -1)).all()


def test_engine_quant_kv_matches_manual_decode(rng, model_and_params):
    """Engine(quant_kv=True) == a manual int8-KV decode loop, exactly.

    The reference loop replays the engine's own numerics (cache-free
    prefill, quantized insert, per-step forward + f32 argmax) one
    request at a time, so greedy tokens must match token-for-token —
    this pins the engine WIRING (quantized insert, vector lengths,
    patched decode at batch); quantization *quality* is pinned by
    test_int8_kv_cache_close_to_fp and the attention_core_q8 test.
    """
    import jax

    from owq_tpu.models.transformer import QuantKVCache, forward
    from owq_tpu.runtime.batching import _insert_slot_q, _prefill_kv

    params, cfg = model_and_params
    prompts = [rng.integers(0, 97, size=(n,)).astype(np.int32)
               for n in (5, 9, 3)]

    want = []
    base = (cfg.num_layers, 1, 64, cfg.num_kv_heads)
    fwd = jax.jit(lambda p, t, c: forward(p, cfg, t, cache=c))
    for p in prompts:
        ids = np.zeros((1, 16), np.int32)
        ids[0, :p.size] = p
        n = jnp.asarray(p.size, jnp.int32)
        last, kvs = _prefill_kv(params, cfg, jnp.asarray(ids), n)
        cache = QuantKVCache(
            k=jnp.zeros(base + (cfg.head_dim,), jnp.int8),
            v=jnp.zeros(base + (cfg.v_dim,), jnp.int8),
            k_scale=jnp.ones(base, jnp.float32),
            v_scale=jnp.ones(base, jnp.float32),
            length=jnp.zeros((1,), jnp.int32))
        cache = _insert_slot_q(cache, kvs, jnp.asarray(0, jnp.int32), n)
        toks = [int(jnp.argmax(last.astype(jnp.float32)))]
        for _ in range(5):
            lg, cache = fwd(params, jnp.asarray([[toks[-1]]], jnp.int32),
                            cache)
            toks.append(int(jnp.argmax(lg[0, -1].astype(jnp.float32))))
        want.append(toks)

    eng_q = Engine(params, cfg, max_batch=2, max_len=64,
                   prompt_buckets=(16,), quant_kv=True)
    assert isinstance(eng_q.cache, QuantKVCache)
    out_q = eng_q.run(prompts, max_new_tokens=6, window=1)
    assert [out_q[i] for i in sorted(out_q)] == want


def test_engine_quant_kv_batched_admission(rng, model_and_params):
    """Batched bursts insert QUANTIZED prefill rows identical to the
    per-request quantized insert path."""
    params, cfg = model_and_params
    prompts = [rng.integers(0, 97, size=(n,)).astype(np.int32)
               for n in (5, 9, 3, 7, 12, 2)]
    eng_b = Engine(params, cfg, max_batch=4, max_len=64,
                   prompt_buckets=(16,), quant_kv=True)
    assert eng_b._bprefill is not None
    out_b = eng_b.run(prompts, max_new_tokens=5)
    eng_s = Engine(params, cfg, max_batch=4, max_len=64,
                   prompt_buckets=(16,), quant_kv=True)
    eng_s._bprefill = None
    out_s = eng_s.run(prompts, max_new_tokens=5)
    assert [out_b[i] for i in sorted(out_b)] == \
           [out_s[i] for i in sorted(out_s)]
