"""Logit parity of the generic decoder vs HuggingFace reference models."""

from functools import partial

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from owq_tpu.models import forward, import_hf_model, init_cache
import hf_tiny


@partial(jax.jit, static_argnames=("cfg",))
def _fwd(params, cfg, ids):
    return forward(params, cfg, ids)[0]


@partial(jax.jit, static_argnames=("cfg",))
def _fwd_cached(params, cfg, ids, cache):
    return forward(params, cfg, ids, cache=cache)


def _parity(model, ids, atol=2e-4):
    ref = hf_tiny.hf_logits(model, ids)
    params, cfg = import_hf_model(model)
    got = np.asarray(_fwd(params, cfg, jnp.asarray(ids)))
    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, atol=atol, rtol=1e-3)
    return params, cfg


def test_opt_parity(rng):
    model = hf_tiny.tiny_opt()
    ids = rng.integers(0, 97, size=(2, 12))
    _parity(model, ids)


def test_opt_350m_style_parity(rng):
    # project_in/out + post-norm ordering (the OPT-350m special case,
    # misc.py:106-107 in the reference)
    model = hf_tiny.tiny_opt(word_embed_proj_dim=24, do_layer_norm_before=False)
    ids = rng.integers(0, 97, size=(1, 9))
    _parity(model, ids)


def test_llama_parity_gqa(rng):
    model = hf_tiny.tiny_llama()
    ids = rng.integers(0, 97, size=(2, 11))
    _parity(model, ids)


def test_bloom_parity(rng):
    model = hf_tiny.tiny_bloom()
    ids = rng.integers(0, 97, size=(2, 10))
    _parity(model, ids)


def test_falcon_parity(rng):
    model = hf_tiny.tiny_falcon()
    ids = rng.integers(0, 97, size=(1, 13))
    _parity(model, ids)


def test_mistral_parity_sliding_window(rng):
    # window=5 over a 16-token prompt: local attention actually bites
    model = hf_tiny.tiny_mistral(sliding_window=5)
    ids = rng.integers(0, 97, size=(2, 16))
    params, cfg = _parity(model, ids)
    assert cfg.sliding_window == 5


def test_mistral_parity_no_window(rng):
    model = hf_tiny.tiny_mistral(sliding_window=None)
    ids = rng.integers(0, 97, size=(1, 12))
    _parity(model, ids)


def test_qwen2_parity_qkv_bias(rng):
    model = hf_tiny.tiny_qwen2()
    # qwen2 ships q/k/v biases; make sure they're nonzero in this fixture
    assert model.model.layers[0].self_attn.q_proj.bias is not None
    ids = rng.integers(0, 97, size=(2, 11))
    _parity(model, ids)


def test_gemma_parity(rng):
    # rmsnorm1p + sqrt(hidden) embed scale + head_dim override + tied head
    model = hf_tiny.tiny_gemma()
    ids = rng.integers(0, 97, size=(2, 10))
    params, cfg = _parity(model, ids, atol=5e-4)
    assert cfg.norm_type == "rmsnorm1p" and cfg.embed_scale is not None
    assert cfg.head_dim == 16


def test_neox_parity_parallel_residual(rng):
    # pythia-style: partial rotary (pct=0.25) + dual-norm parallel block
    model = hf_tiny.tiny_neox(rotary_pct=0.25, parallel=True)
    ids = rng.integers(0, 97, size=(2, 12))
    params, cfg = _parity(model, ids)
    assert cfg.family == "neox" and cfg.rotary_pct == 0.25


def test_neox_parity_sequential(rng):
    model = hf_tiny.tiny_neox(rotary_pct=1.0, parallel=False)
    ids = rng.integers(0, 97, size=(1, 9))
    _parity(model, ids)


@pytest.mark.parametrize("family", ["opt", "llama"])
def test_kv_cache_decode_matches_full_forward(rng, family):
    """Prefill+decode through the cache must equal one full forward."""
    model = hf_tiny.tiny_opt() if family == "opt" else hf_tiny.tiny_llama()
    params, cfg = import_hf_model(model)
    ids = rng.integers(0, 97, size=(1, 10)).astype(np.int32)

    full = np.asarray(_fwd(params, cfg, jnp.asarray(ids)))

    cache = init_cache(cfg, batch=1, max_len=16, dtype=jnp.float32)
    pre, cache = _fwd_cached(params, cfg, jnp.asarray(ids[:, :6]), cache)
    np.testing.assert_allclose(np.asarray(pre), full[:, :6], atol=2e-4, rtol=1e-3)
    for t in range(6, 10):
        step, cache = _fwd_cached(params, cfg, jnp.asarray(ids[:, t:t + 1]),
                                  cache)
        np.testing.assert_allclose(np.asarray(step)[0, 0], full[0, t],
                                   atol=3e-4, rtol=1e-3)


@pytest.mark.parametrize("scaling", [
    {"rope_type": "linear", "factor": 4.0},
    {"rope_type": "llama3", "factor": 4.0, "low_freq_factor": 1.0,
     "high_freq_factor": 4.0, "original_max_position_embeddings": 16},
    {"rope_type": "yarn", "factor": 4.0,
     "original_max_position_embeddings": 16},
], ids=["linear", "llama3", "yarn"])
def test_rope_scaling_parity(rng, scaling):
    # llama-3.1 / CodeLlama / yarn long-context checkpoints: the scaled
    # frequency schedules must match HF's modeling_rope_utils semantics
    model = hf_tiny.tiny_llama(max_pos=64, rope_scaling=scaling)
    ids = rng.integers(0, 97, size=(2, 24))
    _parity(model, ids)


def test_rope_scaling_dynamic_ntk_parity(rng):
    # dynamic NTK recomputes theta once positions exceed the pretraining
    # window; drive both implementations past it (T=32 > max_pos=16)
    model = hf_tiny.tiny_llama(max_pos=16,
                               rope_scaling={"rope_type": "dynamic",
                                             "factor": 4.0})
    ids = rng.integers(0, 97, size=(1, 32))
    _parity(model, ids)


def test_rope_scaling_dynamic_ntk_identity_below_window(rng):
    # at or below the pretraining window, dynamic NTK must be a no-op
    model = hf_tiny.tiny_llama(max_pos=64,
                               rope_scaling={"rope_type": "dynamic",
                                             "factor": 4.0})
    ids = rng.integers(0, 97, size=(1, 12))
    ref = hf_tiny.hf_logits(hf_tiny.tiny_llama(max_pos=64), ids)
    params, cfg = import_hf_model(model)
    got = np.asarray(_fwd(params, cfg, jnp.asarray(ids)))
    np.testing.assert_allclose(got, ref, atol=2e-4, rtol=1e-3)


def test_phi_parity(rng):
    # phi-2 style: parallel block (mlp reads the attn LN output), separate
    # biased q/k/v, partial rotary (0.5), biased lm_head
    model = hf_tiny.tiny_phi()
    ids = rng.integers(0, 97, size=(2, 10))
    _parity(model, ids)


def test_phi_parity_gqa(rng):
    model = hf_tiny.tiny_phi(kv_heads=2)
    ids = rng.integers(0, 97, size=(1, 9))
    _parity(model, ids)


def test_phi3_parity(rng):
    # phi-3: llama wiring with fused qkv_proj / gate_up_proj split at import
    model = hf_tiny.tiny_phi3()
    ids = rng.integers(0, 97, size=(2, 10))
    _parity(model, ids)


def test_phi3_longrope_parity(rng):
    # longrope per-dim factors; T beyond the pretraining window so HF picks
    # the long factors (rot/2 = 4 factors at head_dim 8)
    scaling = {"type": "longrope",
               "short_factor": [1.0, 1.1, 1.2, 1.3],
               "long_factor": [2.0, 4.0, 8.0, 16.0]}
    model = hf_tiny.tiny_phi3(max_pos=64, orig_max_pos=16,
                              rope_scaling=scaling)
    ids = rng.integers(0, 97, size=(1, 32))
    _parity(model, ids)


def test_stablelm_parity(rng):
    # stablelm: llama wiring + biased layernorm + partial rotary (0.25)
    model = hf_tiny.tiny_stablelm()
    ids = rng.integers(0, 97, size=(2, 10))
    _parity(model, ids)


def test_stablelm_parity_qkv_bias(rng):
    model = hf_tiny.tiny_stablelm(qkv_bias=True)
    ids = rng.integers(0, 97, size=(1, 9))
    _parity(model, ids)


def test_mpt_parity(rng):
    # mpt: alibi (mpt slope schedule), fused Wqkv, bias-less layernorm
    model = hf_tiny.tiny_mpt()
    ids = rng.integers(0, 97, size=(2, 10))
    _parity(model, ids)


def test_mpt_parity_nonpow2_heads_clip_qkv(rng):
    # 6 heads exercises the ceil-pow2 odd/even slope interleave; clip_qkv
    # exercises the fused-projection clamp
    model = hf_tiny.tiny_mpt(hidden=48, heads=6, clip_qkv=0.4, no_bias=False)
    ids = rng.integers(0, 97, size=(1, 12))
    _parity(model, ids)


def test_mpt_cache_decode_matches_full(rng):
    model = hf_tiny.tiny_mpt()
    params, cfg = import_hf_model(model)
    ids = rng.integers(0, 97, size=(1, 8)).astype(np.int32)
    full = np.asarray(_fwd(params, cfg, jnp.asarray(ids)))
    cache = init_cache(cfg, 1, 16, dtype=jnp.float32)
    logits, cache = _fwd_cached(params, cfg, jnp.asarray(ids[:, :5]), cache)
    step = np.asarray(logits)[:, -1]
    np.testing.assert_allclose(step, full[:, 4], atol=1e-4, rtol=1e-3)
    for t in range(5, 8):
        logits, cache = _fwd_cached(params, cfg, jnp.asarray(ids[:, t:t + 1]),
                                    cache)
        np.testing.assert_allclose(np.asarray(logits)[:, -1], full[:, t],
                                   atol=1e-4, rtol=1e-3)


def test_phi_cache_decode_matches_full(rng):
    model = hf_tiny.tiny_phi()
    params, cfg = import_hf_model(model)
    ids = rng.integers(0, 97, size=(1, 8)).astype(np.int32)
    full = np.asarray(_fwd(params, cfg, jnp.asarray(ids)))
    cache = init_cache(cfg, 1, 16, dtype=jnp.float32)
    logits, cache = _fwd_cached(params, cfg, jnp.asarray(ids[:, :5]), cache)
    np.testing.assert_allclose(np.asarray(logits)[:, -1], full[:, 4],
                               atol=1e-4, rtol=1e-3)
    for t in range(5, 8):
        logits, cache = _fwd_cached(params, cfg, jnp.asarray(ids[:, t:t + 1]),
                                    cache)
        np.testing.assert_allclose(np.asarray(logits)[:, -1], full[:, t],
                                   atol=1e-4, rtol=1e-3)


def test_qwen3_parity(rng):
    # per-head rms qk-norm before rope + head_dim override
    model = hf_tiny.tiny_qwen3()
    ids = rng.integers(0, 97, size=(2, 10))
    _parity(model, ids)


def test_gemma2_parity(rng):
    # sandwich norms (pre+post attn/ffn), logit softcapping (attn + final),
    # query_pre_attn_scalar scale, alternating sliding window
    model = hf_tiny.tiny_gemma2()
    ids = rng.integers(0, 97, size=(2, 12))
    _parity(model, ids, atol=5e-4)


def test_olmo2_parity(rng):
    # no pre-norms, branch-output norms, whole-projection qk rmsnorm
    model = hf_tiny.tiny_olmo2()
    ids = rng.integers(0, 97, size=(2, 10))
    _parity(model, ids)


def test_qwen3_cache_decode_matches_full(rng):
    model = hf_tiny.tiny_qwen3()
    params, cfg = import_hf_model(model)
    ids = rng.integers(0, 97, size=(1, 8)).astype(np.int32)
    full = np.asarray(_fwd(params, cfg, jnp.asarray(ids)))
    cache = init_cache(cfg, 1, 16, dtype=jnp.float32)
    logits, cache = _fwd_cached(params, cfg, jnp.asarray(ids[:, :5]), cache)
    np.testing.assert_allclose(np.asarray(logits)[:, -1], full[:, 4],
                               atol=1e-4, rtol=1e-3)
    for t in range(5, 8):
        logits, cache = _fwd_cached(params, cfg, jnp.asarray(ids[:, t:t + 1]),
                                    cache)
        np.testing.assert_allclose(np.asarray(logits)[:, -1], full[:, t],
                                   atol=1e-4, rtol=1e-3)


def test_gemma2_cache_decode_matches_full(rng):
    # per-layer alternating windows must hold through the cached path
    model = hf_tiny.tiny_gemma2(sliding_window=5, max_pos=64)
    params, cfg = import_hf_model(model)
    ids = rng.integers(0, 97, size=(1, 10)).astype(np.int32)
    full = np.asarray(_fwd(params, cfg, jnp.asarray(ids)))
    cache = init_cache(cfg, 1, 16, dtype=jnp.float32)
    logits, cache = _fwd_cached(params, cfg, jnp.asarray(ids[:, :6]), cache)
    np.testing.assert_allclose(np.asarray(logits)[:, -1], full[:, 5],
                               atol=2e-4, rtol=1e-3)
    for t in range(6, 10):
        logits, cache = _fwd_cached(params, cfg, jnp.asarray(ids[:, t:t + 1]),
                                    cache)
        np.testing.assert_allclose(np.asarray(logits)[:, -1], full[:, t],
                                   atol=2e-4, rtol=1e-3)


def test_starcoder2_parity(rng):
    # llama-shaped attention + plain biased MLP + biased layernorm
    model = hf_tiny.tiny_starcoder2()
    ids = rng.integers(0, 97, size=(2, 10))
    _parity(model, ids)


def test_starcoder2_parity_sliding_window(rng):
    model = hf_tiny.tiny_starcoder2(sliding_window=5)
    ids = rng.integers(0, 97, size=(1, 12))
    _parity(model, ids)


def test_gpt_bigcode_parity_mqa(rng):
    # starcoder-1/santacoder: gpt2 wiring, MQA c_attn, nn.Linear weights
    model = hf_tiny.tiny_gpt_bigcode(multi_query=True)
    ids = rng.integers(0, 97, size=(2, 10))
    _parity(model, ids)


def test_gpt_bigcode_parity_mha(rng):
    model = hf_tiny.tiny_gpt_bigcode(multi_query=False)
    ids = rng.integers(0, 97, size=(1, 9))
    _parity(model, ids)


def test_olmo_parity(rng):
    # non-parametric layernorm (no scale/bias anywhere)
    model = hf_tiny.tiny_olmo()
    ids = rng.integers(0, 97, size=(2, 10))
    _parity(model, ids)


def test_olmo_parity_clip_qkv(rng):
    model = hf_tiny.tiny_olmo(clip_qkv=0.2)
    ids = rng.integers(0, 97, size=(1, 11))
    _parity(model, ids)


def test_gpt2_parity(rng):
    # Conv1D weights (no transpose), fused c_attn concat qkv, wpe positions
    # without the OPT +2 offset, tied head
    model = hf_tiny.tiny_gpt2()
    ids = rng.integers(0, 97, size=(2, 12))
    params, cfg = _parity(model, ids)
    assert cfg.family == "gpt2" and cfg.pos_offset == 0


def test_gptj_parity(rng):
    # interleaved (rotate-every-two) partial rotary + single-LN parallel
    # block + untied biased lm_head
    model = hf_tiny.tiny_gptj()
    ids = rng.integers(0, 97, size=(2, 11))
    params, cfg = _parity(model, ids)
    assert cfg.rope_style == "interleaved" and cfg.rotary_dim == 4
    assert params["lm_head"].b is not None


def test_gptj_cache_decode_matches_full(rng):
    model = hf_tiny.tiny_gptj()
    params, cfg = import_hf_model(model)
    ids = rng.integers(0, 97, size=(1, 10)).astype(np.int32)
    full = np.asarray(_fwd(params, cfg, jnp.asarray(ids)))
    cache = init_cache(cfg, batch=1, max_len=16, dtype=jnp.float32)
    pre, cache = _fwd_cached(params, cfg, jnp.asarray(ids[:, :6]), cache)
    np.testing.assert_allclose(np.asarray(pre), full[:, :6], atol=2e-4,
                               rtol=1e-3)
    for t in range(6, 10):
        step, cache = _fwd_cached(params, cfg, jnp.asarray(ids[:, t:t + 1]),
                                  cache)
        np.testing.assert_allclose(np.asarray(step)[0, 0], full[0, t],
                                   atol=3e-4, rtol=1e-3)


def test_mixtral_parity_moe(rng):
    """Sparse-MoE routing (top-2 of 4 experts) matches HF Mixtral."""
    model = hf_tiny.tiny_mixtral()
    ids = rng.integers(0, 97, size=(2, 12))
    params, cfg = _parity(model, ids)
    assert cfg.num_experts == 4 and cfg.num_experts_per_tok == 2


def test_mixtral_cache_decode_matches_full(rng):
    model = hf_tiny.tiny_mixtral()
    params, cfg = import_hf_model(model)
    ids = rng.integers(0, 97, size=(1, 10)).astype(np.int32)
    full = np.asarray(_fwd(params, cfg, jnp.asarray(ids)))
    cache = init_cache(cfg, batch=1, max_len=16, dtype=jnp.float32)
    pre, cache = _fwd_cached(params, cfg, jnp.asarray(ids[:, :6]), cache)
    np.testing.assert_allclose(np.asarray(pre), full[:, :6], atol=2e-4,
                               rtol=1e-3)
    for t in range(6, 10):
        step, cache = _fwd_cached(params, cfg, jnp.asarray(ids[:, t:t + 1]),
                                  cache)
        np.testing.assert_allclose(np.asarray(step)[0, 0], full[0, t],
                                   atol=3e-4, rtol=1e-3)


def test_sliding_window_cache_decode_matches_full(rng):
    """Sliding-window attention must be consistent between the uncached
    full forward and the prefill+decode cache path (the window is applied
    by absolute positions, so cached keys outside it are masked)."""
    model = hf_tiny.tiny_mistral(sliding_window=5)
    params, cfg = import_hf_model(model)
    ids = rng.integers(0, 97, size=(1, 12)).astype(np.int32)

    full = np.asarray(_fwd(params, cfg, jnp.asarray(ids)))
    cache = init_cache(cfg, batch=1, max_len=16, dtype=jnp.float32)
    pre, cache = _fwd_cached(params, cfg, jnp.asarray(ids[:, :7]), cache)
    np.testing.assert_allclose(np.asarray(pre), full[:, :7], atol=2e-4,
                               rtol=1e-3)
    for t in range(7, 12):
        step, cache = _fwd_cached(params, cfg, jnp.asarray(ids[:, t:t + 1]),
                                  cache)
        np.testing.assert_allclose(np.asarray(step)[0, 0], full[0, t],
                                   atol=3e-4, rtol=1e-3)


def test_neox_cache_decode_matches_full(rng):
    """Partial-rotary decode through the KV cache == full forward."""
    model = hf_tiny.tiny_neox(rotary_pct=0.25, parallel=True)
    params, cfg = import_hf_model(model)
    ids = rng.integers(0, 97, size=(1, 10)).astype(np.int32)
    full = np.asarray(_fwd(params, cfg, jnp.asarray(ids)))
    cache = init_cache(cfg, batch=1, max_len=16, dtype=jnp.float32)
    pre, cache = _fwd_cached(params, cfg, jnp.asarray(ids[:, :6]), cache)
    np.testing.assert_allclose(np.asarray(pre), full[:, :6], atol=2e-4,
                               rtol=1e-3)
    for t in range(6, 10):
        step, cache = _fwd_cached(params, cfg, jnp.asarray(ids[:, t:t + 1]),
                                  cache)
        np.testing.assert_allclose(np.asarray(step)[0, 0], full[0, t],
                                   atol=3e-4, rtol=1e-3)


def test_int8_kv_cache_close_to_fp(rng):
    """Quantized KV cache decode stays close to the fp cache path."""
    from owq_tpu.models import init_quant_cache

    model = hf_tiny.tiny_llama()
    params, cfg = import_hf_model(model)
    ids = rng.integers(0, 97, size=(1, 10)).astype(np.int32)

    full = np.asarray(_fwd(params, cfg, jnp.asarray(ids)))

    cache = init_quant_cache(cfg, batch=1, max_len=16)
    pre, cache = _fwd_cached(params, cfg, jnp.asarray(ids[:, :6]), cache)
    # int8 KV: small quantization error, but same argmax behavior expected
    np.testing.assert_allclose(np.asarray(pre), full[:, :6], atol=0.05,
                               rtol=0.1)
    for t in range(6, 10):
        step, cache = _fwd_cached(params, cfg, jnp.asarray(ids[:, t:t + 1]),
                                  cache)
        assert np.argmax(np.asarray(step)[0, 0]) == np.argmax(full[0, t])


def test_cohere_parity(rng):
    # parallel block (shared LN) + gated mlp + interleaved rope + logit_scale
    model = hf_tiny.tiny_cohere()
    ids = rng.integers(0, 97, size=(2, 11))
    params, cfg = _parity(model, ids)
    assert cfg.parallel_block and cfg.gated_mlp
    assert cfg.logit_scale == 0.0625 and cfg.rope_style == "interleaved"


def test_cohere_parity_qk_norm(rng):
    # per-head mean-centering LN on q/k (weights [H, hd], no bias)
    model = hf_tiny.tiny_cohere(use_qk_norm=True)
    ids = rng.integers(0, 97, size=(1, 9))
    params, cfg = _parity(model, ids)
    assert cfg.qk_norm == "head_ln"


def test_cohere2_parity_alternating_nope(rng):
    # rope only on sliding-window layers; full-attention layers are NoPE
    model = hf_tiny.tiny_cohere2(sliding_window=6, pattern=2)
    ids = rng.integers(0, 97, size=(2, 12))
    params, cfg = _parity(model, ids)
    assert cfg.rope_layers is not None and 0 in cfg.rope_layers


def test_granite_parity(rng):
    # embedding/attention/residual multipliers + logits_scaling
    model = hf_tiny.tiny_granite()
    ids = rng.integers(0, 97, size=(2, 10))
    params, cfg = _parity(model, ids)
    assert cfg.attn_scale == 0.015625 and cfg.residual_multiplier == 0.22
    assert cfg.embed_scale == 6.0 and cfg.logit_scale == 0.125


def test_nemotron_parity(rng):
    # layernorm1p (weight+1) + relu^2 plain MLP + partial rotary
    model = hf_tiny.tiny_nemotron()
    ids = rng.integers(0, 97, size=(2, 11))
    params, cfg = _parity(model, ids)
    assert cfg.norm_type == "layernorm1p" and cfg.activation == "relu2"


def test_persimmon_parity_qk_layernorm(rng):
    # fused neox-layout qkv + per-head LN (shared weights + bias) + relu^2
    model = hf_tiny.tiny_persimmon(qk_layernorm=True)
    ids = rng.integers(0, 97, size=(2, 10))
    params, cfg = _parity(model, ids)
    assert cfg.fused_qkv and cfg.qk_norm == "head_ln"


def test_persimmon_parity_no_qk_norm(rng):
    model = hf_tiny.tiny_persimmon(qk_layernorm=False)
    ids = rng.integers(0, 97, size=(1, 8))
    _parity(model, ids)


def test_smollm3_parity_nope_layers(rng):
    # every rope_interval-th layer skips rope (no_rope_layers)
    model = hf_tiny.tiny_smollm3(rope_interval=2)
    ids = rng.integers(0, 97, size=(2, 12))
    params, cfg = _parity(model, ids)
    assert cfg.rope_layers is not None and 0 in cfg.rope_layers


def test_glm_parity(rng):
    # interleaved partial rotary + qkv biases + fused gate_up split
    model = hf_tiny.tiny_glm(v4=False)
    ids = rng.integers(0, 97, size=(2, 10))
    params, cfg = _parity(model, ids)
    assert cfg.rope_style == "interleaved" and cfg.rotary_pct == 0.5


def test_glm4_parity_sandwich_norms(rng):
    model = hf_tiny.tiny_glm(v4=True)
    ids = rng.integers(0, 97, size=(2, 10))
    params, cfg = _parity(model, ids)
    assert cfg.branch_norms


def test_cohere2_cache_decode_matches_full(rng):
    from owq_tpu.models import import_hf_model

    model = hf_tiny.tiny_cohere2(sliding_window=5, pattern=2)
    params, cfg = import_hf_model(model)
    ids = rng.integers(0, 97, size=(1, 10)).astype(np.int32)
    full = np.asarray(_fwd(params, cfg, jnp.asarray(ids)))
    cache = init_cache(cfg, batch=1, max_len=16, dtype=jnp.float32)
    logits, cache = _fwd_cached(params, cfg, jnp.asarray(ids[:, :6]), cache)
    step = np.asarray(logits)[:, -1]
    np.testing.assert_allclose(step, full[:, 5], atol=2e-4, rtol=1e-3)
    for t in range(6, 10):
        logits, cache = _fwd_cached(params, cfg, jnp.asarray(ids[:, t:t + 1]),
                                    cache)
        np.testing.assert_allclose(np.asarray(logits)[:, 0], full[:, t],
                                   atol=2e-4, rtol=1e-3)


def test_deepseek_v3_parity_mla_moe(rng):
    # MLA (low-rank q/kv, shared rope key) + sigmoid noaux-tc group routing
    # + shared experts + dense first-k layer + interleaved rope
    model = hf_tiny.tiny_deepseek_v3()
    ids = rng.integers(0, 97, size=(2, 11))
    params, cfg = _parity(model, ids)
    assert cfg.mla and cfg.router_kind == "deepseek_v3"
    assert cfg.n_shared_experts == 1 and cfg.first_k_dense == 1


def test_deepseek_v3_parity_no_interleave(rng):
    model = hf_tiny.tiny_deepseek_v3(interleave=False)
    ids = rng.integers(0, 97, size=(1, 9))
    params, cfg = _parity(model, ids)
    assert cfg.rope_style == "half"


def test_deepseek_v2_parity_lite(rng):
    # v2-lite: no q low-rank projection; greedy softmax routing, no renorm
    model = hf_tiny.tiny_deepseek_v2(q_lora=None, topk_method="greedy")
    ids = rng.integers(0, 97, size=(2, 10))
    params, cfg = _parity(model, ids)
    assert cfg.mla and cfg.q_lora_rank is None
    assert cfg.router_kind == "deepseek_v2" and not cfg.router_norm_topk


def test_deepseek_v2_parity_group_limited(rng):
    model = hf_tiny.tiny_deepseek_v2(q_lora=24,
                                     topk_method="group_limited_greedy",
                                     n_group=2, topk_group=1)
    ids = rng.integers(0, 97, size=(2, 10))
    params, cfg = _parity(model, ids)
    assert cfg.n_group == 2


def test_deepseek_v3_cache_decode_matches_full(rng):
    # the MLA cache stores per-head k at qk dim and v at its own dim
    model = hf_tiny.tiny_deepseek_v3()
    params, cfg = import_hf_model(model)
    ids = rng.integers(0, 97, size=(1, 10)).astype(np.int32)
    full = np.asarray(_fwd(params, cfg, jnp.asarray(ids)))
    cache = init_cache(cfg, batch=1, max_len=16, dtype=jnp.float32)
    assert cache.k.shape[-1] == 12 and cache.v.shape[-1] == 8
    logits, cache = _fwd_cached(params, cfg, jnp.asarray(ids[:, :6]), cache)
    np.testing.assert_allclose(np.asarray(logits)[:, -1], full[:, 5],
                               atol=2e-4, rtol=1e-3)
    for t in range(6, 10):
        logits, cache = _fwd_cached(params, cfg, jnp.asarray(ids[:, t:t + 1]),
                                    cache)
        np.testing.assert_allclose(np.asarray(logits)[:, 0], full[:, t],
                                   atol=2e-4, rtol=1e-3)


def test_gpt_oss_parity(rng):
    # attention sinks + alternating sliding windows + biased projections +
    # clamped-swiglu MoE with softmax-over-topk routing
    model = hf_tiny.tiny_gpt_oss()
    ids = rng.integers(0, 97, size=(2, 12))
    params, cfg = _parity(model, ids)
    assert cfg.attn_sinks and cfg.router_kind == "gpt_oss"
    assert cfg.moe_act == "gpt_oss" and cfg.layer_types is not None


def test_gpt_oss_parity_yarn(rng):
    sc = {"rope_type": "yarn", "factor": 4.0, "beta_fast": 32.0,
          "beta_slow": 1.0, "truncate": False,
          "original_max_position_embeddings": 16}
    model = hf_tiny.tiny_gpt_oss(rope_scaling=sc)
    ids = rng.integers(0, 97, size=(1, 10))
    _parity(model, ids, atol=3e-4)


def test_qwen2_moe_parity_shared_gate(rng):
    # sigmoid-gated shared expert + unnormalized topk routing
    model = hf_tiny.tiny_qwen2_moe(norm_topk=False)
    ids = rng.integers(0, 97, size=(2, 10))
    params, cfg = _parity(model, ids)
    assert cfg.n_shared_experts == 1 and not cfg.router_norm_topk


def test_qwen3_moe_parity(rng):
    model = hf_tiny.tiny_qwen3_moe()
    ids = rng.integers(0, 97, size=(2, 10))
    params, cfg = _parity(model, ids)
    assert cfg.qk_norm == "head" and cfg.router_norm_topk


def test_glm4_moe_parity(rng):
    # half-style partial rotary (unlike glm4's interleaved), per-head rms
    # qk-norm, deepseek-v3 noaux-tc routing, shared experts, dense layer 0
    model = hf_tiny.tiny_glm4_moe()
    ids = rng.integers(0, 97, size=(2, 11))
    params, cfg = _parity(model, ids)
    assert cfg.router_kind == "deepseek_v3" and cfg.rope_style == "half"
    assert cfg.first_k_dense == 1


def test_gpt_oss_cache_decode_matches_full(rng):
    model = hf_tiny.tiny_gpt_oss(sliding_window=5)
    params, cfg = import_hf_model(model)
    ids = rng.integers(0, 97, size=(1, 10)).astype(np.int32)
    full = np.asarray(_fwd(params, cfg, jnp.asarray(ids)))
    cache = init_cache(cfg, batch=1, max_len=16, dtype=jnp.float32)
    logits, cache = _fwd_cached(params, cfg, jnp.asarray(ids[:, :6]), cache)
    np.testing.assert_allclose(np.asarray(logits)[:, -1], full[:, 5],
                               atol=2e-4, rtol=1e-3)
    for t in range(6, 10):
        logits, cache = _fwd_cached(params, cfg, jnp.asarray(ids[:, t:t + 1]),
                                    cache)
        np.testing.assert_allclose(np.asarray(logits)[:, 0], full[:, t],
                                   atol=2e-4, rtol=1e-3)


def test_dbrx_parity(rng):
    # fused clipped Wqkv + layernorm (weight-only) + L1-renormed MoE routing
    model = hf_tiny.tiny_dbrx()
    ids = rng.integers(0, 97, size=(2, 11))
    params, cfg = _parity(model, ids)
    assert cfg.fused_qkv and cfg.qkv_clip == 8.0 and cfg.num_experts == 4


def test_olmoe_parity(rng):
    # whole-projection rms qk-norm BEFORE clip + unnormalized topk routing
    model = hf_tiny.tiny_olmoe(clip_qkv=6.0)
    ids = rng.integers(0, 97, size=(2, 10))
    params, cfg = _parity(model, ids)
    assert cfg.qk_norm == "proj" and cfg.qkv_clip == 6.0


def test_helium_parity(rng):
    model = hf_tiny.tiny_helium()
    ids = rng.integers(0, 97, size=(2, 10))
    params, cfg = _parity(model, ids)
    assert cfg.rope_style == "interleaved" and cfg.head_dim == 8


def test_arcee_parity(rng):
    # llama attention + plain relu^2 MLP + rmsnorm (nemotron wiring)
    model = hf_tiny.tiny_arcee()
    ids = rng.integers(0, 97, size=(2, 10))
    params, cfg = _parity(model, ids)
    assert cfg.family == "nemotron" and cfg.norm_type == "rmsnorm"
    assert cfg.activation == "relu2" and not cfg.gated_mlp


def test_seed_oss_parity(rng):
    model = hf_tiny.tiny_seed_oss()
    ids = rng.integers(0, 97, size=(2, 10))
    params, cfg = _parity(model, ids)
    assert cfg.attn_bias and cfg.head_dim == 16


def test_ernie45_parity(rng):
    # biased linears everywhere + interleaved rope
    model = hf_tiny.tiny_ernie45(use_bias=True)
    ids = rng.integers(0, 97, size=(2, 10))
    params, cfg = _parity(model, ids)
    assert cfg.attn_bias and cfg.mlp_bias and cfg.rope_style == "interleaved"


def test_exaone4_parity_hybrid_nope(rng):
    # post-only branch norms + per-head qk-norm; rope and the window only on
    # sliding layers (global full-attention layers are NoPE)
    model = hf_tiny.tiny_exaone4()
    ids = rng.integers(0, 97, size=(2, 12))
    params, cfg = _parity(model, ids)
    assert cfg.rope_layers == (1, 0, 1, 0) and cfg.qk_norm == "head"
    assert not cfg.input_norms and cfg.branch_norms


def test_exaone4_cache_decode_matches_full(rng):
    model = hf_tiny.tiny_exaone4()
    params, cfg = import_hf_model(model)
    ids = rng.integers(0, 97, size=(1, 10)).astype(np.int32)
    full = np.asarray(_fwd(params, cfg, jnp.asarray(ids)))
    cache = init_cache(cfg, batch=1, max_len=16, dtype=jnp.float32)
    logits, cache = _fwd_cached(params, cfg, jnp.asarray(ids[:, :6]), cache)
    np.testing.assert_allclose(np.asarray(logits)[:, -1], full[:, 5],
                               atol=2e-4, rtol=1e-3)
    for t in range(6, 10):
        logits, cache = _fwd_cached(params, cfg, jnp.asarray(ids[:, t:t + 1]),
                                    cache)
        np.testing.assert_allclose(np.asarray(logits)[:, 0], full[:, t],
                                   atol=2e-4, rtol=1e-3)


def test_llama4_parity(rng):
    # chunked attention on rope layers, NoPE + log-position q temperature on
    # the rest, post-rope L2 qk-norm, sigmoid input-weighted routing with a
    # shared expert, interleaved dense/MoE layers
    model = hf_tiny.tiny_llama4()
    ids = rng.integers(0, 97, size=(2, 12))
    params, cfg = _parity(model, ids)
    assert cfg.router_kind == "llama4" and cfg.moe_weight_inputs
    assert cfg.qk_norm == "l2" and cfg.attn_temperature_tuning
    assert cfg.attention_chunk_size == 8 and cfg.rope_layers == (1, 1, 1, 0)


def test_llama4_parity_long_chunked(rng):
    # prompt spanning several attention chunks: the chunk mask bites
    model = hf_tiny.tiny_llama4(chunk=4, temp_tuning=False)
    ids = rng.integers(0, 97, size=(1, 17))
    _parity(model, ids)


def test_llama4_cache_decode_matches_full(rng):
    model = hf_tiny.tiny_llama4(chunk=4)
    params, cfg = import_hf_model(model)
    ids = rng.integers(0, 97, size=(1, 11)).astype(np.int32)
    full = np.asarray(_fwd(params, cfg, jnp.asarray(ids)))
    cache = init_cache(cfg, batch=1, max_len=16, dtype=jnp.float32)
    logits, cache = _fwd_cached(params, cfg, jnp.asarray(ids[:, :6]), cache)
    np.testing.assert_allclose(np.asarray(logits)[:, -1], full[:, 5],
                               atol=2e-4, rtol=1e-3)
    for t in range(6, 11):
        logits, cache = _fwd_cached(params, cfg, jnp.asarray(ids[:, t:t + 1]),
                                    cache)
        np.testing.assert_allclose(np.asarray(logits)[:, 0], full[:, t],
                                   atol=2e-4, rtol=1e-3)


def test_hunyuan_dense_parity(rng):
    # per-head rms qk-norm applied AFTER rope
    model = hf_tiny.tiny_hunyuan_dense()
    ids = rng.integers(0, 97, size=(2, 11))
    params, cfg = _parity(model, ids)
    assert cfg.qk_norm == "head_post"


def test_hunyuan_moe_parity(rng):
    model = hf_tiny.tiny_hunyuan_moe()
    ids = rng.integers(0, 97, size=(2, 10))
    params, cfg = _parity(model, ids)
    assert cfg.num_experts == 4 and cfg.n_shared_experts == 1


def test_phimoe_parity_sparsemixer(rng):
    # deterministic two-pass sparsemixer routing + LayerNorm blocks
    model = hf_tiny.tiny_phimoe()
    ids = rng.integers(0, 97, size=(2, 11))
    params, cfg = _parity(model, ids)
    assert cfg.router_kind == "phimoe" and cfg.norm_type == "layernorm"


def test_granitemoe_shared_parity(rng):
    # granite muP multipliers + jetmoe gating (softmax over top-k logits) +
    # fused 3D experts + ungated layer-level shared mlp
    model = hf_tiny.tiny_granitemoe(shared=True)
    ids = rng.integers(0, 97, size=(2, 11))
    params, cfg = _parity(model, ids)
    assert cfg.router_kind == "gpt_oss" and cfg.n_shared_experts == 1
    assert cfg.residual_multiplier == 0.3 and cfg.logit_scale == 0.2


def test_granitemoe_parity_no_shared(rng):
    model = hf_tiny.tiny_granitemoe(shared=False)
    ids = rng.integers(0, 97, size=(1, 9))
    params, cfg = _parity(model, ids)
    assert cfg.n_shared_experts == 0


def test_bamba_parity_hybrid_ssd(rng):
    # mamba2 chunked SSD layers + one attention layer (partial rotary GQA);
    # sequence length deliberately not a multiple of the chunk size
    model = hf_tiny.tiny_bamba()
    ids = rng.integers(0, 97, size=(2, 13))
    params, cfg = _parity(model, ids)
    assert cfg.has_mamba and cfg.layer_types == ("mamba", "attention",
                                                 "mamba")


def test_bamba_cache_decode_matches_full(rng):
    # prefill fills conv/ssm states; each decode step runs the O(1)
    # recurrent update — must equal the full quadratic forward
    model = hf_tiny.tiny_bamba()
    params, cfg = import_hf_model(model)
    ids = rng.integers(0, 97, size=(1, 12)).astype(np.int32)
    full = np.asarray(_fwd(params, cfg, jnp.asarray(ids)))
    cache = init_cache(cfg, batch=1, max_len=16, dtype=jnp.float32)
    logits, cache = _fwd_cached(params, cfg, jnp.asarray(ids[:, :6]), cache)
    np.testing.assert_allclose(np.asarray(logits)[:, -1], full[:, 5],
                               atol=3e-4, rtol=1e-3)
    for t in range(6, 12):
        logits, cache = _fwd_cached(params, cfg, jnp.asarray(ids[:, t:t + 1]),
                                    cache)
        np.testing.assert_allclose(np.asarray(logits)[:, 0], full[:, t],
                                   atol=3e-4, rtol=1e-3)


def test_granite4_hybrid_parity(rng):
    # granite-4.0: mamba2 layers + NoPE attention + granitemoe experts +
    # shared mlp + muP multipliers
    model = hf_tiny.tiny_granite4(rope=False)
    ids = rng.integers(0, 97, size=(2, 13))
    params, cfg = _parity(model, ids)
    assert cfg.has_mamba and cfg.rope_layers == (0, 0, 0)
    assert cfg.num_experts == 4 and cfg.attn_scale == 0.0625


def test_granite4_hybrid_parity_rope(rng):
    model = hf_tiny.tiny_granite4(rope=True)
    ids = rng.integers(0, 97, size=(1, 9))
    params, cfg = _parity(model, ids)
    assert cfg.rope_layers == (0, 1, 0)


def test_granite4_cache_decode_matches_full(rng):
    model = hf_tiny.tiny_granite4()
    params, cfg = import_hf_model(model)
    ids = rng.integers(0, 97, size=(1, 12)).astype(np.int32)
    full = np.asarray(_fwd(params, cfg, jnp.asarray(ids)))
    cache = init_cache(cfg, batch=1, max_len=16, dtype=jnp.float32)
    logits, cache = _fwd_cached(params, cfg, jnp.asarray(ids[:, :6]), cache)
    np.testing.assert_allclose(np.asarray(logits)[:, -1], full[:, 5],
                               atol=3e-4, rtol=1e-3)
    for t in range(6, 12):
        logits, cache = _fwd_cached(params, cfg, jnp.asarray(ids[:, t:t + 1]),
                                    cache)
        np.testing.assert_allclose(np.asarray(logits)[:, 0], full[:, t],
                                   atol=3e-4, rtol=1e-3)


def test_bamba_chained_multi_token_decode(rng):
    """Multi-token continuation with a live cache (speculative-verify
    shape): the SSD form must continue exactly from the cached conv/ssm
    states — split prefill + two multi-token continuations == one pass."""
    model = hf_tiny.tiny_bamba()
    params, cfg = import_hf_model(model)
    ids = rng.integers(0, 97, size=(1, 14)).astype(np.int32)
    full = np.asarray(_fwd(params, cfg, jnp.asarray(ids)))
    cache = init_cache(cfg, batch=1, max_len=16, dtype=jnp.float32)
    logits, cache = _fwd_cached(params, cfg, jnp.asarray(ids[:, :5]), cache)
    np.testing.assert_allclose(np.asarray(logits)[:, -1], full[:, 4],
                               atol=3e-4, rtol=1e-3)
    logits, cache = _fwd_cached(params, cfg, jnp.asarray(ids[:, 5:11]), cache)
    np.testing.assert_allclose(np.asarray(logits)[:, -1], full[:, 10],
                               atol=3e-4, rtol=1e-3)
    logits, cache = _fwd_cached(params, cfg, jnp.asarray(ids[:, 11:14]),
                                cache)
    np.testing.assert_allclose(np.asarray(logits)[:, -1], full[:, 13],
                               atol=3e-4, rtol=1e-3)


def test_falcon_h1_parity(rng):
    # every layer: attention AND a mamba2 mixer in parallel on one normed
    # input; the muP multiplier zoo folds into weights at import
    model = hf_tiny.tiny_falcon_h1(rms_norm=True, before_gate=True)
    ids = rng.integers(0, 97, size=(2, 13))
    params, cfg = _parity(model, ids)
    assert cfg.layer_types == ("mamba_attention",) * 2
    assert cfg.embed_scale == 2.0 and cfg.logit_scale == 0.5


def test_falcon_h1_parity_gating_modes(rng):
    for rms, bg in [(True, False), (False, True)]:
        model = hf_tiny.tiny_falcon_h1(rms_norm=rms, before_gate=bg, seed=1)
        ids = rng.integers(0, 97, size=(1, 9))
        _parity(model, ids)


def test_falcon_h1_cache_decode_matches_full(rng):
    # dual layers carry BOTH a kv slice and conv/ssm states in HybridCache
    model = hf_tiny.tiny_falcon_h1()
    params, cfg = import_hf_model(model)
    ids = rng.integers(0, 97, size=(1, 12)).astype(np.int32)
    full = np.asarray(_fwd(params, cfg, jnp.asarray(ids)))
    cache = init_cache(cfg, batch=1, max_len=16, dtype=jnp.float32)
    logits, cache = _fwd_cached(params, cfg, jnp.asarray(ids[:, :6]), cache)
    np.testing.assert_allclose(np.asarray(logits)[:, -1], full[:, 5],
                               atol=3e-4, rtol=1e-3)
    for t in range(6, 12):
        logits, cache = _fwd_cached(params, cfg, jnp.asarray(ids[:, t:t + 1]),
                                    cache)
        np.testing.assert_allclose(np.asarray(logits)[:, 0], full[:, t],
                                   atol=3e-4, rtol=1e-3)


def test_qwen3_next_parity_gdn(rng):
    # gated-delta-net linear attention (chunked delta rule with a
    # triangular-solve in-chunk correction) + gated full attention +
    # sigmoid-gated shared-expert MoE; rms1p norms everywhere
    model = hf_tiny.tiny_qwen3_next()
    ids = rng.integers(0, 97, size=(2, 13))
    params, cfg = _parity(model, ids)
    assert cfg.has_gdn and cfg.attn_gate
    assert cfg.layer_types[-1] == "full_attention"


def test_qwen3_next_cache_decode_matches_full(rng):
    model = hf_tiny.tiny_qwen3_next()
    params, cfg = import_hf_model(model)
    ids = rng.integers(0, 97, size=(1, 12)).astype(np.int32)
    full = np.asarray(_fwd(params, cfg, jnp.asarray(ids)))
    cache = init_cache(cfg, batch=1, max_len=16, dtype=jnp.float32)
    logits, cache = _fwd_cached(params, cfg, jnp.asarray(ids[:, :6]), cache)
    np.testing.assert_allclose(np.asarray(logits)[:, -1], full[:, 5],
                               atol=3e-4, rtol=1e-3)
    for t in range(6, 12):
        logits, cache = _fwd_cached(params, cfg, jnp.asarray(ids[:, t:t + 1]),
                                    cache)
        np.testing.assert_allclose(np.asarray(logits)[:, 0], full[:, t],
                                   atol=3e-4, rtol=1e-3)


def test_qwen3_next_chained_multi_token_decode(rng):
    model = hf_tiny.tiny_qwen3_next(layers=2)
    params, cfg = import_hf_model(model)
    ids = rng.integers(0, 97, size=(1, 14)).astype(np.int32)
    full = np.asarray(_fwd(params, cfg, jnp.asarray(ids)))
    cache = init_cache(cfg, batch=1, max_len=16, dtype=jnp.float32)
    logits, cache = _fwd_cached(params, cfg, jnp.asarray(ids[:, :5]), cache)
    logits, cache = _fwd_cached(params, cfg, jnp.asarray(ids[:, 5:11]), cache)
    np.testing.assert_allclose(np.asarray(logits)[:, -1], full[:, 10],
                               atol=3e-4, rtol=1e-3)
    logits, cache = _fwd_cached(params, cfg, jnp.asarray(ids[:, 11:14]),
                                cache)
    np.testing.assert_allclose(np.asarray(logits)[:, -1], full[:, 13],
                               atol=3e-4, rtol=1e-3)


def test_mamba2_pure_ssm_parity(rng):
    # codestral-mamba class: every block is norm -> SSD mixer -> residual
    # (no attention, no mlp)
    model = hf_tiny.tiny_mamba2()
    ids = rng.integers(0, 97, size=(2, 13))
    params, cfg = _parity(model, ids, atol=5e-4)
    assert cfg.layer_types == ("mamba", "mamba")


def test_mamba2_cache_decode_matches_full(rng):
    model = hf_tiny.tiny_mamba2()
    params, cfg = import_hf_model(model)
    ids = rng.integers(0, 97, size=(1, 12)).astype(np.int32)
    full = np.asarray(_fwd(params, cfg, jnp.asarray(ids)))
    cache = init_cache(cfg, batch=1, max_len=16, dtype=jnp.float32)
    logits, cache = _fwd_cached(params, cfg, jnp.asarray(ids[:, :6]), cache)
    np.testing.assert_allclose(np.asarray(logits)[:, -1], full[:, 5],
                               atol=5e-4, rtol=1e-3)
    for t in range(6, 12):
        logits, cache = _fwd_cached(params, cfg, jnp.asarray(ids[:, t:t + 1]),
                                    cache)
        np.testing.assert_allclose(np.asarray(logits)[:, 0], full[:, t],
                                   atol=5e-4, rtol=1e-3)


def test_jamba_parity_mamba1(rng):
    # mamba-1 selective scan (log-depth associative scan, jamba dt/b/c rms
    # norms) + NoPE attention + MoE without top-k renorm
    model = hf_tiny.tiny_jamba()
    ids = rng.integers(0, 97, size=(2, 13))
    params, cfg = _parity(model, ids)
    assert cfg.mamba_version == 1 and cfg.rope_layers == (0, 0, 0, 0)
    assert cfg.layer_types == ("mamba", "attention", "mamba", "attention")


def test_jamba_cache_decode_matches_full(rng):
    model = hf_tiny.tiny_jamba()
    params, cfg = import_hf_model(model)
    ids = rng.integers(0, 97, size=(1, 12)).astype(np.int32)
    full = np.asarray(_fwd(params, cfg, jnp.asarray(ids)))
    cache = init_cache(cfg, batch=1, max_len=16, dtype=jnp.float32)
    logits, cache = _fwd_cached(params, cfg, jnp.asarray(ids[:, :6]), cache)
    np.testing.assert_allclose(np.asarray(logits)[:, -1], full[:, 5],
                               atol=3e-4, rtol=1e-3)
    for t in range(6, 12):
        logits, cache = _fwd_cached(params, cfg, jnp.asarray(ids[:, t:t + 1]),
                                    cache)
        np.testing.assert_allclose(np.asarray(logits)[:, 0], full[:, t],
                                   atol=3e-4, rtol=1e-3)


def test_jamba_chained_multi_token_decode(rng):
    model = hf_tiny.tiny_jamba(layers=2)
    params, cfg = import_hf_model(model)
    ids = rng.integers(0, 97, size=(1, 14)).astype(np.int32)
    full = np.asarray(_fwd(params, cfg, jnp.asarray(ids)))
    cache = init_cache(cfg, batch=1, max_len=16, dtype=jnp.float32)
    logits, cache = _fwd_cached(params, cfg, jnp.asarray(ids[:, :5]), cache)
    logits, cache = _fwd_cached(params, cfg, jnp.asarray(ids[:, 5:11]), cache)
    np.testing.assert_allclose(np.asarray(logits)[:, -1], full[:, 10],
                               atol=3e-4, rtol=1e-3)
    logits, cache = _fwd_cached(params, cfg, jnp.asarray(ids[:, 11:14]),
                                cache)
    np.testing.assert_allclose(np.asarray(logits)[:, -1], full[:, 13],
                               atol=3e-4, rtol=1e-3)


def test_mamba1_pure_lm_parity(rng):
    # state-spaces mamba LMs: pure selective-scan blocks, tied embeddings
    model = hf_tiny.tiny_mamba1(falcon=False)
    ids = rng.integers(0, 97, size=(2, 13))
    params, cfg = _parity(model, ids, atol=5e-4)
    assert cfg.mamba_version == 1 and cfg.mamba_bcdt_rms_eps is None


def test_falcon_mamba_parity(rng):
    # falcon-mamba: WEIGHTLESS rms on dt/B/C with its own epsilon
    model = hf_tiny.tiny_mamba1(falcon=True)
    ids = rng.integers(0, 97, size=(2, 12))
    params, cfg = _parity(model, ids, atol=5e-4)
    assert cfg.mamba_bcdt_rms_eps is not None


def test_mamba1_cache_decode_matches_full(rng):
    model = hf_tiny.tiny_mamba1(falcon=True)
    params, cfg = import_hf_model(model)
    ids = rng.integers(0, 97, size=(1, 12)).astype(np.int32)
    full = np.asarray(_fwd(params, cfg, jnp.asarray(ids)))
    cache = init_cache(cfg, batch=1, max_len=16, dtype=jnp.float32)
    logits, cache = _fwd_cached(params, cfg, jnp.asarray(ids[:, :6]), cache)
    np.testing.assert_allclose(np.asarray(logits)[:, -1], full[:, 5],
                               atol=5e-4, rtol=1e-3)
    for t in range(6, 12):
        logits, cache = _fwd_cached(params, cfg, jnp.asarray(ids[:, t:t + 1]),
                                    cache)
        np.testing.assert_allclose(np.asarray(logits)[:, 0], full[:, t],
                                   atol=5e-4, rtol=1e-3)


def test_minimax_parity_lightning(rng):
    # lightning decay linear attention + rope full attention + deepnorm
    # residuals (the NORMED input is the residual stream)
    model = hf_tiny.tiny_minimax()
    ids = rng.integers(0, 97, size=(2, 13))
    params, cfg = _parity(model, ids)
    assert cfg.has_lightning and cfg.layer_alpha_beta is not None


def test_minimax_parity_scaled_residuals(rng):
    model = hf_tiny.tiny_minimax(alphas=(0.9, 1.1, 1.05, 0.95, 1.02, 0.97))
    ids = rng.integers(0, 97, size=(1, 11))
    _parity(model, ids)


def test_minimax_cache_decode_matches_full(rng):
    model = hf_tiny.tiny_minimax()
    params, cfg = import_hf_model(model)
    ids = rng.integers(0, 97, size=(1, 12)).astype(np.int32)
    full = np.asarray(_fwd(params, cfg, jnp.asarray(ids)))
    cache = init_cache(cfg, batch=1, max_len=16, dtype=jnp.float32)
    logits, cache = _fwd_cached(params, cfg, jnp.asarray(ids[:, :6]), cache)
    np.testing.assert_allclose(np.asarray(logits)[:, -1], full[:, 5],
                               atol=3e-4, rtol=1e-3)
    for t in range(6, 12):
        logits, cache = _fwd_cached(params, cfg, jnp.asarray(ids[:, t:t + 1]),
                                    cache)
        np.testing.assert_allclose(np.asarray(logits)[:, 0], full[:, t],
                                   atol=3e-4, rtol=1e-3)


def test_lfm2_parity_shortconv(rng):
    # gated short-conv layers (y = out_proj(C*conv(B*x))) alternating with
    # qk-normed GQA attention
    model = hf_tiny.tiny_lfm2()
    ids = rng.integers(0, 97, size=(2, 13))
    params, cfg = _parity(model, ids)
    assert cfg.has_shortconv and cfg.layer_types == ("conv",
                                                     "full_attention")


def test_lfm2_cache_decode_matches_full(rng):
    model = hf_tiny.tiny_lfm2()
    params, cfg = import_hf_model(model)
    ids = rng.integers(0, 97, size=(1, 12)).astype(np.int32)
    full = np.asarray(_fwd(params, cfg, jnp.asarray(ids)))
    cache = init_cache(cfg, batch=1, max_len=16, dtype=jnp.float32)
    logits, cache = _fwd_cached(params, cfg, jnp.asarray(ids[:, :6]), cache)
    np.testing.assert_allclose(np.asarray(logits)[:, -1], full[:, 5],
                               atol=3e-4, rtol=1e-3)
    for t in range(6, 12):
        logits, cache = _fwd_cached(params, cfg, jnp.asarray(ids[:, t:t + 1]),
                                    cache)
        np.testing.assert_allclose(np.asarray(logits)[:, 0], full[:, t],
                                   atol=3e-4, rtol=1e-3)


def test_apertus_parity_xielu(rng):
    # non-gated MLP with learnable xIELU activation + per-head qk-norm
    model = hf_tiny.tiny_apertus()
    ids = rng.integers(0, 97, size=(2, 11))
    params, cfg = _parity(model, ids)
    assert cfg.activation == "xielu" and not cfg.gated_mlp
    assert "act" in params["layers"][0]["mlp"]


def test_ernie45_moe_parity(rng):
    # softmax routing selected on bias-corrected scores, clamp-renormalized
    # weights, ungated shared experts, dense first layer
    model = hf_tiny.tiny_ernie45_moe()
    ids = rng.integers(0, 97, size=(2, 11))
    params, cfg = _parity(model, ids)
    assert cfg.router_kind == "ernie" and cfg.first_k_dense == 1
    assert cfg.n_shared_experts == 1


def test_gemma3_parity(rng):
    # gemma2 sandwich norms + per-head rmsnorm1p qk-norm + DUAL rope:
    # sliding layers use rope_local_base_freq, full layers rope_theta
    model = hf_tiny.tiny_gemma3()
    ids = rng.integers(0, 97, size=(2, 12))
    _parity(model, ids, atol=5e-4)


def test_gemma3_parity_scaled_global_rope(rng):
    # rope_scaling (linear, as on gemma3-4b+) applies ONLY to full layers;
    # sliding layers keep the unscaled local tables
    model = hf_tiny.tiny_gemma3(
        rope_scaling={"rope_type": "linear", "factor": 4.0})
    ids = rng.integers(0, 97, size=(2, 12))
    _parity(model, ids, atol=5e-4)


def test_gemma3_cache_decode_matches_full(rng):
    model = hf_tiny.tiny_gemma3(sliding_window=5)
    params, cfg = import_hf_model(model)
    ids = rng.integers(0, 97, size=(1, 10)).astype(np.int32)
    full = np.asarray(_fwd(params, cfg, jnp.asarray(ids)))
    cache = init_cache(cfg, 1, 16, dtype=jnp.float32)
    logits, cache = _fwd_cached(params, cfg, jnp.asarray(ids[:, :6]), cache)
    np.testing.assert_allclose(np.asarray(logits)[:, -1], full[:, 5],
                               atol=1e-4, rtol=1e-3)
    for t in range(6, 10):
        logits, cache = _fwd_cached(params, cfg, jnp.asarray(ids[:, t:t + 1]),
                                    cache)
        np.testing.assert_allclose(np.asarray(logits)[:, -1], full[:, t],
                                   atol=1e-4, rtol=1e-3)


def test_olmo3_parity(rng):
    # olmo2 post-only branch norms + whole-projection qk-norm, with
    # alternating sliding windows
    model = hf_tiny.tiny_olmo3()
    ids = rng.integers(0, 97, size=(2, 12))
    _parity(model, ids)


def test_olmo3_parity_yarn_full_layers_only(rng):
    # yarn rope_scaling applies only to full_attention layers (HF keeps a
    # second default-rope embedding for sliding layers)
    model = hf_tiny.tiny_olmo3(rope_scaling={
        "rope_type": "yarn", "factor": 4.0,
        "original_max_position_embeddings": 16})
    ids = rng.integers(0, 97, size=(2, 12))
    _parity(model, ids, atol=5e-4)


def test_gpt_neo_parity(rng):
    # alternating global/local(256-token window) attention, UNSCALED
    # attention logits, learned positions; T > window hits the boundary
    model = hf_tiny.tiny_gpt_neo(window=8)
    ids = rng.integers(0, 97, size=(2, 20))
    _parity(model, ids)


def test_codegen_parity(rng):
    # gptj-style parallel block; fused qkv_proj in mp_num=4 groups of
    # (q|v|k) re-laid at import; interleaved partial rotary
    model = hf_tiny.tiny_codegen()
    ids = rng.integers(0, 97, size=(2, 12))
    _parity(model, ids)


def test_codegen_cache_decode_matches_full(rng):
    model = hf_tiny.tiny_codegen()
    params, cfg = import_hf_model(model)
    ids = rng.integers(0, 97, size=(1, 8)).astype(np.int32)
    full = np.asarray(_fwd(params, cfg, jnp.asarray(ids)))
    cache = init_cache(cfg, 1, 16, dtype=jnp.float32)
    logits, cache = _fwd_cached(params, cfg, jnp.asarray(ids[:, :5]), cache)
    np.testing.assert_allclose(np.asarray(logits)[:, -1], full[:, 4],
                               atol=1e-4, rtol=1e-3)
    for t in range(5, 8):
        logits, cache = _fwd_cached(params, cfg, jnp.asarray(ids[:, t:t + 1]),
                                    cache)
        np.testing.assert_allclose(np.asarray(logits)[:, -1], full[:, t],
                                   atol=1e-4, rtol=1e-3)


def test_recurrentgemma_parity(rng):
    # griffin RG-LRU recurrent layers (block-diagonal per-head gates,
    # sqrt(1-a^2) input normalizer with position-0 reset, depthwise conv)
    # alternating with sliding attention; bf16-rounded embed normalizer,
    # final logit softcap
    model = hf_tiny.tiny_recurrentgemma()
    ids = rng.integers(0, 97, size=(2, 12))
    _parity(model, ids, atol=5e-4)


def test_recurrentgemma_cache_decode_matches_full(rng):
    model = hf_tiny.tiny_recurrentgemma()
    params, cfg = import_hf_model(model)
    ids = rng.integers(0, 97, size=(1, 10)).astype(np.int32)
    full = np.asarray(_fwd(params, cfg, jnp.asarray(ids)))
    cache = init_cache(cfg, 1, 16, dtype=jnp.float32)
    logits, cache = _fwd_cached(params, cfg, jnp.asarray(ids[:, :6]), cache)
    np.testing.assert_allclose(np.asarray(logits)[:, -1], full[:, 5],
                               atol=1e-4, rtol=1e-3)
    for t in range(6, 10):
        logits, cache = _fwd_cached(params, cfg, jnp.asarray(ids[:, t:t + 1]),
                                    cache)
        np.testing.assert_allclose(np.asarray(logits)[:, -1], full[:, t],
                                   atol=1e-4, rtol=1e-3)


def test_ministral_parity(rng):
    # mistral wiring with per-layer sliding/full layer_types; T > window
    # exercises the sliding mask on the alternating layers
    model = hf_tiny.tiny_ministral(window=8)
    ids = rng.integers(0, 97, size=(2, 14))
    _parity(model, ids)


def test_vaultgemma_parity(rng):
    # gemma2 softcaps/rmsnorm1p/embed-scale but PRE-norms only (no
    # post-branch sandwich norms)
    model = hf_tiny.tiny_vaultgemma(window=8)
    ids = rng.integers(0, 97, size=(2, 13))
    _parity(model, ids, atol=3e-4)


def test_xglm_parity(rng):
    # fairseq sinusoidal positions (offset 2, synthesized at import),
    # sqrt(d) embed scale, pre-LN opt block, tied head
    model = hf_tiny.tiny_xglm()
    ids = rng.integers(0, 97, size=(2, 12))
    _parity(model, ids)


def test_biogpt_parity(rng):
    # learned positions (offset 2) + sqrt(hidden) embed scale, final
    # layer_norm, tied output_projection head
    model = hf_tiny.tiny_biogpt()
    ids = rng.integers(0, 97, size=(2, 12))
    _parity(model, ids)


def test_bitnet_parity(rng):
    # llama block + attn_sub_norm before o_proj and ffn_sub_norm before
    # down_proj; relu2 MLP activation
    model = hf_tiny.tiny_bitnet()
    ids = rng.integers(0, 97, size=(2, 12))
    _parity(model, ids)


def test_dots1_parity(rng):
    # qwen3-style per-head qk-norm + sliding layer_types; deepseek-v3
    # sigmoid noaux-tc MoE with shared experts and a dense first layer
    model = hf_tiny.tiny_dots1(window=8)
    ids = rng.integers(0, 97, size=(2, 14))
    _parity(model, ids)


def test_flex_olmo_parity(rng):
    # olmo2 post-only branch norms + whole-projection qk-norm, with a
    # mixtral-routed (unnormalized top-k) sparse MoE
    model = hf_tiny.tiny_flex_olmo()
    ids = rng.integers(0, 97, size=(2, 12))
    _parity(model, ids)


def test_zamba2_parity(rng):
    # shared transformer blocks (2 mem blocks cycled over 3 hybrid layers)
    # as prefixes on concat([x, embeddings]), per-layer LoRA adapters
    # folded into the materialized per-layer weights, per-layer output
    # linear, mamba2 mixer on every layer
    model = hf_tiny.tiny_zamba2()
    ids = rng.integers(0, 97, size=(2, 12)).astype(np.int32)
    _parity(model, ids)


def test_zamba2_norope_parity(rng):
    # use_mem_rope=False checkpoints: NoPE shared-attention layers
    model = hf_tiny.tiny_zamba2(rope=False, adapters=False, mem_blocks=1,
                                seed=1)
    ids = rng.integers(0, 97, size=(2, 10)).astype(np.int32)
    _parity(model, ids)


def test_zamba2_cache_decode_matches_full(rng):
    # dual cache on hybrid layers: shared-attention KV next to the mamba
    # conv/ssm states
    model = hf_tiny.tiny_zamba2()
    params, cfg = import_hf_model(model)
    ids = rng.integers(0, 97, size=(1, 10)).astype(np.int32)
    full = np.asarray(_fwd(params, cfg, jnp.asarray(ids)))
    cache = init_cache(cfg, 1, 16, dtype=jnp.float32)
    logits, cache = _fwd_cached(params, cfg, jnp.asarray(ids[:, :6]), cache)
    np.testing.assert_allclose(np.asarray(logits)[:, -1], full[:, 5],
                               atol=1e-4, rtol=1e-3)
    for t in range(6, 10):
        logits, cache = _fwd_cached(params, cfg, jnp.asarray(ids[:, t:t + 1]),
                                    cache)
        np.testing.assert_allclose(np.asarray(logits)[:, -1], full[:, t],
                                   atol=1e-4, rtol=1e-3)


def test_jetmoe_parity(rng):
    # mixture-of-attention: per-token top-2 (q-proj, out-proj) expert
    # pairs over one shared fused kv projection, plus a jetmoe-gated MoE
    # MLP with output biases — computed densely (all experts, weighted)
    model = hf_tiny.tiny_jetmoe()
    ids = rng.integers(0, 97, size=(2, 12)).astype(np.int32)
    _parity(model, ids)


def test_jetmoe_cache_decode_matches_full(rng):
    model = hf_tiny.tiny_jetmoe()
    params, cfg = import_hf_model(model)
    ids = rng.integers(0, 97, size=(1, 10)).astype(np.int32)
    full = np.asarray(_fwd(params, cfg, jnp.asarray(ids)))
    cache = init_cache(cfg, 1, 16, dtype=jnp.float32)
    logits, cache = _fwd_cached(params, cfg, jnp.asarray(ids[:, :6]), cache)
    np.testing.assert_allclose(np.asarray(logits)[:, -1], full[:, 5],
                               atol=1e-4, rtol=1e-3)
    for t in range(6, 10):
        logits, cache = _fwd_cached(params, cfg, jnp.asarray(ids[:, t:t + 1]),
                                    cache)
        np.testing.assert_allclose(np.asarray(logits)[:, -1], full[:, t],
                                   atol=1e-4, rtol=1e-3)
