"""Tensor/data parallelism on the 8-device virtual CPU mesh."""

import copy

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from owq_tpu.models import forward, import_hf_model, arch_for_model
from owq_tpu.parallel import (
    make_mesh,
    make_tp_forward,
    make_tp_train_step,
    place_params,
    shard_model_tp,
)
from owq_tpu.recon.pipeline import quantize_model
from owq_tpu.runtime.checkpoint import pack_model
from owq_tpu.runtime.quant_linear import PackedLinear, shard_packed_rowwise
import hf_tiny


def _packed_tiny_llama(rng, n_out=2, kv_heads=2):
    model = hf_tiny.tiny_llama(hidden=32, inter=64, layers=2, heads=4,
                               kv_heads=kv_heads)
    params, cfg = import_hf_model(model)
    calib = rng.integers(0, 97, size=(4, 16)).astype(np.int32)
    params, quantizers = quantize_model(
        params, cfg, arch_for_model("llama"), calib, wbits=3,
        target_rank=n_out, tuning="minmax", verbose=False)
    packed = pack_model(params, quantizers, 3, weight_dtype=jnp.float32)
    return packed, cfg


def test_shard_packed_rowwise_matches(rng):
    """Per-shard repacking reproduces the unsharded product."""
    from owq_tpu.core import QuantSpec, find_params, quantize_to_int
    from owq_tpu.runtime.quant_linear import pack_linear

    W = rng.standard_normal((24, 64)).astype(np.float32)  # [out, in]
    spec = QuantSpec(3, False)
    s, z = find_params(W, spec, mse=False)
    s, z = np.asarray(s), np.asarray(z)
    Wq = np.asarray(jnp.clip(jnp.round(W / s[:, None]) + z[:, None], 0, 7))
    Wfake = s[:, None] * (Wq - z[:, None])
    out_ids = np.array([3, 40], np.int32)
    Wfake[:, out_ids] = W[:, out_ids]  # weak columns keep fp values
    p = pack_linear(Wfake, s, z, out_ids, 3, weight_dtype=jnp.float32)

    x = rng.standard_normal((2, 64)).astype(np.float32)
    ref = np.asarray(p.apply(jnp.asarray(x)))

    sp = shard_packed_rowwise(p, 4)
    acc = np.zeros_like(ref)
    for sh in range(4):
        local = PackedLinear(
            qweight=sp.qweight[sh], scales=sp.scales, zeros=sp.zeros,
            oweight=sp.oweight[sh], out_ids=sp.out_ids[sh], bias=sp.bias,
            bits=3, in_features=sp.in_features_local)
        xs = x[:, sh * 16:(sh + 1) * 16]
        acc += np.asarray(local.apply(jnp.asarray(xs)))
    np.testing.assert_allclose(acc, ref, atol=1e-5)


@pytest.mark.parametrize("dp,tp", [(1, 2), (2, 2), (1, 4)])
def test_tp_forward_matches_single_device(rng, dp, tp):
    packed, cfg = _packed_tiny_llama(rng, kv_heads=2 if tp == 2 else 4)
    ids = rng.integers(0, 97, size=(2, 12)).astype(np.int32)
    ref, _ = forward(packed, cfg, jnp.asarray(ids))
    ref = np.asarray(ref)

    params_tp, _ = shard_model_tp(copy.deepcopy(packed), cfg, tp)
    mesh = make_mesh(dp=dp, tp=tp)
    with mesh:
        params_tp = place_params(params_tp, mesh)
        fwd = make_tp_forward(mesh, cfg, params_tp)
        got = np.asarray(fwd(params_tp, jnp.asarray(ids)))
    np.testing.assert_allclose(got, ref, atol=2e-4, rtol=1e-3)


def test_tp_dense_forward_matches(rng):
    """TP on an unquantized (dense) model too."""
    model = hf_tiny.tiny_opt(hidden=32, ffn=64, layers=2, heads=4)
    params, cfg = import_hf_model(model)
    ids = rng.integers(0, 97, size=(2, 8)).astype(np.int32)
    ref, _ = forward(params, cfg, jnp.asarray(ids))

    params_tp, _ = shard_model_tp(copy.deepcopy(params), cfg, 2)
    mesh = make_mesh(dp=2, tp=2)
    with mesh:
        params_tp = place_params(params_tp, mesh)
        fwd = make_tp_forward(mesh, cfg, params_tp)
        got = np.asarray(fwd(params_tp, jnp.asarray(ids)))
    np.testing.assert_allclose(got, np.asarray(ref), atol=2e-4, rtol=1e-3)


def test_tp_train_step_updates_weak_columns_only(rng):
    packed, cfg = _packed_tiny_llama(rng)
    params_tp, _ = shard_model_tp(copy.deepcopy(packed), cfg, 2)
    mesh = make_mesh(dp=2, tp=2)
    ids = rng.integers(0, 97, size=(4, 10)).astype(np.int32)
    with mesh:
        params_tp = place_params(params_tp, mesh)
        step = make_tp_train_step(mesh, cfg, params_tp, lr=1e-2)
        new_params, loss = step(params_tp, jnp.asarray(ids))
    assert np.isfinite(float(loss))

    old_lin = params_tp["layers"][0]["attn"]["q"]
    new_lin = new_params["layers"][0]["attn"]["q"]
    # integer codes unchanged; weak columns moved
    np.testing.assert_array_equal(np.asarray(old_lin.qweight),
                                  np.asarray(new_lin.qweight))
    assert not np.allclose(np.asarray(old_lin.oweight),
                           np.asarray(new_lin.oweight))
    # scales frozen (stop_gradient on the dequantized base)
    np.testing.assert_array_equal(np.asarray(old_lin.scales),
                                  np.asarray(new_lin.scales))


def test_tp_cached_decode_matches(rng):
    """TP decode through a head-sharded KV cache == single-device decode."""
    from owq_tpu.parallel import make_tp_decode

    packed, cfg = _packed_tiny_llama(rng, kv_heads=2)
    ids = rng.integers(0, 97, size=(1, 8)).astype(np.int32)

    # single-device reference: prefill 5 + decode 3
    from owq_tpu.models import init_cache
    from owq_tpu.runtime.generate import decode_step, prefill

    cache = init_cache(cfg, 1, 16, dtype=jnp.float32)
    ref_logits, cache = prefill(packed, cfg, jnp.asarray(ids[:, :5]), cache)
    refs = [np.asarray(ref_logits)]
    for t in range(5, 8):
        lg, cache = decode_step(packed, cfg, jnp.asarray(ids[:, t:t + 1]),
                                cache)
        refs.append(np.asarray(lg))

    params_tp, _ = shard_model_tp(copy.deepcopy(packed), cfg, 2)
    mesh = make_mesh(dp=1, tp=2)
    with mesh:
        params_tp = place_params(params_tp, mesh)
        step, make_cache = make_tp_decode(mesh, cfg, params_tp,
                                          dtype=jnp.float32)
        tcache = make_cache(1, 16, cache_dtype=jnp.float32)
        lg, tcache = step(params_tp, jnp.asarray(ids[:, :5]), tcache)
        np.testing.assert_allclose(np.asarray(lg), refs[0], atol=2e-4,
                                   rtol=1e-3)
        for i, t in enumerate(range(5, 8)):
            lg, tcache = step(params_tp, jnp.asarray(ids[:, t:t + 1]), tcache)
            np.testing.assert_allclose(np.asarray(lg), refs[i + 1],
                                       atol=3e-4, rtol=1e-3)


@pytest.mark.parametrize("family", ["bloom", "falcon", "neox", "mistral",
                                    "gemma", "phi", "mpt", "bigcode",
                                    "olmo", "qwen3", "gemma2", "olmo2"])
def test_tp_fused_qkv_families(rng, family):
    """Structure-diverse families under tensor parallelism: BLOOM (alibi +
    fused interleaved qkv), Falcon (MQA + parallel block), NeoX (dual-norm
    parallel block + partial rotary + fused qkv), Mistral (sliding window),
    Gemma (rmsnorm1p + embed scale + tied head), Phi (parallel block +
    partial rotary + biased head), MPT (mpt-schedule alibi + fused Wqkv)."""
    makers = {
        "bloom": lambda: hf_tiny.tiny_bloom(hidden=32, layers=2, heads=4),
        "falcon": lambda: hf_tiny.tiny_falcon(hidden=32, layers=2, heads=4),
        "neox": lambda: hf_tiny.tiny_neox(hidden=32, layers=2, heads=4,
                                          rotary_pct=0.25, parallel=True),
        "mistral": lambda: hf_tiny.tiny_mistral(hidden=32, layers=2, heads=4,
                                                kv_heads=2, sliding_window=4),
        "gemma": lambda: hf_tiny.tiny_gemma(hidden=32, layers=2, heads=4,
                                            kv_heads=2, head_dim=16),
        "phi": lambda: hf_tiny.tiny_phi(hidden=32, layers=2, heads=4),
        "mpt": lambda: hf_tiny.tiny_mpt(hidden=32, layers=2, heads=4),
        "bigcode": lambda: hf_tiny.tiny_gpt_bigcode(hidden=32, layers=2,
                                                    heads=4, multi_query=True),
        "olmo": lambda: hf_tiny.tiny_olmo(hidden=32, inter=64, layers=2,
                                          heads=4, kv_heads=2),
        "qwen3": lambda: hf_tiny.tiny_qwen3(hidden=32, inter=48, layers=2,
                                            heads=4, kv_heads=2),
        "gemma2": lambda: hf_tiny.tiny_gemma2(hidden=32, inter=48, layers=2,
                                              heads=4, kv_heads=2,
                                              sliding_window=4),
        "olmo2": lambda: hf_tiny.tiny_olmo2(hidden=32, inter=48, layers=2,
                                            heads=4, kv_heads=2),
    }
    model = makers[family]()
    params, cfg = import_hf_model(model)
    ids = rng.integers(0, 97, size=(2, 9)).astype(np.int32)
    ref, _ = forward(params, cfg, jnp.asarray(ids))

    params_tp, _ = shard_model_tp(copy.deepcopy(params), cfg, 2)
    mesh = make_mesh(dp=1, tp=2)
    with mesh:
        params_tp = place_params(params_tp, mesh, cfg)
        fwd = make_tp_forward(mesh, cfg, params_tp)
        got = np.asarray(fwd(params_tp, jnp.asarray(ids)))
    np.testing.assert_allclose(got, np.asarray(ref), atol=3e-4, rtol=1e-3)


def test_expert_parallel_moe_forward_matches(rng):
    """Mixtral MoE under expert parallelism: 4 experts sharded 2-way (each
    device holds 2 whole experts, contributions psum-reduced) combined with
    head-sharded attention == single-device forward."""
    model = hf_tiny.tiny_mixtral(hidden=32, inter=48, layers=2, heads=4,
                                 kv_heads=2, experts=4, topk=2)
    params, cfg = import_hf_model(model)
    ids = rng.integers(0, 97, size=(2, 9)).astype(np.int32)
    ref, _ = forward(params, cfg, jnp.asarray(ids))

    params_tp, _ = shard_model_tp(copy.deepcopy(params), cfg, 2)
    from owq_tpu.models import ExpertBank
    assert isinstance(params_tp["layers"][0]["mlp"]["experts"], ExpertBank)
    mesh = make_mesh(dp=2, tp=2)
    with mesh:
        params_tp = place_params(params_tp, mesh, cfg)
        fwd = make_tp_forward(mesh, cfg, params_tp)
        got = np.asarray(fwd(params_tp, jnp.asarray(ids)))
    np.testing.assert_allclose(got, np.asarray(ref), atol=3e-4, rtol=1e-3)


def test_expert_parallel_quantized_decode(rng):
    """Quantize a tiny Mixtral, shard experts 2-ways, decode through the
    TP/EP cache path — packed expert banks ride the same machinery."""
    from owq_tpu.parallel import make_tp_decode

    model = hf_tiny.tiny_mixtral(hidden=32, inter=48, layers=2, heads=4,
                                 kv_heads=2, experts=4, topk=2)
    params, cfg = import_hf_model(model)
    calib = rng.integers(0, 97, size=(4, 16)).astype(np.int32)
    params_q, quantizers = quantize_model(
        params, cfg, arch_for_model("mixtral"), calib, wbits=3, target_rank=2,
        tuning="minmax", verbose=False)
    packed = pack_model(params_q, quantizers, 3, weight_dtype=jnp.float32)

    ids = rng.integers(0, 97, size=(1, 6)).astype(np.int32)
    from owq_tpu.models import init_cache
    from owq_tpu.runtime.generate import decode_step, prefill

    cache = init_cache(cfg, 1, 12, dtype=jnp.float32)
    ref, cache = prefill(packed, cfg, jnp.asarray(ids[:, :4]), cache)
    refs = [np.asarray(ref)]
    for t in range(4, 6):
        lg, cache = decode_step(packed, cfg, jnp.asarray(ids[:, t:t + 1]),
                                cache)
        refs.append(np.asarray(lg))

    params_tp, _ = shard_model_tp(copy.deepcopy(packed), cfg, 2)
    mesh = make_mesh(dp=1, tp=2)
    with mesh:
        params_tp = place_params(params_tp, mesh, cfg)
        step, make_cache = make_tp_decode(mesh, cfg, params_tp,
                                          dtype=jnp.float32)
        tcache = make_cache(1, 12, cache_dtype=jnp.float32)
        lg, tcache = step(params_tp, jnp.asarray(ids[:, :4]), tcache)
        np.testing.assert_allclose(np.asarray(lg), refs[0], atol=3e-4,
                                   rtol=1e-3)
        for i, t in enumerate(range(4, 6)):
            lg, tcache = step(params_tp, jnp.asarray(ids[:, t:t + 1]), tcache)
            np.testing.assert_allclose(np.asarray(lg), refs[i + 1],
                                       atol=4e-4, rtol=1e-3)


def test_sequence_parallel_prefill_matches(rng):
    """SP prefill over 4 sequence shards == single-device forward."""
    from jax.sharding import Mesh
    from owq_tpu.parallel.sequence import SP_AXIS, make_sp_prefill

    model = hf_tiny.tiny_llama(hidden=32, inter=64, layers=2, heads=4,
                               kv_heads=2, max_pos=64)
    params, cfg = import_hf_model(model)
    ids = rng.integers(0, 97, size=(2, 16)).astype(np.int32)
    ref, _ = forward(params, cfg, jnp.asarray(ids))

    mesh = Mesh(np.array(jax.devices()[:4]), (SP_AXIS,))
    with mesh:
        fwd = make_sp_prefill(mesh, cfg)
        got = np.asarray(fwd(params, jnp.asarray(ids)))
    np.testing.assert_allclose(got, np.asarray(ref), atol=2e-4, rtol=1e-3)


def test_tp_deepseek_mla_forward_and_decode(rng):
    """MLA under TP: q_b/kv_b column-parallel over heads, q_a/kv_a and the
    shared rope key replicated, o row-parallel; experts EP-sharded; shared
    experts replicated (added after the psum)."""
    from owq_tpu.parallel import make_tp_decode

    model = hf_tiny.tiny_deepseek_v3(layers=2, experts=4, n_group=2,
                                     topk_group=1)
    params, cfg = import_hf_model(model)
    ids = rng.integers(0, 97, size=(2, 8)).astype(np.int32)
    ref, _ = forward(params, cfg, jnp.asarray(ids))

    params_tp, _ = shard_model_tp(copy.deepcopy(params), cfg, 2)
    mesh = make_mesh(dp=2, tp=2)
    with mesh:
        params_tp = place_params(params_tp, mesh, cfg)
        fwd = make_tp_forward(mesh, cfg, params_tp)
        got = np.asarray(fwd(params_tp, jnp.asarray(ids)))
        np.testing.assert_allclose(got, np.asarray(ref), atol=2e-4, rtol=1e-3)

        step, make_cache = make_tp_decode(mesh, cfg, params_tp,
                                          dtype=jnp.float32)
        cache = make_cache(2, 16, cache_dtype=jnp.float32)
        logits, cache = step(params_tp, jnp.asarray(ids[:, :5]), cache)
        np.testing.assert_allclose(np.asarray(logits), np.asarray(ref)[:, 4],
                                   atol=2e-4, rtol=1e-3)
        logits, cache = step(params_tp, jnp.asarray(ids[:, 5:6]), cache)
        np.testing.assert_allclose(np.asarray(logits), np.asarray(ref)[:, 5],
                                   atol=2e-4, rtol=1e-3)


def test_tp_gpt_oss_sinks_and_experts(rng):
    """gpt-oss under TP: sink logits shard with their heads; experts EP;
    router replicated; biased projections column/row-parallel."""
    model = hf_tiny.tiny_gpt_oss(experts=4, sliding_window=None)
    params, cfg = import_hf_model(model)
    ids = rng.integers(0, 97, size=(2, 8)).astype(np.int32)
    ref, _ = forward(params, cfg, jnp.asarray(ids))

    params_tp, _ = shard_model_tp(copy.deepcopy(params), cfg, 2)
    mesh = make_mesh(dp=2, tp=2)
    with mesh:
        params_tp = place_params(params_tp, mesh, cfg)
        fwd = make_tp_forward(mesh, cfg, params_tp)
        got = np.asarray(fwd(params_tp, jnp.asarray(ids)))
    np.testing.assert_allclose(got, np.asarray(ref), atol=2e-4, rtol=1e-3)


@pytest.mark.parametrize("family", ["bamba", "falcon_h1", "qwen3_next",
                                    "minimax", "lfm2", "jamba"])
def test_tp_hybrid_mixer_forward_matches(rng, family):
    """TP on hybrid linear-mixer models: the mixer params replicate
    (computed redundantly per shard) while attention and mlp/experts shard
    and psum — forward must match single-device exactly."""
    makers = {
        "bamba": lambda: hf_tiny.tiny_bamba(),
        "falcon_h1": lambda: hf_tiny.tiny_falcon_h1(),
        "qwen3_next": lambda: hf_tiny.tiny_qwen3_next(layers=2),
        "minimax": lambda: hf_tiny.tiny_minimax(),
        "lfm2": lambda: hf_tiny.tiny_lfm2(),
        "jamba": lambda: hf_tiny.tiny_jamba(),
    }
    model = makers[family]()
    params, cfg = import_hf_model(model)
    ids = rng.integers(0, 97, size=(2, 8)).astype(np.int32)
    ref, _ = forward(params, cfg, jnp.asarray(ids))

    params_tp, _ = shard_model_tp(copy.deepcopy(params), cfg, 2)
    mesh = make_mesh(dp=1, tp=2)
    with mesh:
        params_tp = place_params(params_tp, mesh, cfg)
        fwd = make_tp_forward(mesh, cfg, params_tp)
        got = np.asarray(fwd(params_tp, jnp.asarray(ids)))
    np.testing.assert_allclose(got, np.asarray(ref), atol=3e-4, rtol=1e-3)


def test_tp_fast_decode_matches_generic(rng, monkeypatch):
    """prepare_decode_fast_tp (VERDICT r3 item 4): per-shard fused-decode
    aux under tensor parallelism.  TP-fast decode logits match the
    SINGLE-CHIP fast path tightly (same fused math family, different
    shard summation order), stay within the fused-vs-generic numeric
    envelope of the generic TP path (the bf16-magic +128-offset
    accumulation carries ~1e-3-grade absolute noise per matvec — the same
    envelope the single-chip serving path has), and the fused dispatcher
    demonstrably RUNS (spy) — 13b/70b-class sharded decode no longer
    silently drops to the slow path."""
    import dataclasses
    from functools import partial

    import owq_tpu.kernels.gemv_fused as gf
    from owq_tpu.models import forward, init_cache
    from owq_tpu.models.synthetic import build_synthetic, synthetic_config
    from owq_tpu.parallel import make_tp_decode
    from owq_tpu.parallel.partition import prepare_decode_fast_tp
    from owq_tpu.runtime.fuse import prepare_decode_fast

    calls = []
    orig = gf.fused_matvec_reference

    def spy(*a, **k):
        calls.append(a[1].shape)
        return orig(*a, **k)

    monkeypatch.setattr(gf, "fused_matvec_reference", spy)

    # llama-tiny with tile-divisible local shapes at tp=2:
    # qkv 768/2=384, gateup 1024/2=512, o/down out 256 (all % 128 == 0)
    cfg = synthetic_config("llama-tiny", max_pos=32)
    cfg = dataclasses.replace(cfg, intermediate_size=512)
    params = jax.jit(partial(build_synthetic, cfg, bits=3, target_bit=3.1,
                             dtype=jnp.bfloat16))()
    ids = rng.integers(0, cfg.vocab_size, size=(1, 8)).astype(np.int32)

    # single-chip FAST reference (teacher-forced, token by token)
    ps, cfg_s = prepare_decode_fast(copy.deepcopy(params), cfg)
    ps.pop("fast_attn", None)
    cs = init_cache(cfg_s, 1, 16, dtype=jnp.bfloat16)
    refs = []
    for t in range(6):
        ls, cs = forward(ps, cfg_s, jnp.asarray(ids[:, t:t + 1]), cache=cs,
                         dtype=jnp.bfloat16)
        refs.append(np.asarray(ls[:, -1], np.float32))

    pg, _ = shard_model_tp(copy.deepcopy(params), cfg, 2)
    pf, _ = shard_model_tp(copy.deepcopy(params), cfg, 2)
    pf, cfg_local = prepare_decode_fast_tp(pf, cfg, 2)
    assert pf["layers"][0].get("fast") is not None
    assert cfg_local.fused_qkv
    assert pf["layers"][0]["fast"]["o"]["sel"].ndim == 3  # per-shard aux

    mesh = make_mesh(dp=1, tp=2)
    with mesh:
        pg = place_params(pg, mesh, cfg)
        step_g, mc_g = make_tp_decode(mesh, cfg, pg, dtype=jnp.bfloat16)
        cg = mc_g(1, 16)
        pf = place_params(pf, mesh, cfg)
        step_f, mc_f = make_tp_decode(mesh, cfg, pf, dtype=jnp.bfloat16)
        cf = mc_f(1, 16)

        n_before = len(calls)
        lg, cg = step_g(pg, jnp.asarray(ids[:, :1]), cg)
        assert len(calls) == n_before  # generic path: no fused calls
        lf, cf = step_f(pf, jnp.asarray(ids[:, :1]), cf)
        assert len(calls) > n_before   # fast path ran the fused dispatcher
        for t in range(6):
            tok = jnp.asarray(ids[:, t:t + 1])
            if t > 0:
                lg, cg = step_g(pg, tok, cg)
                lf, cf = step_f(pf, tok, cf)
            a = np.asarray(lf, np.float32)
            b = np.asarray(lg, np.float32)
            # close to the single-chip fast path (same math family; the
            # per-shard split reorders the f32 accumulation).  Only the
            # FIRST step is gated tightly: later steps read back the
            # slightly different caches, so bf16 deviations compound.
            if t == 0:
                assert np.abs(a - refs[t]).max() <= \
                    0.05 * (np.abs(refs[t]).max() + 1e-6), t
            # envelope vs the generic TP path (catches wiring errors like
            # a dropped/doubled residual, which shift logits by O(1))
            assert np.abs(a - b).max() <= 0.6 + 0.05 * np.abs(b).max(), t
