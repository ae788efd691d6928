"""End-to-end: quantize a tiny model -> ppl gate -> pack -> save/load."""

import numpy as np
import pytest

import jax.numpy as jnp

from owq_tpu.models import arch_for_model, forward, import_hf_model
from owq_tpu.recon.pipeline import outlier_budget, quantize_model
from owq_tpu.runtime.checkpoint import load_checkpoint, pack_model, save_checkpoint
from owq_tpu.eval.ppl import eval_ppl
import hf_tiny


@pytest.fixture(scope="module")
def calib(rng_mod=np.random.default_rng(7)):
    return rng_mod.integers(0, 97, size=(8, 32)).astype(np.int32)


@pytest.fixture(scope="module")
def stream(rng_mod=np.random.default_rng(8)):
    # synthetic "held-out" token stream with some regularity so ppl is finite
    base = np.arange(96 * 4) % 96
    noise = rng_mod.integers(0, 96, size=base.size)
    pick = rng_mod.random(base.size) < 0.3
    return np.where(pick, noise, base).astype(np.int32)


def quantized_tiny_opt(calib, wbits=3, target_bit=3.01, **kw):
    model = hf_tiny.tiny_opt(hidden=32, ffn=64, layers=2)
    params, cfg = import_hf_model(model)
    arch = arch_for_model("opt-tiny")
    params, quantizers = quantize_model(
        params, cfg, arch, calib, wbits=wbits, target_bit=target_bit,
        tuning="minmax", verbose=False, **kw)
    return model, params, cfg, quantizers


def test_budget_matches_reference_formula():
    model = hf_tiny.tiny_opt(hidden=32, ffn=64, layers=2)
    params, cfg = import_hf_model(model)
    arch = arch_for_model("opt")
    n_out = outlier_budget(params, cfg, arch, 3, target_bit=3.01)
    # r = (12/13)*0.01/6 per layer; attn: 32*r*1.0 ~ 0.05 -> 0 (even round)
    r = (12.0 / 13) * 0.01 / 6
    for name, infeat, ratio in [("attn.q", 32, 1.0), ("mlp.fc2", 64, 0.25)]:
        want = round(infeat * r * ratio)
        if want % 2 == 1:
            want += 1
        assert n_out[name] == want
    # a bigger budget actually yields outliers
    n_out2 = outlier_budget(params, cfg, arch, 3, target_bit=3.8)
    assert n_out2["attn.q"] > 0 and n_out2["attn.q"] % 2 == 0


def test_quantize_improves_over_rtn_ppl(calib, stream):
    model, params_q, cfg, quantizers = quantized_tiny_opt(
        calib, target_bit=None, target_rank=2)
    params_fp, _ = import_hf_model(model)

    ppl_fp = eval_ppl(params_fp, cfg, stream, seqlen=32, batch=4)
    ppl_q = eval_ppl(params_q, cfg, stream, seqlen=32, batch=4)
    assert np.isfinite(ppl_q)
    # a tiny random model won't be close, but must stay in a sane band
    assert ppl_q < ppl_fp * 3.0
    assert len(quantizers) == 2 * 6  # 2 layers x 6 linears


def test_packed_forward_matches_fake_quant(calib):
    _, params_q, cfg, quantizers = quantized_tiny_opt(
        calib, target_bit=None, target_rank=2)
    ids = calib[:2, :16]
    ref, _ = forward(params_q, cfg, jnp.asarray(ids))

    import copy
    packed = pack_model(copy.deepcopy(params_q), quantizers, 3,
                        weight_dtype=jnp.float32)
    got, _ = forward(packed, cfg, jnp.asarray(ids))
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=1e-4, rtol=1e-4)


def test_checkpoint_roundtrip(tmp_path, calib):
    _, params_q, cfg, quantizers = quantized_tiny_opt(
        calib, target_bit=None, target_rank=2)
    packed = pack_model(params_q, quantizers, 3, weight_dtype=jnp.float32)
    ids = calib[:1, :8]
    ref, _ = forward(packed, cfg, jnp.asarray(ids))

    path = str(tmp_path / "ckpt")
    save_checkpoint(path, packed, cfg, quantizers=quantizers, packed=True)
    params2, cfg2, manifest = load_checkpoint(path)
    assert cfg2 == cfg
    assert manifest["packed"] is True
    got, _ = forward(params2, cfg2, jnp.asarray(ids))
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-6)


def test_checkpoint_rejects_stale_packed_format(tmp_path, calib):
    # format_version 1 checkpoints hold the old contiguous-chunk qweight
    # row layout; loading them through pair-interleaved decode would be
    # silent numeric garbage, so the loader must refuse (ADVICE r2)
    import json
    import os

    _, params_q, cfg, quantizers = quantized_tiny_opt(
        calib, target_bit=None, target_rank=2)
    packed = pack_model(params_q, quantizers, 3, weight_dtype=jnp.float32)
    path = str(tmp_path / "stale_ckpt")
    save_checkpoint(path, packed, cfg, quantizers=quantizers, packed=True)
    mpath = os.path.join(path, "manifest.json")
    with open(mpath) as f:
        manifest = json.load(f)
    assert manifest["format_version"] == 2
    manifest["format_version"] = 1
    with open(mpath, "w") as f:
        json.dump(manifest, f)
    with pytest.raises(ValueError, match="format_version"):
        load_checkpoint(path)


def test_checkpoint_dense_tolerates_old_version(tmp_path):
    # dense (fp) checkpoints carry no packed words: old-version manifests
    # stay loadable (the layout change cannot corrupt them)
    import json
    import os

    model = hf_tiny.tiny_opt(hidden=32, ffn=64, layers=2)
    params, cfg = import_hf_model(model)
    path = str(tmp_path / "dense_ckpt")
    save_checkpoint(path, params, cfg)
    mpath = os.path.join(path, "manifest.json")
    with open(mpath) as f:
        manifest = json.load(f)
    manifest["format_version"] = 1
    with open(mpath, "w") as f:
        json.dump(manifest, f)
    params2, cfg2, _ = load_checkpoint(path)
    assert cfg2 == cfg


def test_checkpoint_roundtrip_a8_layout(tmp_path, rng):
    # the A8 byte layout must survive save/load: a checkpoint written
    # after repack_model_a8 that silently came back 'paired' would
    # dequantize permuted nibbles (ADVICE r2)
    import copy

    from owq_tpu.models.synthetic import build_synthetic, synthetic_config
    from owq_tpu.runtime.fuse import repack_model_a8

    cfg = synthetic_config("llama-tiny", max_pos=64)
    params = build_synthetic(cfg, bits=4, dtype=jnp.bfloat16)
    params8 = repack_model_a8(copy.deepcopy(params), cfg)
    ids = jnp.asarray(rng.integers(0, cfg.vocab_size, size=(1, 8))
                      .astype(np.int32))
    ref, _ = forward(params8, cfg, ids, kernel="pallas", dtype=jnp.bfloat16)
    path = str(tmp_path / "a8_ckpt")
    save_checkpoint(path, params8, cfg, packed=True)
    params2, cfg2, _ = load_checkpoint(path)
    assert params2["layers"][0]["attn"]["q"].layout == "a8"
    got, _ = forward(params2, cfg2, ids, kernel="pallas", dtype=jnp.bfloat16)
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(ref, np.float32), atol=1e-6)


def test_checkpoint_roundtrip_nonparametric_norms(tmp_path, calib):
    # olmo: norm entries hold no arrays, so they vanish from a saved
    # checkpoint — the rebuilt model must still apply every norm
    # (regression: forward raised KeyError 'ln1' after load, and unembed
    # silently skipped the final norm)
    model = hf_tiny.tiny_olmo(hidden=32, inter=64, layers=2, heads=4,
                              kv_heads=2)
    params, cfg = import_hf_model(model)
    params_q, quantizers = quantize_model(
        params, cfg, arch_for_model("olmo"), calib, wbits=3, target_rank=2,
        tuning="minmax", verbose=False)
    packed = pack_model(params_q, quantizers, 3, weight_dtype=jnp.float32)
    ids = calib[:1, :8]
    ref, _ = forward(packed, cfg, jnp.asarray(ids))
    path = str(tmp_path / "olmo_ckpt")
    save_checkpoint(path, packed, cfg, quantizers=quantizers, packed=True)
    params2, cfg2, _ = load_checkpoint(path)
    got, _ = forward(params2, cfg2, jnp.asarray(ids))
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-6)


def test_checkpoint_roundtrip_tuple_config_fields(tmp_path, calib):
    # layer_types / rope_scaling are tuples in ModelConfig (it is a jit
    # static arg and must hash); the JSON manifest stores them as lists —
    # loading must re-freeze them (regression: gemma2 checkpoints raised
    # "unhashable type: 'list'" at the first jitted call after load)
    model = hf_tiny.tiny_gemma2(hidden=32, inter=48, layers=2, heads=4,
                                kv_heads=2, sliding_window=8)
    params, cfg = import_hf_model(model)
    params_q, quantizers = quantize_model(
        params, cfg, arch_for_model("gemma2"), calib, wbits=3, target_rank=2,
        tuning="minmax", verbose=False)
    packed = pack_model(params_q, quantizers, 3, weight_dtype=jnp.float32)
    ids = calib[:1, :8]
    ref, _ = forward(packed, cfg, jnp.asarray(ids))
    path = str(tmp_path / "gemma2_ckpt")
    save_checkpoint(path, packed, cfg, quantizers=quantizers, packed=True)
    params2, cfg2 = load_checkpoint(path)[:2]
    assert cfg2 == cfg and hash(cfg2) == hash(cfg)
    got, _ = forward(params2, cfg2, jnp.asarray(ids))
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-6)


def test_true_sequential_and_frob(calib, stream):
    model, params_q, cfg, _ = quantized_tiny_opt(
        calib, target_bit=None, target_rank=2, true_sequential=True)
    ppl = eval_ppl(params_q, cfg, stream, seqlen=32, batch=4)
    assert np.isfinite(ppl)


def test_resume_quantization(tmp_path, calib):
    """Per-layer resume: interrupted run restarts from saved blocks."""
    import jax.numpy as jnp
    from owq_tpu.recon import pipeline as pl_mod

    model = hf_tiny.tiny_opt(hidden=32, ffn=64, layers=2)
    params, cfg = import_hf_model(model)
    arch = arch_for_model("opt")
    rdir = str(tmp_path / "resume")

    p1, q1 = quantize_model(
        import_hf_model(model)[0], cfg, arch, calib, wbits=3, target_rank=2,
        tuning="minmax", verbose=False, resume_dir=rdir)

    # fresh params + resume dir -> identical result without re-running GPTQ
    calls = {"n": 0}
    orig = pl_mod.gptq_quantize

    def counting(*a, **k):
        calls["n"] += 1
        return orig(*a, **k)

    pl_mod.gptq_quantize = counting
    try:
        p2, q2 = quantize_model(
            import_hf_model(model)[0], cfg, arch, calib, wbits=3,
            target_rank=2, tuning="minmax", verbose=False, resume_dir=rdir)
    finally:
        pl_mod.gptq_quantize = orig
    assert calls["n"] == 0  # everything restored
    import numpy as np

    for key in q1:
        np.testing.assert_allclose(q1[key].scale, q2[key].scale, rtol=1e-6)
    w1 = np.asarray(p1["layers"][0]["attn"]["q"].w)
    w2 = np.asarray(p2["layers"][0]["attn"]["q"].w)
    np.testing.assert_allclose(w1, w2, rtol=1e-6)


def test_offload_quantization_matches(calib):
    """Host-offload streaming produces the same result as on-device."""
    model = hf_tiny.tiny_opt(hidden=32, ffn=64, layers=2)
    _, cfg = import_hf_model(model)
    arch = arch_for_model("opt")
    p1, q1 = quantize_model(import_hf_model(model)[0], cfg, arch, calib,
                            wbits=3, target_rank=2, tuning="minmax",
                            verbose=False)
    p2, q2 = quantize_model(import_hf_model(model)[0], cfg, arch, calib,
                            wbits=3, target_rank=2, tuning="minmax",
                            verbose=False, offload=True)
    w1 = np.asarray(p1["layers"][1]["mlp"]["fc2"].w)
    w2 = np.asarray(p2["layers"][1]["mlp"]["fc2"].w)
    np.testing.assert_allclose(w1, w2, rtol=1e-5, atol=1e-6)
    assert isinstance(p2["layers"][0]["attn"]["q"].w, np.ndarray)


def test_layerwise_offload_ppl_matches(calib, stream):
    model = hf_tiny.tiny_opt(hidden=32, ffn=64, layers=2)
    params, cfg = import_hf_model(model)
    p1 = eval_ppl(params, cfg, stream, seqlen=32, batch=4)
    p2 = eval_ppl(params, cfg, stream, seqlen=32, batch=4, offload=True)
    assert abs(p1 - p2) / p1 < 1e-4


def test_fused_projections_match(calib):
    """q|k|v + gate|up fusion is numerically identical."""
    import copy

    from owq_tpu.runtime.fuse import fuse_block_projections

    _, params_q, cfg, quantizers = quantized_tiny_opt(
        calib, target_bit=None, target_rank=2)
    packed = pack_model(params_q, quantizers, 3, weight_dtype=jnp.float32)
    ids = calib[:2, :12]
    ref, _ = forward(packed, cfg, jnp.asarray(ids))

    fused, cfg2 = fuse_block_projections(copy.deepcopy(packed), cfg)
    assert cfg2.fused_qkv
    assert "qkv" in fused["layers"][0]["attn"]
    got, _ = forward(fused, cfg2, jnp.asarray(ids))
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=1e-4, rtol=1e-4)


def test_fused_projections_llama(rng_mod=np.random.default_rng(9)):
    """Gated-MLP fusion path (llama)."""
    import copy

    from owq_tpu.runtime.fuse import fuse_block_projections

    model = hf_tiny.tiny_llama(hidden=32, inter=64, layers=2)
    params, cfg = import_hf_model(model)
    ids = rng_mod.integers(0, 97, size=(1, 8)).astype(np.int32)
    ref, _ = forward(params, cfg, jnp.asarray(ids))
    fused, cfg2 = fuse_block_projections(copy.deepcopy(params), cfg)
    assert "gateup" in fused["layers"][0]["mlp"]
    got, _ = forward(fused, cfg2, jnp.asarray(ids))
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=2e-5, rtol=1e-4)


@pytest.mark.parametrize("kwargs", [
    dict(actorder=True),
    dict(sym=True),
    dict(groupsize=128),
    dict(no_frob_norm=True),
])
def test_quantize_flag_combinations(calib, stream, kwargs):
    """Reference CLI flag surface: act-order / sym / groupsize / no-frob."""
    model = hf_tiny.tiny_opt(hidden=32, ffn=64, layers=2)
    params, cfg = import_hf_model(model)
    arch = arch_for_model("opt")
    params, quantizers = quantize_model(
        params, cfg, arch, calib, wbits=4, target_rank=2, tuning="minmax",
        verbose=False, **kwargs)
    ppl = eval_ppl(params, cfg, stream, seqlen=32, batch=4)
    assert np.isfinite(ppl)
    assert all(np.isfinite(q.loss) for q in quantizers.values())


def test_quantize_moe_and_checkpoint_roundtrip(tmp_path, calib):
    """Mixtral: per-expert GPTQ (routing-weighted Hessians) -> pack ->
    save/load roundtrip preserves the expert list structure and logits."""
    model = hf_tiny.tiny_mixtral(hidden=32, inter=48, layers=2, heads=4,
                                 kv_heads=2, experts=4, topk=2)
    params, cfg = import_hf_model(model)
    params_q, quantizers = quantize_model(
        params, cfg, arch_for_model("mixtral"), calib, wbits=3,
        target_bit=3.2, tuning="minmax", true_sequential=True, verbose=False)
    # every expert linear got its own quantizer entry
    assert any("mlp.experts.3.down" in k for k in quantizers)
    packed = pack_model(params_q, quantizers, 3, weight_dtype=jnp.float32)
    ref, _ = forward(packed, cfg, jnp.asarray(calib[:2]))

    path = str(tmp_path / "moe_ckpt")
    save_checkpoint(path, packed, cfg, quantizers=quantizers, packed=True)
    params2, cfg2, _ = load_checkpoint(path)
    assert isinstance(params2["layers"][0]["mlp"]["experts"], list)
    got, _ = forward(params2, cfg2, jnp.asarray(calib[:2]))
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5)


@pytest.mark.parametrize("family", ["mistral", "neox", "gemma", "phi",
                                    "phi3", "stablelm", "mpt", "starcoder2",
                                    "starcoder", "olmo", "qwen3", "gemma2",
                                    "olmo2", "cohere", "granite", "nemotron",
                                    "persimmon", "glm4", "smollm3",
                                    "deepseek", "deepseek-v2-lite",
                                    "gpt-oss", "qwen2-moe", "qwen3-moe",
                                    "glm4-moe", "dbrx", "olmoe", "helium",
                                    "arcee", "seed-oss", "ernie", "exaone",
                                    "llama4", "hunyuan", "hunyuan-moe",
                                    "phimoe", "granitemoe", "bamba",
                                    "granite-4", "falcon-h1",
                                    "qwen3-next", "mamba2", "jamba",
                                    "falcon-mamba", "minimax", "lfm2",
                                    "apertus", "ernie-moe", "gemma-3",
                                    "olmo-3", "gpt-neo", "codegen",
                                    "recurrentgemma", "ministral",
                                    "vaultgemma", "xglm", "biogpt",
                                    "bitnet", "dots1", "flex-olmo",
                                    "zamba2", "jetmoe"])
def test_quantize_new_families(calib, family):
    """GPTQ-OWQ end-to-end (quantize -> pack -> packed forward) on the
    beyond-reference families; fused-qkv taps and llama-shaped taps both."""
    makers = {
        "mistral": lambda: hf_tiny.tiny_mistral(hidden=32, inter=56, layers=2,
                                                heads=4, kv_heads=2,
                                                sliding_window=16),
        "neox": lambda: hf_tiny.tiny_neox(hidden=32, inter=64, layers=2,
                                          heads=4, rotary_pct=0.25),
        "gemma": lambda: hf_tiny.tiny_gemma(hidden=32, inter=56, layers=2,
                                            heads=4, kv_heads=2, head_dim=16),
        "phi": lambda: hf_tiny.tiny_phi(hidden=32, inter=64, layers=2,
                                        heads=4),
        "phi3": lambda: hf_tiny.tiny_phi3(hidden=32, inter=48, layers=2,
                                          heads=4, kv_heads=2),
        "stablelm": lambda: hf_tiny.tiny_stablelm(hidden=32, inter=48,
                                                  layers=2, heads=4,
                                                  kv_heads=2),
        "mpt": lambda: hf_tiny.tiny_mpt(hidden=32, layers=2, heads=4),
        "starcoder2": lambda: hf_tiny.tiny_starcoder2(hidden=32, inter=64,
                                                      layers=2, heads=4,
                                                      kv_heads=2),
        "starcoder": lambda: hf_tiny.tiny_gpt_bigcode(hidden=32, layers=2,
                                                      heads=4),
        "olmo": lambda: hf_tiny.tiny_olmo(hidden=32, inter=64, layers=2,
                                          heads=4, kv_heads=2),
        "qwen3": lambda: hf_tiny.tiny_qwen3(hidden=32, inter=48, layers=2,
                                            heads=4, kv_heads=2),
        "gemma2": lambda: hf_tiny.tiny_gemma2(hidden=32, inter=48, layers=2,
                                              heads=4, kv_heads=2,
                                              sliding_window=8),
        "olmo2": lambda: hf_tiny.tiny_olmo2(hidden=32, inter=48, layers=2,
                                            heads=4, kv_heads=2),
        "cohere": lambda: hf_tiny.tiny_cohere(hidden=32, inter=48, layers=2,
                                              heads=4, kv_heads=2,
                                              use_qk_norm=True),
        "granite": lambda: hf_tiny.tiny_granite(hidden=32, inter=48, layers=2,
                                                heads=4, kv_heads=2),
        "nemotron": lambda: hf_tiny.tiny_nemotron(hidden=32, inter=64,
                                                  layers=2, heads=4,
                                                  kv_heads=2),
        "persimmon": lambda: hf_tiny.tiny_persimmon(hidden=32, inter=64,
                                                    layers=2, heads=4),
        "glm4": lambda: hf_tiny.tiny_glm(hidden=32, inter=48, layers=2,
                                         heads=4, kv_heads=2, v4=True),
        "smollm3": lambda: hf_tiny.tiny_smollm3(hidden=32, inter=48, layers=4,
                                                heads=4, kv_heads=2,
                                                rope_interval=2),
        # heterogeneous blocks: dense first layer + MoE with shared experts;
        # MLA low-rank projections quantized via latent-input Hessians
        "deepseek": lambda: hf_tiny.tiny_deepseek_v3(layers=3, experts=4,
                                                     n_group=2, topk_group=1),
        "deepseek-v2-lite": lambda: hf_tiny.tiny_deepseek_v2(
            q_lora=None, experts=4, topk_method="greedy"),
        "gpt-oss": lambda: hf_tiny.tiny_gpt_oss(experts=4),
        "qwen2-moe": lambda: hf_tiny.tiny_qwen2_moe(),
        "qwen3-moe": lambda: hf_tiny.tiny_qwen3_moe(),
        "glm4-moe": lambda: hf_tiny.tiny_glm4_moe(experts=4, n_group=2,
                                                  topk_group=1),
        "dbrx": lambda: hf_tiny.tiny_dbrx(),
        "olmoe": lambda: hf_tiny.tiny_olmoe(clip_qkv=6.0),
        "helium": lambda: hf_tiny.tiny_helium(),
        "arcee": lambda: hf_tiny.tiny_arcee(),
        "seed-oss": lambda: hf_tiny.tiny_seed_oss(),
        "ernie": lambda: hf_tiny.tiny_ernie45(),
        "exaone": lambda: hf_tiny.tiny_exaone4(),
        "llama4": lambda: hf_tiny.tiny_llama4(),
        "hunyuan": lambda: hf_tiny.tiny_hunyuan_dense(),
        "hunyuan-moe": lambda: hf_tiny.tiny_hunyuan_moe(),
        "phimoe": lambda: hf_tiny.tiny_phimoe(),
        "granitemoe": lambda: hf_tiny.tiny_granitemoe(shared=True),
        # hybrid mamba2/attention: in_proj/out_proj quantize via SSD taps
        "bamba": lambda: hf_tiny.tiny_bamba(),
        "granite-4": lambda: hf_tiny.tiny_granite4(),
        "falcon-h1": lambda: hf_tiny.tiny_falcon_h1(),
        "qwen3-next": lambda: hf_tiny.tiny_qwen3_next(),
        "mamba2": lambda: hf_tiny.tiny_mamba2(),
        "jamba": lambda: hf_tiny.tiny_jamba(),
        "falcon-mamba": lambda: hf_tiny.tiny_mamba1(falcon=True),
        "minimax": lambda: hf_tiny.tiny_minimax(),
        "lfm2": lambda: hf_tiny.tiny_lfm2(),
        "apertus": lambda: hf_tiny.tiny_apertus(),
        "ernie-moe": lambda: hf_tiny.tiny_ernie45_moe(),
        "gemma-3": lambda: hf_tiny.tiny_gemma3(),
        "olmo-3": lambda: hf_tiny.tiny_olmo3(),
        "gpt-neo": lambda: hf_tiny.tiny_gpt_neo(),
        "codegen": lambda: hf_tiny.tiny_codegen(),
        "recurrentgemma": lambda: hf_tiny.tiny_recurrentgemma(),
        "ministral": lambda: hf_tiny.tiny_ministral(),
        "vaultgemma": lambda: hf_tiny.tiny_vaultgemma(),
        "xglm": lambda: hf_tiny.tiny_xglm(),
        "biogpt": lambda: hf_tiny.tiny_biogpt(),
        "bitnet": lambda: hf_tiny.tiny_bitnet(),
        "dots1": lambda: hf_tiny.tiny_dots1(),
        "flex-olmo": lambda: hf_tiny.tiny_flex_olmo(),
        "zamba2": lambda: hf_tiny.tiny_zamba2(),
        "jetmoe": lambda: hf_tiny.tiny_jetmoe(),
    }
    model = makers[family]()
    params, cfg = import_hf_model(model)
    ref, _ = forward(params, cfg, jnp.asarray(calib[:2]))
    params_q, quantizers = quantize_model(
        params, cfg, arch_for_model(family), calib, wbits=3, target_rank=2,
        tuning="minmax", verbose=False)
    packed = pack_model(params_q, quantizers, 3, weight_dtype=jnp.float32)
    got, _ = forward(packed, cfg, jnp.asarray(calib[:2]))
    assert np.isfinite(np.asarray(got)).all()
    # quantized logits stay correlated with fp logits on a tiny model
    a = np.asarray(ref).ravel()
    b = np.asarray(got).ravel()
    assert np.corrcoef(a, b)[0, 1] > 0.9


def test_quantize_2bit_fake(calib, stream):
    """2-bit: reconstruction + fake-quant works (packing is 3/4-bit only,
    like the reference, quant.py:265)."""
    model = hf_tiny.tiny_opt(hidden=32, ffn=64, layers=2)
    params, cfg = import_hf_model(model)
    arch = arch_for_model("opt")
    params, quantizers = quantize_model(
        params, cfg, arch, calib, wbits=2, target_rank=2, tuning="minmax",
        verbose=False)
    ppl = eval_ppl(params, cfg, stream, seqlen=32, batch=4)
    assert np.isfinite(ppl)
    from owq_tpu.runtime.quant_linear import pack_linear

    with pytest.raises(ValueError):
        pack_linear(np.zeros((8, 32), np.float32), np.ones(8), np.zeros(8),
                    np.zeros(0, np.int32), 2)


@pytest.mark.parametrize("family,maker", [
    ("jetmoe", lambda: hf_tiny.tiny_jetmoe()),
    ("dots1", lambda: hf_tiny.tiny_dots1()),
    ("granite-4", lambda: hf_tiny.tiny_granite4()),
    ("deepseek", lambda: hf_tiny.tiny_deepseek_v3(layers=3, experts=4)),
    ("qwen2-moe", lambda: hf_tiny.tiny_qwen2_moe()),
])
def test_true_sequential_covers_all_linears(calib, family, maker):
    """true_sequential reconstructs EVERY quantizable linear present in each
    block.  Round-1 regression (ADVICE.md): the generic MoE grouping skipped
    jetmoe's moa.experts.*.{q,out} + attn.kv, dots1's dense first-k mlp.*
    and mlp.shared.*, and granite-4 hybrid's mamba projections — leaving
    them silently unquantized (group members are intersected with present
    linears, so no error was raised)."""
    from owq_tpu.models.transformer import quantizable_names
    from owq_tpu.recon.pipeline import _has_linear

    model = maker()
    params, cfg = import_hf_model(model)
    params_q, quantizers = quantize_model(
        params, cfg, arch_for_model(family), calib, wbits=3, target_rank=2,
        tuning="minmax", true_sequential=True, verbose=False)
    names = quantizable_names(cfg)
    missing = [f"{li}.{n}"
               for li, blk in enumerate(params_q["layers"])
               for n in names
               if _has_linear(blk, n) and f"{li}.{n}" not in quantizers]
    assert not missing, f"unquantized linears under true_sequential: {missing}"
