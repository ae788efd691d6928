"""Fused-decode fastpath: wiring parity vs the generic block path.

prepare_decode_fast attaches per-block aux (runtime/fuse.py) and
block_forward routes decode steps through kernels/gemv_fused.py.  On CPU
the dispatcher uses the jnp reference with IDENTICAL math, so these tests
exercise the full fastpath wiring (gates, norm/residual restructuring,
engine integration) without TPU hardware; the pallas kernel itself is
parity-tested against the same reference on-chip (tools + bench).
"""

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from owq_tpu.models.synthetic import build_synthetic, synthetic_config
from owq_tpu.models.transformer import forward, init_cache
from owq_tpu.runtime.fuse import fuse_block_projections, prepare_decode_fast
from owq_tpu.runtime.generate import generate

pytestmark = pytest.mark.fast


def _tiny_cfg():
    # intermediate 512 -> gateup out 1024 (tile-divisible; llama-tiny's
    # 688 is not, which also exercises the fused_applicable gate below)
    cfg = synthetic_config("llama-tiny", max_pos=64)
    return dataclasses.replace(cfg, intermediate_size=512)


def _build(cfg, bits=3):
    return jax.jit(partial(build_synthetic, cfg, bits=bits,
                           dtype=jnp.bfloat16))()


def test_prepare_attaches_fast_aux():
    cfg = _tiny_cfg()
    params = _build(cfg)
    params, cfg2 = prepare_decode_fast(params, cfg)
    assert cfg2.fused_qkv
    for blk in params["layers"]:
        assert "fast" in blk
        for key in ("qkv", "o", "gu", "dn"):
            assert blk["fast"][key]["sz"].shape[0] == 2
        # ln1/ln2 weights baked into the qkv/gateup aux
        assert blk["fast"]["qkv"]["gamma"] is not None
        assert blk["fast"]["gu"]["gamma"] is not None


def test_fast_gate_rejects_undivisible_tiles():
    cfg = synthetic_config("llama-tiny", max_pos=64)  # inter 688
    params = _build(cfg)
    params, _ = prepare_decode_fast(params, cfg)
    assert all("fast" not in blk for blk in params["layers"])


@pytest.mark.parametrize("bits", [3, 4])
def test_decode_parity_vs_generic(bits, rng):
    """Teacher-forced scan NLL: deterministic comparison (greedy token
    streams can flip on near-tied logits of a random tiny model)."""
    from owq_tpu.runtime.generate import _bench_scan

    cfg = _tiny_cfg()
    params = _build(cfg, bits=bits)
    fparams, fcfg = prepare_decode_fast(
        jax.tree_util.tree_map(lambda x: x, params), cfg)
    # baseline: plain projection fusion, generic block path
    gparams, gcfg = fuse_block_projections(
        jax.tree_util.tree_map(lambda x: x, params), cfg)

    toks = jnp.asarray(rng.integers(0, cfg.vocab_size, size=(1, 16)),
                       jnp.int32)
    cache = init_cache(fcfg, 1, 16, dtype=jnp.bfloat16)
    nll_f = float(_bench_scan(fparams, fcfg, toks, cache, "xla",
                              jnp.bfloat16))
    cache = init_cache(gcfg, 1, 16, dtype=jnp.bfloat16)
    nll_g = float(_bench_scan(gparams, gcfg, toks, cache, "xla",
                              jnp.bfloat16))
    assert abs(nll_f - nll_g) / max(abs(nll_g), 1.0) < 0.02, (nll_f, nll_g)


def test_fastpath_logits_close(rng):
    cfg = _tiny_cfg()
    params = _build(cfg)
    fparams, fcfg = prepare_decode_fast(
        jax.tree_util.tree_map(lambda x: x, params), cfg)
    gparams, gcfg = fuse_block_projections(
        jax.tree_util.tree_map(lambda x: x, params), cfg)

    ids = jnp.asarray(rng.integers(0, cfg.vocab_size, size=(1, 5)),
                      jnp.int32)
    cache_f = init_cache(fcfg, 1, 16, dtype=jnp.bfloat16)
    cache_g = init_cache(gcfg, 1, 16, dtype=jnp.bfloat16)
    # prefill (T=5 <= 16 rows: fastpath active) then one decode step
    lf, cache_f = forward(fparams, fcfg, ids, cache=cache_f,
                          dtype=jnp.bfloat16)
    lg, cache_g = forward(gparams, gcfg, ids, cache=cache_g,
                          dtype=jnp.bfloat16)
    tok = jnp.asarray([[7]], jnp.int32)
    lf2, _ = forward(fparams, fcfg, tok, cache=cache_f, dtype=jnp.bfloat16)
    lg2, _ = forward(gparams, gcfg, tok, cache=cache_g, dtype=jnp.bfloat16)
    for a, b in ((lf, lg), (lf2, lg2)):
        a = np.asarray(a, np.float32)
        b = np.asarray(b, np.float32)
        denom = np.abs(b).max() + 1e-6
        # bf16 reassociation noise accumulates over the residual stream;
        # bound the worst logit loosely and the average tightly
        assert np.abs(a - b).max() / denom < 0.06
        assert np.abs(a - b).mean() / denom < 0.01


def test_fastpath_inactive_without_cache(rng):
    """No-cache forwards (quantization pipeline) must not hit the fastpath."""
    cfg = _tiny_cfg()
    params = _build(cfg)
    fparams, fcfg = prepare_decode_fast(
        jax.tree_util.tree_map(lambda x: x, params), cfg)
    ids = jnp.asarray(rng.integers(0, cfg.vocab_size, size=(1, 4)),
                      jnp.int32)
    logits, _ = forward(fparams, fcfg, ids, dtype=jnp.float32)
    assert np.isfinite(np.asarray(logits, np.float32)).all()


def test_fast_attn_key_attached_and_active(rng, monkeypatch):
    """prepare_decode_fast sets params['fast_attn'] on an eligible model;
    a T=1 decode step routes EVERY layer through the fused attention path
    (and prefill routes none), and the cache it writes is bit-identical
    to the same fused model decoding through the generic attention."""
    import owq_tpu.kernels.attn_decode as ad

    calls = []
    orig = ad.attn_decode_reference

    def spy(*a, **k):
        calls.append(k.get("layer"))
        return orig(*a, **k)

    monkeypatch.setattr(ad, "attn_decode_reference", spy)

    # hd must be a full 128-lane tile (hd=32/64 fail Mosaic lowering on
    # hardware — verified on-chip, see kernels/attn_decode.py gate), so
    # the tiny model here uses 2 heads / 1 kv head: hd=128, GQA rep=2.
    # The in-place-stacks attention path is opt-in (measured net loss at
    # S=128, see fuse.py) — enable it for this wiring test.
    monkeypatch.setenv("OWQ_FA", "1")
    cfg = dataclasses.replace(_tiny_cfg(), num_heads=2, num_kv_heads=1)
    params = _build(cfg)
    fparams, fcfg = prepare_decode_fast(params, cfg)
    assert "fast_attn" in fparams
    # control: same fused params, fused-attention disabled
    gparams = {k: v for k, v in fparams.items() if k != "fast_attn"}

    ids = jnp.asarray(rng.integers(0, cfg.vocab_size, size=(1, 3)),
                      jnp.int32)
    tok = jnp.asarray([[5]], jnp.int32)
    cf = init_cache(fcfg, 1, 16, dtype=jnp.bfloat16)
    _, cf = forward(fparams, fcfg, ids, cache=cf, dtype=jnp.bfloat16)
    assert calls == []          # prefill stays on the generic attention
    lf, cf = forward(fparams, fcfg, tok, cache=cf, dtype=jnp.bfloat16)
    assert calls == list(range(fcfg.num_layers))

    cg = init_cache(fcfg, 1, 16, dtype=jnp.bfloat16)
    _, cg = forward(gparams, fcfg, ids, cache=cg, dtype=jnp.bfloat16)
    lg, cg = forward(gparams, fcfg, tok, cache=cg, dtype=jnp.bfloat16)
    # identical projections feed both paths -> the written K/V rows agree
    # exactly; slot 4 stays unwritten; logits agree to bf16 noise
    np.testing.assert_array_equal(np.asarray(cf.k), np.asarray(cg.k))
    np.testing.assert_array_equal(np.asarray(cf.v), np.asarray(cg.v))
    assert not np.asarray(cf.k[:, :, 4]).any()
    a, b = np.asarray(lf, np.float32), np.asarray(lg, np.float32)
    assert np.abs(a - b).max() <= 0.02 * (np.abs(b).max() + 1e-6)


@pytest.mark.parametrize("rep", [1, 2, 4])
def test_attn_decode_reference_vs_attention_core(rep, rng):
    """kernels/attn_decode.py math == models/layers.py attention_core on
    the gated subset (plain causal, single token), incl. GQA grouping."""
    from owq_tpu.kernels.attn_decode import attn_decode_reference
    from owq_tpu.models.layers import attention_core

    Hkv, hd, S, L, layer = 4, 128, 16, 3, 1
    H = Hkv * rep
    pos = 5
    scale = hd ** -0.5
    kstack = jnp.asarray(rng.standard_normal((L, 1, S, Hkv, hd)),
                         jnp.bfloat16)
    vstack = jnp.asarray(rng.standard_normal((L, 1, S, Hkv, hd)),
                         jnp.bfloat16)
    q = jnp.asarray(rng.standard_normal((1, 1, H, hd)), jnp.bfloat16)
    kn = jnp.asarray(rng.standard_normal((1, 1, Hkv, hd)), jnp.bfloat16)
    vn = jnp.asarray(rng.standard_normal((1, 1, Hkv, hd)), jnp.bfloat16)

    qg = q.reshape(Hkv, rep, hd).swapaxes(0, 1)
    ctx, ks2, vs2 = attn_decode_reference(
        qg, kn.reshape(1, Hkv, hd), vn.reshape(1, Hkv, hd), kstack, vstack,
        jnp.asarray(pos, jnp.int32), layer=layer, scale=scale)
    got = np.asarray(ctx.swapaxes(0, 1).reshape(1, 1, H * hd), np.float32)

    # generic semantics: cache update + masked attention_core
    kc = kstack.at[layer, 0, pos].set(kn[0, 0])
    vc = vstack.at[layer, 0, pos].set(vn[0, 0])
    sidx = jnp.arange(S)
    bias = jnp.where(sidx <= pos, 0.0, -1e30)[None, None, None, :]
    want = attention_core(q, kc[layer], vc[layer], bias, scale)
    want = np.asarray(want.reshape(1, 1, H * hd), np.float32)
    np.testing.assert_allclose(got, want, rtol=0.05, atol=0.05)
    # the new token's row landed in the returned stacks
    np.testing.assert_array_equal(
        np.asarray(ks2[layer, 0, pos]), np.asarray(kn[0, 0]))
    # other layers untouched
    np.testing.assert_array_equal(np.asarray(ks2[0]), np.asarray(kstack[0]))


def test_pack_lm_head_parity_and_fastpath(rng):
    """pack_lm_head replaces the dense head with an RTN PackedLinear whose
    plain packed forward matches the fast_head fused path bit-for-bit on
    the reference math, and the packed logits track the dense logits."""
    from owq_tpu.models.transformer import _lin, _norm
    from owq_tpu.runtime.fuse import pack_lm_head
    from owq_tpu.runtime.quant_linear import PackedLinear

    cfg = _tiny_cfg()
    params = _build(cfg)
    dense_head = params["lm_head"]
    packed = pack_lm_head(params, cfg, bits=4, n_weak=8)
    head = packed["lm_head"]
    assert isinstance(head, PackedLinear) and head.bits == 4
    assert head.out_ids.shape == (8,)

    fast, fcfg = prepare_decode_fast(dict(packed), cfg)
    assert fast.get("fast_head") is not None

    x = jnp.asarray(rng.standard_normal((1, 1, cfg.hidden_size)),
                    jnp.bfloat16)
    from owq_tpu.models.transformer import unembed

    got = unembed(fast, fcfg, x, kernel="pallas")         # fast_head path
    xn = _norm(packed.get("final_norm"), cfg, x)
    want = _lin(head, xn, "pallas")                        # plain packed
    # same quantized weights through two formulations (fused bf16-magic
    # correction vs plane-sum dequant): bf16 rounding orders differ, so
    # gate on near-perfect correlation + matching argmax, not bitwise
    g = np.asarray(got, np.float32).ravel()
    w = np.asarray(want, np.float32).ravel()
    assert np.corrcoef(g, w)[0, 1] > 0.9999
    assert g.argmax() == w.argmax()
    # quantization tracks the dense head (same argmax on a benign input)
    dense = _lin(dense_head, xn, "xla")
    g = np.asarray(got, np.float32).ravel()
    d = np.asarray(dense, np.float32).ravel()
    corr = np.corrcoef(g, d)[0, 1]
    assert corr > 0.99, f"packed head diverged from dense (corr={corr})"


def test_pack_lm_head_tied_embeddings(rng):
    """Tied-embedding models pack embed_tokens.T; the input embedding
    stays dense."""
    from owq_tpu.runtime.fuse import pack_lm_head
    from owq_tpu.runtime.quant_linear import PackedLinear

    cfg = dataclasses.replace(_tiny_cfg(), tie_word_embeddings=True)
    params = _build(cfg)
    assert params.get("lm_head") is None
    packed = pack_lm_head(params, cfg, bits=4)
    assert isinstance(packed["lm_head"], PackedLinear)
    assert packed["embed_tokens"].dtype == jnp.bfloat16
    ids = jnp.asarray(rng.integers(0, cfg.vocab_size, (1, 4)), jnp.int32)
    logits, _ = forward(packed, cfg, ids, kernel="pallas")
    base, _ = forward(params, cfg, ids, kernel="pallas")
    g = np.asarray(logits, np.float32).ravel()
    d = np.asarray(base, np.float32).ravel()
    assert np.corrcoef(g, d)[0, 1] > 0.99


def test_fast_attn_gate_rejects_non_silu(rng):
    """A gelu-gated model must NOT route into the full-layer kernel (it
    hardcodes the swiglu); the generic path serves it instead and the
    fastpath-model decode matches the unfused model."""
    from owq_tpu.models.transformer import init_cache

    cfg = dataclasses.replace(_tiny_cfg(), num_heads=2, num_kv_heads=1,
                              activation="gelu")
    params = _build(cfg)
    fparams, fcfg = prepare_decode_fast(
        jax.tree_util.tree_map(lambda a: a, params), cfg)
    assert "fast_attn" not in fparams
    ids = jnp.asarray(rng.integers(0, cfg.vocab_size, (1, 6)), jnp.int32)
    cache = init_cache(fcfg, 1, 32, dtype=jnp.bfloat16)
    logits, cache = forward(fparams, fcfg, ids, cache=cache,
                            kernel="pallas", dtype=jnp.bfloat16)
    tok = int(jnp.argmax(logits[0, -1]))
    cache2 = init_cache(cfg, 1, 32, dtype=jnp.bfloat16)
    logits2, _ = forward(params, cfg, ids, cache=cache2, kernel="pallas",
                         dtype=jnp.bfloat16)
    assert tok == int(jnp.argmax(logits2[0, -1]))


# ---------------------------------------------------------------------------
# Whole-model decode kernel (kernels/decode_model.py)
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("bits", [3, 4])
def test_model_kernel_attached_and_parity(bits, rng, monkeypatch):
    """prepare_decode_fast attaches params['fast_model'] on an eligible
    model, a T=1 decode step routes through the whole-model path (the
    jnp twin on CPU), and its logits + written cache rows match the
    per-layer fused path (fast_model stripped) on identical state."""
    import owq_tpu.kernels.decode_model as dm


    calls = []
    orig = dm.model_block_reference
    monkeypatch.setattr(
        dm, "model_block_reference",
        lambda *a, **k: calls.append(1) or orig(*a, **k))

    cfg = dataclasses.replace(_tiny_cfg(), num_heads=2, num_kv_heads=1)
    params = _build(cfg, bits=bits)
    fparams, fcfg = prepare_decode_fast(params, cfg)
    assert "fast_model" in fparams
    fm = fparams["fast_model"]
    assert fm["wq"].shape[0] == fcfg.num_layers
    assert fm["head"].dtype == jnp.bfloat16
    gparams = {k: v for k, v in fparams.items() if k != "fast_model"}

    ids = jnp.asarray(rng.integers(0, cfg.vocab_size, size=(1, 3)),
                      jnp.int32)
    tok = jnp.asarray([[5]], jnp.int32)
    cf = init_cache(fcfg, 1, 16, dtype=jnp.bfloat16)
    _, cf = forward(fparams, fcfg, ids, cache=cf, dtype=jnp.bfloat16)
    assert calls == []          # prefill stays on the generic path
    lf, cf = forward(fparams, fcfg, tok, cache=cf, dtype=jnp.bfloat16)
    assert calls == [1]         # decode ran the whole-model kernel path

    cg = init_cache(fcfg, 1, 16, dtype=jnp.bfloat16)
    _, cg = forward(gparams, fcfg, ids, cache=cg, dtype=jnp.bfloat16)
    lg, cg = forward(gparams, fcfg, tok, cache=cg, dtype=jnp.bfloat16)
    np.testing.assert_array_equal(np.asarray(cf.k), np.asarray(cg.k))
    np.testing.assert_array_equal(np.asarray(cf.v), np.asarray(cg.v))
    a, b = np.asarray(lf, np.float32), np.asarray(lg, np.float32)
    assert np.abs(a - b).max() <= 0.03 * (np.abs(b).max() + 1e-6)
    assert (a[0, -1].argmax() == b[0, -1].argmax())


def test_model_kernel_greedy_decode_matches_generic(rng, monkeypatch):
    """Multi-token greedy decode through the whole-model path tracks the
    fused model with fast_model stripped.  On CPU both run DIFFERENT jnp
    twin chains whose bf16 drift can flip near-tie argmaxes on a random
    tiny model, so the gate is agreement on >= 8/10 tokens with the
    first token exact; the bit-for-bit kernel-vs-kernel greedy equality
    runs ON CHIP (tools/verify_tpu.py section 10)."""
    cfg = dataclasses.replace(_tiny_cfg(), num_heads=2, num_kv_heads=1)
    params = _build(cfg)
    fparams, fcfg = prepare_decode_fast(params, cfg)
    assert "fast_model" in fparams
    gparams = {k: v for k, v in fparams.items() if k != "fast_model"}
    prompt = rng.integers(0, cfg.vocab_size, size=(1, 5)).astype(np.int32)
    tf = generate(fparams, fcfg, prompt, 10, max_len=24,
                  cache_dtype=jnp.bfloat16)
    tg = generate(gparams, fcfg, prompt, 10, max_len=24,
                  cache_dtype=jnp.bfloat16)
    assert tf[0, 0] == tg[0, 0]
    assert (tf[0] == tg[0]).sum() >= 8, (tf, tg)


def test_model_kernel_packed_head_mode(rng, monkeypatch):
    """pack_lm_head replaces the dense head -> the whole-model bundle
    attaches in PACKED-head mode (head ring streams int32 words with the
    scale/zero correction + weak columns fused), and greedy decode
    matches the per-layer fused path with its fast_head kernel."""
    from owq_tpu.runtime.fuse import pack_lm_head

    cfg = dataclasses.replace(_tiny_cfg(), num_heads=2, num_kv_heads=1)
    params = _build(cfg)
    params = pack_lm_head(params, cfg, bits=3, n_weak=8)
    fparams, fcfg = prepare_decode_fast(params, cfg)
    assert "fast_model" in fparams
    assert "hsz" in fparams["fast_model"]
    assert fparams["fast_model"]["head"].dtype == jnp.int32
    assert "fast_head" in fparams
    gparams = {k: v for k, v in fparams.items() if k != "fast_model"}
    # one decode step on identical cache state: same argmax, close
    # logits.  kernel="pallas" so the stripped path routes unembed
    # through the fast_head fused reference — the SAME head numerics
    # the model twin uses (the default "xla" unembed dequantizes
    # exactly, a different, documented ~1e-3-band numeric family).
    ids = jnp.asarray(rng.integers(0, cfg.vocab_size, size=(1, 3)),
                      jnp.int32)
    tok = jnp.asarray([[5]], jnp.int32)
    cf = init_cache(fcfg, 1, 16, dtype=jnp.bfloat16)
    _, cf = forward(fparams, fcfg, ids, cache=cf, dtype=jnp.bfloat16,
                    kernel="pallas")
    lf, _ = forward(fparams, fcfg, tok, cache=cf, dtype=jnp.bfloat16,
                    kernel="pallas")
    cg = init_cache(fcfg, 1, 16, dtype=jnp.bfloat16)
    _, cg = forward(gparams, fcfg, ids, cache=cg, dtype=jnp.bfloat16,
                    kernel="pallas")
    lg2, _ = forward(gparams, fcfg, tok, cache=cg, dtype=jnp.bfloat16,
                     kernel="pallas")
    a = np.asarray(lf, np.float32)
    b = np.asarray(lg2, np.float32)
    assert np.abs(a - b).max() <= 0.03 * (np.abs(b).max() + 1e-6)
    assert a[0, -1].argmax() == b[0, -1].argmax()
