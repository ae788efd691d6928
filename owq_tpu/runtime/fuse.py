"""Runtime projection fusion: fewer, larger kernel launches per block.

Decode is launch-overhead sensitive: fusing q|k|v into one packed matmul
and gate|up into another cuts per-block quantized-matmul calls from 7 to 4
(qkv, o, gateup, down) with identical math.  Fusion is a pure post-pack
transformation — quantization still runs per-linear like the reference
(each keeps its own scales/zeros/weak columns); the fused module
concatenates along the output axis and block-diagonalizes the weak-column
side matrix over the union of outlier indices.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, List, Tuple

import jax.numpy as jnp
import numpy as np

from ..models.config import ModelConfig
from .quant_linear import DenseLinear, PackedLinear

__all__ = ["fuse_linears", "fuse_block_projections", "repack_model_a8",
           "prepare_decode_fast", "make_fast_aux_sharded", "pack_lm_head"]


def fuse_linears(lins: List[Any]):
    """Concat linears along the output axis (same input dim required)."""
    if all(isinstance(l, DenseLinear) for l in lins):
        has_bias = any(l.b is not None for l in lins)
        b = None
        if has_bias:
            b = jnp.concatenate([
                l.b if l.b is not None else
                jnp.zeros((l.out_features,), l.w.dtype) for l in lins])
        return DenseLinear(w=jnp.concatenate([l.w for l in lins], axis=1), b=b)

    assert all(isinstance(l, PackedLinear) for l in lins), \
        "cannot fuse mixed dense/packed linears"
    bits = lins[0].bits
    infeat = lins[0].in_features
    assert all(l.bits == bits and l.in_features == infeat for l in lins)

    # union of weak-column indices; block-diagonal side matrix
    all_ids = sorted(set(int(i) for l in lins
                         for i in np.asarray(l.out_ids)))
    union = np.asarray(all_ids, np.int32)
    pos = {int(i): k for k, i in enumerate(union)}
    parts = []
    for l in lins:
        ow = np.zeros((len(union), l.out_features), np.float32)
        lids = np.asarray(l.out_ids)
        if lids.size:
            rows = [pos[int(i)] for i in lids]
            ow[rows] = np.asarray(l.oweight, np.float32)
        parts.append(ow)
    oweight = np.concatenate(parts, axis=1) if union.size else \
        np.zeros((0, sum(l.out_features for l in lins)), np.float32)

    has_bias = any(l.bias is not None for l in lins)
    bias = None
    if has_bias:
        bias = jnp.concatenate([
            l.bias if l.bias is not None else
            jnp.zeros((l.out_features,), l.scales.dtype) for l in lins])

    return PackedLinear(
        qweight=jnp.concatenate([l.qweight for l in lins], axis=1),
        scales=jnp.concatenate([l.scales for l in lins]),
        zeros=jnp.concatenate([l.zeros for l in lins]),
        oweight=jnp.asarray(oweight, dtype=lins[0].oweight.dtype),
        out_ids=jnp.asarray(union),
        bias=bias, bits=bits, in_features=infeat)


def fuse_block_projections(params: Dict[str, Any], cfg: ModelConfig
                           ) -> Tuple[Dict[str, Any], ModelConfig]:
    """Fuse q|k|v and gate|up in every block (llama/opt-style separates).

    Returns (params, cfg) with cfg.fused_qkv set; falcon/bloom are already
    fused.  Not composable with tensor parallelism's shard transform (TP
    splits fused projections back apart anyway).
    """
    if cfg.fused_qkv:
        return params, cfg
    if cfg.attn_gate:
        # qwen3-next q_proj is [query | gate] (2x width): a fused split by
        # head counts would slice it wrong
        return params, cfg
    for blk in params["layers"]:
        attn = blk.get("attn", {})  # mixer-only blocks have no attention
        if all(k in attn for k in ("q", "k", "v")):
            attn["qkv"] = fuse_linears([attn.pop("q"), attn.pop("k"),
                                        attn.pop("v")])
        mlp = blk.get("mlp", {})
        if cfg.gated_mlp and "gate" in mlp and "up" in mlp:
            mlp["gateup"] = fuse_linears([mlp.pop("gate"), mlp.pop("up")])
    return params, dataclasses.replace(cfg, fused_qkv=True)


def _fast_block_ok(cfg: ModelConfig, blk: Dict[str, Any]) -> bool:
    """Structure gate for the fused-decode fastpath (llama-class blocks).

    The fastpath only replaces norm+matmul+glue; rope / qk-norms /
    attention stay on the generic code, so those need no gating here.
    """
    from ..kernels.gemv_fused import fused_applicable

    if not (cfg.do_layer_norm_before and cfg.input_norms):
        return False
    if cfg.norm_type != "rmsnorm" or not cfg.gated_mlp:
        return False
    if (cfg.parallel_block or cfg.branch_norms or cfg.sub_norms
            or cfg.residual_multiplier is not None):
        return False
    for k in ("conv", "mamba", "zshared", "moa"):
        if k in blk:
            return False
    attn, mlp = blk.get("attn"), blk.get("mlp")
    if attn is None or mlp is None or "experts" in mlp:
        return False
    if blk.get("ln1") is None or blk.get("ln2") is None:
        return False
    lins = [attn.get("qkv"), attn.get("o"), mlp.get("gateup"),
            mlp.get("down")]
    if not all(isinstance(l, PackedLinear) and l.layout == "paired"
               for l in lins):
        return False
    return all(fused_applicable(8, l.out_features, l.qweight.shape[0])
               for l in lins)


def _fast_attn_ok(cfg: ModelConfig) -> bool:
    """Static gate for the full-layer decode kernel
    (kernels/decode_block.py): plain causal full-rotary attention AND a
    silu-gated MLP only — every feature the kernel does not implement
    falls back generically.  The activation check matters: the kernel
    hardcodes the swiglu (g * logistic(g) * u), so a gelu-gated model
    routed here would silently decode with the wrong nonlinearity.
    """
    hd = cfg.head_dim
    return (cfg.pos_embedding == "rope" and cfg.rope_style == "half"
            and cfg.rotary_pct == 1.0 and cfg.rotary_dim is None
            and cfg.sliding_window is None and cfg.layer_types is None
            and cfg.rope_layers is None and cfg.rope_local_theta is None
            and cfg.qk_norm is None and cfg.qkv_clip is None
            and not cfg.mla and not cfg.attn_gate and not cfg.attn_sinks
            and cfg.attn_logit_softcap is None
            and not cfg.attn_temperature_tuning and not cfg.zamba_block
            and cfg.gated_mlp and cfg.activation == "silu"
            and cfg.num_heads % cfg.num_kv_heads == 0
            and (cfg.num_kv_heads * hd) % 128 == 0)


def make_fast_aux_sharded(sp, n_pad_min: int = 8):
    """Per-shard fused-kernel aux for a row-parallel ShardedPackedLinear.

    ``sel``/``ow`` carry a leading shard axis (PartitionSpec ('tp', ...));
    inside shard_map the local slice has leading dim 1 and is squeezed by
    the caller.  ``sz`` and ``bias`` are replicated — the scale/zero
    correction distributes over input shards (y = Σ_s [acc_s*s -
    sum(x_s)*c]) and the bias is already pre-divided by the shard count
    (quant_linear.shard_packed_rowwise), so the block-level psum
    reconstitutes both exactly.
    """
    import numpy as np

    s32 = np.asarray(sp.scales, np.float32)
    z32 = np.asarray(sp.zeros, np.float32)
    sz = jnp.asarray(np.stack([s32, s32 * (z32 + 128.0)]))
    aux = {"sz": sz, "sel": None, "ow": None, "gamma": None, "bias": None}
    shards, n_max = sp.out_ids.shape
    out = sp.oweight.shape[-1]
    if n_max > 0:
        n_pad = max(n_pad_min, -(-n_max // 8) * 8)
        sels = np.zeros((shards, sp.in_features_local, n_pad), np.float32)
        ows = np.zeros((shards, n_pad, out), np.float32)
        ids = np.asarray(sp.out_ids)
        own = np.asarray(sp.oweight, np.float32)
        for s in range(shards):
            # padded slots carry id 0 with a ZERO oweight row: the one-hot
            # column picks x[0] but multiplies zeros — contribution is 0
            sels[s, ids[s], np.arange(n_max)] = 1.0
            ows[s, :n_max] = own[s]
        aux["sel"] = jnp.asarray(sels, jnp.bfloat16)
        aux["ow"] = jnp.asarray(ows, jnp.bfloat16)
    if sp.bias is not None:
        aux["bias"] = jnp.asarray(
            np.asarray(sp.bias, np.float32).reshape(1, -1))
    return aux


def _permute_packed_rows(p: PackedLinear, perm: "np.ndarray") -> PackedLinear:
    """Re-lay a PackedLinear's input rows so row i holds old row perm[i].

    Pure integer-code re-layout (unpack -> permute -> repack) plus the
    matching weak-column index remap; the represented matrix is unchanged
    up to input order.  Used by the attention-phase mega kernel
    (kernels/decode_block.py): for GQA rep > 1 its ctx flatten is
    rep-major while the o-proj input is head-major, so the o codes are
    permuted once at serving-prep time.
    """
    from ..core.packing import pack_np, unpack_np

    codes = unpack_np(np.asarray(p.qweight), p.bits, p.in_features)
    zeros_i = np.asarray(p.zeros).astype(np.int32)
    qw = pack_np(codes[perm], p.bits, zero=zeros_i)
    inv = np.empty(perm.size, np.int64)
    inv[perm] = np.arange(perm.size)
    ids = np.asarray(p.out_ids)
    if ids.size:
        new_ids = inv[ids]
        order = np.argsort(new_ids)
        ow = np.asarray(p.oweight)[order]
        p = dataclasses.replace(
            p, out_ids=jnp.asarray(new_ids[order].astype(np.int32)),
            oweight=jnp.asarray(ow, dtype=p.oweight.dtype))
    return dataclasses.replace(p, qweight=jnp.asarray(qw))


def prepare_decode_fast(params: Dict[str, Any], cfg: ModelConfig
                        ) -> Tuple[Dict[str, Any], ModelConfig]:
    """Serving transform: projection fusion + fused-decode-kernel aux.

    Fuses q|k|v and gate|up (fuse_block_projections), then precomputes
    the per-block aux arrays for kernels/gemv_fused.py (the sz
    correction rows, one-hot weak-column selectors, norm weights) and
    attaches them as ``blk["fast"]``.  The decode step then triggers the
    fused kernels purely on pytree structure — no per-step params-derived
    arithmetic remains inside the jitted scan body (lax.scan does not
    hoist it; xplane showed ~0.25 ms/token of such glue on llama-7b).

    Serving-only, like fuse_block_projections: apply after load, do not
    save the result.  Blocks that don't match the llama-class structure
    simply don't get a "fast" entry and keep the generic path.
    """
    import os

    from ..kernels.gemv_fused import make_fast_aux
    from ..models.transformer import layer_alpha_beta

    params, cfg = fuse_block_projections(params, cfg)
    if os.environ.get("OWQ_NO_FAST"):  # ablation: projection fusion only
        return params, cfg
    for i, blk in enumerate(params["layers"]):
        if layer_alpha_beta(cfg, i) is not None:
            continue
        if not _fast_block_ok(cfg, blk):
            continue
        attn, mlp = blk["attn"], blk["mlp"]
        blk["fast"] = {
            "qkv": make_fast_aux(attn["qkv"], gamma=blk["ln1"]["w"]),
            "o": make_fast_aux(attn["o"]),
            "gu": make_fast_aux(mlp["gateup"], gamma=blk["ln2"]["w"]),
            "dn": make_fast_aux(mlp["down"]),
        }
    # Whole-attention-phase mega kernel (kernels/decode_block.py): only
    # when EVERY block runs the fastpath (forward then owns the whole
    # cache through the in-place stacks).  Ablation history (bench.py
    # r4): XLA attention chain 4.852 ms/token; r3 standalone attention
    # kernel 5.056 (slab-DMA wait + launch = dead weight-stream time);
    # attn-as-o-prologue 5.067 (4-slot ring buffers ~4 us against a
    # ~15 us prologue).  The mega kernel holds BOTH weight streams and
    # the attention in one program — the o weights fully prefetch during
    # the qkv stream, covering the attention compute.  OWQ_NO_FA=1
    # drops back to the XLA attention chain.
    if (_fast_attn_ok(cfg) and not os.environ.get("OWQ_NO_FA")
            and all(blk.get("fast") is not None
                    for blk in params["layers"])):
        rep = cfg.num_heads // cfg.num_kv_heads
        Hkv, hd = cfg.num_kv_heads, cfg.head_dim
        for blk in params["layers"]:
            o = blk["attn"]["o"]
            if rep > 1:
                # ctx flattens rep-major [r, g, d]; o's input is head-major
                # h*hd+d with h = g*rep+r — permute codes to match
                perm = np.arange(o.in_features).reshape(
                    Hkv, rep, hd).transpose(1, 0, 2).reshape(-1)
                o = _permute_packed_rows(o, perm)
            aux = make_fast_aux(o)
            blk["fast"]["o_attn"] = {"qweight": o.qweight, **aux}
        params["fast_attn"] = {}
    # Packed lm_head (pack_lm_head, opt-in): fused final-rmsnorm + packed
    # head matvec aux so the decode step's last matmul streams 3/4-bit
    # words through the same kernel family as the layers.
    head = params.get("lm_head")
    if (isinstance(head, PackedLinear) and head.layout == "paired"
            and cfg.norm_type == "rmsnorm"
            and params.get("project_out") is None
            and params.get("final_norm") is not None):
        from ..kernels.gemv_fused import fused_applicable

        nw = head.qweight.shape[0]
        if fused_applicable(1, head.out_features, nw):
            params["fast_head"] = make_fast_aux(
                head, gamma=params["final_norm"]["w"])
    params = prepare_model_kernel(params, cfg)
    return params, cfg


def prepare_model_kernel(params: Dict[str, Any], cfg: ModelConfig
                         ) -> Dict[str, Any]:
    """Bundle the whole model for the ONE-program decode kernel
    (kernels/decode_model.py): weights stacked per kind [L, nw, out] (o
    rows already rep-major permuted in blk["fast"]["o_attn"]), epilogue
    data pre-bundled into four stacked arrays (f32 scale/zero rows
    [L, 2, ΣOUT]; bf16 weak-column selectors — q|o|g share the hidden
    input, d has its own; bf16 side-product rows [L, C, ΣOUT]; bf16 norm
    gammas [L, 2, hidden]), plus the final-norm gamma and the dense bf16
    lm_head.  Weak-column counts pad with zeros to a common width C —
    zero selector/side-product columns are exact no-ops, so
    heterogeneous n_out needs no branches.

    Attaches params["fast_model"] when applicable (llama-class fast_attn
    models with a dense unprojected head); forward() then runs the whole
    B=1 decode step — embed row to logits — as one pallas call.  Doubles
    the packed-body HBM footprint (the per-layer copies stay for
    prefill/batch paths); OWQ_NO_MODEL_KERNEL=1 opts out.
    """
    import os

    if params.get("fast_attn") is None or os.environ.get(
            "OWQ_NO_MODEL_KERNEL"):
        return params
    head = params.get("lm_head")
    head_packed = isinstance(head, PackedLinear)
    if head_packed:
        if head.layout != "paired" or head.bias is not None:
            return params
    elif not isinstance(head, DenseLinear) or head.b is not None:
        return params
    if (params.get("project_out") is not None
            or params.get("final_norm") is None
            or cfg.logit_scale is not None
            or cfg.final_logit_softcap is not None):
        return params
    layers = params["layers"]
    auxes = []
    for blk in layers:
        f = blk["fast"]
        qa, oa, ga, da = f["qkv"], f["o_attn"], f["gu"], f["dn"]
        if any(a["bias"] is not None for a in (qa, oa, ga, da)):
            return params
        auxes.append((blk["attn"]["qkv"], qa, oa, ga, da,
                      blk["mlp"]["gateup"], blk["mlp"]["down"]))
    hidden = cfg.hidden_size
    in_d = auxes[0][6].in_features
    cols = 8
    for _, qa, oa, ga, da, _, _ in auxes:
        for a in (qa, oa, ga, da):
            if a["sel"] is not None:
                cols = max(cols, a["sel"].shape[1])

    def padded_sel(a, infeat):
        # TRANSPOSED [cols, infeat]: the kernel's layer-sliced HBM DMA
        # needs a 128-aligned lane dim, which infeat is and 3*cols isn't
        if a["sel"] is None:
            return jnp.zeros((cols, infeat), jnp.bfloat16)
        s = a["sel"].T
        return jnp.pad(s, ((0, cols - s.shape[0]), (0, 0)))

    def padded_ow(a, out):
        if a["ow"] is None:
            return jnp.zeros((cols, out), jnp.bfloat16)
        w = a["ow"]
        return jnp.pad(w, ((0, cols - w.shape[0]), (0, 0)))

    out_q = auxes[0][1]["sz"].shape[1]
    out_o = auxes[0][2]["sz"].shape[1]
    out_g = auxes[0][3]["sz"].shape[1]
    out_d = auxes[0][4]["sz"].shape[1]

    # assemble the stacks in ONE jitted dispatch: eager per-layer
    # stacks/concats would be ~300 round trips on a relayed backend
    # (minutes of pure dispatch latency for a 7b model)
    raw = {
        "wq": [q.qweight for q, *_ in auxes],
        "wo": [oa["qweight"] for _, _, oa, _, _, _, _ in auxes],
        "wg": [g.qweight for *_, g, _ in auxes],
        "wd": [d.qweight for *_, d in auxes],
        "sz": [[qa["sz"], oa["sz"], ga["sz"], da["sz"]]
               for _, qa, oa, ga, da, _, _ in auxes],
        "selqog": [[padded_sel(qa, hidden), padded_sel(oa, hidden),
                    padded_sel(ga, hidden)]
                   for _, qa, oa, ga, da, _, _ in auxes],
        "seld": [padded_sel(da, in_d)
                 for _, _, _, _, da, _, _ in auxes],
        "ow": [[padded_ow(qa, out_q), padded_ow(oa, out_o),
                padded_ow(ga, out_g), padded_ow(da, out_d)]
               for _, qa, oa, ga, da, _, _ in auxes],
        "gam": [[qa["gamma"], ga["gamma"]]
                for _, qa, oa, ga, da, _, _ in auxes],
    }

    def _assemble(r):
        return {
            "wq": jnp.stack(r["wq"]),
            "wo": jnp.stack(r["wo"]),
            "wg": jnp.stack(r["wg"]),
            "wd": jnp.stack(r["wd"]),
            "sz": jnp.stack([jnp.concatenate(x, axis=1)
                             for x in r["sz"]]),
            "selqog": jnp.stack([jnp.concatenate(x, axis=0)
                                 for x in r["selqog"]]),
            "seld": jnp.stack(r["seld"]),
            "ow": jnp.stack([jnp.concatenate(x, axis=1)
                             for x in r["ow"]]),
            "gam": jnp.stack([jnp.concatenate(x, axis=0)
                              for x in r["gam"]]),
        }

    import jax

    fm = jax.jit(_assemble)(raw)
    fm["gf"] = jnp.asarray(np.asarray(params["final_norm"]["w"],
                                      np.float32).reshape(1, -1),
                           jnp.bfloat16)
    if head_packed:
        # packed lm_head rides the head ring as int32 words with the
        # scale/zero correction + weak columns fused like the layers
        if head.bits != auxes[0][0].bits:
            return params
        from ..kernels.gemv_fused import make_fast_aux

        ha = make_fast_aux(head)
        ch = 8 if ha["sel"] is None else ha["sel"].shape[1]
        fm["head"] = jax.lax.stop_gradient(head.qweight)
        fm["hsz"] = ha["sz"]
        fm["hsel"] = (ha["sel"] if ha["sel"] is not None
                      else jnp.zeros((hidden, ch), jnp.bfloat16))
        fm["how"] = (ha["ow"] if ha["ow"] is not None
                     else jnp.zeros((ch, head.out_features), jnp.bfloat16))
    else:
        fm["head"] = head.w.astype(jnp.bfloat16)
    params = dict(params)
    params["fast_model"] = fm
    return params


def pack_lm_head(params: Dict[str, Any], cfg: ModelConfig, *,
                 bits: int = 4, n_weak: int = 0, mse: bool = False
                 ) -> Dict[str, Any]:
    """Serving transform BEYOND the reference protocol: RTN-quantize and
    pack the dense lm_head (or the tied embedding) so the final
    projection streams packed words instead of a dense bf16 read — on
    llama-7b the 262 MB bf16 head costs ~0.35 ms of the ~4.65 ms B=1
    decode step; packed 4-bit it streams ~66 MB.

    The reference keeps its head in fp16 (main.py never quantizes
    lm_head), so bench.py reports this as a SEPARATE opt-in line
    (--pack-head) and the default protocol number keeps the dense head.

    Per-output-channel RTN on the asymmetric grid (the reference's
    --nearest recipe, main.py:227-233); ``n_weak`` keeps the OWQ-style
    weak INPUT columns — ranked by per-column l2 mass, the serving-time
    proxy for the Hessian diagonal — in full precision through the same
    weak-column side product as the layers.  Serving-only: apply after
    load, do not save the result.  ``mse`` switches the grid search to
    the p=2.4 MSE solver (slower load, slightly tighter grid).
    """
    from ..core.quantizer import QuantSpec, find_params
    from .quant_linear import pack_linear

    head = params.get("lm_head")
    if isinstance(head, PackedLinear):
        return params
    if head is None:  # tied embeddings: the unembed is embed_tokens.T
        W = np.asarray(params["embed_tokens"], np.float32)  # [out, in]
        bias = None
    elif isinstance(head, DenseLinear):
        W = np.asarray(head.w, np.float32).T  # [in, out] -> [out, in]
        bias = None if head.b is None else np.asarray(head.b)
    else:
        return params
    out_ids = np.zeros((0,), np.int32)
    Wg = W
    if n_weak > 0:
        mass = np.square(W).sum(axis=0)  # per-input-column l2^2
        out_ids = np.sort(np.argpartition(mass, -n_weak)[-n_weak:]
                          ).astype(np.int32)
        Wg = W.copy()
        Wg[:, out_ids] = 0.0  # grid search over the base columns only
    spec = QuantSpec(bits=bits, sym=False)
    scale, zero = find_params(jnp.asarray(Wg), spec, mse=mse)
    lin = pack_linear(W, np.asarray(scale), np.asarray(zero), out_ids,
                      bits, bias=bias)
    params = dict(params)
    params["lm_head"] = lin
    return params


def repack_model_a8(params: Dict[str, Any], cfg: ModelConfig
                    ) -> Dict[str, Any]:
    """Load-time serving transform: re-lay every 4-bit PackedLinear into
    the A8 byte layout (kernels/gemv_a8.py::a8_repack) so the W4A8 decode
    kernel takes naturally-ordered int8 activations with zero shuffles.

    In-place on the block dicts like fuse_block_projections; 3-bit and
    dense linears pass through.  Apply AFTER any TP sharding.
    """
    import dataclasses as _dc

    from ..kernels.gemv_a8 import a8_repack

    def walk(node):
        if isinstance(node, dict):
            for k, v in node.items():
                node[k] = walk(v)
            return node
        if isinstance(node, list):
            return [walk(v) for v in node]
        if isinstance(node, PackedLinear) and node.bits == 4 \
                and node.layout == "paired":
            return _dc.replace(node, qweight=a8_repack(node.qweight),
                               layout="a8")
        return node

    for blk in params["layers"]:
        walk(blk)
    return params
