"""HuggingFace checkpoint import: torch state_dict -> owq_tpu param pytree.

The analogue of the reference's ``get_hfmodel`` (owq/utils/modelutils.py:15-41),
except weights are converted into our functional pytree instead of keeping
torch modules.  Works fully offline from a local path or an in-memory
transformers model (used by tests, which instantiate tiny random models from
configs).
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax.numpy as jnp
import numpy as np

from .config import ModelConfig, config_from_hf
from .transformer import QUANTIZABLE  # noqa: F401 (re-export convenience)
from ..runtime.quant_linear import DenseLinear

__all__ = ["import_hf_model", "load_hf_pretrained", "params_from_state_dict"]


def _np(t) -> np.ndarray:
    if isinstance(t, np.ndarray):
        return t
    # torch tensor (possibly bf16, which numpy can't represent directly)
    t = t.detach().cpu()
    if str(t.dtype) == "torch.bfloat16":
        t = t.float()
    return t.numpy()


def _linear(sd: Dict[str, Any], prefix: str, dtype) -> DenseLinear:
    w = jnp.asarray(_np(sd[prefix + ".weight"]).T, dtype=dtype)  # [in, out]
    b = sd.get(prefix + ".bias")
    return DenseLinear(w=w, b=None if b is None else jnp.asarray(_np(b), dtype))


def _ln(sd: Dict[str, Any], prefix: str, dtype) -> Dict[str, jnp.ndarray]:
    out = {"w": jnp.asarray(_np(sd[prefix + ".weight"]), dtype)}
    b = sd.get(prefix + ".bias")
    if b is not None:
        out["b"] = jnp.asarray(_np(b), dtype)
    return out


def params_from_state_dict(sd: Dict[str, Any], cfg: ModelConfig,
                           dtype=jnp.float32) -> Dict[str, Any]:
    """Build the param pytree from a (numpy/torch) HF state dict."""
    fam = cfg.family
    p: Dict[str, Any] = {"project_in": None, "project_out": None,
                         "embed_norm": None, "final_norm": None,
                         "lm_head": None}

    if fam == "opt":
        # three checkpoints share the fairseq decoder layout: OPT
        # ("model.decoder."), BioGPT ("biogpt.", final norm "layer_norm"),
        # XGLM ("model.", sinusoidal positions synthesized below)
        if "biogpt.embed_tokens.weight" in sd:
            base = "biogpt."
        elif "model.decoder.embed_tokens.weight" in sd:
            base = "model.decoder."
        else:
            base = "model."
        p["embed_tokens"] = jnp.asarray(_np(sd[base + "embed_tokens.weight"]), dtype)
        if base + "embed_positions.weight" in sd:
            p["embed_positions"] = jnp.asarray(
                _np(sd[base + "embed_positions.weight"]), dtype)
        else:
            # XGLM: the sinusoidal table is a non-persistent HF buffer —
            # rebuild it (tensor2tensor layout: [sin | cos] concatenated,
            # rows = max_pos + offset) exactly as
            # XGLMSinusoidalPositionalEmbedding.get_embedding does
            rows = cfg.max_position_embeddings + cfg.pos_offset
            half = cfg.hidden_size // 2
            freq = np.exp(np.arange(half, dtype=np.float64)
                          * -(np.log(10000.0) / (half - 1)))
            ang = np.arange(rows, dtype=np.float64)[:, None] * freq[None, :]
            tab = np.concatenate([np.sin(ang), np.cos(ang)], axis=1)
            if cfg.hidden_size % 2 == 1:
                tab = np.concatenate(
                    [tab, np.zeros((rows, 1), tab.dtype)], axis=1)
            p["embed_positions"] = jnp.asarray(tab.astype(np.float32), dtype)
        if base + "project_in.weight" in sd:
            p["project_in"] = _linear(sd, base + "project_in", dtype)
        if base + "project_out.weight" in sd:
            p["project_out"] = _linear(sd, base + "project_out", dtype)
        if base + "final_layer_norm.weight" in sd and cfg.do_layer_norm_before:
            p["final_norm"] = _ln(sd, base + "final_layer_norm", dtype)
        elif base + "layer_norm.weight" in sd:  # biogpt/xglm final norm
            p["final_norm"] = _ln(sd, base + "layer_norm", dtype)
        layers = []
        for i in range(cfg.num_layers):
            lp = f"{base}layers.{i}."
            layers.append({
                "ln1": _ln(sd, lp + "self_attn_layer_norm", dtype),
                "attn": {
                    "q": _linear(sd, lp + "self_attn.q_proj", dtype),
                    "k": _linear(sd, lp + "self_attn.k_proj", dtype),
                    "v": _linear(sd, lp + "self_attn.v_proj", dtype),
                    "o": _linear(sd, lp + "self_attn.out_proj", dtype),
                },
                "ln2": _ln(sd, lp + "final_layer_norm", dtype),
                "mlp": {
                    "fc1": _linear(sd, lp + "fc1", dtype),
                    "fc2": _linear(sd, lp + "fc2", dtype),
                },
            })
        p["layers"] = layers

    elif fam == "llama":
        base = "model."
        p["embed_tokens"] = jnp.asarray(_np(sd[base + "embed_tokens.weight"]), dtype)
        p["final_norm"] = _ln(sd, base + "norm", dtype)
        # phi-3 fuses q|k|v into qkv_proj and gate|up into gate_up_proj;
        # split here so the rest of the llama path (and per-linear
        # quantization) sees the canonical separate projections
        def split_fused(sd):
            import numpy as np
            out = dict(sd)
            H, Hkv, hd = cfg.num_heads, cfg.num_kv_heads, cfg.head_dim
            for i in range(cfg.num_layers):
                ap = f"{base}layers.{i}.self_attn."
                if ap + "qkv_proj.weight" in out:
                    w = _np(out.pop(ap + "qkv_proj.weight"))
                    q, k, v = np.split(w, [H * hd, (H + Hkv) * hd], axis=0)
                    out[ap + "q_proj.weight"], out[ap + "k_proj.weight"], \
                        out[ap + "v_proj.weight"] = q, k, v
                mp = f"{base}layers.{i}.mlp."
                if mp + "gate_up_proj.weight" in out:
                    w = _np(out.pop(mp + "gate_up_proj.weight"))
                    g, u = np.split(w, 2, axis=0)
                    out[mp + "gate_proj.weight"] = g
                    out[mp + "up_proj.weight"] = u
            return out

        if any(k.endswith("qkv_proj.weight") or
               k.endswith("gate_up_proj.weight") for k in sd):
            sd = split_fused(sd)
        layers = []
        for i in range(cfg.num_layers):
            lp = f"{base}layers.{i}."
            if cfg.num_experts and lp + "block_sparse_moe.gate.weight" in sd:
                # mixtral block_sparse_moe: gate (router) + per-expert
                # w1 (gate) / w3 (up) / w2 (down)
                moe = lp + "block_sparse_moe."
                mlp = {
                    "router": _linear(sd, moe + "gate", dtype),
                    "experts": [
                        {"gate": _linear(sd, f"{moe}experts.{e}.w1", dtype),
                         "up": _linear(sd, f"{moe}experts.{e}.w3", dtype),
                         "down": _linear(sd, f"{moe}experts.{e}.w2", dtype)}
                        for e in range(cfg.num_experts)],
                }
            elif (cfg.num_experts
                  and lp + "block_sparse_moe.input_linear.weight" in sd):
                # granitemoe: jetmoe-style fused 3D experts — input_linear
                # [E, 2*ffn, hid] is gate|up halves, output_linear
                # [E, hid, ffn]; optional layer-level shared_mlp with the
                # same fused layout
                moe = lp + "block_sparse_moe."
                iw = _np(sd[moe + "input_linear.weight"])
                ow = _np(sd[moe + "output_linear.weight"])
                ffn = iw.shape[1] // 2
                experts = [
                    {"gate": DenseLinear(w=jnp.asarray(iw[e][:ffn].T, dtype),
                                         b=None),
                     "up": DenseLinear(w=jnp.asarray(iw[e][ffn:].T, dtype),
                                       b=None),
                     "down": DenseLinear(w=jnp.asarray(ow[e].T, dtype),
                                         b=None)}
                    for e in range(cfg.num_experts)]
                mlp = {"router": _linear(sd, moe + "router.layer", dtype),
                       "experts": experts}
                if lp + "shared_mlp.input_linear.weight" in sd:
                    siw = _np(sd[lp + "shared_mlp.input_linear.weight"])
                    sow = _np(sd[lp + "shared_mlp.output_linear.weight"])
                    sffn = siw.shape[0] // 2
                    mlp["shared"] = {
                        "gate": DenseLinear(w=jnp.asarray(siw[:sffn].T,
                                                          dtype), b=None),
                        "up": DenseLinear(w=jnp.asarray(siw[sffn:].T, dtype),
                                          b=None),
                        "down": DenseLinear(w=jnp.asarray(sow.T, dtype),
                                            b=None),
                    }
            elif cfg.num_experts and lp + "mlp.gate.wg.weight" in sd:
                # hunyuan-moe: wg router + ungated shared_mlp
                mp = lp + "mlp."
                mlp = {
                    "router": _linear(sd, mp + "gate.wg", dtype),
                    "experts": [
                        {"gate": _linear(sd, f"{mp}experts.{e}.gate_proj",
                                         dtype),
                         "up": _linear(sd, f"{mp}experts.{e}.up_proj", dtype),
                         "down": _linear(sd, f"{mp}experts.{e}.down_proj",
                                         dtype)}
                        for e in range(cfg.num_experts)],
                    "shared": {
                        "gate": _linear(sd, mp + "shared_mlp.gate_proj",
                                        dtype),
                        "up": _linear(sd, mp + "shared_mlp.up_proj", dtype),
                        "down": _linear(sd, mp + "shared_mlp.down_proj",
                                        dtype),
                    },
                }
            elif cfg.num_experts and lp + "mlp.gate.weight" in sd:
                # qwen2/3-moe + glm4-moe sparse blocks: mlp.gate router +
                # per-expert *_proj; glm4-moe adds shared_experts (+ v3
                # e_score bias); qwen2-moe adds a sigmoid-gated
                # shared_expert
                mp = lp + "mlp."
                mlp = {
                    "router": _linear(sd, mp + "gate", dtype),
                    "experts": [
                        {"gate": _linear(sd, f"{mp}experts.{e}.gate_proj",
                                         dtype),
                         "up": _linear(sd, f"{mp}experts.{e}.up_proj", dtype),
                         "down": _linear(sd, f"{mp}experts.{e}.down_proj",
                                         dtype)}
                        for e in range(cfg.num_experts)],
                }
                if mp + "gate.e_score_correction_bias" in sd:
                    mlp["router_bias"] = jnp.asarray(
                        _np(sd[mp + "gate.e_score_correction_bias"]),
                        jnp.float32)
                elif mp + "moe_statics.e_score_correction_bias" in sd:
                    mlp["router_bias"] = jnp.asarray(
                        _np(sd[mp + "moe_statics.e_score_correction_bias"]
                            ).reshape(-1), jnp.float32)
                if mp + "shared_experts.gate_proj.weight" in sd:  # glm4-moe
                    mlp["shared"] = {
                        "gate": _linear(sd, mp + "shared_experts.gate_proj",
                                        dtype),
                        "up": _linear(sd, mp + "shared_experts.up_proj",
                                      dtype),
                        "down": _linear(sd, mp + "shared_experts.down_proj",
                                        dtype),
                    }
                elif mp + "shared_expert.gate_proj.weight" in sd:  # qwen2-moe
                    mlp["shared"] = {
                        "gate": _linear(sd, mp + "shared_expert.gate_proj",
                                        dtype),
                        "up": _linear(sd, mp + "shared_expert.up_proj",
                                      dtype),
                        "down": _linear(sd, mp + "shared_expert.down_proj",
                                        dtype),
                    }
                    mlp["shared_gate"] = _linear(
                        sd, mp + "shared_expert_gate", dtype)
            else:
                mlp = {
                    "gate": _linear(sd, lp + "mlp.gate_proj", dtype),
                    "up": _linear(sd, lp + "mlp.up_proj", dtype),
                    "down": _linear(sd, lp + "mlp.down_proj", dtype),
                }
            attn = {
                "q": _linear(sd, lp + "self_attn.q_proj", dtype),
                "k": _linear(sd, lp + "self_attn.k_proj", dtype),
                "v": _linear(sd, lp + "self_attn.v_proj", dtype),
                "o": _linear(sd, lp + "self_attn.o_proj", dtype),
            }
            if lp + "self_attn.attn_sub_norm.weight" in sd:  # bitnet
                attn["o_norm"] = _ln(sd, lp + "self_attn.attn_sub_norm",
                                     dtype)
                mlp["down_norm"] = _ln(sd, lp + "mlp.ffn_sub_norm", dtype)
            if lp + "self_attn.q_norm.weight" in sd:  # qwen3/olmo2 qk-norm
                attn["q_norm"] = _ln(sd, lp + "self_attn.q_norm", dtype)
                attn["k_norm"] = _ln(sd, lp + "self_attn.k_norm", dtype)
            elif lp + "self_attn.query_layernorm.weight" in sd:  # hunyuan
                attn["q_norm"] = _ln(sd, lp + "self_attn.query_layernorm",
                                     dtype)
                attn["k_norm"] = _ln(sd, lp + "self_attn.key_layernorm",
                                     dtype)
            blk = {"attn": attn, "mlp": mlp}
            if lp + "input_layernorm.weight" in sd:  # absent in olmo2
                blk["ln1"] = _ln(sd, lp + "input_layernorm", dtype)
            if (lp + "pre_feedforward_layernorm.weight" in sd
                    and lp + "post_attention_layernorm.weight" in sd):
                # gemma2 sandwich: ln2 = pre-ffn, post_ln* = branch norms
                blk["ln2"] = _ln(sd, lp + "pre_feedforward_layernorm", dtype)
                blk["post_ln1"] = _ln(sd, lp + "post_attention_layernorm",
                                      dtype)
                blk["post_ln2"] = _ln(sd, lp + "post_feedforward_layernorm",
                                      dtype)
            elif lp + "pre_feedforward_layernorm.weight" in sd:
                # vaultgemma: gemma2 names but pre-norms only
                blk["ln2"] = _ln(sd, lp + "pre_feedforward_layernorm", dtype)
            elif lp + "post_feedforward_layernorm.weight" in sd:
                # olmo2: branch norms only
                blk["post_ln1"] = _ln(sd, lp + "post_attention_layernorm",
                                      dtype)
                blk["post_ln2"] = _ln(sd, lp + "post_feedforward_layernorm",
                                      dtype)
            elif lp + "post_self_attn_layernorm.weight" in sd:
                # glm4 sandwich: post_self_attn/post_mlp = branch norms,
                # post_attention_layernorm = pre-mlp norm
                blk["post_ln1"] = _ln(sd, lp + "post_self_attn_layernorm",
                                      dtype)
                blk["ln2"] = _ln(sd, lp + "post_attention_layernorm", dtype)
                blk["post_ln2"] = _ln(sd, lp + "post_mlp_layernorm", dtype)
            elif lp + "post_attention_layernorm.weight" in sd:
                blk["ln2"] = _ln(sd, lp + "post_attention_layernorm", dtype)
            # else: cohere parallel block — attn and mlp share ln1
            layers.append(blk)
        p["layers"] = layers

    elif fam == "gpt2":
        base = "transformer."
        p["embed_tokens"] = jnp.asarray(_np(sd[base + "wte.weight"]), dtype)
        p["embed_positions"] = jnp.asarray(_np(sd[base + "wpe.weight"]), dtype)
        p["final_norm"] = _ln(sd, base + "ln_f", dtype)

        def conv1d(prefix):
            # HF Conv1D stores weight [in, out] already; gpt_bigcode
            # (starcoder/santacoder) uses nn.Linear [out, in] instead
            if not cfg.conv1d_weights:
                return _linear(sd, prefix, dtype)
            w = jnp.asarray(_np(sd[prefix + ".weight"]), dtype)
            b = sd.get(prefix + ".bias")
            return DenseLinear(w=w, b=None if b is None else
                               jnp.asarray(_np(b), dtype))

        def fix_qkv(lin):
            # gpt_bigcode MHA interleaves c_attn as [H, 3, hd]; permute to
            # the plain [q | k | v] concat the runtime (and TP splitting)
            # uses.  gpt2 proper and gpt_bigcode MQA are already plain.
            if cfg.conv1d_weights or cfg.num_kv_heads != cfg.num_heads:
                return lin
            H, hd = cfg.num_heads, cfg.head_dim
            perm = np.arange(3 * H * hd).reshape(H, 3, hd)
            perm = np.concatenate([perm[:, 0], perm[:, 1], perm[:, 2]]).ravel()
            return DenseLinear(w=lin.w[:, perm],
                               b=None if lin.b is None else lin.b[perm])

        layers = []
        for i in range(cfg.num_layers):
            lp = f"{base}h.{i}."
            layers.append({
                "ln1": _ln(sd, lp + "ln_1", dtype),
                "attn": {
                    "qkv": fix_qkv(conv1d(lp + "attn.c_attn")),
                    "o": conv1d(lp + "attn.c_proj"),
                },
                "ln2": _ln(sd, lp + "ln_2", dtype),
                "mlp": {
                    "fc1": conv1d(lp + "mlp.c_fc"),
                    "fc2": conv1d(lp + "mlp.c_proj"),
                },
            })
        p["layers"] = layers

    elif fam == "gptj":
        base = "transformer."
        p["embed_tokens"] = jnp.asarray(_np(sd[base + "wte.weight"]), dtype)
        p["final_norm"] = _ln(sd, base + "ln_f", dtype)
        layers = []
        for i in range(cfg.num_layers):
            lp = f"{base}h.{i}."
            layers.append({
                "ln1": _ln(sd, lp + "ln_1", dtype),  # single LN (parallel)
                "attn": {
                    "q": _linear(sd, lp + "attn.q_proj", dtype),
                    "k": _linear(sd, lp + "attn.k_proj", dtype),
                    "v": _linear(sd, lp + "attn.v_proj", dtype),
                    "o": _linear(sd, lp + "attn.out_proj", dtype),
                },
                "mlp": {
                    "fc1": _linear(sd, lp + "mlp.fc_in", dtype),
                    "fc2": _linear(sd, lp + "mlp.fc_out", dtype),
                },
            })
        p["layers"] = layers

    elif fam == "gpt_neo":
        # HF GPTNeo (modeling_gpt_neo.py): wte+wpe embeddings, per-layer
        # attn.attention.{q,k,v,out}_proj (qkv bias-less) and biased
        # mlp.c_fc/c_proj Linears (not Conv1D), ln_f final norm
        base = "transformer."
        p["embed_tokens"] = jnp.asarray(_np(sd[base + "wte.weight"]), dtype)
        p["embed_positions"] = jnp.asarray(_np(sd[base + "wpe.weight"]),
                                           dtype)
        p["final_norm"] = _ln(sd, base + "ln_f", dtype)
        layers = []
        for i in range(cfg.num_layers):
            lp = f"{base}h.{i}."
            ap = lp + "attn.attention."
            layers.append({
                "ln1": _ln(sd, lp + "ln_1", dtype),
                "attn": {
                    "q": _linear(sd, ap + "q_proj", dtype),
                    "k": _linear(sd, ap + "k_proj", dtype),
                    "v": _linear(sd, ap + "v_proj", dtype),
                    "o": _linear(sd, ap + "out_proj", dtype),
                },
                "ln2": _ln(sd, lp + "ln_2", dtype),
                "mlp": {
                    "fc1": _linear(sd, lp + "mlp.c_fc", dtype),
                    "fc2": _linear(sd, lp + "mlp.c_proj", dtype),
                },
            })
        p["layers"] = layers

    elif fam == "codegen":
        # HF CodeGen (modeling_codegen.py:164-172): one fused qkv_proj whose
        # out features are mp_num=4 groups, each [q | v | k] of
        # (H/mp_num) heads — re-laid here to plain q/k/v with the heads in
        # (group, head-in-group) order to match _split_heads
        base = "transformer."
        p["embed_tokens"] = jnp.asarray(_np(sd[base + "wte.weight"]), dtype)
        p["final_norm"] = _ln(sd, base + "ln_f", dtype)
        mp = 4
        local = cfg.num_heads * cfg.head_dim // mp

        def _codegen_qkv(lin, part):  # part: 0=q, 1=v, 2=k
            cols = np.concatenate(
                [np.arange(g * 3 * local + part * local,
                           g * 3 * local + (part + 1) * local)
                 for g in range(mp)])
            return DenseLinear(w=lin.w[:, cols],
                               b=None if lin.b is None else lin.b[cols])

        layers = []
        for i in range(cfg.num_layers):
            lp = f"{base}h.{i}."
            qkv = _linear(sd, lp + "attn.qkv_proj", dtype)
            layers.append({
                "ln1": _ln(sd, lp + "ln_1", dtype),  # single LN (parallel)
                "attn": {
                    "q": _codegen_qkv(qkv, 0),
                    "k": _codegen_qkv(qkv, 2),
                    "v": _codegen_qkv(qkv, 1),
                    "o": _linear(sd, lp + "attn.out_proj", dtype),
                },
                "mlp": {
                    "fc1": _linear(sd, lp + "mlp.fc_in", dtype),
                    "fc2": _linear(sd, lp + "mlp.fc_out", dtype),
                },
            })
        p["layers"] = layers

    elif fam == "recurrent_gemma":
        # HF RecurrentGemma (modeling_recurrent_gemma.py): per-layer
        # temporal_pre_norm/channel_pre_norm around a temporal block that is
        # either sliding attention or a griffin RG-LRU recurrent block
        base = "model."
        p["embed_tokens"] = jnp.asarray(
            _np(sd[base + "embed_tokens.weight"]), dtype)
        p["final_norm"] = _ln(sd, base + "final_norm", dtype)
        layers = []
        for i in range(cfg.num_layers):
            lp = f"{base}layers.{i}."
            tb = lp + "temporal_block."
            blk: Dict[str, Any] = {
                "ln1": _ln(sd, lp + "temporal_pre_norm", dtype),
                "ln2": _ln(sd, lp + "channel_pre_norm", dtype),
                "mlp": {
                    "gate": _linear(sd, lp + "mlp_block.gate_proj", dtype),
                    "up": _linear(sd, lp + "mlp_block.up_proj", dtype),
                    "down": _linear(sd, lp + "mlp_block.down_proj", dtype),
                },
            }
            if tb + "q_proj.weight" in sd:
                blk["attn"] = {
                    "q": _linear(sd, tb + "q_proj", dtype),
                    "k": _linear(sd, tb + "k_proj", dtype),
                    "v": _linear(sd, tb + "v_proj", dtype),
                    "o": _linear(sd, tb + "o_proj", dtype),
                }
            else:
                rg = tb + "rg_lru."
                blk["griffin"] = {
                    "y": _linear(sd, tb + "linear_y", dtype),
                    "x": _linear(sd, tb + "linear_x", dtype),
                    "out": _linear(sd, tb + "linear_out", dtype),
                    # torch Conv1d weight [W, 1, K] -> taps-major [K, W]
                    "conv_w": jnp.asarray(
                        _np(sd[tb + "conv_1d.weight"])[:, 0, :].T, dtype),
                    "conv_b": jnp.asarray(
                        _np(sd[tb + "conv_1d.bias"]), dtype),
                    "recurrent_param": jnp.asarray(
                        _np(sd[rg + "recurrent_param"]), jnp.float32),
                    "input_gate_w": jnp.asarray(
                        _np(sd[rg + "input_gate_weight"]), dtype),
                    "input_gate_b": jnp.asarray(
                        _np(sd[rg + "input_gate_bias"]), dtype),
                    "recurrent_gate_w": jnp.asarray(
                        _np(sd[rg + "recurrent_gate_weight"]), dtype),
                    "recurrent_gate_b": jnp.asarray(
                        _np(sd[rg + "recurrent_gate_bias"]), dtype),
                }
            layers.append(blk)
        p["layers"] = layers

    elif fam == "neox":
        base = "gpt_neox."
        p["embed_tokens"] = jnp.asarray(_np(sd[base + "embed_in.weight"]), dtype)
        p["final_norm"] = _ln(sd, base + "final_layer_norm", dtype)
        layers = []
        for i in range(cfg.num_layers):
            lp = f"{base}layers.{i}."
            layers.append({
                "ln1": _ln(sd, lp + "input_layernorm", dtype),
                "ln2": _ln(sd, lp + "post_attention_layernorm", dtype),
                "attn": {
                    "qkv": _linear(sd, lp + "attention.query_key_value", dtype),
                    "o": _linear(sd, lp + "attention.dense", dtype),
                },
                "mlp": {
                    "fc1": _linear(sd, lp + "mlp.dense_h_to_4h", dtype),
                    "fc2": _linear(sd, lp + "mlp.dense_4h_to_h", dtype),
                },
            })
        p["layers"] = layers
        if "embed_out.weight" in sd:
            p["lm_head"] = _linear(sd, "embed_out", dtype)

    elif fam == "starcoder2":
        base = "model."
        p["embed_tokens"] = jnp.asarray(_np(sd[base + "embed_tokens.weight"]),
                                        dtype)
        p["final_norm"] = _ln(sd, base + "norm", dtype)
        layers = []
        for i in range(cfg.num_layers):
            lp = f"{base}layers.{i}."
            layers.append({
                "ln1": _ln(sd, lp + "input_layernorm", dtype),
                "attn": {
                    "q": _linear(sd, lp + "self_attn.q_proj", dtype),
                    "k": _linear(sd, lp + "self_attn.k_proj", dtype),
                    "v": _linear(sd, lp + "self_attn.v_proj", dtype),
                    "o": _linear(sd, lp + "self_attn.o_proj", dtype),
                },
                "ln2": _ln(sd, lp + "post_attention_layernorm", dtype),
                "mlp": {
                    "fc1": _linear(sd, lp + "mlp.c_fc", dtype),
                    "fc2": _linear(sd, lp + "mlp.c_proj", dtype),
                },
            })
        p["layers"] = layers

    elif fam == "olmo":
        base = "model."
        p["embed_tokens"] = jnp.asarray(_np(sd[base + "embed_tokens.weight"]),
                                        dtype)
        p["final_norm"] = {}  # non-parametric LN: applied, no params
        layers = []
        for i in range(cfg.num_layers):
            lp = f"{base}layers.{i}."
            layers.append({
                "ln1": {},
                "attn": {
                    "q": _linear(sd, lp + "self_attn.q_proj", dtype),
                    "k": _linear(sd, lp + "self_attn.k_proj", dtype),
                    "v": _linear(sd, lp + "self_attn.v_proj", dtype),
                    "o": _linear(sd, lp + "self_attn.o_proj", dtype),
                },
                "ln2": {},
                "mlp": {
                    "gate": _linear(sd, lp + "mlp.gate_proj", dtype),
                    "up": _linear(sd, lp + "mlp.up_proj", dtype),
                    "down": _linear(sd, lp + "mlp.down_proj", dtype),
                },
            })
        p["layers"] = layers

    elif fam == "phi":
        base = "model."
        p["embed_tokens"] = jnp.asarray(_np(sd[base + "embed_tokens.weight"]),
                                        dtype)
        p["final_norm"] = _ln(sd, base + "final_layernorm", dtype)
        layers = []
        for i in range(cfg.num_layers):
            lp = f"{base}layers.{i}."
            layers.append({
                "ln1": _ln(sd, lp + "input_layernorm", dtype),  # parallel
                "attn": {
                    "q": _linear(sd, lp + "self_attn.q_proj", dtype),
                    "k": _linear(sd, lp + "self_attn.k_proj", dtype),
                    "v": _linear(sd, lp + "self_attn.v_proj", dtype),
                    "o": _linear(sd, lp + "self_attn.dense", dtype),
                },
                "mlp": {
                    "fc1": _linear(sd, lp + "mlp.fc1", dtype),
                    "fc2": _linear(sd, lp + "mlp.fc2", dtype),
                },
            })
        p["layers"] = layers

    elif fam == "bamba":
        base = "model."
        p["embed_tokens"] = jnp.asarray(_np(sd[base + "embed_tokens.weight"]),
                                        dtype)
        p["final_norm"] = _ln(sd, base + "final_layernorm", dtype)
        layers = []
        for i in range(cfg.num_layers):
            lp = f"{base}layers.{i}."
            blk: Dict[str, Any] = {
                "ln1": _ln(sd, lp + "input_layernorm", dtype),
                "ln2": _ln(sd, lp + "pre_ff_layernorm", dtype),
                "mlp": {
                    "gate": _linear(sd, lp + "feed_forward.gate_proj", dtype),
                    "up": _linear(sd, lp + "feed_forward.up_proj", dtype),
                    "down": _linear(sd, lp + "feed_forward.down_proj", dtype),
                },
            }
            if lp + "mamba.in_proj.weight" in sd:
                cw = _np(sd[lp + "mamba.conv1d.weight"])  # [conv_dim, 1, K]
                mm = {
                    "in_proj": _linear(sd, lp + "mamba.in_proj", dtype),
                    "conv_w": jnp.asarray(cw[:, 0, :].T, jnp.float32),
                    "dt_bias": jnp.asarray(_np(sd[lp + "mamba.dt_bias"]),
                                           jnp.float32),
                    "A_log": jnp.asarray(_np(sd[lp + "mamba.A_log"]),
                                         jnp.float32),
                    "D": jnp.asarray(_np(sd[lp + "mamba.D"]), jnp.float32),
                    "norm_w": jnp.asarray(_np(sd[lp + "mamba.norm.weight"]),
                                          jnp.float32),
                    "out_proj": _linear(sd, lp + "mamba.out_proj", dtype),
                }
                if lp + "mamba.conv1d.bias" in sd:
                    mm["conv_b"] = jnp.asarray(
                        _np(sd[lp + "mamba.conv1d.bias"]), jnp.float32)
                blk["mamba"] = mm
            else:
                blk["attn"] = {
                    "q": _linear(sd, lp + "self_attn.q_proj", dtype),
                    "k": _linear(sd, lp + "self_attn.k_proj", dtype),
                    "v": _linear(sd, lp + "self_attn.v_proj", dtype),
                    "o": _linear(sd, lp + "self_attn.o_proj", dtype),
                }
            layers.append(blk)
        p["layers"] = layers

    elif fam == "jetmoe":
        # MoA (per-expert q/out pairs + shared fused kv + output bias) and
        # MoE MLP (fused [E, 2*ffn, hid] input_linear split to per-expert
        # gate|up + output bias), both with router.layer gating
        base = "model."
        p["embed_tokens"] = jnp.asarray(_np(sd[base + "embed_tokens.weight"]),
                                        dtype)
        p["final_norm"] = _ln(sd, base + "norm", dtype)
        layers = []
        for i in range(cfg.num_layers):
            lp = f"{base}layers.{i}."
            ap = lp + "self_attention.experts."
            qiw = _np(sd[ap + "input_linear.weight"])    # [E, Hkv*hd, hid]
            qow = _np(sd[ap + "output_linear.weight"])   # [E, hid, Hkv*hd]
            moa = {
                "router": _linear(sd, ap + "router.layer", dtype),
                "kv": _linear(sd, lp + "self_attention.kv_proj", dtype),
                "bias": jnp.asarray(_np(sd[ap + "bias"]), dtype),
                "experts": [
                    {"q": DenseLinear(w=jnp.asarray(qiw[e].T, dtype),
                                      b=None),
                     "out": DenseLinear(w=jnp.asarray(qow[e].T, dtype),
                                        b=None)}
                    for e in range(cfg.num_experts)],
            }
            miw = _np(sd[lp + "mlp.input_linear.weight"])   # [E, 2f, hid]
            mow = _np(sd[lp + "mlp.output_linear.weight"])  # [E, hid, f]
            ffn = miw.shape[1] // 2
            mlp = {
                "router": _linear(sd, lp + "mlp.router.layer", dtype),
                "out_bias": jnp.asarray(_np(sd[lp + "mlp.bias"]), dtype),
                "experts": [
                    {"gate": DenseLinear(w=jnp.asarray(miw[e][:ffn].T,
                                                       dtype), b=None),
                     "up": DenseLinear(w=jnp.asarray(miw[e][ffn:].T, dtype),
                                       b=None),
                     "down": DenseLinear(w=jnp.asarray(mow[e].T, dtype),
                                         b=None)}
                    for e in range(cfg.num_experts)],
            }
            layers.append({
                "ln1": _ln(sd, lp + "input_layernorm", dtype),
                "ln2": _ln(sd, lp + "post_attention_layernorm", dtype),
                "moa": moa,
                "mlp": mlp,
            })
        p["layers"] = layers

    elif fam == "zamba2":
        # Every layer is a mamba2 mixer; hybrid layers add the SHARED
        # transformer block (Zamba2HybridLayer).  HF registers the shared
        # module under every hybrid layer's path, so each layer reads its
        # own copy; the per-layer LoRA adapters (index = this layer's
        # hybrid ordinal) are folded into the copied base weights
        # (W + B@A — exact, the adapters are plain linears), giving each
        # hybrid layer independent dense weights for OWQ.
        base = "model."
        p["embed_tokens"] = jnp.asarray(_np(sd[base + "embed_tokens.weight"]),
                                        dtype)
        p["final_norm"] = _ln(sd, base + "final_layernorm", dtype)
        layers = []
        hybrid_idx = 0
        for i in range(cfg.num_layers):
            lp = f"{base}layers.{i}."
            hyb = lp + "shared_transformer.input_layernorm.weight" in sd
            mp = lp + ("mamba_decoder." if hyb else "")
            cw = _np(sd[mp + "mamba.conv1d.weight"])  # [conv_dim, 1, K]
            mm = {
                "in_proj": _linear(sd, mp + "mamba.in_proj", dtype),
                "conv_w": jnp.asarray(cw[:, 0, :].T, jnp.float32),
                "dt_bias": jnp.asarray(_np(sd[mp + "mamba.dt_bias"]),
                                       jnp.float32),
                "A_log": jnp.asarray(_np(sd[mp + "mamba.A_log"]),
                                     jnp.float32),
                "D": jnp.asarray(_np(sd[mp + "mamba.D"]), jnp.float32),
                "norm_w": jnp.asarray(_np(sd[mp + "mamba.norm.weight"]),
                                      jnp.float32),
                "out_proj": _linear(sd, mp + "mamba.out_proj", dtype),
            }
            if mp + "mamba.conv1d.bias" in sd:
                mm["conv_b"] = jnp.asarray(
                    _np(sd[mp + "mamba.conv1d.bias"]), jnp.float32)
            blk: Dict[str, Any] = {
                "ln1": _ln(sd, mp + "input_layernorm", dtype),
                "mamba": mm,
            }
            if hyb:
                st = lp + "shared_transformer."
                h = hybrid_idx
                hybrid_idx += 1

                def fold(prefix, adapters):
                    w = _np(sd[prefix + ".weight"])
                    a0 = f"{adapters}.{h}.0.weight"
                    if a0 in sd:  # rank-r adapter: W + B @ A
                        w = w + _np(sd[f"{adapters}.{h}.1.weight"]
                                    ) @ _np(sd[a0])
                    b = sd.get(prefix + ".bias")
                    return DenseLinear(
                        w=jnp.asarray(w.T, dtype),
                        b=None if b is None else jnp.asarray(_np(b), dtype))

                sa = st + "self_attn."
                blk["attn"] = {
                    "q": fold(sa + "q_proj", sa + "linear_q_adapter_list"),
                    "k": fold(sa + "k_proj", sa + "linear_k_adapter_list"),
                    "v": fold(sa + "v_proj", sa + "linear_v_adapter_list"),
                    "o": _linear(sd, sa + "o_proj", dtype),
                }
                blk["zshared"] = {
                    "ln_in": _ln(sd, st + "input_layernorm", dtype),
                    "ln2": _ln(sd, st + "pre_ff_layernorm", dtype),
                    "gateup": fold(
                        st + "feed_forward.gate_up_proj",
                        st + "feed_forward.gate_up_proj_adapter_list"),
                    "down": _linear(sd, st + "feed_forward.down_proj",
                                    dtype),
                    "proj": _linear(sd, lp + "linear", dtype),
                }
            layers.append(blk)
        p["layers"] = layers

    elif fam == "jamba":
        base = "model."
        p["embed_tokens"] = jnp.asarray(_np(sd[base + "embed_tokens.weight"]),
                                        dtype)
        p["final_norm"] = _ln(sd, base + "final_layernorm", dtype)
        layers = []
        for i in range(cfg.num_layers):
            lp = f"{base}layers.{i}."
            fp = lp + "feed_forward."
            if fp + "router.weight" in sd:  # expert layer
                mlp: Dict[str, Any] = {
                    "router": _linear(sd, fp + "router", dtype),
                    "experts": [
                        {"gate": _linear(sd, f"{fp}experts.{e}.gate_proj",
                                         dtype),
                         "up": _linear(sd, f"{fp}experts.{e}.up_proj", dtype),
                         "down": _linear(sd, f"{fp}experts.{e}.down_proj",
                                         dtype)}
                        for e in range(cfg.num_experts)],
                }
            else:
                mlp = {
                    "gate": _linear(sd, fp + "gate_proj", dtype),
                    "up": _linear(sd, fp + "up_proj", dtype),
                    "down": _linear(sd, fp + "down_proj", dtype),
                }
            blk: Dict[str, Any] = {
                "ln1": _ln(sd, lp + "input_layernorm", dtype),
                "ln2": _ln(sd, lp + "pre_ff_layernorm", dtype),
                "mlp": mlp,
            }
            if lp + "mamba.in_proj.weight" in sd:
                cw = _np(sd[lp + "mamba.conv1d.weight"])
                mm = {
                    "in_proj": _linear(sd, lp + "mamba.in_proj", dtype),
                    "conv_w": jnp.asarray(cw[:, 0, :].T, jnp.float32),
                    "x_proj": _linear(sd, lp + "mamba.x_proj", dtype),
                    "dt_proj": _linear(sd, lp + "mamba.dt_proj", dtype),
                    "A_log": jnp.asarray(_np(sd[lp + "mamba.A_log"]),
                                         jnp.float32),
                    "D": jnp.asarray(_np(sd[lp + "mamba.D"]), jnp.float32),
                    "out_proj": _linear(sd, lp + "mamba.out_proj", dtype),
                    "dt_norm": jnp.asarray(
                        _np(sd[lp + "mamba.dt_layernorm.weight"]),
                        jnp.float32),
                    "b_norm": jnp.asarray(
                        _np(sd[lp + "mamba.b_layernorm.weight"]),
                        jnp.float32),
                    "c_norm": jnp.asarray(
                        _np(sd[lp + "mamba.c_layernorm.weight"]),
                        jnp.float32),
                }
                if lp + "mamba.conv1d.bias" in sd:
                    mm["conv_b"] = jnp.asarray(
                        _np(sd[lp + "mamba.conv1d.bias"]), jnp.float32)
                blk["mamba"] = mm
            else:
                blk["attn"] = {
                    "q": _linear(sd, lp + "self_attn.q_proj", dtype),
                    "k": _linear(sd, lp + "self_attn.k_proj", dtype),
                    "v": _linear(sd, lp + "self_attn.v_proj", dtype),
                    "o": _linear(sd, lp + "self_attn.o_proj", dtype),
                }
            layers.append(blk)
        p["layers"] = layers

    elif fam == "lfm2":
        base = "model."
        p["embed_tokens"] = jnp.asarray(_np(sd[base + "embed_tokens.weight"]),
                                        dtype)
        p["final_norm"] = _ln(sd, base + "embedding_norm", dtype)
        layers = []
        for i in range(cfg.num_layers):
            lp = f"{base}layers.{i}."
            blk: Dict[str, Any] = {
                "ln1": _ln(sd, lp + "operator_norm", dtype),
                "ln2": _ln(sd, lp + "ffn_norm", dtype),
                "mlp": {
                    "gate": _linear(sd, lp + "feed_forward.w1", dtype),
                    "up": _linear(sd, lp + "feed_forward.w3", dtype),
                    "down": _linear(sd, lp + "feed_forward.w2", dtype),
                },
            }
            if lp + "conv.in_proj.weight" in sd:
                cw = _np(sd[lp + "conv.conv.weight"])  # [hid, 1, L]
                cv = {
                    "in_proj": _linear(sd, lp + "conv.in_proj", dtype),
                    "conv_w": jnp.asarray(cw[:, 0, :].T, jnp.float32),
                    "out_proj": _linear(sd, lp + "conv.out_proj", dtype),
                }
                if lp + "conv.conv.bias" in sd:
                    cv["conv_b"] = jnp.asarray(_np(sd[lp + "conv.conv.bias"]),
                                               jnp.float32)
                blk["conv"] = cv
            else:
                blk["attn"] = {
                    "q": _linear(sd, lp + "self_attn.q_proj", dtype),
                    "k": _linear(sd, lp + "self_attn.k_proj", dtype),
                    "v": _linear(sd, lp + "self_attn.v_proj", dtype),
                    "o": _linear(sd, lp + "self_attn.out_proj", dtype),
                    "q_norm": _ln(sd, lp + "self_attn.q_layernorm", dtype),
                    "k_norm": _ln(sd, lp + "self_attn.k_layernorm", dtype),
                }
            layers.append(blk)
        p["layers"] = layers

    elif fam == "minimax":
        base = "model."
        p["embed_tokens"] = jnp.asarray(_np(sd[base + "embed_tokens.weight"]),
                                        dtype)
        p["final_norm"] = _ln(sd, base + "norm", dtype)
        layers = []
        for i in range(cfg.num_layers):
            lp = f"{base}layers.{i}."
            moe = lp + "block_sparse_moe."
            mlp = {
                "router": _linear(sd, moe + "gate", dtype),
                "experts": [
                    {"gate": _linear(sd, f"{moe}experts.{e}.w1", dtype),
                     "up": _linear(sd, f"{moe}experts.{e}.w3", dtype),
                     "down": _linear(sd, f"{moe}experts.{e}.w2", dtype)}
                    for e in range(cfg.num_experts)],
            }
            blk: Dict[str, Any] = {
                "ln1": _ln(sd, lp + "input_layernorm", dtype),
                "ln2": _ln(sd, lp + "post_attention_layernorm", dtype),
                "mlp": mlp,
            }
            ap = lp + "self_attn."
            if ap + "qkv_proj.weight" in sd:  # lightning layer
                blk["lightning"] = {
                    "qkv_proj": _linear(sd, ap + "qkv_proj", dtype),
                    "output_gate": _linear(sd, ap + "output_gate", dtype),
                    "out_proj": _linear(sd, ap + "out_proj", dtype),
                    "norm_w": jnp.asarray(_np(sd[ap + "norm.weight"]),
                                          jnp.float32),
                    "slope": jnp.asarray(
                        _np(sd[ap + "slope_rate"]).reshape(-1), jnp.float32),
                }
            else:
                blk["attn"] = {
                    "q": _linear(sd, ap + "q_proj", dtype),
                    "k": _linear(sd, ap + "k_proj", dtype),
                    "v": _linear(sd, ap + "v_proj", dtype),
                    "o": _linear(sd, ap + "o_proj", dtype),
                }
            layers.append(blk)
        p["layers"] = layers

    elif fam in ("mamba2", "mamba1"):
        base = "backbone."
        p["embed_tokens"] = jnp.asarray(_np(sd[base + "embeddings.weight"]),
                                        dtype)
        p["final_norm"] = _ln(sd, base + "norm_f", dtype)
        layers = []
        for i in range(cfg.num_layers):
            lp = f"{base}layers.{i}."
            cw = _np(sd[lp + "mixer.conv1d.weight"])
            mm = {
                "in_proj": _linear(sd, lp + "mixer.in_proj", dtype),
                "conv_w": jnp.asarray(cw[:, 0, :].T, jnp.float32),
                "A_log": jnp.asarray(_np(sd[lp + "mixer.A_log"]),
                                     jnp.float32),
                "D": jnp.asarray(_np(sd[lp + "mixer.D"]), jnp.float32),
                "out_proj": _linear(sd, lp + "mixer.out_proj", dtype),
            }
            if lp + "mixer.dt_bias" in sd:  # mamba2 SSD
                mm["dt_bias"] = jnp.asarray(_np(sd[lp + "mixer.dt_bias"]),
                                            jnp.float32)
            if lp + "mixer.norm.weight" in sd:
                mm["norm_w"] = jnp.asarray(
                    _np(sd[lp + "mixer.norm.weight"]), jnp.float32)
            if lp + "mixer.x_proj.weight" in sd:  # mamba1 selective scan
                mm["x_proj"] = _linear(sd, lp + "mixer.x_proj", dtype)
                mm["dt_proj"] = _linear(sd, lp + "mixer.dt_proj", dtype)
            if lp + "mixer.conv1d.bias" in sd:
                mm["conv_b"] = jnp.asarray(
                    _np(sd[lp + "mixer.conv1d.bias"]), jnp.float32)
            layers.append({"ln1": _ln(sd, lp + "norm", dtype), "mamba": mm})
        p["layers"] = layers

    elif fam == "qwen3_next":
        base = "model."
        p["embed_tokens"] = jnp.asarray(_np(sd[base + "embed_tokens.weight"]),
                                        dtype)
        p["final_norm"] = _ln(sd, base + "norm", dtype)
        layers = []
        for i in range(cfg.num_layers):
            lp = f"{base}layers.{i}."
            blk: Dict[str, Any] = {
                "ln1": _ln(sd, lp + "input_layernorm", dtype),
                "ln2": _ln(sd, lp + "post_attention_layernorm", dtype),
            }
            if lp + "mlp.gate.weight" in sd:  # sparse MoE layer
                mp = lp + "mlp."
                mlp: Dict[str, Any] = {
                    "router": _linear(sd, mp + "gate", dtype),
                    "experts": [
                        {"gate": _linear(sd, f"{mp}experts.{e}.gate_proj",
                                         dtype),
                         "up": _linear(sd, f"{mp}experts.{e}.up_proj", dtype),
                         "down": _linear(sd, f"{mp}experts.{e}.down_proj",
                                         dtype)}
                        for e in range(cfg.num_experts)],
                    "shared": {
                        "gate": _linear(sd, mp + "shared_expert.gate_proj",
                                        dtype),
                        "up": _linear(sd, mp + "shared_expert.up_proj",
                                      dtype),
                        "down": _linear(sd, mp + "shared_expert.down_proj",
                                        dtype),
                    },
                    "shared_gate": _linear(sd, mp + "shared_expert_gate",
                                           dtype),
                }
            else:
                mlp = {
                    "gate": _linear(sd, lp + "mlp.gate_proj", dtype),
                    "up": _linear(sd, lp + "mlp.up_proj", dtype),
                    "down": _linear(sd, lp + "mlp.down_proj", dtype),
                }
            blk["mlp"] = mlp
            if lp + "linear_attn.in_proj_qkvz.weight" in sd:
                cw = _np(sd[lp + "linear_attn.conv1d.weight"])
                gd = {
                    "in_proj_qkvz": _linear(sd, lp + "linear_attn.in_proj_qkvz",
                                            dtype),
                    "in_proj_ba": _linear(sd, lp + "linear_attn.in_proj_ba",
                                          dtype),
                    "conv_w": jnp.asarray(cw[:, 0, :].T, jnp.float32),
                    "dt_bias": jnp.asarray(
                        _np(sd[lp + "linear_attn.dt_bias"]), jnp.float32),
                    "A_log": jnp.asarray(_np(sd[lp + "linear_attn.A_log"]),
                                         jnp.float32),
                    "norm_w": jnp.asarray(
                        _np(sd[lp + "linear_attn.norm.weight"]), jnp.float32),
                    "out_proj": _linear(sd, lp + "linear_attn.out_proj",
                                        dtype),
                }
                if lp + "linear_attn.conv1d.bias" in sd:
                    gd["conv_b"] = jnp.asarray(
                        _np(sd[lp + "linear_attn.conv1d.bias"]), jnp.float32)
                blk["gdn"] = gd
            else:
                blk["attn"] = {
                    "q": _linear(sd, lp + "self_attn.q_proj", dtype),
                    "k": _linear(sd, lp + "self_attn.k_proj", dtype),
                    "v": _linear(sd, lp + "self_attn.v_proj", dtype),
                    "o": _linear(sd, lp + "self_attn.o_proj", dtype),
                    "q_norm": _ln(sd, lp + "self_attn.q_norm", dtype),
                    "k_norm": _ln(sd, lp + "self_attn.k_norm", dtype),
                }
            layers.append(blk)
        p["layers"] = layers

    elif fam == "falcon_h1":
        base = "model."
        p["embed_tokens"] = jnp.asarray(_np(sd[base + "embed_tokens.weight"]),
                                        dtype)
        p["final_norm"] = _ln(sd, base + "final_layernorm", dtype)
        layers = []
        for i in range(cfg.num_layers):
            lp = f"{base}layers.{i}."
            cw = _np(sd[lp + "mamba.conv1d.weight"])
            mm = {
                "in_proj": _linear(sd, lp + "mamba.in_proj", dtype),
                "conv_w": jnp.asarray(cw[:, 0, :].T, jnp.float32),
                "dt_bias": jnp.asarray(_np(sd[lp + "mamba.dt_bias"]),
                                       jnp.float32),
                "A_log": jnp.asarray(_np(sd[lp + "mamba.A_log"]),
                                     jnp.float32),
                "D": jnp.asarray(_np(sd[lp + "mamba.D"]), jnp.float32),
                "out_proj": _linear(sd, lp + "mamba.out_proj", dtype),
            }
            if lp + "mamba.norm.weight" in sd:
                mm["norm_w"] = jnp.asarray(_np(sd[lp + "mamba.norm.weight"]),
                                           jnp.float32)
            if lp + "mamba.conv1d.bias" in sd:
                mm["conv_b"] = jnp.asarray(_np(sd[lp + "mamba.conv1d.bias"]),
                                           jnp.float32)
            layers.append({
                "ln1": _ln(sd, lp + "input_layernorm", dtype),
                "attn": {
                    "q": _linear(sd, lp + "self_attn.q_proj", dtype),
                    "k": _linear(sd, lp + "self_attn.k_proj", dtype),
                    "v": _linear(sd, lp + "self_attn.v_proj", dtype),
                    "o": _linear(sd, lp + "self_attn.o_proj", dtype),
                },
                "mamba": mm,
                "ln2": _ln(sd, lp + "pre_ff_layernorm", dtype),
                "mlp": {
                    "gate": _linear(sd, lp + "feed_forward.gate_proj", dtype),
                    "up": _linear(sd, lp + "feed_forward.up_proj", dtype),
                    "down": _linear(sd, lp + "feed_forward.down_proj", dtype),
                },
            })
        p["layers"] = layers

    elif fam == "granitemoe_hybrid":
        base = "model."
        p["embed_tokens"] = jnp.asarray(_np(sd[base + "embed_tokens.weight"]),
                                        dtype)
        p["final_norm"] = _ln(sd, base + "norm", dtype)
        layers = []
        for i in range(cfg.num_layers):
            lp = f"{base}layers.{i}."
            moe = lp + "block_sparse_moe."
            iw = _np(sd[moe + "input_linear.weight"])
            ow = _np(sd[moe + "output_linear.weight"])
            ffn = iw.shape[1] // 2
            experts = [
                {"gate": DenseLinear(w=jnp.asarray(iw[e][:ffn].T, dtype),
                                     b=None),
                 "up": DenseLinear(w=jnp.asarray(iw[e][ffn:].T, dtype),
                                   b=None),
                 "down": DenseLinear(w=jnp.asarray(ow[e].T, dtype), b=None)}
                for e in range(cfg.num_experts)]
            mlp: Dict[str, Any] = {
                "router": _linear(sd, moe + "router.layer", dtype),
                "experts": experts,
            }
            if lp + "shared_mlp.input_linear.weight" in sd:
                siw = _np(sd[lp + "shared_mlp.input_linear.weight"])
                sow = _np(sd[lp + "shared_mlp.output_linear.weight"])
                sffn = siw.shape[0] // 2
                mlp["shared"] = {
                    "gate": DenseLinear(w=jnp.asarray(siw[:sffn].T, dtype),
                                        b=None),
                    "up": DenseLinear(w=jnp.asarray(siw[sffn:].T, dtype),
                                      b=None),
                    "down": DenseLinear(w=jnp.asarray(sow.T, dtype), b=None),
                }
            blk: Dict[str, Any] = {
                "ln1": _ln(sd, lp + "input_layernorm", dtype),
                "ln2": _ln(sd, lp + "post_attention_layernorm", dtype),
                "mlp": mlp,
            }
            if lp + "mamba.in_proj.weight" in sd:
                cw = _np(sd[lp + "mamba.conv1d.weight"])
                mm = {
                    "in_proj": _linear(sd, lp + "mamba.in_proj", dtype),
                    "conv_w": jnp.asarray(cw[:, 0, :].T, jnp.float32),
                    "dt_bias": jnp.asarray(_np(sd[lp + "mamba.dt_bias"]),
                                           jnp.float32),
                    "A_log": jnp.asarray(_np(sd[lp + "mamba.A_log"]),
                                         jnp.float32),
                    "D": jnp.asarray(_np(sd[lp + "mamba.D"]), jnp.float32),
                    "norm_w": jnp.asarray(_np(sd[lp + "mamba.norm.weight"]),
                                          jnp.float32),
                    "out_proj": _linear(sd, lp + "mamba.out_proj", dtype),
                }
                if lp + "mamba.conv1d.bias" in sd:
                    mm["conv_b"] = jnp.asarray(
                        _np(sd[lp + "mamba.conv1d.bias"]), jnp.float32)
                blk["mamba"] = mm
            else:
                blk["attn"] = {
                    "q": _linear(sd, lp + "self_attn.q_proj", dtype),
                    "k": _linear(sd, lp + "self_attn.k_proj", dtype),
                    "v": _linear(sd, lp + "self_attn.v_proj", dtype),
                    "o": _linear(sd, lp + "self_attn.o_proj", dtype),
                }
            layers.append(blk)
        p["layers"] = layers

    elif fam == "llama4":
        base = "model."
        p["embed_tokens"] = jnp.asarray(_np(sd[base + "embed_tokens.weight"]),
                                        dtype)
        p["final_norm"] = _ln(sd, base + "norm", dtype)
        layers = []
        for i in range(cfg.num_layers):
            lp = f"{base}layers.{i}."
            fp = lp + "feed_forward."
            if fp + "experts.gate_up_proj" in sd:  # MoE layer
                # fused 3D experts [E, hid, 2d] with gate|up as contiguous
                # halves (chunk(2, -1)), down [E, d, hid]; split per expert
                gu = _np(sd[fp + "experts.gate_up_proj"])
                dw = _np(sd[fp + "experts.down_proj"])
                d = gu.shape[-1] // 2
                experts = [
                    {"gate": DenseLinear(w=jnp.asarray(gu[e][:, :d], dtype),
                                         b=None),
                     "up": DenseLinear(w=jnp.asarray(gu[e][:, d:], dtype),
                                       b=None),
                     "down": DenseLinear(w=jnp.asarray(dw[e], dtype), b=None)}
                    for e in range(cfg.num_experts)]
                mlp: Dict[str, Any] = {
                    "router": _linear(sd, fp + "router", dtype),
                    "experts": experts,
                    "shared": {
                        "gate": _linear(sd, fp + "shared_expert.gate_proj",
                                        dtype),
                        "up": _linear(sd, fp + "shared_expert.up_proj",
                                      dtype),
                        "down": _linear(sd, fp + "shared_expert.down_proj",
                                        dtype),
                    },
                }
            else:  # dense layer (interleave_moe_layer_step)
                mlp = {
                    "gate": _linear(sd, fp + "gate_proj", dtype),
                    "up": _linear(sd, fp + "up_proj", dtype),
                    "down": _linear(sd, fp + "down_proj", dtype),
                }
            layers.append({
                "ln1": _ln(sd, lp + "input_layernorm", dtype),
                "attn": {
                    "q": _linear(sd, lp + "self_attn.q_proj", dtype),
                    "k": _linear(sd, lp + "self_attn.k_proj", dtype),
                    "v": _linear(sd, lp + "self_attn.v_proj", dtype),
                    "o": _linear(sd, lp + "self_attn.o_proj", dtype),
                },
                "ln2": _ln(sd, lp + "post_attention_layernorm", dtype),
                "mlp": mlp,
            })
        p["layers"] = layers

    elif fam == "dbrx":
        base = "transformer."
        p["embed_tokens"] = jnp.asarray(_np(sd[base + "wte.weight"]), dtype)
        p["final_norm"] = _ln(sd, base + "norm_f", dtype)
        layers = []
        ffn = cfg.intermediate_size
        for i in range(cfg.num_layers):
            lp = f"{base}blocks.{i}."
            nan = lp + "norm_attn_norm."
            # experts ship as flat [E*ffn, hidden] stacks: w1 (gate) and v1
            # (up) act as x @ chunk.T, w2 (down) as h @ chunk — split into
            # per-expert linears for per-expert OWQ / ExpertBank EP
            w1 = _np(sd[lp + "ffn.experts.mlp.w1"])
            v1 = _np(sd[lp + "ffn.experts.mlp.v1"])
            w2 = _np(sd[lp + "ffn.experts.mlp.w2"])
            experts = []
            for e in range(cfg.num_experts):
                sl = slice(e * ffn, (e + 1) * ffn)
                experts.append({
                    "gate": DenseLinear(w=jnp.asarray(w1[sl].T, dtype), b=None),
                    "up": DenseLinear(w=jnp.asarray(v1[sl].T, dtype), b=None),
                    "down": DenseLinear(w=jnp.asarray(w2[sl], dtype), b=None),
                })
            layers.append({
                "ln1": _ln(sd, nan + "norm_1", dtype),
                "attn": {
                    "qkv": _linear(sd, nan + "attn.Wqkv", dtype),
                    "o": _linear(sd, nan + "attn.out_proj", dtype),
                },
                "ln2": _ln(sd, nan + "norm_2", dtype),
                "mlp": {
                    "router": _linear(sd, lp + "ffn.router.layer", dtype),
                    "experts": experts,
                },
            })
        p["layers"] = layers

    elif fam == "gpt_oss":
        base = "model."
        p["embed_tokens"] = jnp.asarray(_np(sd[base + "embed_tokens.weight"]),
                                        dtype)
        p["final_norm"] = _ln(sd, base + "norm", dtype)
        layers = []
        for i in range(cfg.num_layers):
            lp = f"{base}layers.{i}."
            ap = lp + "self_attn."
            attn = {
                "q": _linear(sd, ap + "q_proj", dtype),
                "k": _linear(sd, ap + "k_proj", dtype),
                "v": _linear(sd, ap + "v_proj", dtype),
                "o": _linear(sd, ap + "o_proj", dtype),
                "sinks": jnp.asarray(_np(sd[ap + "sinks"]), jnp.float32),
            }
            # experts ship as fused 3D tensors [E, in, out] with gate/up
            # interleaved along the out axis; split to per-expert linears so
            # per-expert OWQ quantization and ExpertBank EP apply unchanged
            mp = lp + "mlp."
            gu = _np(sd[mp + "experts.gate_up_proj"])       # [E, hid, 2d]
            gub = _np(sd[mp + "experts.gate_up_proj_bias"])  # [E, 2d]
            dw = _np(sd[mp + "experts.down_proj"])          # [E, d, hid]
            dwb = _np(sd[mp + "experts.down_proj_bias"])    # [E, hid]
            experts = []
            for e in range(cfg.num_experts):
                experts.append({
                    "gate": DenseLinear(w=jnp.asarray(gu[e][:, ::2], dtype),
                                        b=jnp.asarray(gub[e][::2], dtype)),
                    "up": DenseLinear(w=jnp.asarray(gu[e][:, 1::2], dtype),
                                      b=jnp.asarray(gub[e][1::2], dtype)),
                    "down": DenseLinear(w=jnp.asarray(dw[e], dtype),
                                        b=jnp.asarray(dwb[e], dtype)),
                })
            mlp = {"router": _linear(sd, mp + "router", dtype),
                   "experts": experts}
            layers.append({
                "ln1": _ln(sd, lp + "input_layernorm", dtype),
                "attn": attn,
                "ln2": _ln(sd, lp + "post_attention_layernorm", dtype),
                "mlp": mlp,
            })
        p["layers"] = layers

    elif fam == "deepseek":
        base = "model."
        p["embed_tokens"] = jnp.asarray(_np(sd[base + "embed_tokens.weight"]),
                                        dtype)
        p["final_norm"] = _ln(sd, base + "norm", dtype)
        layers = []
        for i in range(cfg.num_layers):
            lp = f"{base}layers.{i}."
            ap = lp + "self_attn."
            attn: Dict[str, Any] = {
                "kv_a": _linear(sd, ap + "kv_a_proj_with_mqa", dtype),
                "kv_a_norm": _ln(sd, ap + "kv_a_layernorm", dtype),
                "kv_b": _linear(sd, ap + "kv_b_proj", dtype),
                "o": _linear(sd, ap + "o_proj", dtype),
            }
            if ap + "q_proj.weight" in sd:  # v2-lite: no q low-rank
                attn["q"] = _linear(sd, ap + "q_proj", dtype)
            else:
                attn["q_a"] = _linear(sd, ap + "q_a_proj", dtype)
                attn["q_a_norm"] = _ln(sd, ap + "q_a_layernorm", dtype)
                attn["q_b"] = _linear(sd, ap + "q_b_proj", dtype)
            mp = lp + "mlp."
            if mp + "gate.weight" in sd:  # MoE block
                mlp: Dict[str, Any] = {
                    # router weight is a bare [E, hidden] parameter
                    "router": DenseLinear(
                        w=jnp.asarray(_np(sd[mp + "gate.weight"]).T, dtype),
                        b=None),
                    "experts": [
                        {"gate": _linear(sd, f"{mp}experts.{e}.gate_proj",
                                         dtype),
                         "up": _linear(sd, f"{mp}experts.{e}.up_proj", dtype),
                         "down": _linear(sd, f"{mp}experts.{e}.down_proj",
                                         dtype)}
                        for e in range(cfg.num_experts)],
                }
                if mp + "gate.e_score_correction_bias" in sd:  # v3 noaux-tc
                    mlp["router_bias"] = jnp.asarray(
                        _np(sd[mp + "gate.e_score_correction_bias"]),
                        jnp.float32)
                if mp + "shared_experts.gate_proj.weight" in sd:
                    mlp["shared"] = {
                        "gate": _linear(sd, mp + "shared_experts.gate_proj",
                                        dtype),
                        "up": _linear(sd, mp + "shared_experts.up_proj",
                                      dtype),
                        "down": _linear(sd, mp + "shared_experts.down_proj",
                                        dtype),
                    }
            else:  # dense block (layer < first_k_dense_replace)
                mlp = {
                    "gate": _linear(sd, mp + "gate_proj", dtype),
                    "up": _linear(sd, mp + "up_proj", dtype),
                    "down": _linear(sd, mp + "down_proj", dtype),
                }
            layers.append({
                "ln1": _ln(sd, lp + "input_layernorm", dtype),
                "attn": attn,
                "ln2": _ln(sd, lp + "post_attention_layernorm", dtype),
                "mlp": mlp,
            })
        p["layers"] = layers

    elif fam == "nemotron":
        base = "model."
        p["embed_tokens"] = jnp.asarray(_np(sd[base + "embed_tokens.weight"]),
                                        dtype)
        p["final_norm"] = _ln(sd, base + "norm", dtype)
        layers = []
        for i in range(cfg.num_layers):
            lp = f"{base}layers.{i}."
            attn = {
                "q": _linear(sd, lp + "self_attn.q_proj", dtype),
                "k": _linear(sd, lp + "self_attn.k_proj", dtype),
                "v": _linear(sd, lp + "self_attn.v_proj", dtype),
                "o": _linear(sd, lp + "self_attn.o_proj", dtype),
            }
            if lp + "self_attn.q_norm.weight" in sd:  # apertus qk-norm
                attn["q_norm"] = _ln(sd, lp + "self_attn.q_norm", dtype)
                attn["k_norm"] = _ln(sd, lp + "self_attn.k_norm", dtype)
            mlp = {
                "fc1": _linear(sd, lp + "mlp.up_proj", dtype),
                "fc2": _linear(sd, lp + "mlp.down_proj", dtype),
            }
            if lp + "mlp.act_fn.alpha_p" in sd:  # apertus learnable xIELU
                mlp["act"] = {
                    k: jnp.asarray(_np(sd[lp + f"mlp.act_fn.{k}"]),
                                   jnp.float32)
                    for k in ("alpha_p", "alpha_n", "beta", "eps")}
            ln_name = ("attention_layernorm"
                       if lp + "attention_layernorm.weight" in sd
                       else "input_layernorm")
            ff_name = ("feedforward_layernorm"
                       if lp + "feedforward_layernorm.weight" in sd
                       else "post_attention_layernorm")
            layers.append({
                "ln1": _ln(sd, lp + ln_name, dtype),
                "attn": attn,
                "ln2": _ln(sd, lp + ff_name, dtype),
                "mlp": mlp,
            })
        p["layers"] = layers

    elif fam == "persimmon":
        base = "model."
        p["embed_tokens"] = jnp.asarray(_np(sd[base + "embed_tokens.weight"]),
                                        dtype)
        p["final_norm"] = _ln(sd, base + "final_layernorm", dtype)
        layers = []
        for i in range(cfg.num_layers):
            lp = f"{base}layers.{i}."
            attn = {
                "qkv": _linear(sd, lp + "self_attn.query_key_value", dtype),
                "o": _linear(sd, lp + "self_attn.dense", dtype),
            }
            if lp + "self_attn.q_layernorm.weight" in sd:
                attn["q_norm"] = _ln(sd, lp + "self_attn.q_layernorm", dtype)
                attn["k_norm"] = _ln(sd, lp + "self_attn.k_layernorm", dtype)
            layers.append({
                "ln1": _ln(sd, lp + "input_layernorm", dtype),
                "attn": attn,
                "ln2": _ln(sd, lp + "post_attention_layernorm", dtype),
                "mlp": {
                    "fc1": _linear(sd, lp + "mlp.dense_h_to_4h", dtype),
                    "fc2": _linear(sd, lp + "mlp.dense_4h_to_h", dtype),
                },
            })
        p["layers"] = layers

    elif fam == "mpt":
        base = "transformer."
        p["embed_tokens"] = jnp.asarray(_np(sd[base + "wte.weight"]), dtype)
        p["final_norm"] = _ln(sd, base + "norm_f", dtype)
        layers = []
        for i in range(cfg.num_layers):
            lp = f"{base}blocks.{i}."
            layers.append({
                "ln1": _ln(sd, lp + "norm_1", dtype),
                "attn": {
                    "qkv": _linear(sd, lp + "attn.Wqkv", dtype),
                    "o": _linear(sd, lp + "attn.out_proj", dtype),
                },
                "ln2": _ln(sd, lp + "norm_2", dtype),
                "mlp": {
                    "fc1": _linear(sd, lp + "ffn.up_proj", dtype),
                    "fc2": _linear(sd, lp + "ffn.down_proj", dtype),
                },
            })
        p["layers"] = layers

    elif fam in ("bloom", "falcon"):
        base = "transformer."
        p["embed_tokens"] = jnp.asarray(_np(sd[base + "word_embeddings.weight"]), dtype)
        if base + "word_embeddings_layernorm.weight" in sd:
            p["embed_norm"] = _ln(sd, base + "word_embeddings_layernorm", dtype)
        p["final_norm"] = _ln(sd, base + "ln_f", dtype)
        layers = []
        for i in range(cfg.num_layers):
            lp = f"{base}h.{i}."
            blk = {
                "attn": {
                    "qkv": _linear(sd, lp + "self_attention.query_key_value", dtype),
                    "o": _linear(sd, lp + "self_attention.dense", dtype),
                },
                "mlp": {
                    "fc1": _linear(sd, lp + "mlp.dense_h_to_4h", dtype),
                    "fc2": _linear(sd, lp + "mlp.dense_4h_to_h", dtype),
                },
            }
            blk["ln1"] = _ln(sd, lp + "input_layernorm", dtype)
            if not cfg.parallel_block:
                blk["ln2"] = _ln(sd, lp + "post_attention_layernorm", dtype)
            layers.append(blk)
        p["layers"] = layers
    else:
        raise NotImplementedError(fam)

    if not cfg.tie_word_embeddings and "lm_head.weight" in sd:
        p["lm_head"] = _linear(sd, "lm_head", dtype)
    elif (not cfg.tie_word_embeddings
          and "output_projection.weight" in sd):  # biogpt untied head
        p["lm_head"] = _linear(sd, "output_projection", dtype)
    return p


def _fold_falcon_h1(sd: Dict[str, Any], hc) -> Dict[str, Any]:
    """Fold falcon-h1's muP multipliers into the weights so the runtime
    (and quantization) sees plain linears.

    attention_in scales the attention input (q/k/v weights), key scales
    the k output (weight+bias), attention_out / ssm_out scale module
    outputs (weight+bias of o/out_proj), ssm_in scales the mixer input
    (in_proj weight), the per-channel mup vector scales in_proj output
    rows (z|x|B|C|dt segments), and mlp_multipliers scale the gate output
    (pre-activation) and the down output.  The embedding and lm-head
    scalars stay in ModelConfig (embed_scale / logit_scale).
    """
    import numpy as np

    out = {k: _np(v) for k, v in sd.items()}
    inner = (hc.mamba_d_ssm
             or int(hc.mamba_expand * hc.hidden_size))
    gn = hc.mamba_n_groups * hc.mamba_d_state
    zm = hc.ssm_multipliers or [1.0] * 5
    mup = np.ones(2 * inner + 2 * gn + hc.mamba_n_heads, np.float32)
    mup[:inner] *= zm[0]
    mup[inner:2 * inner] *= zm[1]
    mup[2 * inner:2 * inner + gn] *= zm[2]
    mup[2 * inner + gn:2 * inner + 2 * gn] *= zm[3]
    mup[2 * inner + 2 * gn:] *= zm[4]
    a_in = hc.attention_in_multiplier or 1.0
    a_out = hc.attention_out_multiplier or 1.0
    k_m = hc.key_multiplier or 1.0
    s_in = hc.ssm_in_multiplier or 1.0
    s_out = hc.ssm_out_multiplier or 1.0
    g_m, d_m = hc.mlp_multipliers or (1.0, 1.0)

    def scale(key, f, bias=True):
        if key + ".weight" in out:
            out[key + ".weight"] = out[key + ".weight"] * f
        if bias and key + ".bias" in out:
            out[key + ".bias"] = out[key + ".bias"] * f

    for i in range(hc.num_hidden_layers):
        lp = f"model.layers.{i}."
        scale(lp + "self_attn.q_proj", a_in, bias=False)  # input scale
        scale(lp + "self_attn.v_proj", a_in, bias=False)
        scale(lp + "self_attn.k_proj", a_in, bias=False)
        scale(lp + "self_attn.k_proj", k_m)               # output scale
        scale(lp + "self_attn.o_proj", a_out)
        scale(lp + "mamba.in_proj", s_in, bias=False)
        out[lp + "mamba.in_proj.weight"] = (
            out[lp + "mamba.in_proj.weight"] * mup[:, None])
        if lp + "mamba.in_proj.bias" in out:
            out[lp + "mamba.in_proj.bias"] = (
                out[lp + "mamba.in_proj.bias"] * mup)
        scale(lp + "mamba.out_proj", s_out)
        scale(lp + "feed_forward.gate_proj", g_m)
        scale(lp + "feed_forward.down_proj", d_m)
    return out


def import_hf_model(hf_model, dtype=jnp.float32):
    """In-memory transformers model -> (params, ModelConfig)."""
    cfg = config_from_hf(hf_model.config)
    sd = hf_model.state_dict()
    if hf_model.config.model_type == "falcon_h1":
        sd = _fold_falcon_h1(sd, hf_model.config)
    params = params_from_state_dict(sd, cfg, dtype)
    return params, cfg


def load_hf_pretrained(name_or_path: str, dtype=jnp.float32,
                       trust_remote_code: bool = False):
    """Load an HF checkpoint from disk (offline-safe with a local path)."""
    import torch
    from transformers import AutoModelForCausalLM

    # skip weight init for speed, like the reference (modelutils.py:15-41):
    # from_pretrained overwrites everything anyway
    model = AutoModelForCausalLM.from_pretrained(
        name_or_path, torch_dtype=torch.float32,
        trust_remote_code=trust_remote_code)
    return import_hf_model(model, dtype)
