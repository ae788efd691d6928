"""Sequence (context) parallelism for long-context prefill.

The reference has no long-context support at all (SURVEY.md §5: max context
= max_position_embeddings, no ring attention anywhere); this is the
TPU-native stretch goal: shard the *token* axis over an 'sp' mesh axis so a
long prompt's prefill distributes across chips.

Design (all-gather KV, the first-order scheme): each shard embeds and
projects its local token slice; K/V are all-gathered over ICI per block
(they are Hkv*hd wide — cheap relative to attention flops at long T);
attention runs with global causal masking via each shard's absolute
positions; MLP is purely local.  Logits come back sharded on the token
axis.  Compute and memory per chip scale as T/sp (modulo the gathered KV).

Composes with the quantized runtime: the packed weights are replicated
across 'sp' (or sharded over a nested tp axis)."""

from __future__ import annotations

from functools import partial
from typing import Any, Dict

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from ..models.config import ModelConfig
from ..models.layers import (
    activation,
    apply_rope,
    attention_core,
    causal_mask_bias,
    rope_cos_sin,
)
from ..models.transformer import _lin, _norm, embed, unembed

__all__ = ["SP_AXIS", "make_sp_prefill"]

SP_AXIS = "sp"


def _sp_block(blk, cfg: ModelConfig, x, positions, kernel: str):
    """One block with token-sharded x and all-gathered K/V."""
    B, T_loc, _ = x.shape
    H, Hkv, hd = cfg.num_heads, cfg.num_kv_heads, cfg.head_dim

    pre_norm = cfg.do_layer_norm_before
    res = x
    x_ln = _norm(blk.get("ln1"), cfg, x) if pre_norm else x
    attn_p = blk["attn"]
    q = _lin(attn_p["q"], x_ln, kernel).reshape(B, T_loc, H, hd)
    k = _lin(attn_p["k"], x_ln, kernel).reshape(B, T_loc, Hkv, hd)
    v = _lin(attn_p["v"], x_ln, kernel).reshape(B, T_loc, Hkv, hd)

    if cfg.pos_embedding == "rope":
        from ..models.transformer import rope_tables

        rope = rope_tables(cfg, positions)
        q, k = apply_rope(q, k, *rope, style=cfg.rope_style)

    # gather K/V over the sequence shards (tiled=True keeps token order)
    k_all = jax.lax.all_gather(k, SP_AXIS, axis=1, tiled=True)
    v_all = jax.lax.all_gather(v, SP_AXIS, axis=1, tiled=True)
    T_glob = k_all.shape[1]
    kv_pos = jnp.broadcast_to(jnp.arange(T_glob, dtype=jnp.int32)[None],
                              (B, T_glob))
    mask = causal_mask_bias(positions, jnp.ones((B, T_glob), jnp.int32),
                            kv_pos)
    ctx = attention_core(q, k_all, v_all, mask, 1.0 / (hd ** 0.5))
    ctx = ctx.reshape(B, T_loc, H * hd)
    attn_out = _lin(attn_p["o"], ctx, kernel)

    x = res + attn_out
    if not pre_norm:
        x = _norm(blk.get("ln1"), cfg, x)
    res = x
    x_ln2 = _norm(blk.get("ln2"), cfg, x) if pre_norm else x
    mlp = blk["mlp"]
    if cfg.gated_mlp:
        h = activation(_lin(mlp["gate"], x_ln2, kernel),
                       cfg.activation) * _lin(mlp["up"], x_ln2, kernel)
        y = res + _lin(mlp["down"], h, kernel)
    else:
        h = activation(_lin(mlp["fc1"], x_ln2, kernel), cfg.activation)
        y = res + _lin(mlp["fc2"], h, kernel)
    if not pre_norm:
        y = _norm(blk.get("ln2"), cfg, y)
    return y


def make_sp_prefill(mesh: Mesh, cfg: ModelConfig, kernel: str = "xla",
                    dtype=jnp.float32):
    """(params, ids [B, T]) -> logits [B, T, vocab], T sharded over 'sp'.

    Requires T divisible by the sp axis size.  Currently rope/learned
    position families without parallel blocks (llama/opt).
    """
    if cfg.pos_embedding == "alibi" or cfg.parallel_block or cfg.fused_qkv:
        raise NotImplementedError(
            "sequence parallelism currently covers llama/opt-style blocks")

    def local_fwd(params, ids):
        B, T_loc = ids.shape
        shard = jax.lax.axis_index(SP_AXIS)
        positions = (shard * T_loc
                     + jnp.arange(T_loc, dtype=jnp.int32))[None, :]
        positions = jnp.broadcast_to(positions, (B, T_loc))
        x = embed(params, cfg, ids, positions, dtype=dtype)
        for blk in params["layers"]:
            x = _sp_block(blk, cfg, x, positions, kernel)
        return unembed(params, cfg, x)

    fwd = shard_map(local_fwd, mesh=mesh,
                    in_specs=(P(), P(None, SP_AXIS)),
                    out_specs=P(None, SP_AXIS, None),
                    check_vma=False)
    return jax.jit(fwd)
