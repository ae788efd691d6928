"""Tensor-parallel partitioning of model params + shard_map forward/train.

Megatron-style TP over the 'tp' mesh axis:

  * q/k/v (+gate/up/fc1): column-parallel — weight output axis sharded;
    attention runs on local heads.  Packed arrays shard trivially on the
    output axis (plane-chunk packing is per-column independent).
  * o (+down/fc2): row-parallel — input axis sharded, output psum-reduced.
    Packed arrays are re-packed per shard (see ShardedPackedLinear) because
    packed words span whole input chunks; weak-column indices are localized
    per shard.  Biases are pre-divided by tp so the psum restores them.
  * embeddings / norms / lm_head: replicated (cheap at 3/4-bit scale).

Data parallelism shards the batch axis; gradients are psum-averaged over
'dp'.  The packed-weight design constraint (SURVEY.md §7.4.4: int32 words
mix many logical rows — never shard mid-word) is satisfied by construction.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from ..models.config import ModelConfig
from ..models.transformer import forward
from ..runtime.quant_linear import (
    DenseLinear,
    PackedLinear,
    ShardedPackedLinear,
    shard_packed_rowwise,
)
from .mesh import DP_AXIS, TP_AXIS

__all__ = ["shard_model_tp", "param_pspecs", "make_tp_forward",
           "make_tp_train_step", "local_config"]

# dotted paths (within a block) of row-parallel linears
_ROW_PARALLEL = {"attn.o", "mlp.down", "mlp.fc2"}
_COL_PARALLEL = {"attn.q", "attn.k", "attn.v", "attn.qkv", "mlp.gate",
                 "mlp.up", "mlp.fc1"}


def local_config(cfg: ModelConfig, tp: int) -> ModelConfig:
    """Per-shard config: local head counts, global head_dim pinned."""
    if cfg.num_heads % tp or (cfg.num_kv_heads % tp and cfg.num_kv_heads > 1):
        raise ValueError(
            f"heads {cfg.num_heads}/{cfg.num_kv_heads} not divisible by tp={tp}")
    return dataclasses.replace(
        cfg,
        num_heads=cfg.num_heads // tp,
        num_kv_heads=max(cfg.num_kv_heads // tp, 1),
        intermediate_size=cfg.intermediate_size // tp,
        head_dim_override=cfg.head_dim,
    )


def _shard_block(blk: Dict[str, Any], tp: int) -> Dict[str, Any]:
    for part in ("attn", "mlp"):
        for leaf, lin in list(blk.get(part, {}).items()):
            name = f"{part}.{leaf}"
            if name in _ROW_PARALLEL:
                if isinstance(lin, PackedLinear):
                    blk[part][leaf] = shard_packed_rowwise(lin, tp)
                elif isinstance(lin, DenseLinear) and lin.b is not None:
                    blk[part][leaf] = DenseLinear(w=lin.w, b=lin.b / tp)
    return blk


def shard_model_tp(params: Dict[str, Any], cfg: ModelConfig, tp: int
                   ) -> Tuple[Dict[str, Any], ModelConfig]:
    """Transform params for tp-way tensor parallelism (host-side, in place)."""
    for blk in params["layers"]:
        _shard_block(blk, tp)
    return params, local_config(cfg, tp)


def _linear_spec(name: str, lin) -> Any:
    """PartitionSpec pytree for one linear."""
    if name in _ROW_PARALLEL:
        if isinstance(lin, ShardedPackedLinear):
            return ShardedPackedLinear(
                qweight=P(TP_AXIS, None, None), scales=P(), zeros=P(),
                oweight=P(TP_AXIS, None, None), out_ids=P(TP_AXIS, None),
                bias=None if lin.bias is None else P(),
                bits=lin.bits, in_features_local=lin.in_features_local)
        return DenseLinear(w=P(TP_AXIS, None),
                           b=None if lin.b is None else P())
    # column-parallel
    if isinstance(lin, PackedLinear):
        return PackedLinear(
            qweight=P(None, TP_AXIS), scales=P(TP_AXIS), zeros=P(TP_AXIS),
            oweight=P(None, TP_AXIS), out_ids=P(None),
            bias=None if lin.bias is None else P(TP_AXIS),
            bits=lin.bits, in_features=lin.in_features)
    return DenseLinear(w=P(None, TP_AXIS),
                       b=None if lin.b is None else P(TP_AXIS))


def param_pspecs(params: Dict[str, Any]) -> Any:
    """PartitionSpec pytree mirroring a TP-sharded param tree."""

    def norm_spec(n):
        if n is None:
            return None
        return {k: P() for k in n}

    specs: Dict[str, Any] = {
        "embed_tokens": P(),
        "project_in": None if params.get("project_in") is None else
        DenseLinear(w=P(), b=None if params["project_in"].b is None else P()),
        "project_out": None if params.get("project_out") is None else
        DenseLinear(w=P(), b=None if params["project_out"].b is None else P()),
        "embed_norm": norm_spec(params.get("embed_norm")),
        "final_norm": norm_spec(params.get("final_norm")),
        "lm_head": None if params.get("lm_head") is None else
        DenseLinear(w=P(), b=None if params["lm_head"].b is None else P()),
    }
    if "embed_positions" in params:
        specs["embed_positions"] = P()

    blocks = []
    for blk in params["layers"]:
        bspec: Dict[str, Any] = {}
        for key, val in blk.items():
            if key.startswith("ln"):
                bspec[key] = norm_spec(val)
            else:
                bspec[key] = {leaf: _linear_spec(f"{key}.{leaf}", lin)
                              for leaf, lin in val.items()}
        blocks.append(bspec)
    specs["layers"] = blocks
    return specs


def place_params(params: Dict[str, Any], mesh: Mesh) -> Dict[str, Any]:
    """device_put the param tree according to its TP partition specs."""
    specs = param_pspecs(params)

    def put(leaf, spec):
        if leaf is None:
            return None
        return jax.device_put(leaf, NamedSharding(mesh, spec))

    return jax.tree_util.tree_map(
        put, params, specs,
        is_leaf=lambda x: x is None or isinstance(x, jnp.ndarray))


def make_tp_forward(mesh: Mesh, cfg: ModelConfig, params: Dict[str, Any],
                    kernel: str = "xla", dtype=jnp.float32):
    """shard_map'd full-sequence forward: (params, ids [B,T]) -> logits."""
    tp = mesh.shape[TP_AXIS]
    cfg_local = local_config(cfg, tp)
    pspecs = param_pspecs(params)

    def local_fwd(p, ids):
        logits, _ = forward(p, cfg_local, ids, kernel=kernel, dtype=dtype,
                            tp_axis=TP_AXIS)
        return logits

    fwd = shard_map(local_fwd, mesh=mesh,
                    in_specs=(pspecs, P(DP_AXIS, None)),
                    out_specs=P(DP_AXIS, None, None),
                    check_vma=False)
    return jax.jit(fwd)


def make_tp_decode(mesh: Mesh, cfg: ModelConfig, params: Dict[str, Any],
                   kernel: str = "xla", dtype=jnp.bfloat16):
    """shard_map'd cached decode/prefill step for tensor-parallel serving.

    The KV cache shards on the head axis (each device holds its local
    heads' cache); activations stay replicated between blocks via the two
    per-block psums.  Returns (step_fn, init_cache_fn):

      step_fn(params, ids [B,T], cache) -> (logits [B, vocab], cache)
    """
    from ..models.transformer import KVCache, forward, init_cache

    tp = mesh.shape[TP_AXIS]
    cfg_local = local_config(cfg, tp)
    pspecs = param_pspecs(params)
    cache_spec = KVCache(k=P(None, DP_AXIS, None, TP_AXIS, None),
                         v=P(None, DP_AXIS, None, TP_AXIS, None),
                         length=P())

    def local_step(p, ids, cache):
        logits, cache = forward(p, cfg_local, ids, cache=cache,
                                kernel=kernel, dtype=dtype, tp_axis=TP_AXIS)
        return logits[:, -1], cache

    step = shard_map(local_step, mesh=mesh,
                     in_specs=(pspecs, P(DP_AXIS, None), cache_spec),
                     out_specs=(P(DP_AXIS, None), cache_spec),
                     check_vma=False)
    jstep = jax.jit(step)

    def make_cache(batch: int, max_len: int, cache_dtype=jnp.bfloat16):
        c = init_cache(cfg, batch, max_len, dtype=cache_dtype)
        return jax.device_put(c, jax.tree_util.tree_map(
            lambda s: NamedSharding(mesh, s), cache_spec,
            is_leaf=lambda x: isinstance(x, P)))

    return jstep, make_cache


def make_tp_train_step(mesh: Mesh, cfg: ModelConfig, params: Dict[str, Any],
                       kernel: str = "xla", dtype=jnp.float32,
                       lr: float = 1e-4):
    """shard_map'd training step: next-token CE loss + SGD on float params.

    Fine-tunes exactly what the reference's QuantMatMul makes trainable
    (owq/quant.py:221-259): weak columns (oweight) and any dense params;
    packed integer codes get no gradient (stop_gradient in the dequant
    path + allow_int).  Gradients are psum-averaged over 'dp'.
    """
    tp = mesh.shape[TP_AXIS]
    cfg_local = local_config(cfg, tp)
    pspecs = param_pspecs(params)

    def local_step(p, ids):
        def loss_fn(p):
            logits, _ = forward(p, cfg_local, ids[:, :-1], kernel=kernel,
                                dtype=dtype, tp_axis=TP_AXIS)
            logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
            tgt = ids[:, 1:]
            nll = -jnp.take_along_axis(logp, tgt[..., None], axis=-1)
            return jnp.mean(nll)

        loss, grads = jax.value_and_grad(loss_fn, allow_int=True)(p)
        loss = jax.lax.pmean(loss, DP_AXIS)
        grads = jax.tree_util.tree_map(
            lambda g: (jax.lax.pmean(g, DP_AXIS)
                       if hasattr(g, "dtype") and
                       jnp.issubdtype(g.dtype, jnp.floating) else g),
            grads)

        def upd(param, g):
            if (hasattr(g, "dtype") and jnp.issubdtype(g.dtype, jnp.floating)
                    and hasattr(param, "dtype")
                    and jnp.issubdtype(param.dtype, jnp.floating)):
                return param - lr * g.astype(param.dtype)
            return param

        new_p = jax.tree_util.tree_map(upd, p, grads)
        return new_p, loss

    step = shard_map(local_step, mesh=mesh,
                     in_specs=(pspecs, P(DP_AXIS, None)),
                     out_specs=(pspecs, P()),
                     check_vma=False)
    return jax.jit(step)
