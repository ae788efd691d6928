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
from ..models.transformer import ExpertBank, forward, stack_experts
from ..runtime.quant_linear import (
    DenseLinear,
    PackedLinear,
    ShardedPackedLinear,
    shard_packed_rowwise,
)
from .mesh import DP_AXIS, TP_AXIS

__all__ = ["shard_model_tp", "param_pspecs", "make_tp_forward",
           "make_tp_train_step", "local_config", "prepare_decode_fast_tp"]

# dotted paths (within a block) of row-parallel linears
_ROW_PARALLEL = {"attn.o", "mlp.down", "mlp.fc2"}
_COL_PARALLEL = {"attn.q", "attn.k", "attn.v", "attn.qkv", "mlp.gate",
                 "mlp.up", "mlp.gateup", "mlp.fc1", "attn.q_b",
                 "attn.kv_b"}
# small latent projections (MLA) and routers compute redundantly per shard
_REPLICATED = {"attn.q_a", "attn.kv_a", "mlp.router", "mlp.shared_gate"}


def local_config(cfg: ModelConfig, tp: int) -> ModelConfig:
    """Per-shard config: local head counts, global head_dim pinned.

    Fused-QKV families (bloom/falcon) are split into separate q/k/v at
    shard time (see _split_fused_qkv), so the local config clears
    fused_qkv; MQA (1 kv head) replicates k/v on every shard.
    """
    if cfg.num_heads % tp or (cfg.num_kv_heads % tp and cfg.num_kv_heads > 1):
        raise ValueError(
            f"heads {cfg.num_heads}/{cfg.num_kv_heads} not divisible by tp={tp}")
    if cfg.num_experts and cfg.num_experts % tp:
        raise ValueError(
            f"experts {cfg.num_experts} not divisible by tp={tp}")
    return dataclasses.replace(
        cfg,
        num_heads=cfg.num_heads // tp,
        num_kv_heads=max(cfg.num_kv_heads // tp, 1),
        # MoE shards whole experts (EP), not the inner ffn dim
        intermediate_size=(cfg.intermediate_size if cfg.num_experts
                           else cfg.intermediate_size // tp),
        head_dim_override=cfg.head_dim,
        fused_qkv=False,
        tp_size=tp,
    )


def _select_cols(lin, cols):
    """Column (output-feature) subset of a dense or packed linear."""
    import numpy as np

    cols = jnp.asarray(np.asarray(cols, np.int32))
    if isinstance(lin, PackedLinear):
        return PackedLinear(
            qweight=jnp.take(lin.qweight, cols, axis=1),
            scales=jnp.take(lin.scales, cols),
            zeros=jnp.take(lin.zeros, cols),
            oweight=jnp.take(lin.oweight, cols, axis=1),
            out_ids=lin.out_ids,
            bias=None if lin.bias is None else jnp.take(lin.bias, cols),
            bits=lin.bits, in_features=lin.in_features)
    return DenseLinear(
        w=jnp.take(lin.w, cols, axis=1),
        b=None if lin.b is None else jnp.take(lin.b, cols))


def _split_fused_qkv(blk: Dict[str, Any], cfg: ModelConfig) -> None:
    """Replace attn.qkv with separate q/k/v linears (layout-aware)."""
    import numpy as np

    attn = blk["attn"]
    if "qkv" not in attn:
        return
    lin = attn.pop("qkv")
    H, Hkv, hd = cfg.num_heads, cfg.num_kv_heads, cfg.head_dim
    idx = np.arange(lin.out_features)
    if cfg.family in ("llama", "opt", "gpt2", "mpt"):
        # plain [q | k | v] concat (gpt2 c_attn / mpt Wqkv / runtime-fused)
        qc = idx[: H * hd]
        kc = idx[H * hd: (H + Hkv) * hd]
        vc = idx[(H + Hkv) * hd:]
    elif cfg.family in ("bloom", "neox"):
        # [H, 3, hd] interleave
        i3 = idx.reshape(H, 3, hd)
        qc, kc, vc = i3[:, 0].ravel(), i3[:, 1].ravel(), i3[:, 2].ravel()
    elif Hkv == 1:
        # falcon MQA: [H*hd | hd | hd]
        qc = idx[: H * hd]
        kc = idx[H * hd: H * hd + hd]
        vc = idx[H * hd + hd:]
    else:
        # falcon GQA/new-arch: [Hkv, H//Hkv + 2, hd]
        g = idx.reshape(Hkv, H // Hkv + 2, hd)
        qc = g[:, :-2].ravel()
        kc = g[:, -2].ravel()
        vc = g[:, -1].ravel()
    attn["q"] = _select_cols(lin, qc)
    attn["k"] = _select_cols(lin, kc)
    attn["v"] = _select_cols(lin, vc)


def _shard_block(blk: Dict[str, Any], cfg: ModelConfig, tp: int
                 ) -> Dict[str, Any]:
    if cfg.fused_qkv:
        _split_fused_qkv(blk, cfg)
    if isinstance(blk.get("mlp", {}).get("experts"), list):
        # expert parallelism: stack whole experts along a leading axis that
        # shards across the 'tp' axis; router stays replicated
        blk["mlp"]["experts"] = stack_experts(blk["mlp"]["experts"])
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
        _shard_block(blk, cfg, tp)
    return params, local_config(cfg, tp)


def _fuse_cols_tp(lins, tp: int):
    """Concat linears along the output axis with columns GROUPED PER TP
    SHARD: [l0_s | l1_s | ...] for s = 0..tp-1, so a contiguous
    P(None, 'tp') column shard IS the shard-local fused projection.
    (A plain concat would give shard s a mix of the components' columns.)
    """
    import numpy as np

    from ..runtime.fuse import fuse_linears

    fused = fuse_linears(lins)
    outs = [l.out_features for l in lins]
    off = np.cumsum([0] + outs)
    cols = [np.arange(off[i] + s * (outs[i] // tp),
                      off[i] + (s + 1) * (outs[i] // tp))
            for s in range(tp) for i in range(len(lins))]
    return _select_cols(fused, np.concatenate(cols))


def _fast_block_ok_tp(cfg: ModelConfig, blk: Dict[str, Any], tp: int) -> bool:
    """Structure gate for the TP fused-decode fastpath: the llama-class
    subset of runtime.fuse._fast_block_ok, on TP-sharded blocks (separate
    q/k/v column-parallel PackedLinears + row-parallel
    ShardedPackedLinears for o/down)."""
    from ..kernels.gemv_fused import fused_applicable

    if not (cfg.do_layer_norm_before and cfg.input_norms):
        return False
    if cfg.norm_type != "rmsnorm" or not cfg.gated_mlp:
        return False
    if (cfg.parallel_block or cfg.branch_norms or cfg.sub_norms
            or cfg.residual_multiplier is not None or cfg.attn_gate):
        return False
    if cfg.num_kv_heads < tp or cfg.num_kv_heads % tp:
        return False  # MQA replicates k/v — no shard-interleaved fuse
    for k in ("conv", "mamba", "zshared", "moa", "gdn", "lightning"):
        if k in blk:
            return False
    attn, mlp = blk.get("attn"), blk.get("mlp")
    if attn is None or mlp is None or "experts" in mlp:
        return False
    if blk.get("ln1") is None or blk.get("ln2") is None:
        return False
    cols = [attn.get("q"), attn.get("k"), attn.get("v"),
            mlp.get("gate"), mlp.get("up")]
    rows = [attn.get("o"), mlp.get("down")]
    if not all(isinstance(l, PackedLinear) and l.layout == "paired"
               and l.out_features % tp == 0 for l in cols):
        return False
    if not all(isinstance(l, ShardedPackedLinear) for l in rows):
        return False
    qkv_out = sum(l.out_features for l in cols[:3]) // tp
    gu_out = sum(l.out_features for l in cols[3:]) // tp
    nw_in = cols[0].qweight.shape[0]
    nw_o = rows[0].qweight.shape[1]
    nw_dn = rows[1].qweight.shape[1]
    return (fused_applicable(8, qkv_out, nw_in)
            and fused_applicable(8, gu_out, nw_in)
            and fused_applicable(8, rows[0].oweight.shape[-1], nw_o)
            and fused_applicable(8, rows[1].oweight.shape[-1], nw_dn))


def prepare_decode_fast_tp(params: Dict[str, Any], cfg: ModelConfig,
                           tp: int) -> Tuple[Dict[str, Any], ModelConfig]:
    """TP serving transform — the tensor-parallel analogue of
    runtime.fuse.prepare_decode_fast, applied AFTER shard_model_tp.

    Fuses q|k|v and gate|up with shard-interleaved column order
    (_fuse_cols_tp) so each device's contiguous column shard is its local
    fused projection, and attaches per-block ``fast`` aux: column-parallel
    aux from make_fast_aux (shards along the fused out axis with the
    weights), row-parallel aux from make_fast_aux_sharded (leading shard
    axis).  block_forward then runs the fused matvec kernels per shard
    with psum epilogues (BASELINE configs #5/#6: 13b/70b-class sharded
    decode no longer drops to the slow path).

    All-or-nothing: if any block fails the structure gate, params are
    returned unchanged (cfg.fused_qkv stays False).  Call BEFORE
    place_params; a no-op when tp == 1 shapes don't divide.
    """
    from ..kernels.gemv_fused import make_fast_aux
    from ..runtime.fuse import make_fast_aux_sharded

    if cfg.fused_qkv:  # bloom/falcon-style native fused qkv: not supported
        return params, local_config(cfg, tp)
    if not all(_fast_block_ok_tp(cfg, blk, tp) for blk in params["layers"]):
        return params, local_config(cfg, tp)
    for blk in params["layers"]:
        attn, mlp = blk["attn"], blk["mlp"]
        attn["qkv"] = _fuse_cols_tp(
            [attn.pop("q"), attn.pop("k"), attn.pop("v")], tp)
        mlp["gateup"] = _fuse_cols_tp([mlp.pop("gate"), mlp.pop("up")], tp)
        blk["fast"] = {
            "qkv": make_fast_aux(attn["qkv"], gamma=blk["ln1"]["w"]),
            "o": make_fast_aux_sharded(attn["o"]),
            "gu": make_fast_aux(mlp["gateup"], gamma=blk["ln2"]["w"]),
            "dn": make_fast_aux_sharded(mlp["down"]),
        }
    return params, dataclasses.replace(local_config(cfg, tp),
                                       fused_qkv=True)


def _expert_bank_spec(bank: ExpertBank) -> ExpertBank:
    """Leading expert axis shards over 'tp' (expert parallelism); every
    per-expert array stays whole within a shard."""
    def one(lin):
        if isinstance(lin, PackedLinear):
            return PackedLinear(
                qweight=P(TP_AXIS, None, None), scales=P(TP_AXIS, None),
                zeros=P(TP_AXIS, None), oweight=P(TP_AXIS, None, None),
                out_ids=P(TP_AXIS, None),
                bias=None if lin.bias is None else P(TP_AXIS, None),
                bits=lin.bits, in_features=lin.in_features)
        return DenseLinear(w=P(TP_AXIS, None, None),
                           b=None if lin.b is None else P(TP_AXIS, None))

    return ExpertBank(gate=one(bank.gate), up=one(bank.up),
                      down=one(bank.down))


def _linear_spec(name: str, lin, replicate: bool = False) -> Any:
    """PartitionSpec pytree for one linear."""
    if isinstance(lin, ExpertBank):
        return _expert_bank_spec(lin)
    if name in _REPLICATED:  # routers + MLA latent projections (tiny)
        replicate = True
    if replicate:
        if isinstance(lin, PackedLinear):
            return PackedLinear(
                qweight=P(), scales=P(), zeros=P(), oweight=P(), out_ids=P(),
                bias=None if lin.bias is None else P(),
                bits=lin.bits, in_features=lin.in_features)
        return DenseLinear(w=P(), b=None if lin.b is None else P())
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


def param_pspecs(params: Dict[str, Any],
                 cfg: Optional[ModelConfig] = None) -> Any:
    """PartitionSpec pytree mirroring a TP-sharded param tree.

    With a (global) cfg for an MQA family (1 kv head), k/v are replicated
    instead of head-sharded.
    """
    mqa = cfg is not None and cfg.num_kv_heads == 1

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
            if key.startswith(("ln", "post_ln")):
                bspec[key] = norm_spec(val)
            elif key == "fast":
                # fused-decode aux (prepare_decode_fast_tp): column-
                # parallel aux shards along the fused out axis with the
                # weights; row-parallel aux carries a leading shard axis
                def aux_spec(name, aux):
                    col = name in ("qkv", "gu")
                    sp = {}
                    for k2, v2 in aux.items():
                        if v2 is None:
                            sp[k2] = None
                        elif k2 in ("sz", "bias", "ow") and col:
                            sp[k2] = P(None, TP_AXIS)
                        elif k2 in ("sel", "ow") and not col:
                            sp[k2] = P(TP_AXIS, None, None)
                        else:  # gamma, replicated sel (col), sz/bias (row)
                            sp[k2] = P()
                    return sp

                bspec[key] = {n: aux_spec(n, a) for n, a in val.items()}
            else:
                # qk-norm weights: per-head ('head') norms replicate; whole-
                # projection ('proj', olmo2) norms shard with the column-
                # parallel q/k out-features (the rms reduction psums)
                qk_spec = ({"w": P(TP_AXIS)}
                           if cfg is not None and cfg.qk_norm == "proj"
                           else None)
                def leaf_spec(leaf, lin):
                    if key in ("mamba", "gdn", "lightning", "conv"):
                        # linear mixers: replicated (computed redundantly per
                        # shard; attention/mlp still shard and psum) — their
                        # params are small next to the mlp/expert weights
                        return (_linear_spec(f"{key}.{leaf}", lin,
                                             replicate=True)
                                if hasattr(lin, "apply") else
                                norm_spec(lin) if isinstance(lin, dict)
                                else P())
                    if leaf.endswith("_norm"):
                        return qk_spec or norm_spec(lin)
                    if leaf == "router_bias":  # raw array (v3 noaux-tc bias)
                        return P()
                    if leaf == "sinks":  # gpt-oss per-head sink logits
                        return P(TP_AXIS)
                    if leaf in ("shared", "act"):  # small sub-trees (deepseek
                        # shared experts / apertus xielu params): replicated
                        return {k2: (_linear_spec(f"{key}.{leaf}.{k2}", l2,
                                                  replicate=True)
                                     if hasattr(l2, "apply") else P())
                                for k2, l2 in lin.items()}
                    if (not hasattr(lin, "apply")
                            and not isinstance(lin, ExpertBank)):
                        return P()  # raw array leaf
                    return _linear_spec(
                        f"{key}.{leaf}", lin,
                        replicate=(mqa and key == "attn"
                                   and leaf in ("k", "v")))

                bspec[key] = {leaf: leaf_spec(leaf, lin)
                              for leaf, lin in val.items()}
        blocks.append(bspec)
    specs["layers"] = blocks
    return specs


def place_params(params: Dict[str, Any], mesh: Mesh,
                 cfg: Optional[ModelConfig] = None) -> Dict[str, Any]:
    """device_put the param tree according to its TP partition specs."""
    specs = param_pspecs(params, cfg)

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
    pspecs = param_pspecs(params, cfg)

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
    if params["layers"] and params["layers"][0].get("fast") is not None:
        # params went through prepare_decode_fast_tp: blocks carry the
        # shard-interleaved fused projections
        cfg_local = dataclasses.replace(cfg_local, fused_qkv=True)
    pspecs = param_pspecs(params, cfg)
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
    pspecs = param_pspecs(params, cfg)

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
