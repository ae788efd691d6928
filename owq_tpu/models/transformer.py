"""Generic causal decoder covering the reference's model families.

One parameterized forward (OPT / LLaMA / BLOOM / Falcon) instead of the
reference's four HuggingFace module trees; family differences are static
branches resolved at trace time from ModelConfig, so each configuration
compiles to a dedicated XLA program.

Params are plain pytrees (dicts + DenseLinear/PackedLinear dataclasses) —
no framework modules — which makes layer-wise quantization a pure tree
transformation.  Every linear that the reference quantizes
(model_config.json:2-97) is addressable by the same dotted names used in
ArchSpec ("attn.q", "mlp.down", ...), and ``block_forward`` can return the
exact input activations of any of them ("taps") for Hessian accumulation —
the JAX-native replacement for the reference's forward hooks
(main.py:112-120).
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any, Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from .config import ModelConfig
from .layers import (
    activation,
    alibi_bias,
    apply_rope,
    attention_core,
    causal_mask_bias,
    layernorm,
    rmsnorm,
    rmsnorm1p,
    rope_cos_sin,
)
from ..runtime.quant_linear import DenseLinear, PackedLinear, ShardedPackedLinear

__all__ = ["KVCache", "QuantKVCache", "ExpertBank", "block_forward",
           "forward", "embed", "unembed", "init_cache", "init_quant_cache",
           "QUANTIZABLE", "quantizable_names", "layer_mask_biases",
           "layer_rope", "HybridCache", "init_hybrid_cache"]

# Ablation/debug switches: False routes T==1 decode through the generic
# scatter-then-attend path instead of the patched attention (bf16:
# attention_core kv_patch; int8: attention_core_q8).  Differential tests
# (CPU: tests/test_batching.py; on-chip: tools/verify_tpu.py section 9)
# flip these to compare the branches on identical cache state; serving
# always leaves them on.
_QUANT_PATCHED_DECODE = True
_DELTA_DECODE = True

# dotted linear names per family (quantization targets)
QUANTIZABLE = {
    "opt": ("attn.q", "attn.k", "attn.v", "attn.o", "mlp.fc1", "mlp.fc2"),
    "llama": ("attn.q", "attn.k", "attn.v", "attn.o", "mlp.gate", "mlp.up",
              "mlp.down"),
    "bloom": ("attn.qkv", "attn.o", "mlp.fc1", "mlp.fc2"),
    "falcon": ("attn.qkv", "attn.o", "mlp.fc1", "mlp.fc2"),
    "neox": ("attn.qkv", "attn.o", "mlp.fc1", "mlp.fc2"),
    "gpt2": ("attn.qkv", "attn.o", "mlp.fc1", "mlp.fc2"),
    "gptj": ("attn.q", "attn.k", "attn.v", "attn.o", "mlp.fc1", "mlp.fc2"),
    "phi": ("attn.q", "attn.k", "attn.v", "attn.o", "mlp.fc1", "mlp.fc2"),
    "mpt": ("attn.qkv", "attn.o", "mlp.fc1", "mlp.fc2"),
    "starcoder2": ("attn.q", "attn.k", "attn.v", "attn.o", "mlp.fc1",
                   "mlp.fc2"),
    "olmo": ("attn.q", "attn.k", "attn.v", "attn.o", "mlp.gate", "mlp.up",
             "mlp.down"),
    "nemotron": ("attn.q", "attn.k", "attn.v", "attn.o", "mlp.fc1",
                 "mlp.fc2"),
    "persimmon": ("attn.qkv", "attn.o", "mlp.fc1", "mlp.fc2"),
    "gpt_neo": ("attn.q", "attn.k", "attn.v", "attn.o", "mlp.fc1",
                "mlp.fc2"),
    "codegen": ("attn.q", "attn.k", "attn.v", "attn.o", "mlp.fc1",
                "mlp.fc2"),
}


def quantizable_names(cfg: ModelConfig) -> Tuple[str, ...]:
    """Dotted quantization-target names for a config.

    MoE models enumerate per-expert linears (the router stays fp, like the
    reference keeps lm_head fp); dense models use the family table.  For
    heterogeneous-layer models (deepseek: dense first-k blocks, then MoE
    with shared experts) this is the union over layers — callers filter to
    the names actually present in each block.
    """
    if cfg.zamba_block:
        return ("attn.q", "attn.k", "attn.v", "attn.o", "zshared.gateup",
                "zshared.down", "zshared.proj", "mamba.in_proj",
                "mamba.out_proj")
    if cfg.family == "jetmoe":
        names = ["attn.kv"]
        for e in range(cfg.num_experts):
            names += [f"moa.experts.{e}.q", f"moa.experts.{e}.out",
                      f"mlp.experts.{e}.gate", f"mlp.experts.{e}.up",
                      f"mlp.experts.{e}.down"]
        return tuple(names)
    if (cfg.has_mamba or cfg.has_gdn or cfg.has_lightning
            or cfg.has_shortconv or cfg.has_griffin):
        names = ["attn.q", "attn.k", "attn.v", "attn.o"]
        if cfg.has_griffin:
            names += ["griffin.y", "griffin.x", "griffin.out"]
        if cfg.has_shortconv:
            names += ["conv.in_proj", "conv.out_proj"]
        if cfg.has_lightning:
            names += ["lightning.qkv_proj", "lightning.output_gate",
                      "lightning.out_proj"]
        if cfg.has_mamba:
            names += ["mamba.in_proj", "mamba.out_proj"]
            if cfg.mamba_version == 1:
                names += ["mamba.x_proj", "mamba.dt_proj"]
        if cfg.has_gdn:
            names += ["gdn.in_proj_qkvz", "gdn.in_proj_ba", "gdn.out_proj"]
        if cfg.num_experts:
            for e in range(cfg.num_experts):
                names += [f"mlp.experts.{e}.gate", f"mlp.experts.{e}.up",
                          f"mlp.experts.{e}.down"]
            if cfg.n_shared_experts:
                names += ["mlp.shared.gate", "mlp.shared.up",
                          "mlp.shared.down"]
        else:
            names += ["mlp.gate", "mlp.up", "mlp.down"]
        return tuple(names)
    if cfg.mla:
        attn = ((("attn.q",) if cfg.q_lora_rank is None
                 else ("attn.q_a", "attn.q_b"))
                + ("attn.kv_a", "attn.kv_b", "attn.o"))
    elif cfg.num_experts:
        attn = (("attn.qkv", "attn.o") if cfg.fused_qkv
                else ("attn.q", "attn.k", "attn.v", "attn.o"))
    else:
        return QUANTIZABLE[cfg.family]
    names = list(attn)
    if cfg.num_experts:
        if cfg.first_k_dense > 0 or cfg.moe_dense_layers:
            names += ["mlp.gate", "mlp.up", "mlp.down"]
        for e in range(cfg.num_experts):
            names += [f"mlp.experts.{e}.gate", f"mlp.experts.{e}.up",
                      f"mlp.experts.{e}.down"]
        if cfg.n_shared_experts:
            names += ["mlp.shared.gate", "mlp.shared.up", "mlp.shared.down"]
    else:
        names += ["mlp.gate", "mlp.up", "mlp.down"]
    return tuple(names)


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class ExpertBank:
    """Expert-parallel form of an MoE mlp: per-expert linears stacked along
    a leading expert axis so a single array shards across the mesh
    ('tp'/'ep' axis).  ``gate``/``up``/``down`` are DenseLinear/PackedLinear
    whose arrays carry an extra leading [E_local] dim; ``index_expert``
    slices one expert back out for the per-expert matmuls."""

    gate: Any
    up: Any
    down: Any

    @property
    def n_local(self) -> int:
        lin = self.gate
        arr = lin.w if hasattr(lin, "w") else lin.qweight
        return arr.shape[0]


def stack_experts(experts: Sequence[Dict[str, Any]]) -> ExpertBank:
    """List-of-expert-dicts (canonical form) -> stacked ExpertBank."""
    def stack(lins):
        proto = lins[0]
        return jax.tree_util.tree_map(lambda *a: jnp.stack(a), *lins)

    return ExpertBank(gate=stack([e["gate"] for e in experts]),
                      up=stack([e["up"] for e in experts]),
                      down=stack([e["down"] for e in experts]))


def index_expert(bank: ExpertBank, e: int) -> Dict[str, Any]:
    """Slice expert ``e`` (static index) out of a stacked bank."""
    pick = lambda lin: jax.tree_util.tree_map(lambda a: a[e], lin)
    return {"gate": pick(bank.gate), "up": pick(bank.up),
            "down": pick(bank.down)}


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class KVCache:
    """Static-shape KV cache: k/v [L, B, S_max, H_kv, hd].

    ``length`` is the number of tokens already cached — a scalar for
    lockstep batches, or a vector [B] for per-slot lengths (continuous
    batching: each slot advances independently).
    """

    k: jnp.ndarray
    v: jnp.ndarray
    length: jnp.ndarray  # int32 scalar or [B]

    @property
    def max_len(self) -> int:
        return self.k.shape[2]


def init_cache(cfg: ModelConfig, batch: int, max_len: int,
               dtype=jnp.bfloat16):
    if (cfg.has_mamba or cfg.has_gdn or cfg.has_lightning
            or cfg.has_shortconv or cfg.has_griffin):
        return init_hybrid_cache(cfg, batch, max_len, dtype=dtype)
    base = (cfg.num_layers, batch, max_len, cfg.num_kv_heads)
    return KVCache(k=jnp.zeros(base + (cfg.head_dim,), dtype),
                   v=jnp.zeros(base + (cfg.v_dim,), dtype),
                   length=jnp.zeros((), jnp.int32))


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class QuantKVCache:
    """Int8 KV cache with per-(token, head) absmax scales.

    Halves serving cache memory vs bf16 (the KV cache, not the weights,
    bounds batch x context on long-context serving).  Quantization is
    symmetric absmax over the head dim at write time; dequantization fuses
    into the attention reads.  Same interface as KVCache.
    """

    k: jnp.ndarray        # int8 [L, B, S, Hkv, hd]
    v: jnp.ndarray
    k_scale: jnp.ndarray  # f32 [L, B, S, Hkv]
    v_scale: jnp.ndarray
    length: jnp.ndarray

    @property
    def max_len(self) -> int:
        return self.k.shape[2]


def init_quant_cache(cfg: ModelConfig, batch: int, max_len: int) -> QuantKVCache:
    base = (cfg.num_layers, batch, max_len, cfg.num_kv_heads)
    return QuantKVCache(
        k=jnp.zeros(base + (cfg.head_dim,), jnp.int8),
        v=jnp.zeros(base + (cfg.v_dim,), jnp.int8),
        k_scale=jnp.ones(base, jnp.float32),
        v_scale=jnp.ones(base, jnp.float32),
        length=jnp.zeros((), jnp.int32))


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class HybridCache:
    """Cache for hybrid mamba2/attention models (bamba class).

    ``kv`` serves the attention layers (mamba layers' slices stay zero);
    ``conv`` [L, B, conv_dim, K] holds each mamba layer's last K raw
    projected inputs, ``ssm`` [L, B, H, P, N] its recurrent state.
    """

    kv: KVCache
    conv: jnp.ndarray
    ssm: jnp.ndarray

    @property
    def length(self):
        return self.kv.length

    @property
    def max_len(self) -> int:
        return self.kv.max_len


def hybrid_state_shapes(cfg: ModelConfig):
    """(conv [C,K], state [H,P,N]) per-layer shapes for the linear mixer."""
    if cfg.has_griffin:
        return ((cfg.griffin_lru_width, cfg.griffin_conv_width - 1),
                (cfg.griffin_lru_width,))
    if cfg.has_lightning:
        return ((1, 1), (cfg.num_heads, cfg.head_dim, cfg.head_dim))
    if cfg.has_shortconv:
        return ((cfg.hidden_size, cfg.shortconv_L), (1, 1, 1))
    if cfg.has_gdn:
        g = cfg.gdn_spec()
        return ((g.conv_dim, g.d_conv),
                (g.num_v_heads, g.head_k_dim, g.head_v_dim))
    spec = cfg.mamba_spec()
    if cfg.mamba_version == 1:
        return ((spec.conv_dim, spec.d_conv),
                (spec.intermediate, spec.d_state))
    return ((spec.conv_dim, spec.d_conv),
            (spec.num_heads, spec.head_dim, spec.d_state))


def init_hybrid_cache(cfg: ModelConfig, batch: int, max_len: int,
                      dtype=jnp.bfloat16) -> HybridCache:
    cshape, sshape = hybrid_state_shapes(cfg)
    return HybridCache(
        kv=KVCache(
            k=jnp.zeros((cfg.num_layers, batch, max_len, cfg.num_kv_heads,
                         cfg.head_dim), dtype),
            v=jnp.zeros((cfg.num_layers, batch, max_len, cfg.num_kv_heads,
                         cfg.v_dim), dtype),
            length=jnp.zeros((), jnp.int32)),
        conv=jnp.zeros((cfg.num_layers, batch) + cshape, jnp.float32),
        ssm=jnp.zeros((cfg.num_layers, batch) + sshape, jnp.float32))


def _quantize_kv(x: jnp.ndarray):
    """[B, T, H, hd] -> (int8 codes, f32 scales [B, T, H])."""
    amax = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=-1)
    scale = jnp.maximum(amax, 1e-8)
    q = jnp.round(x.astype(jnp.float32) / scale[..., None] * 127.0)
    return q.astype(jnp.int8), scale


def rope_inv_freq(cfg: ModelConfig, seq_len: Optional[int] = None):
    """(inv_freq [rot/2] or None, attention_factor) for cfg.rope_scaling.

    Implements the HF rope_type schemes (modeling_rope_utils.py semantics):
    linear, dynamic (NTK-by-length), yarn, llama3, longrope.  ``seq_len`` is
    the *static* planned sequence length — the allocated cache window or the
    prompt length — used by the length-dependent types (dynamic/longrope);
    defaults to cfg.max_position_embeddings, matching HF's init-time value.
    Returns (None, 1.0) when no scaling is configured (default schedule).
    """
    import math

    if cfg.rope_scaling is None:
        return None, 1.0
    sc = dict(cfg.rope_scaling)
    kind = sc.get("rope_type") or sc.get("type") or "default"
    rot = cfg.rotary_dim or int(cfg.head_dim * cfg.rotary_pct)
    rot -= rot % 2
    base = cfg.rope_theta
    if seq_len is None:
        seq_len = cfg.max_position_embeddings
    exps = jnp.arange(0, rot, 2, dtype=jnp.float32) / rot
    inv_freq = 1.0 / (base ** exps)

    if kind in ("default", "none"):
        return None, 1.0
    if kind == "linear":
        return inv_freq / sc["factor"], 1.0
    if kind == "dynamic":
        # NTK-by-parts: grow theta with the planned length beyond the
        # pretraining window (identity at or below it)
        factor = sc["factor"]
        mpe = sc.get("original_max_position_embeddings",
                     cfg.max_position_embeddings)
        s = max(seq_len, mpe)
        base_d = base * ((factor * s / mpe) - (factor - 1)) ** (rot / (rot - 2))
        return 1.0 / (base_d ** exps), 1.0
    if kind == "llama3":
        factor = sc["factor"]
        lo_f, hi_f = sc["low_freq_factor"], sc["high_freq_factor"]
        old_ctx = sc["original_max_position_embeddings"]
        wavelen = 2 * math.pi / inv_freq
        scaled = jnp.where(wavelen > old_ctx / lo_f, inv_freq / factor,
                           inv_freq)
        smooth = (old_ctx / wavelen - lo_f) / (hi_f - lo_f)
        mid = (1 - smooth) * scaled / factor + smooth * scaled
        medium = (wavelen >= old_ctx / hi_f) & (wavelen <= old_ctx / lo_f)
        return jnp.where(medium, mid, scaled), 1.0
    if kind == "yarn":
        factor = sc["factor"]
        attn = sc.get("attention_factor")
        mscale, mscale_all = sc.get("mscale"), sc.get("mscale_all_dim")

        def get_mscale(scale, m=1.0):
            return 1.0 if scale <= 1 else 0.1 * m * math.log(scale) + 1.0

        if attn is None:
            if mscale and mscale_all:
                attn = get_mscale(factor, mscale) / get_mscale(factor,
                                                               mscale_all)
            else:
                attn = get_mscale(factor)
        beta_fast = sc.get("beta_fast") or 32
        beta_slow = sc.get("beta_slow") or 1
        old_ctx = sc.get("original_max_position_embeddings",
                         cfg.max_position_embeddings)

        def corr_dim(n_rot):
            return (rot * math.log(old_ctx / (n_rot * 2 * math.pi))
                    / (2 * math.log(base)))

        low, high = corr_dim(beta_fast), corr_dim(beta_slow)
        if sc.get("truncate", True):
            low, high = math.floor(low), math.ceil(high)
        low, high = max(low, 0), min(high, rot - 1)
        if low == high:
            high += 0.001
        ramp = jnp.clip((jnp.arange(rot // 2, dtype=jnp.float32) - low)
                        / (high - low), 0, 1)
        extrap_w = 1.0 - ramp
        return (inv_freq / factor * (1 - extrap_w)
                + inv_freq * extrap_w), float(attn)
    if kind == "longrope":
        # phi-3 style per-dim rescale factors; short vs long chosen by the
        # planned window vs the pretraining window
        orig = sc.get("original_max_position_embeddings",
                      cfg.max_position_embeddings)
        ext = jnp.asarray(sc["long_factor"] if seq_len > orig
                          else sc["short_factor"], jnp.float32)
        attn = sc.get("attention_factor")
        if attn is None:
            factor = sc.get("factor") or cfg.max_position_embeddings / orig
            attn = (1.0 if factor <= 1.0
                    else math.sqrt(1 + math.log(factor) / math.log(orig)))
        return inv_freq / ext, float(attn)
    raise NotImplementedError(f"rope_scaling type {kind!r}")


def rope_tables(cfg: ModelConfig, positions: jnp.ndarray, dtype=jnp.float32,
                seq_len: Optional[int] = None):
    """Config-aware cos/sin tables: partial rotary (rotary_pct/rotary_dim),
    pairing style (half vs gptj-interleaved), and RoPE scaling resolved in
    one place."""
    rot = cfg.rotary_dim or int(cfg.head_dim * cfg.rotary_pct)
    rot -= rot % 2
    inv_freq, attn_factor = rope_inv_freq(cfg, seq_len)
    return rope_cos_sin(positions, rot, cfg.rope_theta, dtype=dtype,
                        style=cfg.rope_style, inv_freq=inv_freq,
                        attn_factor=attn_factor)


def model_rope_tables(cfg: ModelConfig, positions: jnp.ndarray,
                      dtype=jnp.float32, seq_len: Optional[int] = None):
    """Rope tables for every layer of the model.

    With ``cfg.rope_local_theta`` set (gemma3 / olmo3) returns a
    (global, local) pair: sliding_attention layers use the local base
    frequency WITHOUT rope_scaling (HF keeps a second rotary embedding
    with rope_type='default'); layer_rope() picks per layer.  Otherwise
    one shared table.
    """
    g = rope_tables(cfg, positions, dtype, seq_len)
    if cfg.rope_local_theta is None:
        return g
    import dataclasses

    lcfg = dataclasses.replace(cfg, rope_theta=cfg.rope_local_theta,
                               rope_scaling=None, rope_local_theta=None)
    return (g, rope_tables(lcfg, positions, dtype, seq_len))


def _norm(p: Dict[str, jnp.ndarray], cfg: ModelConfig, x: jnp.ndarray) -> jnp.ndarray:
    if cfg.norm_type == "rmsnorm":
        return rmsnorm(x, p["w"], cfg.norm_eps)
    if cfg.norm_type == "rmsnorm1p":
        return rmsnorm1p(x, p["w"], cfg.norm_eps)
    if cfg.norm_type == "layernorm_np":  # olmo: no scale/bias params
        return layernorm(x, jnp.ones((x.shape[-1],), jnp.float32), None,
                         cfg.norm_eps)
    if cfg.norm_type == "layernorm1p":  # nemotron: LN with (1 + weight)
        return layernorm(x, 1.0 + p["w"].astype(jnp.float32), p.get("b"),
                         cfg.norm_eps)
    return layernorm(x, p["w"], p.get("b"), cfg.norm_eps)


def _qk_norm(p: Dict[str, jnp.ndarray], cfg: ModelConfig, x: jnp.ndarray,
             tp_axis: Optional[str] = None) -> jnp.ndarray:
    """RMS-normalize q/k before rope (qwen3 per-head / olmo2 per-projection).

    Under TP with per-projection norm, the reduction spans all heads, so
    the local sum of squares is psum'd and divided by the global width.
    """
    x32 = x.astype(jnp.float32)
    if cfg.qk_norm == "head_ln":
        # mean-centering LN over head_dim, applied per head before rope
        # (cohere: per-head weights [H, hd], no bias; persimmon: shared
        # weights [hd] + bias)
        mu = jnp.mean(x32, axis=-1, keepdims=True)
        var = jnp.mean((x32 - mu) ** 2, axis=-1, keepdims=True)
        y = (x32 - mu) * jax.lax.rsqrt(var + cfg.norm_eps)
        y = y * p["w"].astype(jnp.float32)
        if p.get("b") is not None:
            y = y + p["b"].astype(jnp.float32)
        return y.astype(x.dtype)
    if tp_axis is not None and cfg.tp_size > 1:
        ss = jax.lax.psum(jnp.sum(x32 * x32, axis=-1, keepdims=True), tp_axis)
        ms = ss / (x.shape[-1] * cfg.tp_size)
    else:
        ms = jnp.mean(x32 * x32, axis=-1, keepdims=True)
    y = x32 * jax.lax.rsqrt(ms + cfg.norm_eps)
    w = p["w"].astype(jnp.float32)
    if cfg.norm_type == "rmsnorm1p":  # gemma-style zero-centered weights
        w = 1.0 + w
    return (y * w).astype(x.dtype)


def _mlp_act(mlp: Dict[str, Any], cfg: ModelConfig,
             h: jnp.ndarray) -> jnp.ndarray:
    """Plain-MLP activation; xIELU (apertus) carries learnable params."""
    if cfg.activation == "xielu":
        a = mlp["act"]
        h32 = h.astype(jnp.float32)
        beta = a["beta"].astype(jnp.float32)
        eps = a["eps"].astype(jnp.float32)
        ap = jax.nn.softplus(a["alpha_p"].astype(jnp.float32))
        an = beta + jax.nn.softplus(a["alpha_n"].astype(jnp.float32))
        y = jnp.where(h32 > 0,
                      ap * h32 * h32 + beta * h32,
                      (jnp.expm1(jnp.minimum(h32, eps)) - h32) * an
                      + beta * h32)
        return y.astype(h.dtype)
    return activation(h, cfg.activation)


def _lin(p, x, kernel: str) -> jnp.ndarray:
    if isinstance(p, (PackedLinear, ShardedPackedLinear, DenseLinear)):
        return p.apply(x, kernel=kernel)
    if type(p).__name__ == "LoraLinear":  # avoid runtime<->models import cycle
        return p.apply(x, kernel=kernel)
    return p.apply(x)


def _split_qkv(cfg: ModelConfig, fused: jnp.ndarray
               ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Family-specific fused-QKV layouts -> q [B,T,H,hd], k/v [B,T,Hkv,hd]."""
    B, T = fused.shape[:2]
    H, Hkv, hd = cfg.num_heads, cfg.num_kv_heads, cfg.head_dim
    if cfg.family in ("bloom", "neox", "persimmon"):
        f = fused.reshape(B, T, H, 3, hd)
        return f[:, :, :, 0], f[:, :, :, 1], f[:, :, :, 2]
    if cfg.family != "falcon":
        # gpt2 c_attn, mpt Wqkv, dbrx Wqkv, and runtime-fused projections
        # (fuse_block_projections) on ANY separate-projection family:
        # plain [q | k | v] concat
        q = fused[..., : H * hd].reshape(B, T, H, hd)
        k = fused[..., H * hd: (H + Hkv) * hd].reshape(B, T, Hkv, hd)
        v = fused[..., (H + Hkv) * hd:].reshape(B, T, Hkv, hd)
        return q, k, v
    # falcon
    if Hkv == H:  # no MQA/GQA: same [H, 3, hd] interleave as bloom new-arch
        f = fused.reshape(B, T, Hkv, -1, hd)
        q, k, v = f[:, :, :, :-2], f[:, :, :, -2], f[:, :, :, -1]
        return q.reshape(B, T, H, hd), k, v
    f = fused.reshape(B, T, Hkv, H // Hkv + 2, hd)
    q = f[:, :, :, :-2].reshape(B, T, H, hd)
    k = f[:, :, :, -2]
    v = f[:, :, :, -1]
    return q, k, v


def _attention_part(blk, cfg: ModelConfig, x_ln, res, *, B, T,
                    mask_bias, rope, alibi, attn_temp, kv, cache_at,
                    kernel, taps, tapped, tp_axis, kv_delta=False,
                    fast=None):
    """The attention half of a decoder block: q/k/v (dense, fused,
    or MLA), rope/qk-norms, cache update, attention core, o-proj.
    Returns (attn_out, k_full, v_full); taps write into ``tapped``.

    ``kv_delta``: return only the NEW tokens' (k, v) (cache dtype;
    with scales when the cache is quantized) instead of the updated
    full per-layer caches.  The caller then writes the [B, T] slab
    straight into its stacked cache — an 8KB dynamic-update-slice
    instead of restaging the whole layer cache (which cost ~0.18
    ms/token on a llama-7b decode step, xplane-measured).  Attention
    itself still runs over the updated full cache either way.
    """
    H, Hkv, hd = cfg.num_heads, cfg.num_kv_heads, cfg.head_dim
    x = res  # mask/cache shapes reference the block input
    attn_p = blk["attn"]
    attn_gate = None  # only the separate-q branch may rebind (qwen3-next)

    if cfg.mla:
        # deepseek multi-head latent attention: low-rank q/kv projections;
        # rope covers only the last qk_rope_head_dim lanes of each q head
        # and ONE shared key slice broadcast to all heads (the MQA trick);
        # v has its own (smaller) head dim.
        dn, dr = cfg.qk_nope_head_dim, cfg.qk_rope_head_dim
        if "q" in attn_p:  # no q-lora (deepseek-v2-lite)
            if "attn.q" in taps:
                tapped["attn.q"] = x_ln
            q = _lin(attn_p["q"], x_ln, kernel)
        else:
            if "attn.q_a" in taps:
                tapped["attn.q_a"] = x_ln
            q_lat = _lin(attn_p["q_a"], x_ln, kernel)
            q_lat = rmsnorm(q_lat, attn_p["q_a_norm"]["w"], cfg.norm_eps)
            if "attn.q_b" in taps:
                tapped["attn.q_b"] = q_lat
            q = _lin(attn_p["q_b"], q_lat, kernel)
        q = q.reshape(B, T, H, dn + dr)
        q_nope, q_rot = q[..., :dn], q[..., dn:]
        if "attn.kv_a" in taps:
            tapped["attn.kv_a"] = x_ln
        ckv = _lin(attn_p["kv_a"], x_ln, kernel)
        kv_lat, k_rot = ckv[..., :cfg.kv_lora_rank], ckv[..., cfg.kv_lora_rank:]
        kv_lat = rmsnorm(kv_lat, attn_p["kv_a_norm"]["w"], cfg.norm_eps)
        if "attn.kv_b" in taps:
            tapped["attn.kv_b"] = kv_lat
        kvp = _lin(attn_p["kv_b"], kv_lat, kernel)
        kvp = kvp.reshape(B, T, H, dn + cfg.v_dim)
        k_nope, v = kvp[..., :dn], kvp[..., dn:]
        k_rot = k_rot.reshape(B, T, 1, dr)
        if rope is not None:
            q_rot, k_rot = apply_rope(q_rot, k_rot, *rope,
                                      style=cfg.rope_style)
        q = jnp.concatenate([q_nope, q_rot], axis=-1)
        k = jnp.concatenate(
            [k_nope, jnp.broadcast_to(k_rot, (B, T, H, dr))], axis=-1)
    elif cfg.fused_qkv:
        if "attn.qkv" in taps:
            tapped["attn.qkv"] = x_ln
        if fast is not None:
            # fused decode fastpath: x_ln is the RAW block input; the
            # kernel applies ln1 + qkv + weak columns in one pass
            # (kernels/gemv_fused.py, aux from prepare_decode_fast)
            from ..kernels.gemv_fused import fused_call

            qkv = fused_call(x_ln, attn_p["qkv"], fast["qkv"],
                             pre="rmsnorm", eps=cfg.norm_eps)
        else:
            qkv = _lin(attn_p["qkv"], x_ln, kernel)
        if cfg.qkv_clip is not None:  # mpt clip_qkv
            qkv = jnp.clip(qkv, -cfg.qkv_clip, cfg.qkv_clip)
        q, k, v = _split_qkv(cfg, qkv)
    else:
        for name in ("attn.q", "attn.k", "attn.v"):
            if name in taps:
                tapped[name] = x_ln
        q = _lin(attn_p["q"], x_ln, kernel)
        if cfg.attn_gate:  # qwen3-next: per-head [query | gate] halves
            qg = q.reshape(B, T, H, 2 * hd)
            q = qg[..., :hd].reshape(B, T, H * hd)
            attn_gate = qg[..., hd:].reshape(B, T, H * hd)
        k = _lin(attn_p["k"], x_ln, kernel)
        v = _lin(attn_p["v"], x_ln, kernel)
        if cfg.qk_norm == "proj":  # olmo2/olmoe: rms over the projection
            q = _qk_norm(attn_p["q_norm"], cfg, q, tp_axis)
            k = _qk_norm(attn_p["k_norm"], cfg, k, tp_axis)
        if cfg.qkv_clip is not None:  # olmo/olmoe clip_qkv
            clip = lambda t: jnp.clip(t, -cfg.qkv_clip, cfg.qkv_clip)
            q, k, v = clip(q), clip(k), clip(v)
        q = q.reshape(B, T, H, hd)
        k = k.reshape(B, T, Hkv, hd)
        v = v.reshape(B, T, Hkv, hd)

    if not cfg.mla:
        if cfg.qk_norm in ("head", "head_ln"):  # qwen3 rms / cohere ln
            q = _qk_norm(attn_p["q_norm"], cfg, q, None)
            k = _qk_norm(attn_p["k_norm"], cfg, k, None)
        if rope is not None:
            q, k = apply_rope(q, k, *rope, style=cfg.rope_style)
            if cfg.qk_norm == "l2":  # llama4: weightless rms AFTER rope
                l2 = lambda t: (t.astype(jnp.float32) * jax.lax.rsqrt(
                    jnp.mean(jnp.square(t.astype(jnp.float32)), axis=-1,
                             keepdims=True) + cfg.norm_eps)).astype(t.dtype)
                q, k = l2(q), l2(k)
        if cfg.qk_norm == "head_post":  # hunyuan: per-head rms AFTER rope
            q = _qk_norm(attn_p["q_norm"], cfg, q, None)
            k = _qk_norm(attn_p["k_norm"], cfg, k, None)
    if attn_temp is not None:  # llama4 NoPE-layer temperature tuning
        q = (q.astype(jnp.float32)
             * attn_temp[:, :, None, None]).astype(q.dtype)

    kv_patch = None
    if kv is not None:
        quantized = len(kv) == 4
        if quantized:
            k_cache, v_cache, ks_cache, vs_cache = kv
            (k_w, k_s), (v_w, v_s) = _quantize_kv(k), _quantize_kv(v)
        else:
            k_cache, v_cache = kv
            k_w, v_w = k.astype(k_cache.dtype), v.astype(v_cache.dtype)
        if quantized and kv_delta and T == 1 and _QUANT_PATCHED_DECODE \
                and cfg.attn_logit_softcap is None and not cfg.attn_sinks:
            # decode step on the QUANTIZED delta path: attend the raw
            # int8 cache directly (scales fold out of the hd-contraction
            # — attention_core_q8), patch the new token at score/value
            # level, and hand back only the quantized new-row slab for
            # the stacked delta write.  No dequantized bf16 copy of the
            # [B, S, Hkv, hd] slice is ever materialized — the engine's
            # attention traffic drops to the int8 bytes themselves
            # (half the bf16-cache bound that dominates b16/b32).
            from .layers import attention_core_q8

            bias = mask_bias if alibi is None else mask_bias + alibi
            scale = (cfg.attn_scale if cfg.attn_scale is not None
                     else (cfg.attn_scale_override or hd) ** -0.5)
            ctx = attention_core_q8(q, k_cache, v_cache, ks_cache,
                                    vs_cache, bias, scale,
                                    kv_patch=(k, v, cache_at))
            return _attn_epilogue(blk, cfg, ctx, res, attn_gate, B, T, H,
                                  hd, taps, tapped, kernel, fast, tp_axis,
                                  (k_w, k_s), (v_w, v_s), attn_p)
        if not quantized and kv_delta and T == 1 and _DELTA_DECODE:
            # decode step on the delta path: forward writes the new row
            # into the stack itself, and attention runs over the RAW
            # cache slice with the new token patched in at score/value
            # level (attention_core kv_patch) — no updated copy of the
            # whole [B, S, Hkv, hd] slice is ever materialized (xplane:
            # that staging cost ~1 ms/step on the b8 engine).
            kv_patch = (k_w, v_w, cache_at)
            k_att, v_att = k_cache.astype(x.dtype), v_cache.astype(x.dtype)
            k_full, v_full = k_w, v_w
            bias = mask_bias if alibi is None else mask_bias + alibi
            scale = (cfg.attn_scale if cfg.attn_scale is not None
                     else (cfg.attn_scale_override or hd) ** -0.5)
            ctx = attention_core(
                q, k_att, v_att, bias, scale,
                softcap=cfg.attn_logit_softcap,
                sinks=attn_p.get("sinks") if cfg.attn_sinks else None,
                kv_patch=kv_patch)
            return _attn_epilogue(blk, cfg, ctx, res, attn_gate, B, T, H,
                                  hd, taps, tapped, kernel, fast, tp_axis,
                                  k_full, v_full, attn_p)
        if cache_at.ndim == 0:
            upd = lambda c, n: jax.lax.dynamic_update_slice(
                c, n, (0, cache_at) + (0,) * (c.ndim - 2))
        else:
            bidx = jnp.arange(B, dtype=jnp.int32)[:, None]
            sidx = cache_at[:, None] + jnp.arange(T, dtype=jnp.int32)[None, :]
            upd = lambda c, n: c.at[bidx, sidx].set(n)
        k_full = upd(k_cache, k_w)
        v_full = upd(v_cache, v_w)
        if quantized:
            ks_full = upd(ks_cache, k_s)
            vs_full = upd(vs_cache, v_s)
            k_att = (k_full.astype(jnp.float32)
                     * (ks_full[..., None] / 127.0)).astype(x.dtype)
            v_att = (v_full.astype(jnp.float32)
                     * (vs_full[..., None] / 127.0)).astype(x.dtype)
            k_full = (k_full, ks_full)
            v_full = (v_full, vs_full)
        else:
            k_att, v_att = k_full.astype(x.dtype), v_full.astype(x.dtype)
        if kv_delta:  # hand back just the new tokens' slab
            if quantized:
                k_full, v_full = (k_w, k_s), (v_w, v_s)
            else:
                k_full, v_full = k_w, v_w
    else:
        k_full, v_full = k, v
        k_att, v_att = k, v

    bias = mask_bias if alibi is None else mask_bias + alibi
    scale = (cfg.attn_scale if cfg.attn_scale is not None
             else (cfg.attn_scale_override or hd) ** -0.5)
    ctx = attention_core(q, k_att, v_att, bias, scale,
                         softcap=cfg.attn_logit_softcap,
                         sinks=attn_p.get("sinks") if cfg.attn_sinks else None)
    return _attn_epilogue(blk, cfg, ctx, res, attn_gate, B, T, H, hd,
                          taps, tapped, kernel, fast, tp_axis,
                          k_full, v_full, attn_p)


def _attn_epilogue(blk, cfg: ModelConfig, ctx, res, attn_gate, B, T, H, hd,
                   taps, tapped, kernel, fast, tp_axis, k_full, v_full,
                   attn_p):
    """Shared tail of the attention half: gate / sub-norm / tap / o-proj."""
    ctx = ctx.reshape(B, T, H * (cfg.v_dim if cfg.mla else hd))
    if cfg.attn_gate:
        ctx = (ctx.astype(jnp.float32)
               * jax.nn.sigmoid(attn_gate.astype(jnp.float32))
               ).astype(ctx.dtype)
    if cfg.sub_norms:  # bitnet attn_sub_norm (before the tap so Hessians
        # for o-proj quantization see the true layer input)
        ctx = rmsnorm(ctx, attn_p["o_norm"]["w"], cfg.norm_eps)
    if "attn.o" in taps:
        tapped["attn.o"] = ctx
    if fast is not None:
        # o-proj with the residual add fused in-kernel: returns the
        # post-attention hidden stream directly (block_forward skips
        # its own residual add on this path).  Under TP the output is a
        # row-parallel partial sum: the residual moves OUT of the kernel
        # and block_forward adds it after the psum.
        from ..kernels.gemv_fused import fused_call

        attn_out = fused_call(ctx, attn_p["o"], fast["o"],
                              res=res if tp_axis is None else None)
    else:
        attn_out = _lin(attn_p["o"], ctx, kernel)
    return attn_out, k_full, v_full


def _moa_part(blk, cfg: ModelConfig, x_ln, *, B, T, mask_bias, rope, kv,
              cache_at, kernel, taps, tapped):
    """JetMoE mixture-of-attention (JetMoeMoA/JetMoeAttention): per-token
    top-k attention experts, each a (q-projection, out-projection) pair
    sharing ONE fused kv projection.  Computed densely: every expert's
    queries attend (E*Hkv heads vs the shared Hkv kv heads) and each
    expert's out-projection is weighted by its routing probability
    (softmax over the top-k router logits; 0 when not selected) — exactly
    the HF grouped-scatter computation, MXU-shaped and static.
    Returns (attn_out, k_full, v_full)."""
    ma = blk["moa"]
    E, K = cfg.num_experts, cfg.num_experts_per_tok
    Hkv, hd = cfg.num_kv_heads, cfg.head_dim

    logits = _lin(ma["router"], x_ln, kernel).astype(jnp.float32)
    topl, topi = jax.lax.top_k(logits, K)
    topv = jax.nn.softmax(topl, axis=-1)           # jetmoe top-k gating

    if "attn.kv" in taps:
        tapped["attn.kv"] = x_ln
    kvp = _lin(ma["kv"], x_ln, kernel)
    k, v = jnp.split(kvp, 2, axis=-1)
    k = k.reshape(B, T, Hkv, hd)
    v = v.reshape(B, T, Hkv, hd)

    w_es = []
    qs = []
    for e in range(E):
        w_e = jnp.sum(jnp.where(topi == e, topv, 0.0), axis=-1)   # [B,T]
        w_es.append(w_e)
        tn = f"moa.experts.{e}.q"
        if tn in taps:  # routing-weighted Hessians (cf. mixtral experts)
            tapped[tn] = x_ln * jnp.sqrt(w_e)[..., None].astype(x_ln.dtype)
        qs.append(_lin(ma["experts"][e]["q"], x_ln, kernel
                       ).reshape(B, T, Hkv, hd))
    # kv-head-major head order [h0e0, h0e1, ...] so attention_core's
    # interleaved GQA repeat pairs every expert with its kv head
    q_all = jnp.stack(qs, axis=3).reshape(B, T, Hkv * E, hd)
    if rope is not None:
        q_all, k = apply_rope(q_all, k, *rope, style=cfg.rope_style)

    if kv is not None:
        k_cache, v_cache = kv
        if B == 1 or k_cache.shape[0] == 1:
            upd = lambda c, n: jax.lax.dynamic_update_slice(
                c, n, (0, cache_at) + (0,) * (c.ndim - 2))
        else:
            bidx = jnp.arange(B, dtype=jnp.int32)[:, None]
            sidx = cache_at[:, None] + jnp.arange(T, dtype=jnp.int32)[None, :]
            upd = lambda c, n: c.at[bidx, sidx].set(n)
        k_full = upd(k_cache, k.astype(k_cache.dtype))
        v_full = upd(v_cache, v.astype(v_cache.dtype))
        k_att = k_full.astype(x_ln.dtype)
        v_att = v_full.astype(x_ln.dtype)
    else:
        k_full, v_full = k, v
        k_att, v_att = k, v

    ctx = attention_core(q_all, k_att, v_att, mask_bias, hd ** -0.5)
    ctx = ctx.reshape(B, T, Hkv, E, hd).transpose(0, 1, 3, 2, 4)
    ctx = ctx.reshape(B, T, E, Hkv * hd)
    attn_out = jnp.broadcast_to(ma["bias"].astype(x_ln.dtype),
                                (B, T, ma["bias"].shape[-1]))
    for e in range(E):
        w_e = w_es[e][..., None].astype(x_ln.dtype)
        tn = f"moa.experts.{e}.out"
        if tn in taps:
            tapped[tn] = ctx[:, :, e] * jnp.sqrt(
                w_es[e])[..., None].astype(x_ln.dtype)
        attn_out = attn_out + w_e * _lin(ma["experts"][e]["out"],
                                         ctx[:, :, e], kernel)
    return attn_out, k_full, v_full


def block_forward(blk: Dict[str, Any], cfg: ModelConfig, x: jnp.ndarray, *,
                  mask_bias: jnp.ndarray,
                  rope: Optional[Tuple[jnp.ndarray, jnp.ndarray]] = None,
                  alibi: Optional[jnp.ndarray] = None,
                  kv: Optional[Tuple[jnp.ndarray, jnp.ndarray]] = None,
                  cache_at: Optional[jnp.ndarray] = None,
                  kernel: str = "xla",
                  taps: Sequence[str] = (),
                  tp_axis: Optional[str] = None,
                  attn_temp: Optional[jnp.ndarray] = None,
                  valid_len: Optional[jnp.ndarray] = None,
                  ssm: Optional[Tuple[jnp.ndarray, jnp.ndarray]] = None,
                  alpha_beta: Optional[Tuple[float, float, float, float]]
                  = None,
                  embed0: Optional[jnp.ndarray] = None,
                  kv_delta: bool = False,
                  attn_stacks=None,
                  ) -> Tuple[jnp.ndarray, Tuple[jnp.ndarray, jnp.ndarray],
                             Dict[str, jnp.ndarray]]:
    """One decoder block.

    x: [B, T, hidden].  kv: optional cache (k, v) [B, S_max, Hkv, hd] to
    update in-place at position ``cache_at``; when None, attention runs over
    the current T tokens only.  Returns (y, (k_full, v_full), taps).

    With ``tp_axis`` set (inside shard_map), the block runs Megatron-style
    tensor parallelism: q/k/v/gate/up/fc1 are column-parallel (local heads /
    local ffn slice), o/down/fc2 are row-parallel and their outputs are
    psum-reduced over the axis — two collectives per block riding ICI.
    """
    B, T, _ = x.shape
    H, Hkv, hd = cfg.num_heads, cfg.num_kv_heads, cfg.head_dim
    tapped: Dict[str, jnp.ndarray] = {}

    zs = blk.get("zshared")
    z_kv = None
    if zs is not None:
        # zamba2 hybrid layer (Zamba2HybridLayer): the shared transformer
        # block runs as a PREFIX on concat([x, embeddings]) — attention
        # with in-width 2*hidden, then pre-ff norm, a fused gate|up MLP,
        # and a per-layer linear — and its output is ADDED to x before the
        # mamba layer below.  No residual adds inside the prefix itself.
        cat = jnp.concatenate([x, embed0.astype(x.dtype)], axis=-1)
        z = rmsnorm(cat, zs["ln_in"]["w"], cfg.norm_eps)
        z_attn, zk, zv = _attention_part(
            blk, cfg, z, x, B=B, T=T, mask_bias=mask_bias, rope=rope,
            alibi=alibi, attn_temp=attn_temp, kv=kv, cache_at=cache_at,
            kernel=kernel, taps=taps, tapped=tapped, tp_axis=tp_axis)
        f = rmsnorm(z_attn, zs["ln2"]["w"], cfg.norm_eps)
        if "zshared.gateup" in taps:
            tapped["zshared.gateup"] = f
        gu = _lin(zs["gateup"], f, kernel)
        g, u = jnp.split(gu, 2, axis=-1)
        hgu = activation(g, cfg.activation) * u
        if "zshared.down" in taps:
            tapped["zshared.down"] = hgu
        t = _lin(zs["down"], hgu, kernel)
        if "zshared.proj" in taps:
            tapped["zshared.proj"] = t
        z_add = _lin(zs["proj"], t, kernel)
        z_kv = (zk, zv)
        kv = None  # the attention cache was consumed by the prefix

    # OPT-350m style post-norm: LN applied after the residual add
    # (HF OPTDecoderLayer with do_layer_norm_before=False).
    pre_norm = cfg.do_layer_norm_before

    res = x
    # Fused decode fastpath (kernels/gemv_fused.py): active when the
    # serving transform attached blk["fast"] (prepare_decode_fast gates
    # on block structure) AND this call is a small-row cached decode
    # step outside TP/taps.  Norms, the scale/zero correction, weak
    # columns and residual adds all run inside the matmul kernels, so
    # the scan body holds no per-step glue between weight streams.
    fast = None
    if (blk.get("fast") is not None
            and (kv is not None or attn_stacks is not None) and not taps
            and alpha_beta is None and zs is None
            and B * T <= 32 and x.dtype == jnp.bfloat16):
        # under TP the aux was built per shard (prepare_decode_fast_tp);
        # the row-parallel fused calls drop their in-kernel residual and
        # the block psums before adding it (see below)
        fast = blk["fast"]
    # forward only passes attn_stacks when every block-level fast gate
    # holds (prepare_decode_fast sets params["fast_attn"] iff all blocks
    # carry "fast"); a disagreement here would silently drop the cache
    assert attn_stacks is None or fast is not None, \
        "attn_stacks passed to a block without the fused fastpath"
    if attn_stacks is not None:
        # FULL-LAYER mega kernel (kernels/decode_block.py): rmsnorm ->
        # qkv matvec -> rope -> in-place cache append -> attention ->
        # o-proj -> residual -> ln2 -> gate|up -> swiglu -> down ->
        # residual as ONE pallas program — the o weights prefetch during
        # the qkv stream, the gate|up ring starts during the o matvec and
        # the down ring during the swiglu, so the HBM weight stream
        # crosses the whole layer without a gap.  Caches updated IN PLACE
        # on the [L, 1, S, Hkv, hd] stacks (forward skips its own cache
        # writes).  Gated by forward on B == T == 1 and the
        # plain-causal/full-rotary llama-class subset.
        from ..kernels.decode_block import (layer_block_reference,
                                            layer_block_step)

        attn_p, mlp_p = blk["attn"], blk["mlp"]
        ks, vs, li = attn_stacks
        rep = cfg.num_heads // cfg.num_kv_heads
        hd = cfg.head_dim
        scale = (cfg.attn_scale if cfg.attn_scale is not None
                 else (cfg.attn_scale_override or hd) ** -0.5)
        cos, sin = rope
        fn = (layer_block_step if jax.default_backend() == "tpu"
              else layer_block_reference)
        sg = partial(jax.tree_util.tree_map, jax.lax.stop_gradient)
        qa, oa = fast["qkv"], fast["o_attn"]
        ga, da = fast["gu"], fast["dn"]
        h, ks2, vs2 = fn(x.reshape(1, -1).astype(jnp.bfloat16), ks, vs,
                         cache_at, cos.reshape(1, hd), sin.reshape(1, hd),
                         sg(attn_p["qkv"].qweight), sg(qa),
                         sg(oa["qweight"]), sg(oa),
                         sg(mlp_p["gateup"].qweight), sg(ga),
                         sg(mlp_p["down"].qweight), sg(da),
                         bits=attn_p["qkv"].bits, layer=li,
                         scale=float(scale), eps=cfg.norm_eps, rep=rep)
        return h.reshape(B, T, -1), (ks2, vs2), tapped
    # zamba2: the prefix output is added to the NORM input only — the
    # mamba residual stays the pre-add hidden (Zamba2MambaDecoderLayer)
    norm_in = x if zs is None else x + z_add
    if fast is not None:
        x_ln = norm_in  # ln1 runs inside the fused qkv kernel
    else:
        x_ln = (_norm(blk.get("ln1"), cfg, norm_in)
                if pre_norm and cfg.input_norms else norm_in)
    if alpha_beta is not None:  # minimax deepnorm-style residual
        res = x_ln
    conv_f = ssm_f = None
    # linear mixers run REPLICATED under TP (every shard computes the full
    # mixer from replicated params — see parallel/partition.py leaf_spec),
    # so their output must NOT be psum-reduced like row-parallel attention
    attn_reduced = False
    if "conv" in blk:
        # lfm2 gated short conv; the cache is just the conv window
        from .ssm import shortconv_full, shortconv_step

        L = cfg.shortconv_L
        state_in = ssm if ssm is not None else kv
        if state_in is not None and T == 1:
            m_out, c_new = shortconv_step(blk["conv"], L, x_ln, state_in[0],
                                          kernel=kernel)
        elif state_in is not None:
            m_out, c_new, t2 = shortconv_full(
                blk["conv"], L, x_ln, kernel=kernel, taps=taps,
                conv_state=state_in[0])
            tapped.update(t2)
        else:
            m_out, c_new, t2 = shortconv_full(
                blk["conv"], L, x_ln, kernel=kernel, taps=taps,
                valid_len=valid_len)
            tapped.update(t2)
        conv_f = c_new
        ssm_f = (state_in[1] if state_in is not None
                 else jnp.zeros((B, 1, 1, 1), jnp.float32))
    elif "lightning" in blk:
        # minimax decay linear attention; the state is a per-head KV matrix
        from .lightning import lightning_full, lightning_step

        lspec = cfg.lightning_spec()
        state_in = ssm if ssm is not None else kv
        if state_in is not None and T == 1:
            m_out, s_new = lightning_step(
                blk["lightning"], lspec, x_ln, state_in[1],
                eps=cfg.norm_eps, kernel=kernel)
        elif state_in is not None:
            m_out, s_new, t2 = lightning_full(
                blk["lightning"], lspec, x_ln, eps=cfg.norm_eps,
                kernel=kernel, taps=taps, state=state_in[1])
            tapped.update(t2)
        else:
            m_out, s_new, t2 = lightning_full(
                blk["lightning"], lspec, x_ln, eps=cfg.norm_eps,
                kernel=kernel, taps=taps, valid_len=valid_len)
            tapped.update(t2)
        # the conv slot is a dummy [1,1] placeholder for lightning layers
        conv_f = (state_in[0] if state_in is not None
                  else jnp.zeros((B, 1, 1), jnp.float32))
        ssm_f = s_new
    elif "mamba" in blk:
        # mamba-2 mixer (bamba/granite-4 hybrid layers; falcon-h1 runs it
        # in PARALLEL with attention on the same normed input).  With a
        # cache and T==1 the recurrent single-step update runs (exact even
        # from a zero state); multi-token with a live cache (prefill into
        # a fresh slot, speculative verification, chained windows) runs
        # the chunked SSD form continuing exactly from the cached states.
        from .ssm import mamba1_full, mamba1_step, mamba2_full, mamba2_step

        if cfg.mamba_version == 1:
            mamba2_full, mamba2_step = mamba1_full, mamba1_step
        spec = cfg.mamba_spec()
        state_in = ssm if ssm is not None else (
            kv if "attn" not in blk else None)
        if state_in is not None and T == 1:
            conv_in, ssm_in = state_in
            m_out, (conv_f, ssm_f) = mamba2_step(
                blk["mamba"], spec, x_ln, conv_in, ssm_in,
                eps=cfg.norm_eps, kernel=kernel)
        elif state_in is not None:
            conv_in, ssm_in = state_in
            m_out, (conv_f, ssm_f), t2 = mamba2_full(
                blk["mamba"], spec, x_ln, eps=cfg.norm_eps,
                kernel=kernel, taps=taps, conv_state=conv_in,
                ssm_state=ssm_in)
            tapped.update(t2)
        else:
            m_out, (conv_f, ssm_f), t2 = mamba2_full(
                blk["mamba"], spec, x_ln, eps=cfg.norm_eps,
                kernel=kernel, taps=taps, valid_len=valid_len)
            tapped.update(t2)
    if "griffin" in blk:
        # recurrentgemma RG-LRU block (griffin.py); same HybridCache slots
        # as mamba layers (conv raw-input window + a recurrent vector)
        from .griffin import griffin_full, griffin_step

        gs = cfg.griffin_spec()
        state_in = ssm if ssm is not None else kv
        if state_in is not None and T == 1:
            conv_in, rec_in = state_in
            attn_out, (k_full, v_full) = griffin_step(
                blk["griffin"], gs, x_ln, conv_in, rec_in,
                eps=cfg.norm_eps, kernel=kernel)
        elif state_in is not None:
            conv_in, rec_in = state_in
            attn_out, (k_full, v_full), t2 = griffin_full(
                blk["griffin"], gs, x_ln, eps=cfg.norm_eps, kernel=kernel,
                taps=taps, conv_state=conv_in, rec_state=rec_in,
                pos_start=cache_at)
            tapped.update(t2)
        else:
            attn_out, (k_full, v_full), t2 = griffin_full(
                blk["griffin"], gs, x_ln, eps=cfg.norm_eps, kernel=kernel,
                taps=taps, valid_len=valid_len)
            tapped.update(t2)
        attn_reduced = True
    elif "gdn" in blk:
        # gated-delta-net linear attention (qwen3-next); same cache slots
        # as mamba layers (conv raw-input window + a recurrent matrix)
        from .gdn import gdn_full, gdn_step

        gspec = cfg.gdn_spec()
        state_in = ssm if ssm is not None else kv
        if state_in is not None and T == 1:
            conv_in, rec_in = state_in
            attn_out, (k_full, v_full) = gdn_step(
                blk["gdn"], gspec, x_ln, conv_in, rec_in,
                eps=cfg.norm_eps, kernel=kernel)
        elif state_in is not None:
            conv_in, rec_in = state_in
            attn_out, (k_full, v_full), t2 = gdn_full(
                blk["gdn"], gspec, x_ln, eps=cfg.norm_eps, kernel=kernel,
                taps=taps, conv_state=conv_in, rec_state=rec_in)
            tapped.update(t2)
        else:
            attn_out, (k_full, v_full), t2 = gdn_full(
                blk["gdn"], gspec, x_ln, eps=cfg.norm_eps, kernel=kernel,
                taps=taps, valid_len=valid_len)
            tapped.update(t2)
        attn_reduced = True
    elif "moa" in blk:  # jetmoe mixture-of-attention
        attn_out, k_full, v_full = _moa_part(
            blk, cfg, x_ln, B=B, T=T, mask_bias=mask_bias, rope=rope,
            kv=kv, cache_at=cache_at, kernel=kernel, taps=taps,
            tapped=tapped)
    elif "attn" in blk and zs is None:
        attn_out, k_full, v_full = _attention_part(
            blk, cfg, x_ln, res, B=B, T=T, mask_bias=mask_bias,
            rope=rope, alibi=alibi, attn_temp=attn_temp, kv=kv,
            cache_at=cache_at, kernel=kernel, taps=taps,
            tapped=tapped, tp_axis=tp_axis,
            kv_delta=kv_delta and "mamba" not in blk, fast=fast)
        if conv_f is not None:  # falcon-h1: parallel sum of both mixers.
            # o_proj output is row-parallel partial sums but the mamba half
            # is replicated: reduce the attention half alone before adding
            if tp_axis is not None:
                attn_out = jax.lax.psum(attn_out, tp_axis)
            attn_reduced = True
            attn_out = attn_out + m_out
            k_full = (k_full, conv_f)
            v_full = (v_full, ssm_f)
    else:
        attn_out, k_full, v_full = m_out, conv_f, ssm_f
        attn_reduced = True

    if cfg.parallel_block:
        # falcon-style: mlp reads the same LN output; one residual add.
        # neox-style (parallel_dual_norm): mlp has its own LN over the
        # block input — x + attn(ln1(x)) + mlp(ln2(x)).
        # cohere-style: same single-LN parallel wiring but a gated SwiGLU mlp.
        mlp_in = _norm(blk.get("ln2"), cfg, res) if cfg.parallel_dual_norm else x_ln
        if cfg.gated_mlp:
            for name in ("mlp.gate", "mlp.up"):
                if name in taps:
                    tapped[name] = mlp_in
            g = _lin(blk["mlp"]["gate"], mlp_in, kernel)
            u = _lin(blk["mlp"]["up"], mlp_in, kernel)
            h = activation(g, cfg.activation) * u
            if "mlp.down" in taps:
                tapped["mlp.down"] = h
            mlp_out = _lin(blk["mlp"]["down"], h, kernel)
        else:
            if "mlp.fc1" in taps:
                tapped["mlp.fc1"] = mlp_in
            h = _mlp_act(blk["mlp"], cfg,
                         _lin(blk["mlp"]["fc1"], mlp_in, kernel))
            if "mlp.fc2" in taps:
                tapped["mlp.fc2"] = h
            mlp_out = _lin(blk["mlp"]["fc2"], h, kernel)
        both = attn_out + mlp_out
        if tp_axis is not None:
            both = jax.lax.psum(both, tp_axis)
        if cfg.residual_multiplier is not None:
            both = both * cfg.residual_multiplier
        y = res + both
        return y, (k_full, v_full), tapped

    if tp_axis is not None and not attn_reduced:
        attn_out = jax.lax.psum(attn_out, tp_axis)
    if cfg.branch_norms:  # gemma2/olmo2/glm4: norm the branch before the add
        attn_out = _norm(blk.get("post_ln1"), cfg, attn_out)
    if cfg.residual_multiplier is not None:  # granite
        attn_out = attn_out * cfg.residual_multiplier

    if fast is not None and tp_axis is None:
        x = attn_out  # residual added inside the fused o-proj kernel
    elif alpha_beta is not None:
        x = res * alpha_beta[0] + attn_out * alpha_beta[1]
    else:
        x = res + attn_out
    if "mlp" not in blk:  # pure-SSM blocks (mamba2 LMs): norm+mixer only
        if not pre_norm:
            x = _norm(blk.get("ln1"), cfg, x)
        if z_kv is not None:  # zamba2 hybrid: dual (attention + ssm) cache
            return x, ((z_kv[0], k_full), (z_kv[1], v_full)), tapped
        return x, (k_full, v_full), tapped
    if not pre_norm:
        x = _norm(blk.get("ln1"), cfg, x)
    res = x
    if fast is not None:
        x_ln2 = x  # ln2 runs inside the fused gateup kernel
    else:
        x_ln2 = (_norm(blk.get("ln2"), cfg, x)
                 if pre_norm and cfg.input_norms else x)
    if alpha_beta is not None:
        res = x_ln2
    mlp = blk["mlp"]
    if cfg.num_experts and "experts" in mlp:
        # Sparse MoE, computed densely: every (local) expert processes all
        # tokens and is weighted by its routing probability (0 for tokens
        # not routed to it).  Dense compute keeps the matmuls MXU-shaped
        # and static; under expert parallelism each shard holds E/tp whole
        # experts and the weighted sum is psum-reduced.  Deepseek blocks
        # below first_k_dense have a plain gated mlp and skip this branch.
        E, K = cfg.num_experts, cfg.num_experts_per_tok
        logits = _lin(mlp["router"], x_ln2, kernel).astype(jnp.float32)
        if cfg.router_kind == "mixtral":
            probs = jax.nn.softmax(logits, axis=-1)           # [B,T,E]
            topv, topi = jax.lax.top_k(probs, K)
            if cfg.router_norm_topk:  # mixtral always; qwen-moe per config
                topv = topv / jnp.sum(topv, axis=-1, keepdims=True)
        elif cfg.router_kind == "gpt_oss":
            # top-k on the raw logits, softmax over just the selected values
            topl, topi = jax.lax.top_k(logits, K)
            topv = jax.nn.softmax(topl, axis=-1)
        elif cfg.router_kind == "llama4":
            # top-k on the raw logits; weight = sigmoid(logit) per selected
            topl, topi = jax.lax.top_k(logits, K)
            topv = jax.nn.sigmoid(topl)
        elif cfg.router_kind == "phimoe":
            # sparsemixer inference (HF phimoe sparsemixer, training=False):
            # two argmax passes; each weight is the softmax of the
            # jitter-masked scores at the selected expert
            if K != 2:
                raise NotImplementedError("sparsemixer requires top_k=2")
            eps2 = 2.0 * cfg.router_jitter
            s_ = logits
            m1 = jnp.max(s_, axis=-1, keepdims=True)
            e1 = jnp.argmax(s_, axis=-1)[..., None]
            fac1 = jnp.maximum(jnp.abs(s_), m1)
            g1 = jnp.where((m1 - s_) / fac1 > eps2, -jnp.inf, s_)
            w1 = jnp.take_along_axis(jax.nn.softmax(g1, axis=-1), e1, -1)
            s2 = jnp.where(
                jax.nn.one_hot(e1[..., 0], E, dtype=jnp.bool_), -jnp.inf, s_)
            m2 = jnp.max(s2, axis=-1, keepdims=True)
            e2 = jnp.argmax(s2, axis=-1)[..., None]
            fac2 = jnp.maximum(jnp.abs(s_), m2)
            g2 = jnp.where((m2 - s_) / fac2 > eps2, -jnp.inf, s2)
            w2 = jnp.take_along_axis(jax.nn.softmax(g2, axis=-1), e2, -1)
            topi = jnp.concatenate([e1, e2], axis=-1)
            topv = jnp.concatenate([w1, w2], axis=-1)
        else:
            # deepseek_v2: softmax scores, optional group-max mask, no
            # renorm; deepseek_v3: sigmoid scores + e_score correction bias
            # for selection, group mask by sum of top-2 scores per group,
            # weights gathered from the UNbiased scores then renormalized.
            if cfg.router_kind == "deepseek_v3":
                scores = jax.nn.sigmoid(logits)
            else:
                scores = jax.nn.softmax(logits, axis=-1)
            choice = scores
            if "router_bias" in mlp:
                choice = choice + mlp["router_bias"].astype(jnp.float32)
            if cfg.n_group > 1:
                G = cfg.n_group
                gsh = choice.reshape(choice.shape[:-1] + (G, E // G))
                if cfg.router_kind == "deepseek_v3":
                    g_scores = jnp.sum(jax.lax.top_k(gsh, 2)[0], axis=-1)
                else:
                    g_scores = jnp.max(gsh, axis=-1)
                _, gidx = jax.lax.top_k(g_scores, cfg.topk_group)
                gmask = jnp.sum(jax.nn.one_hot(gidx, G, dtype=jnp.float32),
                                axis=-2)                      # [B,T,G]
                choice = jnp.where(
                    jnp.repeat(gmask, E // G, axis=-1) > 0, choice, 0.0)
            _, topi = jax.lax.top_k(choice, K)
            topv = jnp.take_along_axis(scores, topi, axis=-1)
            if cfg.router_norm_topk:
                topv = topv / (jnp.sum(topv, axis=-1, keepdims=True) + 1e-20)
            topv = topv * cfg.routed_scaling_factor
        experts = mlp["experts"]
        bank = isinstance(experts, ExpertBank)
        localE = experts.n_local if bank else len(experts)
        off = 0
        if tp_axis is not None and localE < E:
            off = jax.lax.axis_index(tp_axis) * localE
        mlp_out = jnp.zeros_like(res)
        for le in range(localE):
            exp = index_expert(experts, le) if bank else experts[le]
            ge = off + le
            w_e = jnp.sum(jnp.where(topi == ge, topv, 0.0), axis=-1)  # [B,T]
            if cfg.moe_weight_inputs:
                # llama4: the routing weight scales the expert INPUT, so the
                # scaled input IS the Hessian sample
                x_e = x_ln2 * w_e[..., None].astype(x_ln2.dtype)
                for leaf in ("gate", "up"):
                    tn = f"mlp.experts.{ge}.{leaf}"
                    if tn in taps:
                        tapped[tn] = x_e
                g = _lin(exp["gate"], x_e, kernel)
                u = _lin(exp["up"], x_e, kernel)
                h = activation(g, cfg.activation) * u
                tn = f"mlp.experts.{ge}.down"
                if tn in taps:
                    tapped[tn] = h
                mlp_out = mlp_out + _lin(exp["down"], h, kernel).astype(
                    res.dtype)
                continue
            sw = jnp.sqrt(w_e)[..., None].astype(x_ln2.dtype)
            # taps carry sqrt(route weight)-scaled activations so the
            # accumulated Hessian is the routing-weighted input covariance
            # (tokens this expert never sees contribute nothing)
            for leaf in ("gate", "up"):
                tn = f"mlp.experts.{ge}.{leaf}"
                if tn in taps:
                    tapped[tn] = x_ln2 * sw
            g = _lin(exp["gate"], x_ln2, kernel)
            u = _lin(exp["up"], x_ln2, kernel)
            if cfg.moe_act == "gpt_oss":
                # clamped swiglu: (clip(up)+1) * gate*sigmoid(1.702*gate)
                lim = cfg.swiglu_limit
                g = jnp.minimum(g, lim)
                u = jnp.clip(u, -lim, lim)
                h = (u + 1.0) * (g * jax.nn.sigmoid(1.702 * g))
            else:
                h = activation(g, cfg.activation) * u
            tn = f"mlp.experts.{ge}.down"
            if tn in taps:
                tapped[tn] = h * sw
            mlp_out = mlp_out + w_e[..., None].astype(res.dtype) * _lin(
                exp["down"], h, kernel)
        if tp_axis is not None:
            mlp_out = jax.lax.psum(mlp_out, tp_axis)
        if "shared" in mlp:  # deepseek shared experts: process every token
            sh = mlp["shared"]
            for name in ("mlp.shared.gate", "mlp.shared.up"):
                if name in taps:
                    tapped[name] = x_ln2
            hs = (activation(_lin(sh["gate"], x_ln2, kernel), cfg.activation)
                  * _lin(sh["up"], x_ln2, kernel))
            if "mlp.shared.down" in taps:
                tapped["mlp.shared.down"] = hs
            shared_out = _lin(sh["down"], hs, kernel)
            if "shared_gate" in mlp:  # qwen2-moe scalar sigmoid gate
                shared_out = shared_out * jax.nn.sigmoid(
                    _lin(mlp["shared_gate"], x_ln2, kernel).astype(
                        jnp.float32)).astype(shared_out.dtype)
            mlp_out = mlp_out + shared_out
        if "out_bias" in mlp:  # jetmoe MoE output bias
            mlp_out = mlp_out + mlp["out_bias"].astype(mlp_out.dtype)
        if cfg.branch_norms:  # flex_olmo: post_feedforward_layernorm
            mlp_out = _norm(blk.get("post_ln2"), cfg, mlp_out)
        if cfg.residual_multiplier is not None:
            mlp_out = mlp_out * cfg.residual_multiplier
        if alpha_beta is not None:
            y = res * alpha_beta[2] + mlp_out * alpha_beta[3]
        else:
            y = res + mlp_out
        if not pre_norm:
            y = _norm(blk.get("ln2"), cfg, y)
        return y, (k_full, v_full), tapped
    if cfg.gated_mlp:
        for name in ("mlp.gate", "mlp.up"):
            if name in taps:
                tapped[name] = x_ln2
        if fast is not None:
            from ..kernels.gemv_fused import fused_call

            res_in = res if tp_axis is None else None
            gu = fused_call(x_ln2, mlp["gateup"], fast["gu"],
                            pre="rmsnorm", eps=cfg.norm_eps)
            if cfg.activation == "silu":
                # silu(g)*u runs inside the down-proj kernel (pre="swiglu");
                # under TP gu is the LOCAL [gate_s | up_s] pair, so the
                # in-kernel split stays correct per shard
                out = fused_call(gu, mlp["down"], fast["dn"],
                                 pre="swiglu", res=res_in)
            else:
                g, u = jnp.split(gu, 2, axis=-1)
                h2 = activation(g, cfg.activation) * u
                # down-proj with the residual add fused in-kernel
                out = fused_call(h2, mlp["down"], fast["dn"], res=res_in)
            if tp_axis is not None:
                out = res + jax.lax.psum(out, tp_axis)
            return out, (k_full, v_full), tapped
        if "gateup" in mlp:  # runtime-fused gate|up projection
            gu = _lin(mlp["gateup"], x_ln2, kernel)
            g, u = jnp.split(gu, 2, axis=-1)
        else:
            g = _lin(mlp["gate"], x_ln2, kernel)
            u = _lin(mlp["up"], x_ln2, kernel)
        h = activation(g, cfg.activation) * u
        if cfg.sub_norms:  # bitnet ffn_sub_norm
            h = rmsnorm(h, mlp["down_norm"]["w"], cfg.norm_eps)
        if "mlp.down" in taps:
            tapped["mlp.down"] = h
        mlp_out = _lin(mlp["down"], h, kernel)
        if tp_axis is not None:
            mlp_out = jax.lax.psum(mlp_out, tp_axis)
        if cfg.branch_norms:
            mlp_out = _norm(blk.get("post_ln2"), cfg, mlp_out)
        if cfg.residual_multiplier is not None:
            mlp_out = mlp_out * cfg.residual_multiplier
        if alpha_beta is not None:
            y = res * alpha_beta[2] + mlp_out * alpha_beta[3]
        else:
            y = res + mlp_out
    else:
        if "mlp.fc1" in taps:
            tapped["mlp.fc1"] = x_ln2
        h = _mlp_act(mlp, cfg, _lin(mlp["fc1"], x_ln2, kernel))
        if "mlp.fc2" in taps:
            tapped["mlp.fc2"] = h
        mlp_out = _lin(mlp["fc2"], h, kernel)
        if tp_axis is not None:
            mlp_out = jax.lax.psum(mlp_out, tp_axis)
        if cfg.branch_norms:
            mlp_out = _norm(blk.get("post_ln2"), cfg, mlp_out)
        if cfg.residual_multiplier is not None:
            mlp_out = mlp_out * cfg.residual_multiplier
        if alpha_beta is not None:
            y = res * alpha_beta[2] + mlp_out * alpha_beta[3]
        else:
            y = res + mlp_out
    if not pre_norm:
        y = _norm(blk.get("ln2"), cfg, y)
    return y, (k_full, v_full), tapped


def embed(params: Dict[str, Any], cfg: ModelConfig, input_ids: jnp.ndarray,
          positions: jnp.ndarray, dtype=jnp.float32) -> jnp.ndarray:
    """Token (+learned position) embedding and input projection/norm."""
    x = jnp.take(params["embed_tokens"], input_ids, axis=0).astype(dtype)
    if cfg.embed_scale is not None:  # gemma sqrt(hidden) normalizer
        x = x * jnp.asarray(cfg.embed_scale, dtype)
    if params.get("project_in") is not None:
        x = params["project_in"].apply(x)
    if cfg.pos_embedding == "learned":
        # OPT offsets learned positions by 2 (HF OPTLearnedPositionalEmbedding);
        # GPT-2 uses plain wpe indexing (pos_offset=0)
        pos = jnp.take(params["embed_positions"], positions + cfg.pos_offset,
                       axis=0)
        x = x + pos.astype(dtype)
    if params.get("embed_norm") is not None:
        x = _norm(params["embed_norm"], cfg, x)
    return x


def layer_mask_biases(cfg: ModelConfig, positions, kv_valid, kv_pos):
    """Per-layer attention mask biases.

    Uniform models get one shared mask; alternating-window models (gemma2
    layer_types) get a sliding mask on 'sliding_attention' layers and a
    full causal mask elsewhere.
    """
    if not cfg.layer_types:
        m = causal_mask_bias(positions, kv_valid, kv_pos,
                             window=cfg.sliding_window)
        return [m] * cfg.num_layers
    full = causal_mask_bias(positions, kv_valid, kv_pos, window=None)
    sliding = chunked = None
    if "sliding_attention" in cfg.layer_types:
        sliding = causal_mask_bias(positions, kv_valid, kv_pos,
                                   window=cfg.sliding_window)
    if "chunked_attention" in cfg.layer_types:  # llama4
        C = cfg.attention_chunk_size
        same = (kv_pos[:, None, :] // C) == (positions[:, :, None] // C)
        chunked = jnp.where(same[:, None, :, :], full, -1e9)
    return [sliding if t == "sliding_attention"
            else chunked if t == "chunked_attention" else full
            for t in cfg.layer_types]


def layer_rope(cfg: ModelConfig, rope, i: int):
    """Per-layer rope tables: None on NoPE layers (cohere2 full-attention
    layers / smollm3 no_rope_layers); with a (global, local) pair from
    model_rope_tables (gemma3/olmo3), sliding layers take the local one."""
    if rope is None:
        return None
    if cfg.rope_local_theta is not None:
        g, loc = rope
        rope = (loc if cfg.layer_types
                and cfg.layer_types[i] == "sliding_attention" else g)
    if cfg.rope_layers is None:
        return rope
    return rope if cfg.rope_layers[i] else None


def attn_temperature(cfg: ModelConfig, positions: jnp.ndarray) -> jnp.ndarray:
    """llama4 NoPE-layer q temperature: log1p(floor((p+1)/floor_scale))*s + 1.

    positions: [B, T] absolute token positions -> [B, T] f32 multiplier.
    """
    p = positions.astype(jnp.float32)
    return (jnp.log1p(jnp.floor((p + 1.0) / cfg.temp_tuning_floor))
            * cfg.temp_tuning_scale + 1.0)


def layer_alpha_beta(cfg: ModelConfig, i: int):
    """Per-layer deepnorm residual factors (minimax), else None."""
    if cfg.layer_alpha_beta is None:
        return None
    return cfg.layer_alpha_beta[i]


def layer_attn_temp(cfg: ModelConfig, temp, i: int):
    """Temperature applies only on NoPE layers (HF: `and not use_rope`)."""
    if temp is None:
        return None
    if cfg.rope_layers is not None and cfg.rope_layers[i]:
        return None
    return temp


def _kv_delta_write(stack: jnp.ndarray, i: int, delta: jnp.ndarray,
                    at: jnp.ndarray) -> jnp.ndarray:
    """Write the new tokens' [B, T, ...] slab into a stacked per-layer
    cache [L, B, S, ...] at (layer i, position ``at``).

    The whole-layer restage this replaces (slice layer -> update -> set
    back) moved ~2MB per layer per decode step; this is a [B, T] slab
    (8KB at B=1) that XLA performs in place on the loop-carried buffer.
    """
    delta = delta.astype(stack.dtype)
    if at.ndim == 0:
        return jax.lax.dynamic_update_slice(
            stack, delta[None], (i, 0, at) + (0,) * (delta.ndim - 2))
    bidx = jnp.arange(delta.shape[0], dtype=jnp.int32)[:, None]
    sidx = at[:, None] + jnp.arange(delta.shape[1], dtype=jnp.int32)[None, :]
    return stack.at[i, bidx, sidx].set(delta)


def unembed(params: Dict[str, Any], cfg: ModelConfig,
            x: jnp.ndarray, kernel: str = "xla") -> jnp.ndarray:
    """Final norm + output projection + LM head -> logits [B, T, vocab]."""
    # layernorm_np (olmo) has no norm params at all (an empty dict does not
    # survive a checkpoint roundtrip) — the final norm still applies
    fh = params.get("fast_head")
    if (fh is not None and kernel == "pallas" and x.ndim == 3
            and x.shape[0] * x.shape[1] <= 32
            and x.dtype == jnp.bfloat16):
        # packed lm_head decode fastpath (fuse.py::pack_lm_head): final
        # rmsnorm + packed head matvec (+ weak columns/bias) in one
        # kernel; prepare_decode_fast attaches "fast_head" only for the
        # rmsnorm / no-project_out structure this covers
        from ..kernels.gemv_fused import fused_matvec, fused_matvec_reference

        head = params["lm_head"]
        fn = (fused_matvec if jax.default_backend() == "tpu"
              else fused_matvec_reference)
        rows = x.reshape(-1, x.shape[-1])
        logits = fn(rows, jax.lax.stop_gradient(head.qweight), fh["sz"],
                    bits=head.bits, pre="rmsnorm", gamma=fh["gamma"],
                    sel=fh["sel"], ow=fh["ow"], bias=fh["bias"],
                    eps=cfg.norm_eps, out_dtype=x.dtype)
        logits = logits.reshape(x.shape[0], x.shape[1], -1)
    else:
        if (params.get("final_norm") is not None
                or cfg.norm_type == "layernorm_np"):
            x = _norm(params.get("final_norm"), cfg, x)
        if params.get("project_out") is not None:
            x = _lin(params["project_out"], x, kernel)
        if params.get("lm_head") is not None:
            logits = _lin(params["lm_head"], x, kernel)
        else:
            logits = jnp.dot(x, params["embed_tokens"].T.astype(x.dtype),
                             preferred_element_type=jnp.float32
                             ).astype(x.dtype)
    if cfg.logit_scale is not None:  # cohere logit_scale / granite scaling
        logits = logits * jnp.asarray(cfg.logit_scale, logits.dtype)
    if cfg.final_logit_softcap is not None:  # gemma2
        cap = cfg.final_logit_softcap
        logits = (cap * jnp.tanh(logits.astype(jnp.float32) / cap)
                  ).astype(logits.dtype)
    return logits


def forward(params: Dict[str, Any], cfg: ModelConfig, input_ids: jnp.ndarray,
            *, cache: Optional[KVCache] = None,
            positions: Optional[jnp.ndarray] = None,
            kernel: str = "xla", dtype=jnp.float32,
            tp_axis: Optional[str] = None,
            ) -> Tuple[jnp.ndarray, Optional[KVCache]]:
    """Full-model forward.  input_ids: [B, T] -> logits [B, T, vocab].

    Without a cache: plain causal attention over T (ppl eval / calibration).
    With a cache: tokens are appended at ``cache.length`` (prefill or decode)
    and attention covers the whole valid cache (static shapes).
    """
    B, T = input_ids.shape
    if cache is None:
        start = jnp.zeros((), jnp.int32)
        start_vec = jnp.zeros((B,), jnp.int32)
    else:
        start = cache.length
        start_vec = jnp.broadcast_to(jnp.atleast_1d(start), (B,))
    if positions is None:
        positions = start_vec[:, None] + jnp.arange(T, dtype=jnp.int32)[None, :]

    x = embed(params, cfg, input_ids, positions, dtype=dtype)
    embed0 = x if cfg.zamba_block else None  # zamba2 shared-block input

    if cache is None:
        kv_pos = positions
        kv_valid = jnp.ones((B, T), jnp.int32)
    else:
        S = cache.max_len
        kv_pos = jnp.broadcast_to(jnp.arange(S, dtype=jnp.int32)[None, :], (B, S))
        kv_valid = (kv_pos < (start_vec[:, None] + T)).astype(jnp.int32)
    masks = layer_mask_biases(cfg, positions, kv_valid, kv_pos)

    rope = None
    alibi = None
    if cfg.pos_embedding == "rope":
        # length-dependent scaling types (dynamic NTK / longrope) plan for
        # the allocated window: the prompt length uncached, the cache
        # capacity when serving (static under jit, unlike HF's running max)
        rope = model_rope_tables(
            cfg, positions, seq_len=T if cache is None else cache.max_len)
    elif cfg.pos_embedding == "alibi":
        # bias depends on key positions; invalid slots are masked anyway
        if tp_axis is None or cfg.tp_size == 1:
            alibi = alibi_bias(cfg.num_heads, kv_pos * kv_valid,
                               cfg.alibi_scheme)
        else:
            # shard-local slice of the global slope schedule
            from .layers import alibi_slopes

            slopes = alibi_slopes(cfg.num_heads * cfg.tp_size,
                                  cfg.alibi_scheme)
            off = jax.lax.axis_index(tp_axis) * cfg.num_heads
            local = jax.lax.dynamic_slice(slopes, (off,), (cfg.num_heads,))
            kvp = (kv_pos * kv_valid).astype(jnp.float32)
            alibi = local[None, :, None, None] * kvp[:, None, None, :]

    temp = (attn_temperature(cfg, positions)
            if cfg.attn_temperature_tuning else None)
    quant_cache = isinstance(cache, QuantKVCache)
    hybrid = isinstance(cache, HybridCache)
    kvc = cache.kv if hybrid else cache
    new_k, new_v, new_ks, new_vs = None, None, None, None
    new_conv, new_ssm = None, None
    # Fused decode attention (kernels/attn_decode.py): single-token steps
    # on an eligible model run cache-append + attention in one kernel per
    # layer, updating the [L, S, Hkv*hd]-flattened stacks in place.
    # prepare_decode_fast only sets params["fast_attn"] when EVERY block
    # carries the fused-gemv fastpath and the attention config is the
    # plain-causal/full-rotary subset the kernel implements.
    fa = params.get("fast_attn")
    cur_k = cur_v = None
    use_fa = (fa is not None and cache is not None and not quant_cache
              and not hybrid and B == 1 and T == 1
              and jnp.ndim(start) == 0 and tp_axis is None
              and dtype == jnp.bfloat16
              # the kernel's slabs/DMAs are cache-dtype bf16; an f32 cache
              # (init_cache(dtype=f32)) takes the generic path instead
              and kvc.k.dtype == jnp.bfloat16
              and kvc.v.dtype == jnp.bfloat16)
    if use_fa:
        from ..kernels.decode_block import layer_block_applicable

        L_, _, S_, Hkv_, hd_ = kvc.k.shape
        rep_ = cfg.num_heads // cfg.num_kv_heads
        blk0 = params["layers"][0]
        wq0 = blk0["attn"]["qkv"].qweight
        wo0 = blk0["fast"]["o_attn"]["qweight"]
        wg0 = blk0["mlp"]["gateup"].qweight
        wd0 = blk0["mlp"]["down"].qweight
        if layer_block_applicable(S_, Hkv_, hd_, rep_, wq0.shape[1],
                                  wq0.shape[0], wo0.shape[1], wo0.shape[0],
                                  wg0.shape[1], wg0.shape[0],
                                  wd0.shape[1], wd0.shape[0]):
            # native 5D cache buffers, updated in place by the kernel
            cur_k, cur_v = kvc.k, kvc.v
        else:
            use_fa = False
    if use_fa and params.get("fast_model") is not None:
        # WHOLE-MODEL decode kernel (kernels/decode_model.py): every
        # layer's attention+mlp phases AND the final-norm + dense
        # lm_head matvec run as ONE pallas program — no per-layer
        # launches, no XLA staging between layers, no separate head op.
        # Caches update in place on the donated 5D stacks.
        from ..kernels.decode_model import (model_block_applicable,
                                            model_block_reference,
                                            model_block_step)

        fm = params["fast_model"]
        if model_block_applicable(
                kvc.k.shape[0], kvc.k.shape[2], cfg.num_kv_heads,
                cfg.head_dim, cfg.num_heads // cfg.num_kv_heads,
                fm["wq"].shape[2], fm["wq"].shape[1],
                fm["wo"].shape[2], fm["wo"].shape[1],
                fm["wg"].shape[2], fm["wg"].shape[1],
                fm["wd"].shape[2], fm["wd"].shape[1],
                fm["head"].shape[1], fm["selqog"].shape[1] // 3):
            hd_ = cfg.head_dim
            scale_ = (cfg.attn_scale if cfg.attn_scale is not None
                      else (cfg.attn_scale_override or hd_) ** -0.5)
            cos, sin = layer_rope(cfg, rope, 0)
            fn = (model_block_step if jax.default_backend() == "tpu"
                  else model_block_reference)
            sg = jax.lax.stop_gradient
            fm_arr = {k2: sg(v2) for k2, v2 in fm.items()}
            # bits via the PackedLinear's static metadata (an int in the
            # fm dict would turn into a tracer at jit boundaries)
            bits_ = params["layers"][0]["attn"]["qkv"].bits
            logits, k2_, v2_ = fn(
                x.reshape(1, -1).astype(jnp.bfloat16), cur_k, cur_v,
                start, cos.reshape(1, hd_), sin.reshape(1, hd_), fm_arr,
                bits=bits_, scale=float(scale_), eps=cfg.norm_eps,
                rep=cfg.num_heads // cfg.num_kv_heads)
            return (logits.reshape(1, 1, -1).astype(dtype),
                    KVCache(k=k2_, v=v2_, length=start + T))
    for i, blk in enumerate(params["layers"]):
        is_mamba = ("mamba" in blk or "gdn" in blk or "lightning" in blk
                    or "griffin" in blk
                    or "conv" in blk)
        is_dual = is_mamba and "attn" in blk  # falcon-h1 parallel mixers
        ssm_in = None
        # Read layer i's cache slice from the ALREADY-UPDATED stack, not
        # the original: layer i's rows are untouched until layer i writes
        # them, so the values are identical — but slicing the original
        # keeps it live across every later layer's delta write, which
        # forces XLA to materialize a FULL KV-stack copy at the first
        # write (read-after-write hazard; xplane showed a
        # [L,B,S,H,hd]-sized copy-done per decode step — ~5.4 GB/step of
        # hidden HBM traffic for llama-7b b8, the engine's dominant
        # cost).  Reading from the updated buffer makes the original
        # dead after the first write, so the whole chain runs in place
        # on the donated scan carry.
        if cache is None or use_fa:
            # use_fa: the layer kernel reads/writes the 5D stacks
            # directly; slicing them here would also dereference buffers
            # the kernel's donate_argnums already consumed (an eager,
            # non-jitted decode step would crash on the deleted array —
            # under jit the dead slice is DCE'd, but don't rely on it)
            kv = None
        elif is_dual:
            k_buf = kvc.k if new_k is None else new_k
            v_buf = kvc.v if new_v is None else new_v
            kv = (k_buf[i], v_buf[i])
            ssm_in = (cache.conv[i] if new_conv is None else new_conv[i],
                      cache.ssm[i] if new_ssm is None else new_ssm[i])
        elif is_mamba:
            kv = (cache.conv[i] if new_conv is None else new_conv[i],
                  cache.ssm[i] if new_ssm is None else new_ssm[i])
        elif quant_cache:
            kv = (cache.k[i] if new_k is None else new_k[i],
                  cache.v[i] if new_v is None else new_v[i],
                  cache.k_scale[i] if new_ks is None else new_ks[i],
                  cache.v_scale[i] if new_vs is None else new_vs[i])
        else:
            kv = ((kvc.k if new_k is None else new_k)[i],
                  (kvc.v if new_v is None else new_v)[i])
        use_delta = (cache is not None and not is_mamba
                     and "attn" in blk and "zshared" not in blk
                     and "moa" not in blk)
        fa_arg = None
        if use_fa:
            fa_arg = (cur_k, cur_v, i)
            use_delta = False
        x, (kf, vf), _ = block_forward(
            blk, cfg, x, mask_bias=masks[i], rope=layer_rope(cfg, rope, i),
            alibi=alibi, attn_temp=layer_attn_temp(cfg, temp, i),
            kv=kv, cache_at=start if cache is not None else None,
            kernel=kernel, tp_axis=tp_axis, ssm=ssm_in,
            alpha_beta=layer_alpha_beta(cfg, i), embed0=embed0,
            kv_delta=use_delta, attn_stacks=fa_arg)
        if cache is not None:
            if fa_arg is not None:
                cur_k, cur_v = kf, vf  # updated in place by the kernel
            elif is_dual:
                (kf, cf), (vf, sf) = kf, vf
                new_k = (kvc.k if new_k is None else new_k).at[i].set(kf)
                new_v = (kvc.v if new_v is None else new_v).at[i].set(vf)
                new_conv = (cache.conv if new_conv is None else new_conv
                            ).at[i].set(cf)
                new_ssm = (cache.ssm if new_ssm is None else new_ssm
                           ).at[i].set(sf)
            elif is_mamba:
                new_conv = (cache.conv if new_conv is None else new_conv
                            ).at[i].set(kf)
                new_ssm = (cache.ssm if new_ssm is None else new_ssm
                           ).at[i].set(vf)
            elif quant_cache:
                (kq, ks), (vq, vs) = kf, vf
                if use_delta:  # kf/vf are the new tokens' slab only
                    new_k = _kv_delta_write(
                        cache.k if new_k is None else new_k, i, kq, start)
                    new_v = _kv_delta_write(
                        cache.v if new_v is None else new_v, i, vq, start)
                    new_ks = _kv_delta_write(
                        cache.k_scale if new_ks is None else new_ks, i, ks,
                        start)
                    new_vs = _kv_delta_write(
                        cache.v_scale if new_vs is None else new_vs, i, vs,
                        start)
                else:
                    new_k = (cache.k if new_k is None else new_k
                             ).at[i].set(kq)
                    new_v = (cache.v if new_v is None else new_v
                             ).at[i].set(vq)
                    new_ks = (cache.k_scale if new_ks is None else new_ks
                              ).at[i].set(ks)
                    new_vs = (cache.v_scale if new_vs is None else new_vs
                              ).at[i].set(vs)
            elif use_delta:  # kf/vf are the new tokens' slab only
                new_k = _kv_delta_write(
                    kvc.k if new_k is None else new_k, i, kf, start)
                new_v = _kv_delta_write(
                    kvc.v if new_v is None else new_v, i, vf, start)
            else:
                new_k = (kvc.k if new_k is None else new_k).at[i].set(kf)
                new_v = (kvc.v if new_v is None else new_v).at[i].set(vf)

    logits = unembed(params, cfg, x, kernel)
    if cache is None:
        return logits, None
    if use_fa:
        return logits, KVCache(k=cur_k, v=cur_v, length=start + T)
    if hybrid:
        new_kv = KVCache(k=new_k if new_k is not None else kvc.k,
                         v=new_v if new_v is not None else kvc.v,
                         length=start + T)
        return logits, HybridCache(
            kv=new_kv,
            conv=new_conv if new_conv is not None else cache.conv,
            ssm=new_ssm if new_ssm is not None else cache.ssm)
    if quant_cache:
        return logits, QuantKVCache(k=new_k, v=new_v, k_scale=new_ks,
                                    v_scale=new_vs, length=start + T)
    return logits, KVCache(k=new_k, v=new_v, length=start + T)
