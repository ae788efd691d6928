"""Synthetic model builders (random weights, exact shapes).

Used by benchmarks and the graft entry: decode throughput of a packed model
does not depend on weight *values*, so flagship-shaped models are built
directly on device (random packed codes via jax.random) — no host transfer,
no HF download (this container has zero egress).
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp

from .config import ModelConfig
from ..core.packing import padded_infeatures
from ..runtime.quant_linear import DenseLinear, PackedLinear

__all__ = ["LLAMA_SHAPES", "OPT_SHAPES", "synthetic_config",
           "build_synthetic", "build_moe_synthetic"]

# (hidden, intermediate, layers, heads, kv_heads, vocab)
LLAMA_SHAPES = {
    "llama-7b": (4096, 11008, 32, 32, 32, 32000),
    "llama-13b": (5120, 13824, 40, 40, 40, 32000),
    "llama-2-13b": (5120, 13824, 40, 40, 40, 32000),
    "llama-2-70b": (8192, 28672, 80, 64, 8, 32000),
    "llama-tiny": (256, 688, 4, 8, 8, 1024),
}
OPT_SHAPES = {
    "opt-125m": (768, 3072, 12, 12, 12, 50272),
    "opt-1.3b": (2048, 8192, 24, 32, 32, 50272),
    "opt-6.7b": (4096, 16384, 32, 32, 32, 50272),
    "opt-66b": (9216, 36864, 64, 72, 72, 50272),
}


def synthetic_config(name: str, max_pos: int = 2048) -> ModelConfig:
    if name in LLAMA_SHAPES:
        h, i, l, nh, nkv, v = LLAMA_SHAPES[name]
        return ModelConfig(
            family="llama", vocab_size=v, hidden_size=h, intermediate_size=i,
            num_layers=l, num_heads=nh, num_kv_heads=nkv,
            max_position_embeddings=max_pos, norm_eps=1e-5,
            tie_word_embeddings=False, activation="silu",
            pos_embedding="rope", norm_type="rmsnorm", gated_mlp=True)
    if name in OPT_SHAPES:
        h, i, l, nh, nkv, v = OPT_SHAPES[name]
        return ModelConfig(
            family="opt", vocab_size=v, hidden_size=h, intermediate_size=i,
            num_layers=l, num_heads=nh, num_kv_heads=nkv,
            max_position_embeddings=max_pos, tie_word_embeddings=True,
            activation="relu", word_embed_proj_dim=h,
            pos_embedding="learned", pos_offset=2, norm_type="layernorm",
            attn_bias=True, mlp_bias=True, gated_mlp=False)
    raise KeyError(name)


def _rand_packed(key, infeat: int, out: int, bits: int, n_out: int,
                 dtype) -> PackedLinear:
    in_pad, nw = padded_infeatures(infeat, bits)
    k1, k2, k3, k4 = jax.random.split(key, 4)
    qweight = jax.random.bits(k1, (nw, out), jnp.uint32).astype(jnp.int32)
    scales = (jax.random.uniform(k2, (out,), jnp.float32) * 0.01 + 0.001)
    zeros = jnp.full((out,), float(2 ** (bits - 1)), jnp.float32)
    oweight = (jax.random.normal(k3, (n_out, out), jnp.float32) * 0.01
               ).astype(dtype)
    step = max(infeat // max(n_out, 1), 1)
    out_ids = (jnp.arange(n_out, dtype=jnp.int32) * step) % max(infeat, 1)
    return PackedLinear(qweight=qweight, scales=scales, zeros=zeros,
                        oweight=oweight, out_ids=out_ids, bias=None,
                        bits=bits, in_features=infeat)


def _rand_dense(key, infeat: int, out: int, dtype, bias: bool) -> DenseLinear:
    w = (jax.random.normal(key, (infeat, out), jnp.float32)
         * (infeat ** -0.5)).astype(dtype)
    b = jnp.zeros((out,), dtype) if bias else None
    return DenseLinear(w=w, b=b)


def build_synthetic(cfg: ModelConfig, *, bits: Optional[int] = 3,
                    target_bit: Optional[float] = None, seed: int = 0,
                    dtype=jnp.bfloat16) -> Dict:
    """Build a model with random weights; bits=None -> dense (fp) model.

    target_bit sets the weak-column budget via the reference formula
    (main.py:76-86); default 3.01/4.01-style 1% effective overhead.
    """
    if bits is not None and bits >= 16:
        bits = None  # "16-bit" synthetic == dense fp model
    if target_bit is None and bits is not None:
        target_bit = bits + 0.01
    key = jax.random.PRNGKey(seed)
    h, hd = cfg.hidden_size, cfg.head_dim
    nh, nkv, inter = cfg.num_heads, cfg.num_kv_heads, cfg.intermediate_size

    if cfg.family == "llama":
        lin_shapes = {"attn.q": (h, nh * hd, 1.0), "attn.k": (h, nkv * hd, 1.0),
                      "attn.v": (h, nkv * hd, 1.0), "attn.o": (nh * hd, h, 1.0),
                      "mlp.gate": (h, inter, 0.375), "mlp.up": (h, inter, 0.375),
                      "mlp.down": (inter, h, 0.375)}
    else:
        lin_shapes = {"attn.q": (h, h, 1.0), "attn.k": (h, h, 1.0),
                      "attn.v": (h, h, 1.0), "attn.o": (h, h, 1.0),
                      "mlp.fc1": (h, inter, 0.25), "mlp.fc2": (inter, h, 0.25)}

    n_lin = len(lin_shapes)
    r = 0.0
    if bits is not None:
        r = (12.0 / (16 - bits)) * (target_bit - bits) / n_lin

    def make_lin(key, name):
        infeat, out, ratio = lin_shapes[name]
        if bits is None:
            return _rand_dense(key, infeat, out, dtype,
                               bias=cfg.attn_bias if name.startswith("attn")
                               else cfg.mlp_bias)
        n_out = round(infeat * r * ratio)
        n_out += n_out % 2
        return _rand_packed(key, infeat, out, bits, n_out, dtype)

    layers = []
    for li in range(cfg.num_layers):
        lkey = jax.random.fold_in(key, li)
        keys = jax.random.split(lkey, n_lin)
        attn = {}
        mlp = {}
        for k, name in zip(keys, lin_shapes):
            part, leaf = name.split(".")
            (attn if part == "attn" else mlp)[leaf] = make_lin(k, name)
        norm_w = jnp.ones((h,), dtype)
        if cfg.norm_type == "layernorm":
            ln1 = {"w": norm_w, "b": jnp.zeros((h,), dtype)}
            ln2 = {"w": norm_w, "b": jnp.zeros((h,), dtype)}
        else:
            ln1, ln2 = {"w": norm_w}, {"w": norm_w}
        layers.append({"ln1": ln1, "attn": attn, "ln2": ln2, "mlp": mlp})

    ek = jax.random.fold_in(key, 10_000)
    params = {
        "embed_tokens": (jax.random.normal(ek, (cfg.vocab_size, h), jnp.float32)
                         * 0.02).astype(dtype),
        "project_in": None, "project_out": None, "embed_norm": None,
        "layers": layers,
        "final_norm": ({"w": jnp.ones((h,), dtype)}
                       if cfg.norm_type == "rmsnorm" else
                       {"w": jnp.ones((h,), dtype), "b": jnp.zeros((h,), dtype)}),
        "lm_head": None,
    }
    if cfg.pos_embedding == "learned":
        pk = jax.random.fold_in(key, 10_001)
        params["embed_positions"] = (jax.random.normal(
            pk, (cfg.max_position_embeddings + 2, h), jnp.float32) * 0.02
        ).astype(dtype)
    if not cfg.tie_word_embeddings:
        hk = jax.random.fold_in(key, 10_002)
        params["lm_head"] = _rand_dense(hk, h, cfg.vocab_size, dtype, False)
    return params


def build_moe_synthetic(*, hidden: int = 64, inter: int = 96, layers: int = 2,
                        heads: int = 4, kv_heads: int = 2, vocab: int = 256,
                        num_experts: int = 4, topk: int = 2, seed: int = 0,
                        dtype=jnp.float32):
    """Tiny random dense-weight Mixtral-shaped MoE: (params, cfg).

    Used by the multichip dry-run to exercise expert parallelism without HF
    downloads."""
    cfg = ModelConfig(
        family="llama", vocab_size=vocab, hidden_size=hidden,
        intermediate_size=inter, num_layers=layers, num_heads=heads,
        num_kv_heads=kv_heads, max_position_embeddings=128, norm_eps=1e-6,
        tie_word_embeddings=False, activation="silu", pos_embedding="rope",
        norm_type="rmsnorm", gated_mlp=True, num_experts=num_experts,
        num_experts_per_tok=topk)
    key = jax.random.PRNGKey(seed)
    h = hidden
    blocks = []
    for li in range(layers):
        lk = jax.random.fold_in(key, li)
        ks = jax.random.split(lk, 5 + 3 * num_experts)
        attn = {"q": _rand_dense(ks[0], h, heads * cfg.head_dim, dtype, False),
                "k": _rand_dense(ks[1], h, kv_heads * cfg.head_dim, dtype, False),
                "v": _rand_dense(ks[2], h, kv_heads * cfg.head_dim, dtype, False),
                "o": _rand_dense(ks[3], heads * cfg.head_dim, h, dtype, False)}
        experts = []
        for e in range(num_experts):
            b = 5 + 3 * e
            experts.append({"gate": _rand_dense(ks[b], h, inter, dtype, False),
                            "up": _rand_dense(ks[b + 1], h, inter, dtype, False),
                            "down": _rand_dense(ks[b + 2], inter, h, dtype, False)})
        mlp = {"router": _rand_dense(ks[4], h, num_experts, dtype, False),
               "experts": experts}
        blocks.append({"ln1": {"w": jnp.ones((h,), dtype)}, "attn": attn,
                       "ln2": {"w": jnp.ones((h,), dtype)}, "mlp": mlp})
    ek = jax.random.fold_in(key, 10_000)
    params = {
        "embed_tokens": (jax.random.normal(ek, (vocab, h), jnp.float32)
                         * 0.02).astype(dtype),
        "project_in": None, "project_out": None, "embed_norm": None,
        "layers": blocks,
        "final_norm": {"w": jnp.ones((h,), dtype)},
        "lm_head": _rand_dense(jax.random.fold_in(key, 10_002), h, vocab,
                               dtype, False),
    }
    return params, cfg
