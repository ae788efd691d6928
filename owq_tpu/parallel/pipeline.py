"""Naive pipeline (stage) parallelism — the reference's ``model_multigpu``.

The reference splits ``ceil(n_layers/n_gpus)`` contiguous blocks per GPU and
hops the hidden state across devices between stages (main.py:269-302,
duplicated in demo_llama2_70b.py:39-74); embeddings/norms/lm_head are pinned
to device 0.  Here each stage's params are committed to its device and each
stage runs as its own jitted function — JAX transfers the activations at
stage boundaries (ICI on TPU), exactly the reference's MoveModule pattern
without host mediation.

On TPU, tensor parallelism (partition.py) is almost always the better
choice; this exists for capability parity and for fitting models that
exceed one device's HBM without re-packing for TP.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from ..models.config import ModelConfig
from ..models.layers import alibi_bias, causal_mask_bias, rope_cos_sin
from ..models.transformer import (KVCache, attn_temperature,
                                  block_forward, embed,
                                  layer_alpha_beta,
                                  layer_attn_temp, layer_rope,
                                  unembed)

__all__ = ["StagedModel", "stage_model"]


@partial(jax.jit, static_argnames=("cfg", "dtype"))
def _embed_fn(params, cfg: ModelConfig, ids, positions, dtype=jnp.float32):
    return embed(params, cfg, ids, positions, dtype=dtype)


@partial(jax.jit, static_argnames=("cfg",))
def _head_fn(params, cfg: ModelConfig, x):
    return unembed(params, cfg, x)


@partial(jax.jit, static_argnames=("cfg", "kernel", "with_cache",
                                   "layer_off"))
def _stage_fn(blocks, cfg: ModelConfig, x, positions, kv, start,
              kernel: str = "xla", with_cache: bool = False,
              layer_off: int = 0):
    """Run a contiguous group of blocks on the device holding ``blocks``.

    ``layer_off`` is the stage's global first-layer index (alternating-
    window models pick per-layer masks by global layer position).
    """
    from ..models.transformer import layer_mask_biases

    B, T = x.shape[:2]
    if with_cache:
        S = kv[0].shape[2]
        kv_pos = jnp.broadcast_to(jnp.arange(S, dtype=jnp.int32)[None], (B, S))
        start_vec = jnp.broadcast_to(jnp.atleast_1d(start), (B,))
        kv_valid = (kv_pos < (start_vec[:, None] + T)).astype(jnp.int32)
    else:
        kv_pos, kv_valid = positions, jnp.ones((B, T), jnp.int32)
    masks = layer_mask_biases(cfg, positions, kv_valid, kv_pos)
    rope = alibi = None
    if cfg.pos_embedding == "rope":
        from ..models.transformer import model_rope_tables

        rope = model_rope_tables(cfg, positions)
    elif cfg.pos_embedding == "alibi":
        alibi = alibi_bias(cfg.num_heads, kv_pos * kv_valid, cfg.alibi_scheme)

    temp = (attn_temperature(cfg, positions)
            if cfg.attn_temperature_tuning else None)
    new_k, new_v = [], []
    for i, blk in enumerate(blocks):
        pair = None if not with_cache else (kv[0][i], kv[1][i])
        x, (kf, vf), _ = block_forward(
            blk, cfg, x, mask_bias=masks[layer_off + i],
            rope=layer_rope(cfg, rope, layer_off + i),
            attn_temp=layer_attn_temp(cfg, temp, layer_off + i),
            alpha_beta=layer_alpha_beta(cfg, layer_off + i),
            alibi=alibi, kv=pair, cache_at=start if with_cache else None,
            kernel=kernel)
        if with_cache:
            new_k.append(kf)
            new_v.append(vf)
    if with_cache:
        return x, (jnp.stack(new_k), jnp.stack(new_v))
    return x, None


@dataclasses.dataclass
class StagedModel:
    cfg: ModelConfig
    head_params: Dict[str, Any]          # embeddings/norms/lm_head (dev 0)
    stages: List[Tuple[Any, ...]]        # per-stage block tuples
    devices: List[Any]
    kernel: str = "xla"
    dtype: Any = jnp.float32

    def forward(self, input_ids, caches: Optional[List] = None,
                start: Optional[jnp.ndarray] = None):
        """caches: per-stage (k, v) stacks [n_blocks, B, S, Hkv, hd]."""
        ids = jnp.asarray(input_ids)
        B, T = ids.shape
        if start is None:
            start = jnp.zeros((), jnp.int32)
        positions = jnp.atleast_1d(start)[:, None] + jnp.arange(
            T, dtype=jnp.int32)[None, :]
        positions = jnp.broadcast_to(positions, (B, T))
        x = _embed_fn(self.head_params, self.cfg, ids, positions, self.dtype)
        new_caches = []
        off = 0
        for s, blocks in enumerate(self.stages):
            x = jax.device_put(x, self.devices[s])
            kv = None if caches is None else caches[s]
            x, kv_out = _stage_fn(blocks, self.cfg, x,
                                  jax.device_put(positions, self.devices[s]),
                                  kv, start, self.kernel,
                                  with_cache=caches is not None,
                                  layer_off=off)
            off += len(blocks)
            new_caches.append(kv_out)
        x = jax.device_put(x, self.devices[0])
        logits = _head_fn(self.head_params, self.cfg, x)
        return logits, (new_caches if caches is not None else None)

    def init_caches(self, batch: int, max_len: int, dtype=jnp.bfloat16):
        caches = []
        for s, blocks in enumerate(self.stages):
            base = (len(blocks), batch, max_len, self.cfg.num_kv_heads)
            caches.append((
                jax.device_put(jnp.zeros(base + (self.cfg.head_dim,), dtype),
                               self.devices[s]),
                jax.device_put(jnp.zeros(base + (self.cfg.v_dim,), dtype),
                               self.devices[s])))
        return caches

    def generate_greedy(self, prompt_ids, max_new_tokens: int,
                        max_len: Optional[int] = None):
        import numpy as np

        prompt_ids = np.asarray(prompt_ids).reshape(1, -1)
        T = prompt_ids.shape[1]
        max_len = max_len or (T + max_new_tokens)
        caches = self.init_caches(1, max_len, dtype=self.dtype)
        logits, caches = self.forward(prompt_ids, caches,
                                      jnp.zeros((), jnp.int32))
        out = []
        pos = T
        tok = jnp.argmax(logits[:, -1].astype(jnp.float32), axis=-1)
        for _ in range(max_new_tokens):
            out.append(int(tok[0]))
            logits, caches = self.forward(
                np.asarray(tok)[:, None], caches, jnp.asarray(pos, jnp.int32))
            pos += 1
            tok = jnp.argmax(logits[:, -1].astype(jnp.float32), axis=-1)
        return out


def stage_model(params: Dict[str, Any], cfg: ModelConfig,
                devices: Optional[Sequence] = None, kernel: str = "xla",
                dtype=jnp.float32) -> StagedModel:
    """Split blocks contiguously over devices (reference main.py:297-300)."""
    devices = list(devices if devices is not None else jax.devices())
    n = len(params["layers"])
    per = -(-n // len(devices))
    stages: List[Tuple] = []
    devs_used: List[Any] = []
    for s in range(0, n, per):
        di = len(stages)
        blocks = params["layers"][s:s + per]
        blocks = jax.device_put(tuple(blocks), devices[di])
        stages.append(blocks)
        devs_used.append(devices[di])
    head = {k: v for k, v in params.items() if k != "layers"}
    head = jax.device_put(head, devices[0])
    return StagedModel(cfg=cfg, head_params=head, stages=stages,
                       devices=devs_used, kernel=kernel, dtype=dtype)
