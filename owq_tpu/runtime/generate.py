"""Autoregressive generation and decode benchmarking.

The reference benchmarks with a Python loop feeding one token per
``model()`` call and reusing ``past_key_values`` (main.py:305-353).  Here the
decode step is a single jitted function over the static-shape KVCache; the
whole multi-token decode can additionally run as one ``lax.scan`` on device
(zero host round-trips — the idiomatic TPU decode loop).
"""

from __future__ import annotations

import time
from functools import partial
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..models.config import ModelConfig
from ..models.transformer import KVCache, forward, init_cache

__all__ = ["prefill", "decode_step", "generate", "benchmark_decode"]


@partial(jax.jit, static_argnames=("cfg", "kernel", "dtype"))
def prefill(params, cfg: ModelConfig, ids: jnp.ndarray, cache: KVCache,
            kernel: str = "xla", dtype=jnp.float32
            ) -> Tuple[jnp.ndarray, KVCache]:
    """Run the prompt through the model; returns (last-position logits, cache)."""
    logits, cache = forward(params, cfg, ids, cache=cache, kernel=kernel,
                            dtype=dtype)
    return logits[:, -1], cache


@partial(jax.jit, static_argnames=("cfg", "kernel", "dtype"))
def decode_step(params, cfg: ModelConfig, tok: jnp.ndarray, cache: KVCache,
                kernel: str = "xla", dtype=jnp.float32
                ) -> Tuple[jnp.ndarray, KVCache]:
    """One decode step.  tok: [B, 1] -> (logits [B, vocab], cache)."""
    logits, cache = forward(params, cfg, tok, cache=cache, kernel=kernel,
                            dtype=dtype)
    return logits[:, -1], cache


def _sample(logits: jnp.ndarray, key, temperature: float, top_p: float
            ) -> jnp.ndarray:
    if temperature == 0.0:
        return jnp.argmax(logits, axis=-1)
    logits = logits / temperature
    if top_p < 1.0:
        sorted_logits = jnp.sort(logits, axis=-1)[:, ::-1]
        probs = jax.nn.softmax(sorted_logits, axis=-1)
        cum = jnp.cumsum(probs, axis=-1)
        cutoff_idx = jnp.sum(cum < top_p, axis=-1, keepdims=True)
        cutoff = jnp.take_along_axis(sorted_logits, cutoff_idx, axis=-1)
        logits = jnp.where(logits < cutoff, -jnp.inf, logits)
    return jax.random.categorical(key, logits, axis=-1)


@partial(jax.jit, static_argnames=("cfg", "steps", "kernel", "temperature",
                                   "top_p", "dtype"))
def _scan_decode(params, cfg: ModelConfig, first_tok, cache: KVCache, key,
                 steps: int, kernel: str, temperature: float, top_p: float,
                 dtype=jnp.float32):
    """On-device decode loop: lax.scan over steps, no host round-trips."""

    def step(carry, _):
        tok, cache, key = carry
        logits, cache = forward(params, cfg, tok[:, None], cache=cache,
                                kernel=kernel, dtype=dtype)
        key, sub = jax.random.split(key)
        nxt = _sample(logits[:, -1], sub, temperature, top_p)
        return (nxt, cache, key), nxt

    (_, cache, _), toks = jax.lax.scan(
        step, (first_tok, cache, key), None, length=steps)
    return jnp.moveaxis(toks, 0, 1), cache  # [B, steps]


def generate(params, cfg: ModelConfig, prompt_ids: np.ndarray,
             max_new_tokens: int, *, max_len: Optional[int] = None,
             temperature: float = 0.0, top_p: float = 1.0, seed: int = 0,
             kernel: str = "xla", cache_dtype=jnp.bfloat16, dtype=None,
             ) -> np.ndarray:
    """Generate continuations.  prompt_ids: [B, T] -> [B, max_new_tokens].

    ``dtype`` is the activation compute dtype; defaults to ``cache_dtype``
    (bf16 serving by default, f32 when an exact cache is requested).
    """
    dtype = dtype or cache_dtype
    prompt_ids = np.asarray(prompt_ids)
    B, T = prompt_ids.shape
    max_len = max_len or (T + max_new_tokens)
    cache = init_cache(cfg, B, max_len, dtype=cache_dtype)
    logits, cache = prefill(params, cfg, jnp.asarray(prompt_ids), cache,
                            kernel=kernel, dtype=dtype)
    key = jax.random.PRNGKey(seed)
    key, sub = jax.random.split(key)
    first = _sample(logits, sub, temperature, top_p)
    if max_new_tokens == 1:
        return np.asarray(first)[:, None]
    rest, _ = _scan_decode(params, cfg, first, cache, key,
                           max_new_tokens - 1, kernel, temperature, top_p,
                           dtype)
    return np.concatenate([np.asarray(first)[:, None], np.asarray(rest)], axis=1)


@partial(jax.jit, static_argnames=("cfg", "kernel", "dtype"))
def _bench_scan(params, cfg: ModelConfig, toks, cache: KVCache, kernel: str,
                dtype=jnp.bfloat16):
    """Teacher-forced decode over toks [1, n] as one on-device lax.scan.

    Feeds token i, scores token i+1; returns total NLL (scalar).  A single
    dispatch + a single scalar readback — immune to async-dispatch timing
    artifacts (device runtimes can ack block_until_ready before compute
    finishes; only a host readback of a data-dependent scalar proves the
    work happened).
    """
    n = toks.shape[1]

    def step(carry, i):
        nll, cache = carry
        logits, cache = forward(params, cfg,
                                jax.lax.dynamic_slice(toks, (0, i), (1, 1)),
                                cache=cache, kernel=kernel, dtype=dtype)
        logp = jax.nn.log_softmax(logits[:, -1].astype(jnp.float32), axis=-1)
        tgt = jax.lax.dynamic_slice(toks, (0, jnp.minimum(i + 1, n - 1)),
                                    (1, 1))[0, 0]
        return (nll - logp[0, tgt], cache), None

    (nll, cache), _ = jax.lax.scan(
        step, (jnp.zeros((), jnp.float32), cache),
        jnp.arange(n, dtype=jnp.int32))
    return nll


def benchmark_decode(params, cfg: ModelConfig, input_ids: np.ndarray, *,
                     kernel: str = "xla", cache_dtype=jnp.bfloat16,
                     max_len: Optional[int] = None, repeats: int = 3,
                     ) -> Dict[str, float]:
    """Reference-protocol token-latency benchmark (main.py:305-353).

    One-token-at-a-time autoregressive decode with past reuse, measured as
    a single on-device scan timed from dispatch to the readback of the
    accumulated NLL (see _bench_scan for why per-step host timing is not
    trustworthy on relayed/async backends).
    """
    input_ids = np.asarray(input_ids).reshape(1, -1)
    n = input_ids.shape[1]
    max_len = max_len or n
    toks = jax.device_put(jnp.asarray(input_ids))
    dtype = cache_dtype  # serving activations match the cache dtype

    # compile + warmup
    cache = init_cache(cfg, 1, max_len, dtype=cache_dtype)
    nll = _bench_scan(params, cfg, toks, cache, kernel, dtype)
    ppl = float(np.exp(float(nll) / n))

    samples = []
    for _ in range(repeats):
        cache = init_cache(cfg, 1, max_len, dtype=cache_dtype)
        t0 = time.perf_counter()
        nll = _bench_scan(params, cfg, toks, cache, kernel, dtype)
        _ = float(nll)  # forces completion
        samples.append(time.perf_counter() - t0)

    # Reference protocol reports median AND min separately
    # (/root/reference/main.py:335-353), and its headline is the MEDIAN —
    # so ``tokens_per_s`` here derives from the median sample.  The min is
    # kept as a detail (``tokens_per_s_min``): on a shared TPU pool noisy
    # neighbors inflate the median and the min reflects the hardware, but
    # the honest default matches the reference's protocol.
    median = float(np.median(samples))
    best = float(np.min(samples))
    return {
        "median_s": median / n,
        "min_s": best / n,
        "tokens_per_s": n / median,
        "tokens_per_s_min": n / best,
        "ppl": ppl,
    }
