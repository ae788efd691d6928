"""Self-speculative decoding via prompt-lookup (n-gram) drafting.

Beyond-reference capability.  Single-stream (B=1) decode streams the whole
packed weight set once per step and is bandwidth/VPU-bound (PARITY.md), so
verifying K drafted tokens in ONE forward costs almost the same as decoding
one token — every accepted draft is a nearly-free extra token.  Drafts come
from the generated context itself (prompt-lookup decoding: find the most
recent earlier occurrence of the trailing n-gram and propose the tokens
that followed it), so no draft model is needed and greedy outputs are
exactly those of ``generate(temperature=0)``: every emitted token is the
model's own argmax, speculation only changes how many forwards that takes.

The reference has no analogue (its decode loop is strictly one token per
kernel call, main.py:339-347).
"""

from __future__ import annotations

from functools import partial
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..models.config import ModelConfig
from ..models.transformer import KVCache, forward, init_cache
from .generate import prefill

__all__ = ["propose_ngram", "generate_speculative", "stream_speculative",
           "generate_speculative_draft", "stream_speculative_draft"]


def propose_ngram(ctx: np.ndarray, k: int, ngram_max: int = 3,
                  ngram_min: int = 1) -> Optional[np.ndarray]:
    """Prompt-lookup draft: continuation of the most recent earlier match
    of the trailing n-gram (longest n first).  Returns exactly ``k`` tokens
    (padded with the last context token — bad drafts are merely rejected,
    and a fixed length keeps the verify step a single compiled program),
    or None when no n-gram recurs.
    """
    ctx = np.asarray(ctx).ravel()
    L = len(ctx)
    for n in range(ngram_max, ngram_min - 1, -1):
        if L < n + 1:
            continue
        tail = ctx[-n:]
        windows = np.lib.stride_tricks.sliding_window_view(ctx[:-1], n)
        hits = np.nonzero((windows == tail).all(axis=1))[0]
        # exclude the trailing occurrence itself; most recent match first
        hits = hits[hits < L - n]
        if len(hits) == 0:
            continue
        start = int(hits[-1]) + n
        cont = ctx[start: start + k]
        if len(cont) == 0:
            continue
        if len(cont) < k:
            cont = np.concatenate(
                [cont, np.full(k - len(cont), ctx[-1], ctx.dtype)])
        return cont.astype(np.int32)
    return None


@partial(jax.jit, static_argnames=("cfg", "kernel", "dtype"))
def _verify_step(params, cfg: ModelConfig, toks: jnp.ndarray, cache: KVCache,
                 kernel: str = "xla", dtype=jnp.float32
                 ) -> Tuple[jnp.ndarray, KVCache]:
    """Score [last confirmed tok | K drafts] in one forward.

    toks: [1, K+1] -> (greedy next-token ids [1, K+1], cache with K+1
    entries appended).  preds[:, i] is the model's argmax continuation of
    the sequence up to and including toks[:, i].
    """
    logits, cache = forward(params, cfg, toks, cache=cache, kernel=kernel,
                            dtype=dtype)
    return jnp.argmax(logits, axis=-1).astype(jnp.int32), cache


@partial(jax.jit, static_argnames=("cfg", "kernel", "dtype"))
def _decode_argmax(params, cfg: ModelConfig, tok: jnp.ndarray, cache: KVCache,
                   kernel: str = "xla", dtype=jnp.float32):
    logits, cache = forward(params, cfg, tok, cache=cache, kernel=kernel,
                            dtype=dtype)
    return jnp.argmax(logits[:, -1], axis=-1).astype(jnp.int32), cache


def stream_speculative(params, cfg: ModelConfig, prompt_ids: np.ndarray,
                       max_new_tokens: int, *, draft_len: int = 8,
                       ngram_max: int = 3, ngram_min: int = 1,
                       max_len: Optional[int] = None, kernel: str = "xla",
                       cache_dtype=jnp.bfloat16, dtype=None,
                       eos_id: Optional[int] = None,
                       stats: Optional[Dict[str, int]] = None):
    """Yields chunks (lists of ints) of verified greedy tokens; see
    generate_speculative.  Pass a dict as ``stats`` to collect
    forwards/drafted/accepted counters."""
    dtype = dtype or cache_dtype
    prompt_ids = np.asarray(prompt_ids).reshape(1, -1).astype(np.int32)
    T = prompt_ids.shape[1]
    # slack for the draft window that may overshoot max_new_tokens
    max_len = max_len or (T + max_new_tokens + draft_len + 1)
    cache = init_cache(cfg, 1, max_len, dtype=cache_dtype)
    logits, cache = prefill(params, cfg, jnp.asarray(prompt_ids), cache,
                            kernel=kernel, dtype=dtype)
    last = int(np.argmax(np.asarray(logits[0])))

    if stats is None:
        stats = {}
    stats.update({"forwards": 1, "drafted": 0, "accepted": 0})
    emitted = 1
    ctx = np.concatenate([prompt_ids[0], np.asarray([last], np.int32)])
    yield [last]
    while emitted < max_new_tokens and (eos_id is None or last != eos_id):
        draft = propose_ngram(ctx, draft_len, ngram_max, ngram_min)
        if draft is None:
            tok = jnp.asarray([[last]], jnp.int32)
            nxt, cache = _decode_argmax(params, cfg, tok, cache,
                                        kernel=kernel, dtype=dtype)
            new = [int(nxt[0])]
        else:
            toks = jnp.asarray(
                np.concatenate([[last], draft])[None, :], jnp.int32)
            old_len = cache.length
            preds, cache = _verify_step(params, cfg, toks, cache,
                                        kernel=kernel, dtype=dtype)
            p = np.asarray(preds[0])
            m = 0
            while m < draft_len and p[m] == draft[m]:
                m += 1
            # emitted: the argmax after `last` plus every verified draft's
            # continuation — p[0..m] (m accepted drafts -> m+1 new tokens)
            new = [int(t) for t in p[: m + 1]]
            # keep only the KV rows of [last | accepted drafts]
            import dataclasses

            cache = dataclasses.replace(
                cache, length=(old_len + 1 + m).astype(jnp.int32))
            stats["drafted"] += draft_len
            stats["accepted"] += m
        stats["forwards"] += 1
        if eos_id is not None and eos_id in new:
            new = new[: new.index(eos_id) + 1]
        new = new[: max_new_tokens - emitted]
        emitted += len(new)
        last = new[-1]
        ctx = np.concatenate([ctx, np.asarray(new, np.int32)])
        yield new
        if eos_id is not None and last == eos_id:
            break


@partial(jax.jit, static_argnames=("cfg", "k", "kernel", "dtype"))
def _draft_propose(params, cfg: ModelConfig, pending: jnp.ndarray,
                   cache: KVCache, k: int, kernel: str = "xla",
                   dtype=jnp.float32):
    """Consume ``pending`` [1, P] confirmed tokens, then draft k greedy
    tokens ([1, k]) with k-1 single-token steps; cache ends having
    consumed pending + the first k-1 drafts."""
    logits, cache = forward(params, cfg, pending, cache=cache, kernel=kernel,
                            dtype=dtype)
    d0 = jnp.argmax(logits[:, -1], axis=-1).astype(jnp.int32)

    def step(carry, _):
        tok, cache = carry
        logits, cache = forward(params, cfg, tok[:, None], cache=cache,
                                kernel=kernel, dtype=dtype)
        nxt = jnp.argmax(logits[:, -1], axis=-1).astype(jnp.int32)
        return (nxt, cache), nxt

    (_, cache), rest = jax.lax.scan(step, (d0, cache), None, length=k - 1)
    drafts = jnp.concatenate([d0[None], rest], axis=0)      # [k, 1]
    return drafts[:, 0][None, :], cache


def stream_speculative_draft(params, cfg: ModelConfig, draft_params,
                             draft_cfg: ModelConfig, prompt_ids: np.ndarray,
                             max_new_tokens: int, *, draft_len: int = 8,
                             max_len: Optional[int] = None,
                             kernel: str = "xla", cache_dtype=jnp.bfloat16,
                             dtype=None, eos_id: Optional[int] = None,
                             stats: Optional[Dict[str, int]] = None):
    """Draft-MODEL speculative decoding (greedy-exact, B=1).

    A small draft model proposes ``draft_len`` tokens autoregressively;
    the target verifies them in ONE forward and emits the longest agreeing
    prefix plus its own next argmax — identical tokens to plain greedy
    decode, fewer target weight-streaming passes.  Both models roll
    rejected KV rows back by truncating cache.length, so both must use
    plain KV caches (no mamba/gdn/lightning layers — recurrent states
    cannot roll back).  The draft tracks the target through a ``pending``
    window: confirmed tokens it has not consumed yet are fed as one
    multi-token forward at the start of its next proposal (exact
    multi-token KV continuation).

    Beyond-reference capability (the reference decodes strictly one token
    per kernel call, main.py:339-347); complements the zero-extra-model
    prompt-lookup path above.
    """
    from ..models.transformer import HybridCache  # noqa: F401

    for c in (cfg, draft_cfg):
        if (c.has_mamba or c.has_gdn or c.has_lightning
                or c.has_shortconv or c.has_griffin):
            raise ValueError("draft speculation needs rollbackable KV "
                             "caches; linear-mixer states cannot roll back")
    dtype = dtype or cache_dtype
    prompt_ids = np.asarray(prompt_ids).reshape(1, -1).astype(np.int32)
    T = prompt_ids.shape[1]
    max_len = max_len or (T + max_new_tokens + draft_len + 1)
    cache = init_cache(cfg, 1, max_len, dtype=cache_dtype)
    dcache = init_cache(draft_cfg, 1, max_len, dtype=cache_dtype)
    logits, cache = prefill(params, cfg, jnp.asarray(prompt_ids), cache,
                            kernel=kernel, dtype=dtype)
    _, dcache = prefill(draft_params, draft_cfg, jnp.asarray(prompt_ids),
                        dcache, kernel=kernel, dtype=dtype)
    last = int(np.argmax(np.asarray(logits[0])))

    if stats is None:
        stats = {}
    stats.update({"forwards": 1, "draft_forwards": 1, "drafted": 0,
                  "accepted": 0})
    emitted = 1
    ctx = np.concatenate([prompt_ids[0], np.asarray([last], np.int32)])
    n_draft_seen = T  # confirmed tokens the draft cache has consumed
    yield [last]
    while emitted < max_new_tokens and (eos_id is None or last != eos_id):
        # always draft the full window (overshoot past the token budget is
        # truncated below) so every round reuses one compiled proposal
        k = draft_len
        pending = ctx[n_draft_seen:]                  # ends with `last`
        d_len0 = dcache.length
        draft, dcache = _draft_propose(
            draft_params, draft_cfg, jnp.asarray(pending[None, :]), dcache,
            k, kernel=kernel, dtype=dtype)
        draft = np.asarray(draft[0])
        stats["draft_forwards"] += k
        toks = jnp.asarray(np.concatenate([[last], draft])[None, :])
        old_len = cache.length
        preds, cache = _verify_step(params, cfg, toks.astype(jnp.int32),
                                    cache, kernel=kernel, dtype=dtype)
        p = np.asarray(preds[0])
        m = 0
        while m < k and p[m] == draft[m]:
            m += 1
        new = [int(t) for t in p[: m + 1]]
        import dataclasses

        cache = dataclasses.replace(
            cache, length=(old_len + 1 + m).astype(jnp.int32))
        # the draft consumed pending + draft[:k-1]; of those, pending and
        # the m ACCEPTED drafts are confirmed context
        n_draft_seen += len(pending) + min(m, k - 1)
        dcache = dataclasses.replace(
            dcache,
            length=(d_len0 + len(pending) + min(m, k - 1)).astype(jnp.int32))
        stats["drafted"] += k
        stats["accepted"] += m
        stats["forwards"] += 1
        if eos_id is not None and eos_id in new:
            new = new[: new.index(eos_id) + 1]
        new = new[: max_new_tokens - emitted]
        emitted += len(new)
        last = new[-1]
        ctx = np.concatenate([ctx, np.asarray(new, np.int32)])
        yield new
        if eos_id is not None and last == eos_id:
            break


def generate_speculative_draft(params, cfg: ModelConfig, draft_params,
                               draft_cfg: ModelConfig,
                               prompt_ids: np.ndarray, max_new_tokens: int,
                               *, return_stats: bool = False, **kw):
    """Greedy generation with draft-model speculation; B=1; emits exactly
    what ``generate(..., temperature=0)`` on the TARGET would."""
    stats: Dict[str, int] = {}
    out = []
    for chunk in stream_speculative_draft(params, cfg, draft_params,
                                          draft_cfg, prompt_ids,
                                          max_new_tokens, stats=stats, **kw):
        out.extend(chunk)
    toks_out = np.asarray(out, np.int32)[None, :]
    if return_stats:
        return toks_out, stats
    return toks_out


def generate_speculative(params, cfg: ModelConfig, prompt_ids: np.ndarray,
                         max_new_tokens: int, *, return_stats: bool = False,
                         **kw):
    """Greedy generation with prompt-lookup speculation.  B=1 only.

    Emits exactly the tokens ``generate(..., temperature=0)`` would (every
    token is verified as the model's argmax before being emitted); returns
    [1, <=max_new_tokens] (shorter only when ``eos_id`` fires).  With
    ``return_stats`` also returns {"forwards", "drafted", "accepted"} —
    tokens-per-forward > 1 is the speedup over plain decode.
    """
    stats: Dict[str, int] = {}
    out = []
    for chunk in stream_speculative(params, cfg, prompt_ids, max_new_tokens,
                                    stats=stats, **kw):
        out.extend(chunk)
    toks_out = np.asarray(out, np.int32)[None, :]
    if return_stats:
        return toks_out, stats
    return toks_out
