"""LM abstractions for the zero-shot harness.

A fresh implementation of the evaluation contract used by the reference's
vendored EleutherAI harness (lm_eval/base.py — see SURVEY.md §2.2): an LM
answers three request types:

  loglikelihood(context, continuation) -> (logprob, is_greedy)
  loglikelihood_rolling(text)          -> sum logprob over rolling windows
  greedy_until(context, stops)         -> generated string

``JaxLM`` scores requests with the owq_tpu runtime: requests are
length-sorted (so padded batches are dense), tokenized once, scored with a
jitted teacher-forced forward, and restored to original order — the same
batching strategy as the reference's BaseLM._loglikelihood_tokens
(base.py:281-416) without the torch loop.
"""

from __future__ import annotations

import abc
from functools import partial
from typing import Any, Dict, Iterable, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["LM", "JaxLM", "rolling_token_windows", "Reorderer"]


class LM(abc.ABC):
    @abc.abstractmethod
    def loglikelihood(self, requests: Sequence[Tuple[str, str]]
                      ) -> List[Tuple[float, bool]]:
        ...

    @abc.abstractmethod
    def loglikelihood_rolling(self, requests: Sequence[str]) -> List[float]:
        ...

    @abc.abstractmethod
    def greedy_until(self, requests: Sequence[Tuple[str, List[str]]]
                     ) -> List[str]:
        ...


class Reorderer:
    """Sort requests by a key, then restore original order of results."""

    def __init__(self, items: Sequence[Any], key):
        self.order = sorted(range(len(items)), key=lambda i: key(items[i]))
        self.items = [items[i] for i in self.order]

    def restore(self, results: Sequence[Any]) -> List[Any]:
        out = [None] * len(results)
        for pos, idx in enumerate(self.order):
            out[idx] = results[pos]
        return out


def rolling_token_windows(tokens: List[int], prefix_token: int,
                          max_seq_len: int, context_len: int = 1
                          ) -> List[Tuple[List[int], List[int]]]:
    """Split a long document into (context, prediction) windows.

    Same contract as the reference's get_rolling_token_windows
    (lm_eval/utils.py:135-175): every token is predicted exactly once; the
    first window's context is the prefix (EOT) token; subsequent windows
    keep ``context_len - 1`` tokens of real context (max_seq_len when the
    remainder is short).
    """
    assert 1 <= context_len <= max_seq_len
    if not tokens:
        return []
    out = []
    first_seq_len = min(max_seq_len, len(tokens))
    out.append(([prefix_token], tokens[:first_seq_len]))
    pred_start = first_seq_len
    while pred_start < len(tokens):
        window_pred_len = min(len(tokens) - pred_start,
                              max_seq_len - context_len + 1)
        window_end = pred_start + window_pred_len
        ctx_start = max(0, window_end - max_seq_len - 1)
        out.append((tokens[ctx_start:pred_start], tokens[pred_start:window_end]))
        pred_start = window_end
    return out


@partial(jax.jit, static_argnames=("cfg", "kernel"))
def _score_batch(params, cfg, ids: jnp.ndarray, kernel: str = "xla"):
    """Teacher-forced token logprobs + greedy tokens.

    ids: [B, T] -> (logprob of ids[:,1:] given prefix, greedy argmax ids).
    """
    from ...models.transformer import forward

    logits, _ = forward(params, cfg, ids, kernel=kernel)
    logp = jax.nn.log_softmax(logits[:, :-1].astype(jnp.float32), axis=-1)
    tgt = ids[:, 1:]
    token_lp = jnp.take_along_axis(logp, tgt[..., None], axis=-1)[..., 0]
    greedy = jnp.argmax(logp, axis=-1)
    return token_lp, greedy


class JaxLM(LM):
    """Scores requests with an owq_tpu model.

    tokenizer: HF-style (callable encode via .encode, .decode, eos_token_id).
    """

    def __init__(self, params, cfg, tokenizer, *, batch_size: int = 8,
                 max_length: Optional[int] = None, kernel: str = "xla"):
        self.params = params
        self.cfg = cfg
        self.tok = tokenizer
        self.batch_size = batch_size
        self.max_length = max_length or cfg.max_position_embeddings or 2048
        self.kernel = kernel

    # -- tokenization helpers ------------------------------------------
    def tok_encode(self, s: str) -> List[int]:
        return self.tok.encode(s, add_special_tokens=False)

    @property
    def eot_token_id(self) -> int:
        return int(getattr(self.tok, "eos_token_id", 0) or 0)

    # -- core scoring --------------------------------------------------
    def _score_token_requests(
            self, reqs: Sequence[Tuple[List[int], List[int]]]
    ) -> List[Tuple[float, bool]]:
        """reqs: (context_tokens, continuation_tokens) pairs."""
        reorder = Reorderer(list(reqs), key=lambda r: -(len(r[0]) + len(r[1])))
        results = []
        bs = self.batch_size
        for start in range(0, len(reorder.items), bs):
            chunk = reorder.items[start:start + bs]
            rows, spans = [], []
            maxlen = 0
            for ctx, cont in chunk:
                ids = (ctx + cont)[-(self.max_length + 1):]
                # keep at least one context token so every continuation
                # token has a scoring position
                cont_len = min(len(cont), len(ids) - 1)
                rows.append(ids)
                spans.append((len(ids) - cont_len, cont_len))
                maxlen = max(maxlen, len(ids))
            batch = np.zeros((len(rows), maxlen), np.int32)
            for i, ids in enumerate(rows):
                batch[i, :len(ids)] = ids  # right-padded
            lp, greedy = _score_batch(self.params, self.cfg,
                                      jnp.asarray(batch), self.kernel)
            lp = np.asarray(lp)
            greedy = np.asarray(greedy)
            for i, (ctx, cont) in enumerate(chunk):
                s, L = spans[i]
                # positions of continuation tokens within lp row:
                # token j of ids is scored at lp[j-1]
                sl = slice(s - 1, s - 1 + L)
                ll = float(lp[i, sl].sum())
                ids = rows[i]
                is_greedy = bool((greedy[i, sl] ==
                                  np.asarray(ids[s:s + L])).all())
                results.append((ll, is_greedy))
        return reorder.restore(results)

    def loglikelihood(self, requests):
        token_reqs = []
        for context, continuation in requests:
            if context == "":
                ctx = [self.eot_token_id]
            else:
                ctx = self.tok_encode(context)
            cont = self.tok_encode(continuation)
            if not cont:  # degenerate continuation
                cont = [self.eot_token_id]
            token_reqs.append((ctx, cont))
        return self._score_token_requests(token_reqs)

    def loglikelihood_rolling(self, requests):
        out = []
        for (text,) in [(r,) if isinstance(r, str) else r for r in requests]:
            tokens = self.tok_encode(text)
            windows = rolling_token_windows(tokens, self.eot_token_id,
                                            self.max_length)
            scored = self._score_token_requests(windows)
            out.append(sum(ll for ll, _ in scored))
        return out

    def greedy_until(self, requests, max_new: int = 256):
        """Batched generation through the continuous-batching engine:
        requests share decode steps; stop strings terminate their request
        at each host sync window."""
        from ...runtime.batching import Engine

        prepped = []
        for context, until in requests:
            if isinstance(until, dict):
                until = until.get("until", [])
            ctx = self.tok_encode(context)[-(self.max_length // 2):]
            if not ctx:
                ctx = [self.eot_token_id]
            prepped.append((ctx, list(until or [])))

        eng = Engine(self.params, self.cfg, max_batch=self.batch_size,
                     max_len=self.max_length, kernel=self.kernel,
                     eos_token_id=self.eot_token_id or None)
        rids = [eng.add_request(np.asarray(ctx, np.int32),
                                min(max_new, self.max_length - len(ctx)))
                for ctx, _ in prepped]
        texts = [None] * len(requests)

        def flush(i):
            rid = rids[i]
            toks = eng.requests[rid].generated
            text = self.tok.decode(toks)
            for stop in prepped[i][1]:
                idx = text.find(stop)
                if idx >= 0:
                    text = text[:idx]
                    if not eng.requests[rid].done:
                        eng.finish_request(rid)
            texts[i] = text

        while not all(eng.requests[r].done for r in rids):
            eng.step(8)
            for i, rid in enumerate(rids):
                if eng.requests[rid].generated and texts[i] is None:
                    # check stop strings each window; freeze text when done
                    rid_req = eng.requests[rid]
                    partial = self.tok.decode(rid_req.generated)
                    stopped = any(s in partial for s in prepped[i][1])
                    if stopped or rid_req.done:
                        flush(i)
            if (not eng.queue and not any(r is not None
                                          for r in eng.slot_req)):
                break
        for i, rid in enumerate(rids):
            if texts[i] is None:
                flush(i)
        return texts
