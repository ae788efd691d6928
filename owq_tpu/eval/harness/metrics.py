"""Aggregation metrics + bootstrap standard errors.

Same metric vocabulary as the reference harness (lm_eval/metrics.py):
mean/acc, f1, matthews, perplexity, weighted perplexity, bits_per_byte,
and nonparametric bootstrap stderr.
"""

from __future__ import annotations

import math
import random
from typing import Callable, List, Optional, Sequence, Tuple

import numpy as np

__all__ = ["mean", "median", "perplexity", "weighted_perplexity",
           "bits_per_byte", "matthews_corrcoef", "f1_score", "acc_all",
           "bootstrap_stderr", "stderr_for", "bleu", "chrf", "ter"]


def _translation_streams(items):
    """items: (refs, pred) pairs where refs is a str or list of str.

    Returns (preds, ref_streams) in sacrebleu corpus convention:
    ref_streams[r][i] = r-th reference for prediction i (None-padded).
    """
    preds = [p for _, p in items]
    ref_lists = [[r] if isinstance(r, str) else list(r) for r, _ in items]
    depth = max(len(r) for r in ref_lists) if ref_lists else 1
    streams = [[r[k] if k < len(r) else None for r in ref_lists]
               for k in range(depth)]
    return preds, streams


def _translation_module():
    """Prefer sacrebleu (the reference's scorer) when importable; our
    native implementation (translation.py) is parity-tested against it."""
    try:
        import sacrebleu

        return sacrebleu
    except ImportError:
        from . import translation

        return translation


def bleu(items) -> float:
    """Corpus BLEU over (refs, pred) items — higher is better."""
    preds, refs = _translation_streams(items)
    return float(_translation_module().corpus_bleu(preds, refs).score)


def chrf(items) -> float:
    """Corpus chrF over (refs, pred) items — higher is better."""
    preds, refs = _translation_streams(items)
    return float(_translation_module().corpus_chrf(preds, refs).score)


def ter(items) -> float:
    """Corpus TER over (refs, pred) items — lower is better."""
    preds, refs = _translation_streams(items)
    return float(_translation_module().corpus_ter(preds, refs).score)


def mean(items: Sequence[float]) -> float:
    return float(np.mean(items))


def perplexity(items: Sequence[Tuple[float, float]]) -> float:
    """items: (loglikelihood, token_count)."""
    lls = [ll for ll, _ in items]
    toks = [n for _, n in items]
    return float(math.exp(-sum(lls) / max(sum(toks), 1)))


def weighted_perplexity(items: Sequence[Tuple[float, float]]) -> float:
    return perplexity(items)


def bits_per_byte(items: Sequence[Tuple[float, float]]) -> float:
    """items: (loglikelihood, byte_count)."""
    lls = [ll for ll, _ in items]
    nbytes = [n for _, n in items]
    return float(-sum(lls) / max(sum(nbytes), 1) / math.log(2))


def matthews_corrcoef(items: Sequence[Tuple[int, int]]) -> float:
    golds = np.asarray([g for g, _ in items])
    preds = np.asarray([p for _, p in items])
    tp = int(((golds == 1) & (preds == 1)).sum())
    tn = int(((golds == 0) & (preds == 0)).sum())
    fp = int(((golds == 0) & (preds == 1)).sum())
    fn = int(((golds == 1) & (preds == 0)).sum())
    denom = math.sqrt((tp + fp) * (tp + fn) * (tn + fp) * (tn + fn))
    return (tp * tn - fp * fn) / denom if denom else 0.0


def f1_score(items: Sequence[Tuple[int, int]]) -> float:
    golds = np.asarray([g for g, _ in items])
    preds = np.asarray([p for _, p in items])
    tp = int(((golds == 1) & (preds == 1)).sum())
    fp = int(((golds == 0) & (preds == 1)).sum())
    fn = int(((golds == 1) & (preds == 0)).sum())
    denom = 2 * tp + fp + fn
    return 2 * tp / denom if denom else 0.0


def median(items: Sequence[float]) -> float:
    return items[len(items) // 2]


def bootstrap_stderr(metric: Callable, items: List, iters: int = 1000
                     ) -> float:
    """Nonparametric bootstrap stderr, reproducing the reference's exact
    resampling stream (lm_eval/metrics.py:192-233): ``iters`` draws in
    chunks of min(1000, iters), chunk i from ``random.Random(i)`` via
    ``rnd.choices(items, k=len(items))``, sample-stddev (ddof=1) of the
    stat distribution.  The reference fans chunks over a process pool;
    imap preserves chunk order, so a serial loop is bit-identical.
    """
    if len(items) <= 1:
        return 0.0
    chunk = min(1000, iters)
    stats = []
    for i in range(max(iters // chunk, 1)):
        rnd = random.Random()
        rnd.seed(i)
        for _ in range(chunk):
            stats.append(metric(rnd.choices(items, k=len(items))))
    return float(np.std(stats, ddof=1))


# metric functions whose stderr the reference bootstraps
# (lm_eval/metrics.py:236-246); everything else analytic-or-none
_BOOTSTRAPPABLE = {"median", "matthews_corrcoef", "f1_score", "perplexity",
                   "bleu", "chrf", "ter"}


def stderr_for(metric_name: str, metric: Callable, items: List,
               iters: int = 1000) -> Optional[float]:
    """Stderr for an aggregation, reference dispatch semantics
    (lm_eval/metrics.py:236-252): bootstrappable metrics resample
    (bleu/chrf/ter capped at 1000 iters); ``mean`` gets the analytic
    sample-stddev/sqrt(n); anything else has NO stderr (returns None —
    the evaluator then omits the ``_stderr`` key, like the reference).
    """
    fn_name = getattr(metric, "__name__", "")
    if fn_name in _BOOTSTRAPPABLE:
        if iters <= 0:
            return None
        it = min(iters, 1000) if metric_name in ("bleu", "chrf", "ter") \
            else iters
        return bootstrap_stderr(metric, items, iters=it)
    if fn_name in ("mean", "acc_all"):
        vals = np.asarray(items, dtype=np.float64)
        if fn_name == "acc_all":  # per-question grouped accuracy
            vals = np.asarray(_acc_all_values(items), dtype=np.float64)
        if vals.size <= 1:
            return 0.0
        return float(vals.std(ddof=1) / math.sqrt(vals.size))
    return None


def _acc_all_values(items) -> List[float]:
    """Question-grouped all-correct indicators (reference acc_all[_stderr],
    lm_eval/metrics.py:48-85): one 0/1 per (paragraph, question)."""
    scoring: dict = {}
    for pred, doc in items:
        key = (doc["idx"]["paragraph"], doc["idx"]["question"])
        ok = doc["label"] == pred
        scoring.setdefault(key, []).append(ok)
    return [float(all(v)) for v in scoring.values()]


def acc_all(items) -> float:
    vals = _acc_all_values(items)
    return float(np.mean(vals)) if vals else 0.0
