"""Native QA/summarization metrics (no metric-package dependencies).

Semantics match the implementations the reference harness calls out to:

  * SQuAD normalize/exact/F1 — transformers squad_metrics (used by coqa,
    record, quac; reference coqa.py:97-124, superglue.py:344-349),
  * SQuAD-v2 aggregate suite (exact/f1/HasAns/NoAns/best_* with the
    no-answer-probability threshold sweep) — datasets' squad_v2 metric
    (reference squad.py:213-222),
  * ROUGE-1/2/L/Lsum F-measures — google rouge_score with default
    tokenization and no stemming (reference truthfulqa.py rouge(),
    scrolls summary tasks),
  * DROP EM/F1 (typed bags, number gating, optimal alignment) — the
    official allennlp DROP evaluator (reference drop.py:160-282).

Parity-tested against rouge_score / transformers.squad_metrics in
tests/test_qa_metrics.py.
"""

from __future__ import annotations

import collections
import re
import string
from typing import Dict, Iterable, List, Sequence, Tuple

__all__ = [
    "normalize_answer", "compute_exact", "compute_f1",
    "metric_max_over_ground_truths", "rouge",
    "squad2_agg", "drop_metrics",
]

_ARTICLES = re.compile(r"\b(a|an|the)\b", re.UNICODE)


# --------------------------------------------------------------------------
# SQuAD-style string metrics
# --------------------------------------------------------------------------

def normalize_answer(s: str) -> str:
    """Lowercase, strip punctuation/articles/extra whitespace."""
    s = s.lower()
    s = "".join(ch for ch in s if ch not in set(string.punctuation))
    s = _ARTICLES.sub(" ", s)
    return " ".join(s.split())


def _get_tokens(s: str) -> List[str]:
    return normalize_answer(s).split() if s else []


def compute_exact(a_gold: str, a_pred: str) -> int:
    return int(normalize_answer(a_gold) == normalize_answer(a_pred))


def compute_f1(a_gold: str, a_pred: str) -> float:
    gold_toks = _get_tokens(a_gold)
    pred_toks = _get_tokens(a_pred)
    common = collections.Counter(gold_toks) & collections.Counter(pred_toks)
    num_same = sum(common.values())
    if len(gold_toks) == 0 or len(pred_toks) == 0:
        # If either is no-answer, F1 is 1 iff they agree
        return float(gold_toks == pred_toks)
    if num_same == 0:
        return 0.0
    precision = num_same / len(pred_toks)
    recall = num_same / len(gold_toks)
    return 2 * precision * recall / (precision + recall)


def metric_max_over_ground_truths(metric_fn, prediction: str,
                                  ground_truths: Sequence[str]) -> float:
    return max(metric_fn(gt, prediction) for gt in ground_truths)


# --------------------------------------------------------------------------
# ROUGE (rouge_score parity: default tokenizer, no stemmer)
# --------------------------------------------------------------------------

_ROUGE_NONALNUM = re.compile(r"[^a-z0-9]+")


def _rouge_tokenize(text: str) -> List[str]:
    return [t for t in _ROUGE_NONALNUM.split(text.lower()) if t]


def _fmeasure(matches: int, n_pred: int, n_ref: int) -> float:
    precision = matches / n_pred if n_pred else 0.0
    recall = matches / n_ref if n_ref else 0.0
    if precision + recall == 0:
        return 0.0
    return 2 * precision * recall / (precision + recall)


def _ngrams(tokens: Sequence[str], n: int) -> collections.Counter:
    return collections.Counter(
        tuple(tokens[i:i + n]) for i in range(len(tokens) - n + 1))


def _rouge_n(ref: Sequence[str], pred: Sequence[str], n: int) -> float:
    rg, pg = _ngrams(ref, n), _ngrams(pred, n)
    matches = sum((rg & pg).values())
    return _fmeasure(matches, sum(pg.values()), sum(rg.values()))


def _lcs_len(a: Sequence[str], b: Sequence[str]) -> int:
    if not a or not b:
        return 0
    dp = [0] * (len(b) + 1)
    for x in a:
        prev = 0
        for j, y in enumerate(b, 1):
            cur = dp[j]
            dp[j] = prev + 1 if x == y else max(dp[j], dp[j - 1])
            prev = cur
    return dp[-1]


def _lcs_table(a: Sequence[str], b: Sequence[str]) -> List[List[int]]:
    rows, cols = len(a), len(b)
    t = [[0] * (cols + 1) for _ in range(rows + 1)]
    for i in range(1, rows + 1):
        for j in range(1, cols + 1):
            if a[i - 1] == b[j - 1]:
                t[i][j] = t[i - 1][j - 1] + 1
            else:
                t[i][j] = max(t[i - 1][j], t[i][j - 1])
    return t


def _backtrack_lcs(a: Sequence[str], b: Sequence[str]) -> List[int]:
    """Indices into ``a`` of one LCS of a and b (rouge_score semantics)."""
    t = _lcs_table(a, b)
    i, j = len(a), len(b)
    out = []
    while i > 0 and j > 0:
        if a[i - 1] == b[j - 1]:
            out.append(i - 1)
            i -= 1
            j -= 1
        elif t[i][j - 1] > t[i - 1][j]:
            j -= 1
        else:
            i -= 1
    return out[::-1]


def _split_sentences(text: str) -> List[List[str]]:
    sents = [s for s in re.split(r"\n", text) if s.strip()]
    toks = [_rouge_tokenize(s) for s in sents]
    return [t for t in toks if t]


def _rouge_lsum(ref_text: str, pred_text: str) -> float:
    """Summary-level ROUGE-L: union-LCS over sentences (rouge_score)."""
    ref_sents = _split_sentences(ref_text)
    pred_sents = _split_sentences(pred_text)
    if not ref_sents or not pred_sents:
        return 0.0
    m = sum(len(s) for s in ref_sents)
    n = sum(len(s) for s in pred_sents)
    token_cnts_r = collections.Counter(t for s in ref_sents for t in s)
    token_cnts_p = collections.Counter(t for s in pred_sents for t in s)
    hits = 0
    for r in ref_sents:
        lcs = set()
        for p in pred_sents:
            lcs.update(_backtrack_lcs(r, p))
        for i in sorted(lcs):
            t = r[i]
            if token_cnts_r[t] > 0 and token_cnts_p[t] > 0:
                hits += 1
                token_cnts_r[t] -= 1
                token_cnts_p[t] -= 1
    return _fmeasure(hits, n, m)


def rouge(ref: str, pred: str) -> Dict[str, float]:
    """F-measures: rouge1 / rouge2 / rougeL / rougeLsum."""
    rt, pt = _rouge_tokenize(ref), _rouge_tokenize(pred)
    return {
        "rouge1": _rouge_n(rt, pt, 1),
        "rouge2": _rouge_n(rt, pt, 2),
        "rougeL": _fmeasure(_lcs_len(rt, pt), len(pt), len(rt)),
        "rougeLsum": _rouge_lsum(ref, pred),
    }


# --------------------------------------------------------------------------
# SQuAD v2 aggregate (datasets squad_v2 metric semantics)
# --------------------------------------------------------------------------

def _squad2_raw(items):
    """items: (prediction dict, reference dict) pairs as in the reference's
    process_results (squad.py:306-315)."""
    exact, f1, na_probs, has_ans = {}, {}, {}, {}
    for pred, ref in items:
        qid = ref["id"]
        golds = [t for t in ref["answers"]["text"] if normalize_answer(t)]
        has_ans[qid] = bool(golds)
        if not golds:
            golds = [""]
        p = pred["prediction_text"]
        exact[qid] = metric_max_over_ground_truths(compute_exact, p, golds)
        f1[qid] = metric_max_over_ground_truths(compute_f1, p, golds)
        na_probs[qid] = pred.get("no_answer_probability", 0.0)
    return exact, f1, na_probs, has_ans


def _apply_thresh(scores, na_probs, has_ans, thresh):
    out = {}
    for qid, s in scores.items():
        if na_probs[qid] > thresh:
            out[qid] = float(not has_ans[qid])
        else:
            out[qid] = s
    return out


def _best_thresh(scores, na_probs, has_ans):
    num_no_ans = sum(1 for q in has_ans if not has_ans[q])
    cur_score = best_score = num_no_ans
    best_thresh = 0.0
    for qid in sorted(na_probs, key=lambda q: na_probs[q]):
        if qid not in scores:
            continue
        diff = scores[qid] if has_ans[qid] else -1
        cur_score += diff
        if cur_score > best_score:
            best_score = cur_score
            best_thresh = na_probs[qid]
    return 100.0 * best_score / len(scores), best_thresh


def squad2_agg(key: str, items) -> float:
    """One squad_v2 aggregate metric over (prediction, reference) pairs."""
    exact, f1, na_probs, has_ans = _squad2_raw(items)
    thresh = 1.0  # datasets metric default no_answer_threshold
    exact_t = _apply_thresh(exact, na_probs, has_ans, thresh)
    f1_t = _apply_thresh(f1, na_probs, has_ans, thresh)
    qids = list(exact.keys())
    ans = [q for q in qids if has_ans[q]]
    noans = [q for q in qids if not has_ans[q]]

    def avg(d, keys):
        return 100.0 * sum(d[q] for q in keys) / len(keys) if keys else 0.0

    if key == "exact":
        return avg(exact_t, qids)
    if key == "f1":
        return avg(f1_t, qids)
    if key == "HasAns_exact":
        return avg(exact_t, ans)
    if key == "HasAns_f1":
        return avg(f1_t, ans)
    if key == "NoAns_exact":
        return avg(exact_t, noans)
    if key == "NoAns_f1":
        return avg(f1_t, noans)
    if key == "best_exact":
        return _best_thresh(exact, na_probs, has_ans)[0]
    if key == "best_f1":
        return _best_thresh(f1, na_probs, has_ans)[0]
    raise KeyError(key)


# --------------------------------------------------------------------------
# DROP EM/F1 (official evaluator semantics; reference drop.py:160-282)
# --------------------------------------------------------------------------

def _drop_is_number(text: str) -> bool:
    try:
        float(text)
        return True
    except ValueError:
        return False


def _drop_normalize(answer: str) -> str:
    def norm_token(token: str) -> str:
        t = token.lower()
        if not _drop_is_number(t):
            t = "".join(ch for ch in t if ch not in set(string.punctuation))
        t = _ARTICLES.sub(" ", t)
        if _drop_is_number(t):
            t = str(float(t))
        return " ".join(t.split())

    tokens = [norm_token(t) for t in re.split(" |-", answer)]
    return " ".join(t for t in tokens if t.strip()).strip()


def _drop_bags(answer) -> Tuple[List[str], List[set]]:
    spans = answer if isinstance(answer, (list, tuple)) else [answer]
    normalized = [_drop_normalize(s) for s in spans]
    return normalized, [set(n.split()) for n in normalized]


def _drop_bag_f1(pred_bag: set, gold_bag: set) -> float:
    inter = len(gold_bag & pred_bag)
    precision = inter / len(pred_bag) if pred_bag else 1.0
    recall = inter / len(gold_bag) if gold_bag else 1.0
    return (2 * precision * recall / (precision + recall)
            if (precision or recall) else 0.0)


def _drop_numbers_gate(gold_bag: set, pred_bag: set) -> bool:
    gold_numbers = {w for w in gold_bag if _drop_is_number(w)}
    pred_numbers = {w for w in pred_bag if _drop_is_number(w)}
    return (not gold_numbers) or bool(gold_numbers & pred_numbers)


def drop_metrics(predicted, gold) -> Tuple[float, float]:
    """(exact_match, f1) between a predicted and gold answer (str or list)."""
    import numpy as np
    from scipy.optimize import linear_sum_assignment

    pred_spans, pred_bags = _drop_bags(predicted)
    gold_spans, gold_bags = _drop_bags(gold)

    em = float(set(pred_spans) == set(gold_spans)
               and len(pred_spans) == len(gold_spans))

    scores = np.zeros((len(gold_bags), len(pred_bags)))
    for gi, gb in enumerate(gold_bags):
        for pi, pb in enumerate(pred_bags):
            if _drop_numbers_gate(gb, pb):
                scores[gi, pi] = _drop_bag_f1(pb, gb)
    row, col = linear_sum_assignment(-scores)
    max_scores = np.zeros(max(len(gold_bags), len(pred_bags)))
    for r, c in zip(row, col):
        max_scores[r] = max(max_scores[r], scores[r, c])
    return em, round(float(np.mean(max_scores)), 2)
