"""Native translation metrics: corpus BLEU, chrF, TER.

The reference harness scores translation tasks through the sacrebleu
package (/root/reference/lm_eval/metrics.py:111-154).  This module
implements the same three corpus metrics natively so the wmt16 tasks run
without that dependency; when sacrebleu is importable the tasks prefer it,
and tests/test_translation.py asserts this implementation matches
sacrebleu's scores exactly on random corpora.

Semantics implemented (matching sacrebleu 2.x defaults):
  * BLEU: mteval-13a tokenization, n-grams 1..4, exponential smoothing of
    zero numerators, closest-reference-length brevity penalty.
  * chrF: character 6-grams on whitespace-stripped text, beta=2,
    best-matching reference per segment, effective-order averaging.
  * TER: tercom-style edit rate — case-insensitive tokenized edit distance
    with greedy phrase shifts, total edits / total reference words.
"""

from __future__ import annotations

import math
import re
from collections import Counter
from typing import List, Sequence

__all__ = ["corpus_bleu", "corpus_chrf", "corpus_ter", "Score",
           "tokenize_13a"]


class Score:
    """Minimal result object mirroring sacrebleu's `.score` attribute."""

    def __init__(self, name: str, score: float):
        self.name = name
        self.score = float(score)

    def __repr__(self):  # pragma: no cover - debugging nicety
        return f"{self.name} = {self.score:.2f}"


# ---------------------------------------------------------------------------
# mteval-v13a tokenization (the WMT standard BLEU tokenizer)
# ---------------------------------------------------------------------------

_13A_RULES = [
    # language-independent punctuation splits, in mteval-v13a.pl order
    (re.compile(r"([\{-\~\[-\` -\&\(-\+\:-\@\/])"), r" \1 "),
    (re.compile(r"([^0-9])([\.,])"), r"\1 \2 "),
    (re.compile(r"([\.,])([^0-9])"), r" \1 \2"),
    (re.compile(r"([0-9])(-)"), r"\1 \2 "),
]


def tokenize_13a(line: str) -> List[str]:
    line = line.replace("<skipped>", "")
    line = line.replace("-\n", "")
    line = line.replace("\n", " ")
    if "&" in line:
        line = (line.replace("&quot;", '"').replace("&amp;", "&")
                .replace("&lt;", "<").replace("&gt;", ">"))
    for pat, repl in _13A_RULES:
        line = pat.sub(repl, line)
    return line.split()


def _ngrams(tokens: Sequence, max_order: int) -> Counter:
    counts: Counter = Counter()
    n = len(tokens)
    for order in range(1, max_order + 1):
        for i in range(n - order + 1):
            counts[tuple(tokens[i:i + order])] += 1
    return counts


# ---------------------------------------------------------------------------
# BLEU
# ---------------------------------------------------------------------------

def corpus_bleu(hypotheses: Sequence[str],
                references: Sequence[Sequence[str]],
                max_order: int = 4) -> Score:
    """Corpus BLEU with 13a tokenization and 'exp' smoothing.

    `references` is a list of reference *streams*: references[r][i] is the
    r-th reference for hypothesis i (sacrebleu's corpus_bleu convention).
    """
    correct = [0] * max_order
    total = [0] * max_order
    sys_len = 0
    ref_len = 0
    for i, hyp in enumerate(hypotheses):
        hyp_toks = tokenize_13a(hyp)
        ref_toks = [tokenize_13a(refs[i]) for refs in references
                    if refs[i] is not None]
        sys_len += len(hyp_toks)
        # closest reference length; ties broken toward the shorter ref
        ref_len += min((abs(len(r) - len(hyp_toks)), len(r))
                       for r in ref_toks)[1]
        hyp_ngrams = _ngrams(hyp_toks, max_order)
        max_ref: Counter = Counter()
        for r in ref_toks:
            for ng, cnt in _ngrams(r, max_order).items():
                if cnt > max_ref[ng]:
                    max_ref[ng] = cnt
        for ng, cnt in hyp_ngrams.items():
            order = len(ng)
            total[order - 1] += cnt
            correct[order - 1] += min(cnt, max_ref[ng])

    precisions = [0.0] * max_order
    smooth = 1.0
    for n in range(max_order):
        if total[n] == 0:
            break
        if correct[n] == 0:
            smooth *= 2.0
            precisions[n] = 100.0 / (smooth * total[n])
        else:
            precisions[n] = 100.0 * correct[n] / total[n]

    if sys_len == 0:
        return Score("BLEU", 0.0)
    if sys_len < ref_len:
        bp = math.exp(1.0 - ref_len / sys_len)
    else:
        bp = 1.0
    log_sum = sum(math.log(p) if p > 0 else -9999999999.0
                  for p in precisions)
    return Score("BLEU", bp * math.exp(log_sum / max_order))


# ---------------------------------------------------------------------------
# chrF
# ---------------------------------------------------------------------------

def _chrf_stats(hyp: str, ref: str, order: int) -> List[int]:
    """Per-order (hyp_count, ref_count, match_count) triples."""
    hyp_chars = "".join(hyp.split())
    ref_chars = "".join(ref.split())
    stats = []
    for n in range(1, order + 1):
        h = Counter(hyp_chars[i:i + n]
                    for i in range(len(hyp_chars) - n + 1))
        r = Counter(ref_chars[i:i + n]
                    for i in range(len(ref_chars) - n + 1))
        match = sum(min(cnt, r[ng]) for ng, cnt in h.items())
        stats.extend([sum(h.values()), sum(r.values()), match])
    return stats


def _chrf_f(stats: List[int], order: int, beta: float) -> float:
    # sacrebleu>=2 default (eps_smoothing=False): average precision and
    # recall over "effective" orders (both sides non-empty), then a single
    # F-beta of those averages.
    eps = 1e-16
    factor = beta ** 2
    avg_prec = avg_rec = 0.0
    effective = 0
    for i in range(order):
        n_hyp, n_ref, n_match = stats[3 * i:3 * i + 3]
        prec = n_match / n_hyp if n_hyp > 0 else eps
        rec = n_match / n_ref if n_ref > 0 else eps
        if n_hyp > 0 and n_ref > 0:
            avg_prec += prec
            avg_rec += rec
            effective += 1
    if effective == 0:
        return 0.0
    avg_prec /= effective
    avg_rec /= effective
    if avg_prec + avg_rec == 0:
        return 0.0
    return 100.0 * (1 + factor) * avg_prec * avg_rec / (
        factor * avg_prec + avg_rec)


def corpus_chrf(hypotheses: Sequence[str],
                references: Sequence[Sequence[str]],
                order: int = 6, beta: float = 2.0) -> Score:
    """Corpus chrF (char 6-grams, beta=2); best reference per segment."""
    totals = [0] * (3 * order)
    for i, hyp in enumerate(hypotheses):
        best = None
        best_f = -1.0
        for refs in references:
            if refs[i] is None:
                continue
            stats = _chrf_stats(hyp, refs[i], order)
            f = _chrf_f(stats, order, beta)
            if f > best_f:
                best_f, best = f, stats
        if best is not None:
            totals = [a + b for a, b in zip(totals, best)]
    return Score("chrF2", _chrf_f(totals, order, beta))


# ---------------------------------------------------------------------------
# TER (tercom-style: edit distance with greedy phrase shifts)
# ---------------------------------------------------------------------------

_TER_PUNCT = re.compile(r"([\.,\?:;!\"\(\)])")
_TER_SYMBOLS = re.compile(r"([\{-\~\[-\` -\&\(-\+\:-\@\/])")


def _ter_tokenize(sent: str, case_sensitive: bool = False) -> List[str]:
    if not case_sensitive:
        sent = sent.lower()
    return sent.split()


def _edit_distance(hyp: List[str], ref: List[str]) -> int:
    """Plain Levenshtein over tokens (unit costs)."""
    m, n = len(hyp), len(ref)
    if m == 0:
        return n
    if n == 0:
        return m
    prev = list(range(n + 1))
    for i in range(1, m + 1):
        cur = [i] + [0] * n
        hi = hyp[i - 1]
        for j in range(1, n + 1):
            cost = 0 if hi == ref[j - 1] else 1
            cur[j] = min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + cost)
        prev = cur
    return prev[n]


_MAX_SHIFT_SIZE = 10
_MAX_SHIFT_DIST = 50


def _find_shifted(hyp: List[str], ref: List[str]):
    """Best single shift of a hyp phrase that lowers edit distance.

    tercom's greedy step: try moving every hyp span (len<=10) that occurs
    somewhere in ref to each position within distance 50; keep the move
    with the largest distance reduction.
    """
    base = _edit_distance(hyp, ref)
    ref_ngrams = set()
    for n in range(1, _MAX_SHIFT_SIZE + 1):
        for i in range(len(ref) - n + 1):
            ref_ngrams.add(tuple(ref[i:i + n]))
    best = None
    best_dist = base
    for size in range(1, min(_MAX_SHIFT_SIZE, len(hyp)) + 1):
        for start in range(len(hyp) - size + 1):
            phrase = tuple(hyp[start:start + size])
            if phrase not in ref_ngrams:
                continue
            rest = hyp[:start] + hyp[start + size:]
            for pos in range(len(rest) + 1):
                if pos == start:
                    continue
                if abs(pos - start) > _MAX_SHIFT_DIST:
                    continue
                cand = rest[:pos] + list(phrase) + rest[pos:]
                d = _edit_distance(cand, ref)
                if d < best_dist:
                    best_dist = d
                    best = cand
    if best is None:
        return None, base
    return best, best_dist


def _ter_segment(hyp: List[str], ref: List[str]):
    """(num_edits, ref_len) for one hypothesis/reference pair."""
    edits = 0
    cur = list(hyp)
    while True:
        shifted, dist = _find_shifted(cur, ref)
        if shifted is None:
            edits += dist
            break
        # one shift costs one edit, then continue from the shifted string
        edits += 1
        cur = shifted
    return edits, len(ref)


def corpus_ter(hypotheses: Sequence[str],
               references: Sequence[Sequence[str]],
               case_sensitive: bool = False) -> Score:
    """Corpus TER: total best-reference edits / total reference words."""
    total_edits = 0
    total_ref = 0.0
    for i, hyp in enumerate(hypotheses):
        hyp_toks = _ter_tokenize(hyp, case_sensitive)
        best_edits = None
        ref_lens = []
        for refs in references:
            if refs[i] is None:
                continue
            ref_toks = _ter_tokenize(refs[i], case_sensitive)
            edits, rlen = _ter_segment(hyp_toks, ref_toks)
            ref_lens.append(rlen)
            if best_edits is None or edits < best_edits:
                best_edits = edits
        if best_edits is None:
            continue
        total_edits += best_edits
        total_ref += sum(ref_lens) / len(ref_lens)
    if total_ref == 0:
        return Score("TER", 0.0 if total_edits == 0 else 100.0)
    return Score("TER", 100.0 * total_edits / total_ref)
