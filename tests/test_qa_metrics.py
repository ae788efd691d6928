"""Native QA metrics vs their oracle packages (available in this image)."""

import numpy as np
import pytest

from owq_tpu.eval.harness import qa_metrics as Q


CASES = [
    ("The quick brown fox", "the quick brown fox"),
    ("a cat sat on the mat!", "The cat sat on a mat."),
    ("42", "forty two"),
    ("", "something"),
    ("Barack Obama", "Obama, Barack H."),
    ("New York City", "NYC in New York"),
]


def test_squad_exact_f1_parity_vs_transformers():
    from transformers.data.metrics import squad_metrics as SM

    for gold, pred in CASES:
        assert Q.normalize_answer(gold) == SM.normalize_answer(gold)
        assert Q.compute_exact(gold, pred) == SM.compute_exact(gold, pred)
        assert abs(Q.compute_f1(gold, pred) - SM.compute_f1(gold, pred)) < 1e-9


ROUGE_CASES = [
    ("the cat sat on the mat", "the cat was sitting on the mat"),
    ("a completely different sentence", "nothing shared here at all"),
    ("one two three four five six", "one two three four five six"),
    ("first sentence here.\nsecond line of text",
     "second line of text.\nfirst sentence here"),
    ("", "empty reference"),
]


def test_rouge_parity_vs_rouge_score():
    from rouge_score import rouge_scorer

    scorer = rouge_scorer.RougeScorer(
        ["rouge1", "rouge2", "rougeL", "rougeLsum"], use_stemmer=False)
    for ref, pred in ROUGE_CASES:
        ours = Q.rouge(ref, pred)
        theirs = scorer.score(ref, pred)
        for k in ours:
            assert abs(ours[k] - theirs[k].fmeasure) < 1e-9, (k, ref, pred)


def test_squad2_aggregate():
    items = [
        ({"id": "1", "prediction_text": "Paris",
          "no_answer_probability": 0.1},
         {"id": "1", "answers": {"text": ["Paris"], "answer_start": [0]}}),
        ({"id": "2", "prediction_text": "blue",
          "no_answer_probability": 0.2},
         {"id": "2", "answers": {"text": ["red"], "answer_start": [0]}}),
        ({"id": "3", "prediction_text": "",
          "no_answer_probability": 0.9},
         {"id": "3", "answers": {"text": [], "answer_start": []}}),
    ]
    assert Q.squad2_agg("exact", items) == pytest.approx(100 * 2 / 3)
    assert Q.squad2_agg("HasAns_exact", items) == pytest.approx(50.0)
    assert Q.squad2_agg("NoAns_exact", items) == pytest.approx(100.0)
    assert Q.squad2_agg("best_exact", items) >= Q.squad2_agg("exact", items) - 1e-9
    assert 0 <= Q.squad2_agg("f1", items) <= 100


def test_drop_metrics():
    # single span exact
    em, f1 = Q.drop_metrics("the Bears", ("the bears",))
    assert em == 1.0 and f1 == 1.0
    # number gating: numbers must intersect or score is 0
    em, f1 = Q.drop_metrics("12 points", ("15 points",))
    assert em == 0.0 and f1 == 0.0
    em, f1 = Q.drop_metrics("15 points", ("15 points",))
    assert f1 == 1.0
    # multi-span alignment
    em, f1 = Q.drop_metrics(["foo bar", "baz"], ("baz", "foo bar"))
    assert em == 1.0 and f1 == 1.0
    # number normalization: 15.0 == 15
    em, f1 = Q.drop_metrics("15.0", ("15",))
    assert em == 1.0
