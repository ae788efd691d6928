"""Structural/semantic tests for the QA / ethics / math / scrolls task
families (no network: drive request plumbing and scoring on synthetic docs)."""

import numpy as np
import pytest

import jax  # noqa: F401  (conftest pins CPU)

import owq_tpu.eval.harness.tasks  # populate registry
from owq_tpu.eval.harness.registry import TASK_REGISTRY


def T(name):
    cls = TASK_REGISTRY[name]
    return cls.__new__(cls)


def test_registry_superset_of_reference():
    import re

    src = open("/root/reference/lm_eval/tasks/__init__.py").read()
    m = re.search(r"TASK_REGISTRY\s*=\s*\{(.*?)\n\}", src, re.S)
    keys = []
    for line in m.group(1).splitlines():
        if not line.strip().startswith("#"):
            keys += re.findall(r'^\s*"([^"]+)"\s*:', line)
    keys += [f"scrolls_{x}" for x in
             ("qasper", "quality", "narrativeqa", "contractnli",
              "govreport", "summscreenfd", "qmsum")]
    missing = [k for k in keys if k not in TASK_REGISTRY]
    assert not missing, missing


def test_coqa_scoring_leave_one_out():
    t = T("coqa")
    doc = {"story": "s", "questions": ["q1", "q2"],
           "answers": ["a1", "white house"],
           "additional_answers": {"0": {"input_text": ["a1", "the White House"]}}}
    ctx = t.doc_to_text(doc)
    assert ctx.endswith("A:") and "Q: q2" in ctx and "A: a1" in ctx
    res = t.process_results(doc, ["White House.\nQ: junk"])
    assert res["em"] == 1.0 and res["f1"] == 1.0


def test_drop_process_results():
    t = T("drop")
    doc = {"answers": [("15 touchdowns",)]}
    res = t.process_results(doc, ["15 touchdowns"])
    assert res["em"] == 1.0 and res["f1"] == 1.0
    res = t.process_results(doc, ["12"])
    assert res["em"] == 0.0
    # multi-span gold: a single prediction string is one bag, so EM stays 0
    # but F1 aligns the best span (reference drop.py:168-181 semantics)
    doc2 = {"answers": [("foo", "bar")]}
    res2 = t.process_results(doc2, ["foo"])
    assert res2["em"] == 0.0 and res2["f1"] == 0.5


def test_wsc273_partial_context():
    t = T("wsc273")
    doc = {"text": "The trophy fit in the case because it was small.",
           "pronoun": "it", "pronoun_loc": 35,
           "options": ["the trophy", "the case"], "label": 0}
    ctx = t.partial_context(doc, "the trophy")
    assert ctx.endswith("because the trophy")
    target = t.partial_target(doc)
    assert target == " was small."
    reqs = t.construct_requests(doc, t.doc_to_text(doc))
    assert len(reqs) == 2
    res = t.process_results(doc, [(-1.0, False), (-5.0, False)])
    assert res["acc"] == 1.0


def test_record_answer_formatting():
    t = T("record")
    doc = {"passage": "p\n@highlight\nh1", "query": "X @placeholder Y",
           "entities": ["Alice", "Bob"], "answers": ["Bob"]}
    assert t.doc_to_text(doc) == "p\n\n  - h1.\n"
    assert t.format_answer(doc["query"], "Bob") == "  - X Bob Y"
    res = t.process_results(doc, [(-3.0, False), (-1.0, False)])
    assert res["em"] == 1.0 and res["f1"] == 1.0


def test_mctaco_grouped_aggregation():
    t = T("mc_taco")
    # two questions: Q1 (both options right), Q2 (one wrong)
    items = [(1, 1, "q1"), (0, 0, "q1"), (1, 0, "q2"), (0, 0, "q2")]
    em = t.aggregation()["em"](items)
    assert em == 0.5  # only q1 fully correct
    f1 = t.aggregation()["f1"](items)
    assert 0.0 <= f1 <= 1.0


def test_ethics_grouped_em():
    t = T("ethics_deontology")
    # group of 4 all-correct, group of 4 with one miss
    items = ([(0, True)] * 4) + [(4, True), (5, True), (6, False), (7, True)]
    em = t.aggregation()["em"](items)
    assert em == 0.5


def test_ethics_utilitarianism_deterministic_shuffle():
    t = T("ethics_utilitarianism")
    doc = {"activity": "I helped a friend.", "baseline": "I ignored a friend."}
    p1 = t._process(doc)
    p2 = t._process(doc)
    assert p1 == p2  # seeded by the activity text
    assert set(p1["scenarios"]) == {doc["activity"], doc["baseline"]}
    assert p1["label"] == int(p1["scenarios"][0] == doc["activity"])


def test_math_equivalence():
    from owq_tpu.eval.harness.tasks.ethics_math import (
        last_boxed_only_string, math_is_equiv, remove_boxed)

    sol = "We see that $x = \\boxed{\\frac{1}{2}}$ is the answer."
    assert remove_boxed(last_boxed_only_string(sol)) == "\\frac{1}{2}"
    assert math_is_equiv("1/2", "\\frac{1}{2}")
    assert math_is_equiv("0.5", "\\frac{1}{2}")
    assert math_is_equiv("\\left( 3 \\right)", "(3)")  # \left/\right stripped
    assert not math_is_equiv("3", "4")
    t = T("math_algebra")
    doc = {"solution": sol}
    assert t.process_results(doc, ["$\\frac{1}{2}$"])["acc"] == 1.0
    assert t.process_results(doc, ["7"])["acc"] == 0.0


def test_truthfulqa_mc_scoring():
    t = T("truthfulqa_mc")
    doc = {"question": "q",
           "mc1_targets": {"choices": ["true", "false1", "false2"]},
           "mc2_targets": {"choices": ["t1", "t2", "f1"],
                           "labels": [1, 1, 0]}}
    # mc1 lls put the gold (index 0) first; mc2: true mass dominates
    results = [(-1.0, False), (-2.0, False), (-3.0, False),
               (-1.0, False), (-1.0, False), (-4.0, False)]
    res = t.process_results(doc, results)
    assert res["mc1"] == 1.0
    assert 0.9 < res["mc2"] < 1.0


def test_truthfulqa_gen_metrics_without_bleurt():
    t = T("truthfulqa_gen")
    doc = {"question": "q",
           "correct_answers": ["The sky is blue.", "I have no comment."],
           "incorrect_answers": ["The sky is green."]}
    res = t.process_results(doc, ["The sky is blue"])
    assert res["bleu_acc"] == 1
    assert res["rouge1_max"] > res["rouge1_max"] - res["rouge1_diff"] - 1e-9
    agg = t.aggregation()
    assert "bleu_max" in agg and "bleurt_max" not in agg


def test_webqs_prefix_dedup():
    t = T("webqs")
    assert t._remove_prefixes(["new york", "new york city", "nyc"]) == \
        ["new york", "nyc"]


def test_squad2_request_shape():
    t = T("squad2")
    doc = {"id": "1", "title": "T", "context": "C", "question": "Q",
           "answers": {"text": ["A"], "answer_start": [0]}}
    reqs = t.construct_requests(doc, t.doc_to_text(doc))
    assert reqs[0].kind == "greedy_until"
    assert reqs[1].kind == "loglikelihood"
    res = t.process_results(doc, ["A", (-20.0, False)])
    assert set(res) == {"exact", "f1", "HasAns_exact", "HasAns_f1",
                        "NoAns_exact", "NoAns_f1", "best_exact", "best_f1"}
    assert t.aggregation()["exact"]([res["exact"]]) == 100.0


def test_scrolls_dedup_and_quality_parse():
    from owq_tpu.eval.harness.tasks.scrolls import _dedup_inputs

    rows = [{"id": "a", "pid": "1", "input": "q\n\ntext", "output": "x"},
            {"id": "a", "pid": "2", "input": "q\n\ntext", "output": "y"},
            {"id": "b", "pid": "3", "input": "q2\n\ntext2", "output": "z"}]
    docs = _dedup_inputs(rows)
    assert len(docs) == 2 and docs[0]["outputs"] == ["x", "y"]

    t = T("scrolls_quality")
    doc = {"id": "1", "pid": "1",
           "input": ("What color?\n\n (A) red\n (B) blue\n (C) green\n "
                     "(D) yellow\n\nThe story text."),
           "outputs": ["blue"]}
    (d,) = t._process_doc(doc)
    assert d["choices"] == ["red", "blue", "green", "yellow"]
    assert d["gold"] == 1 and d["text"] == "The story text."
    res = t.process_results(d, [(-5.0, False), (-1.0, False),
                                (-4.0, False), (-6.0, False)])
    assert res["acc"] == 1.0


def test_scrolls_qasper_yesno_routing():
    t = T("scrolls_qasper")
    doc = {"id": "1", "pid": "1", "input": "Is it fast?\n\npaper text",
           "outputs": ["Yes"]}
    (d,) = t._process_doc(doc)
    assert d["is_yes_no"]
    reqs = t.construct_requests(d, "ctx")
    assert len(reqs) == 2 and reqs[0].kind == "loglikelihood"
    res = t.process_results(d, [(-1.0, False), (-2.0, False)])
    assert res["f1"] == 100.0


def test_cbt_request_uses_full_passage():
    t = T("cbt-cn")
    doc = {"sentences": ["The dog ran."], "question": "The XXXXX ran .",
           "options": ["dog", "cat"], "answer": "dog"}
    ctx = t.doc_to_text(doc)
    reqs = t.construct_requests(doc, ctx)
    assert reqs[0].args[0] == ""  # scored as full-sequence likelihood
    assert "dog ran" in reqs[0].args[1]
    res = t.process_results(doc, [(-1.0, False), (-9.0, False)])
    assert res["acc"] == 1.0


def test_mutual_rank_metrics():
    t = T("mutual")
    doc = {"article": "a b", "options": ["w", "x", "y", "z"], "answers": "B"}
    res = t.process_results(doc, [(-3.0, 0), (-2.0, 0), (-1.0, 0), (-4.0, 0)])
    assert res["r@1"] == 0.0 and res["r@2"] == 1.0 and res["mrr"] == 0.5


def test_csatqa_haerae_prompts():
    t = T("csatqa_wr")
    doc = t._process({"context": "c", "question": "q", "option#1": "1",
                      "option#2": "2", "option#3": "3", "option#4": "4",
                      "option#5": "5", "gold": 3})
    assert doc["gold"] == 2 and len(doc["choices"]) == 5
    h = T("haerae_rc")
    hd = h._process({"query": "q", "o1": "a", "o2": "b", "o3": "c",
                     "o4": "d", "o5": None, "gold": 1})
    assert hd["gold"] == 0 and len(hd["choices"]) == 4
