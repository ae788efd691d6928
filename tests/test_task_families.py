"""Offline tests for the large task families (BLiMP, CrowS-Pairs, CMMLU,
C-Eval, Pile) — registry coverage + request/metric semantics on synthetic
docs, plus a real end-to-end Pile run from a zstd archive written with our
archiver."""

import json
import random

import pytest

import owq_tpu.eval.harness.tasks  # noqa: F401  (populates the registry)
from owq_tpu.eval.harness.registry import TASK_REGISTRY
from owq_tpu.eval.harness import evaluate
from owq_tpu.eval.harness.dummy import DummyLM
from owq_tpu.eval.harness.tasks.minimal_pairs import (
    BLIMP_CONFIGS, CROWS_BIAS_TYPES, BlimpTask, CrowsPairsTask)
from owq_tpu.eval.harness.tasks.chinese import (
    CMMLU_SUBJECTS, CEVAL_SUBJECTS, CmmluTask, CevalTask)
from owq_tpu.eval.harness.tasks.pile import PILE_SETS


def _bare(cls, **attrs):
    """Instantiate a task subclass without running download()."""
    sub = type("T", (cls,), attrs)
    return sub.__new__(sub)


def test_registry_counts():
    assert len(BLIMP_CONFIGS) == 67
    assert len(CMMLU_SUBJECTS) == 67
    assert len(CEVAL_SUBJECTS) == 52
    assert len(PILE_SETS) == 22
    for c in BLIMP_CONFIGS:
        assert f"blimp_{c}" in TASK_REGISTRY
    for lang in ("english", "french"):
        assert f"crows_pairs_{lang}" in TASK_REGISTRY
        for suffix in CROWS_BIAS_TYPES:
            assert f"crows_pairs_{lang}_{suffix}" in TASK_REGISTRY
    for s in CMMLU_SUBJECTS:
        assert f"cmmlu-{s}" in TASK_REGISTRY
    for s in CEVAL_SUBJECTS:
        assert f"Ceval-valid-{s}" in TASK_REGISTRY
    for k in PILE_SETS:
        assert k in TASK_REGISTRY


def test_blimp_pair_semantics():
    t = _bare(BlimpTask)
    doc = {"sentence_good": "The cats sleep.",
           "sentence_bad": "The cats sleeps."}
    reqs = t.construct_requests(doc, t.fewshot_context(doc, 0, random.Random(0)))
    assert [r.kind for r in reqs] == ["loglikelihood"] * 2
    assert reqs[0].args == ("", doc["sentence_good"])
    assert t.process_results(doc, [(-5.0, False), (-7.0, False)])["acc"] == 1.0
    assert t.process_results(doc, [(-7.0, False), (-5.0, False)])["acc"] == 0.0


def test_crows_pairs_semantics():
    t = _bare(CrowsPairsTask)
    res = t.process_results({}, [(-3.0, False), (-4.5, False)])
    assert res["pct_stereotype"] == 1.0
    assert res["likelihood_difference"] == pytest.approx(1.5)
    hib = t.higher_is_better()
    assert hib["pct_stereotype"] is False and hib["likelihood_difference"] is False


def test_cmmlu_prompt_format():
    t = _bare(CmmluTask, SUBJECT="virology")
    doc = t._process_doc({"Question": " 问题？ ", "A": "甲", "B": "乙",
                          "C": "丙", "D": "丁", "Answer": "B"})
    assert doc["query"] == "问题？\nA. 甲\nB. 乙\nC. 丙\nD. 丁\n答案："
    assert doc["choices"] == ["A", "B", "C", "D"] and doc["gold"] == 1
    assert "病毒学" in t.DESCRIPTION_FMT


def test_ceval_fewshot_uses_dev_order():
    t = _bare(CevalTask, SUBJECT="law")
    devdocs = [{"question": f"q{i}", "A": "a", "B": "b", "C": "c", "D": "d",
                "answer": "A"} for i in range(4)]
    t.data = {"val": [], "dev": devdocs}
    doc = t._process_doc(devdocs[3])
    ctx = t.fewshot_context(doc, 2, random.Random(0))
    # description + first two dev docs in order, then the target question
    assert ctx.startswith("以下是中国关于法学的单项选择题")
    assert ctx.index("q0") < ctx.index("q1") < ctx.index("q3")
    assert "q2" not in ctx


def test_pile_task_end_to_end(tmp_path):
    from owq_tpu.eval.archiver import Archive

    arc = Archive(str(tmp_path / "val.jsonl.zst"))
    arc.add_data("github doc one", meta={"pile_set_name": "Github"})
    arc.add_data("arxiv doc", meta={"pile_set_name": "ArXiv"})
    arc.add_data("github doc two", meta={"pile_set_name": "Github"})
    arc.commit()

    task = TASK_REGISTRY["pile_github"](data_dir=str(tmp_path))
    docs = list(task.validation_docs())
    assert docs == ["github doc one", "github doc two"]
    assert task.has_validation_docs() and not task.has_test_docs()

    results = evaluate(DummyLM(), {"pile_github": task}, num_fewshot=0,
                       limit=None)
    res = results["results"]["pile_github"]
    assert "word_perplexity" in res and res["word_perplexity"] > 0


def test_pile_requires_data_dir(monkeypatch):
    monkeypatch.delenv("OWQ_PILE_DIR", raising=False)
    with pytest.raises(RuntimeError):
        TASK_REGISTRY["pile_github"]()
