"""Offline data-contract tests for the BASELINE-relevant harness tasks.

VERDICT.md r1 Weak #4: the ~100 task modules call datasets.load_dataset
with hard-coded names/splits/fields that only fail with egress.  The
fixtures in fixtures/hf_datasets.json are small snapshots of the REAL
upstream schemas (field names, value types, label encodings — e.g.
hellaswag's string labels, winogrande's "1"/"2" answers, ARC's mixed
letter/digit answerKeys); each task's whole request chain
(download -> docs -> fewshot_context -> construct_requests ->
process_results -> aggregation) runs against them, so a field rename in a
task module breaks here instead of in a future online eval run.
"""

import json
import os
import random

import pytest

FIXTURES = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "fixtures", "hf_datasets.json")


class FakeSplit:
    """list-of-row-dicts that also supports HF column access (ds["text"])."""

    def __init__(self, rows):
        self.rows = rows

    def __iter__(self):
        return iter(self.rows)

    def __len__(self):
        return len(self.rows)

    def __getitem__(self, key):
        if isinstance(key, str):
            return [r[key] for r in self.rows]
        return self.rows[key]


class FakeDataset(dict):
    pass


@pytest.fixture(scope="module")
def fixture_data():
    with open(FIXTURES) as f:
        raw = json.load(f)
    raw.pop("__doc__", None)
    return raw


@pytest.fixture()
def fake_hf(fixture_data, monkeypatch):
    calls = []

    def load_dataset(name, config=None, **kw):
        key = f"{name}|{config}"
        calls.append(key)
        if key not in fixture_data:
            raise AssertionError(
                f"no fixture for load_dataset({name!r}, {config!r}) — add a "
                f"schema snapshot to tests/fixtures/hf_datasets.json")
        return FakeDataset({split: FakeSplit(rows)
                            for split, rows in fixture_data[key].items()})

    import datasets

    monkeypatch.setattr(datasets, "load_dataset", load_dataset)
    return calls


TASKS = ["hellaswag", "piqa", "lambada_openai", "arc_easy", "boolq", "copa",
         "rte", "sst", "hendrycksTest-abstract_algebra", "winogrande",
         "wikitext", "openbookqa"]


def _fake_result(req):
    if req.kind == "loglikelihood":
        return (-1.5, False)
    if req.kind == "loglikelihood_rolling":
        return -42.0
    if req.kind == "greedy_until":
        return "fake continuation"
    raise AssertionError(f"unknown request kind {req.kind}")


@pytest.mark.parametrize("name", TASKS)
def test_task_chain_against_fixture_schema(name, fake_hf):
    from owq_tpu.eval.harness.registry import get_task_dict

    task = get_task_dict([name])[name]
    docs = list(task.validation_docs() if task.has_validation_docs()
                else task.test_docs())
    assert docs, f"{name}: no docs from fixture"
    rnd = random.Random(42)
    for num_fewshot in (0, 1):
        for doc in docs:
            ctx = task.fewshot_context(doc, num_fewshot, rnd)
            # perplexity tasks legitimately use an empty context
            assert isinstance(ctx, str)
            reqs = task.construct_requests(doc, ctx)
            if not isinstance(reqs, (list, tuple)):
                reqs = [reqs]
            assert reqs
            results = [_fake_result(r) for r in reqs]
            res = task.process_results(doc, results)
            agg = task.aggregation()
            hib = task.higher_is_better()
            for key, val in res.items():
                assert key in agg, (name, key)
                assert key in hib, (name, key)
                # aggregation functions accept a list of per-doc values
                out = agg[key]([val, val])
                assert out == out  # not NaN


def test_fixture_covers_gold_extraction(fake_hf):
    """Spot-check that label decoding matches the upstream encodings the
    fixtures snapshot: hellaswag str labels, ARC digit answerKeys,
    winogrande "1"/"2"."""
    from owq_tpu.eval.harness.registry import get_task_dict

    hs = get_task_dict(["hellaswag"])["hellaswag"]
    doc = list(hs.validation_docs())[0]
    assert doc["gold"] == 3 and len(doc["choices"]) == 4
    # the [title] / double-space cleanup actually ran
    assert "[" not in doc["choices"][2] if len(doc["choices"]) > 2 else True

    arc = get_task_dict(["arc_easy"])["arc_easy"]
    vdocs = list(arc.validation_docs())
    assert vdocs[1]["gold"] == 2  # digit answerKey "3" -> index 2

    wg = get_task_dict(["winogrande"])["winogrande"]
    doc = list(wg.validation_docs())[0]
    reqs = wg.construct_requests(doc, wg.fewshot_context(doc, 0,
                                                         random.Random(0)))
    assert len(reqs) == 2
    # partial scoring: context ends with the option, target is the suffix
    ctx0, tgt0 = reqs[0].args
    assert ctx0.endswith("Sarah") and tgt0.endswith("cases.")
    assert wg.process_results(doc, [(-1.0, False), (-0.5, False)])["acc"] == 1.0
