"""Differential test of the EVALUATOR CORE against the reference's own
vendored lm_eval (VERDICT r4 item 4 — the last protocol surface without a
head-to-head).

The reference's ``evaluate(lm=..., task_dict=...)`` accepts an injected LM
object and arbitrary Task instances, so the whole protocol — seed-42 doc
shuffle, limit slicing, fewshot context assembly (k from the training
split / k+1-with-dedup otherwise), request grouping by type, per-doc
metric routing, aggregation, analytic + chunked-bootstrap stderr
(/root/reference/lm_eval/evaluator.py:142-391, metrics.py:192-252) — can
run offline on a shared fixture with a DETERMINISTIC fake LM, and the
results dicts compared against our ``harness.evaluator.evaluate``.

Both sides see identical docs and identical hash-derived loglikelihoods;
every divergence in doc order, rnd consumption, prompt text, metric
plumbing, or stderr resampling shows up as a mismatched number.
"""

import hashlib
import importlib
import json
import math
import os
import sys
import types

import numpy as np
import pytest

REF = "/root/reference"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(os.path.join(REF, "lm_eval")),
    reason="reference checkout not present")


# ---------------------------------------------------------------------------
# reference lm_eval loader (stubs for deps absent from this container)
# ---------------------------------------------------------------------------

def _load_ref_lm_eval():
    if "lm_eval.evaluator" in sys.modules:
        return (sys.modules["lm_eval.evaluator"],
                sys.modules["lm_eval.base"],
                sys.modules["lm_eval.metrics"])
    if REF not in sys.path:
        sys.path.insert(0, REF)

    def stub(name, **attrs):
        if name in sys.modules:
            return sys.modules[name]
        m = types.ModuleType(name)
        for k, v in attrs.items():
            setattr(m, k, v)
        sys.modules[name] = m
        return m

    class _SqliteDict(dict):
        def __init__(self, *a, **k):
            super().__init__()

        def commit(self):
            pass

        def close(self):
            pass

    stub("sqlitedict", SqliteDict=_SqliteDict)
    stub("omegaconf", OmegaConf=object)
    stub("pycountry",
         languages=types.SimpleNamespace(get=lambda **k: None))
    import datasets

    if not hasattr(datasets, "load_metric"):  # removed in new datasets
        datasets.load_metric = lambda *a, **k: None
    ev = importlib.import_module("lm_eval.evaluator")
    base = importlib.import_module("lm_eval.base")
    metrics = importlib.import_module("lm_eval.metrics")
    return ev, base, metrics


# ---------------------------------------------------------------------------
# shared fixture: docs + a deterministic LM both harnesses can consume
# ---------------------------------------------------------------------------

MC_TRAIN = [
    {"query": f"Train question {i}?", "choices": [f"alpha{i}", f"bb{i}",
                                                  f"gamma gamma {i}"],
     "gold": i % 3}
    for i in range(12)
]
MC_TEST = [
    {"query": f"Test question {i} about thing {i * 7 % 5}.",
     "choices": [f"one {i}", f"twotwo {i}", f"c{i}"], "gold": (i * 2) % 3}
    for i in range(15)
]
CLOZE_DOCS = [
    {"text": f"The quick brown fox {i} jumps over the lazy dog {i * 3}."}
    for i in range(14)
]


def _det_ll(ctx: str, cont: str):
    h = hashlib.md5(f"LL|{ctx}|{cont}".encode()).digest()
    ll = -0.25 - int.from_bytes(h[:4], "big") / 2 ** 32 * 8.0
    return ll, (h[4] % 2 == 0)


def _det_rolling(s: str) -> float:
    h = hashlib.md5(f"ROLL|{s}".encode()).digest()
    return -0.5 - int.from_bytes(h[:4], "big") / 2 ** 32 * 40.0


class DetLM:
    """Deterministic injected LM serving BOTH evaluator interfaces.

    The reference's evaluate calls ``lm.loglikelihood(list-of-arg-tuples)``
    and ``lm.loglikelihood_rolling(list-of-(string,)-tuples)``; ours passes
    bare strings for rolling — normalize both.
    """

    def loglikelihood(self, requests):
        return [_det_ll(ctx, cont) for ctx, cont in requests]

    def loglikelihood_rolling(self, requests):
        return [_det_rolling(r[0] if isinstance(r, (tuple, list)) else r)
                for r in requests]

    def greedy_until(self, requests):
        return ["stub" for _ in requests]


# ---------------------------------------------------------------------------
# task pairs (reference classes vs ours) over the SAME docs
# ---------------------------------------------------------------------------

def _ref_mc_task(base):
    class RefMC(base.MultipleChoiceTask):
        VERSION = 7

        def __init__(self):
            self._training_docs = None
            self._fewshot_docs = None

        def download(self, *a, **k):
            pass

        def has_training_docs(self):
            return True

        def has_validation_docs(self):
            return False

        def has_test_docs(self):
            return True

        def training_docs(self):
            return list(MC_TRAIN)

        def test_docs(self):
            return list(MC_TEST)

        def doc_to_text(self, doc):
            return doc["query"] + "\nAnswer:"

    return RefMC()


def _our_mc_task():
    from owq_tpu.eval.harness.task import MultipleChoiceTask

    class OurMC(MultipleChoiceTask):
        VERSION = 7

        def has_training_docs(self):
            return True

        def has_validation_docs(self):
            return False

        def has_test_docs(self):
            return True

        def training_docs(self):
            return list(MC_TRAIN)

        def test_docs(self):
            return list(MC_TEST)

        def doc_to_text(self, doc):
            return doc["query"] + "\nAnswer:"

    return OurMC()


def _ref_cloze_task(base, metrics):
    class RefCloze(base.Task):
        VERSION = 3

        def __init__(self):
            self._training_docs = None
            self._fewshot_docs = None

        def download(self, *a, **k):
            pass

        def has_training_docs(self):
            return False

        def has_validation_docs(self):
            return False

        def has_test_docs(self):
            return True

        def test_docs(self):
            return list(CLOZE_DOCS)

        def doc_to_text(self, doc):
            return doc["text"].rsplit(" ", 1)[0]

        def doc_to_target(self, doc):
            return " " + doc["text"].rsplit(" ", 1)[1]

        def construct_requests(self, doc, ctx):
            # reference task idiom: iterating the Request yields one
            # indexed sub-request per return slot (base.py:1176-1180)
            ll, is_greedy = base.rf.loglikelihood(
                ctx, self.doc_to_target(doc))
            return ll, is_greedy

        def process_results(self, doc, results):
            ll, is_greedy = results
            return {"ppl": ll, "acc": float(is_greedy)}

        def aggregation(self):
            return {"ppl": metrics.perplexity, "acc": metrics.mean}

        def higher_is_better(self):
            return {"ppl": False, "acc": True}

    return RefCloze()


def _our_cloze_task():
    from owq_tpu.eval.harness import metrics as M
    from owq_tpu.eval.harness.task import Request, Task

    class OurCloze(Task):
        VERSION = 3

        def has_validation_docs(self):
            return False

        def has_test_docs(self):
            return True

        def test_docs(self):
            return list(CLOZE_DOCS)

        def doc_to_text(self, doc):
            return doc["text"].rsplit(" ", 1)[0]

        def doc_to_target(self, doc):
            return " " + doc["text"].rsplit(" ", 1)[1]

        def construct_requests(self, doc, ctx):
            return [Request("loglikelihood", (ctx, self.doc_to_target(doc)))]

        def process_results(self, doc, results):
            ll, is_greedy = results[0]
            # (ll, 1) tuples: our perplexity aggregates exp(-sum/sum),
            # identical to the reference's exp(-mean) over bare lls
            return {"ppl": (ll, 1), "acc": float(is_greedy)}

        def aggregation(self):
            return {"ppl": M.perplexity, "acc": M.mean}

        def higher_is_better(self):
            return {"ppl": False, "acc": True}

    return OurCloze()


def _compare(ref_out, our_out, task_name):
    ref_res = ref_out["results"][task_name]
    our_res = our_out["results"][task_name]
    assert set(ref_res) == set(our_res), (
        f"metric keys differ: {sorted(ref_res)} vs {sorted(our_res)}")
    for k, v in ref_res.items():
        assert our_res[k] == pytest.approx(v, rel=1e-9, abs=1e-12), (
            task_name, k, v, our_res[k])
    assert ref_out["versions"][task_name] == our_out["versions"][task_name]


# ---------------------------------------------------------------------------
# tests
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("num_fewshot", [0, 2, 5])
def test_mc_task_matches_reference(num_fewshot):
    """acc/acc_norm + analytic mean stderr, fewshot 0/2/5, limit slicing.

    Covers: seed-42 shuffle-then-limit doc selection, training-split
    fewshot draws (k per doc from the SAME rnd that shuffled), prompt
    assembly, per-choice request fanout and response routing.
    """
    ev, base, _ = _load_ref_lm_eval()
    from owq_tpu.eval.harness.evaluator import evaluate as our_evaluate

    ref_out = ev.evaluate(lm=DetLM(), task_dict={"mc": _ref_mc_task(base)},
                          num_fewshot=num_fewshot, limit=10,
                          bootstrap_iters=1000)
    our_out = our_evaluate(DetLM(), {"mc": _our_mc_task()},
                           num_fewshot=num_fewshot, limit=10,
                           bootstrap_iters=1000)
    _compare(ref_out, our_out, "mc")
    assert "acc_stderr" in ref_out["results"]["mc"]


def test_mc_fractional_limit_matches_reference():
    ev, base, _ = _load_ref_lm_eval()
    from owq_tpu.eval.harness.evaluator import evaluate as our_evaluate

    ref_out = ev.evaluate(lm=DetLM(), task_dict={"mc": _ref_mc_task(base)},
                          num_fewshot=1, limit=0.4, bootstrap_iters=0)
    our_out = our_evaluate(DetLM(), {"mc": _our_mc_task()},
                           num_fewshot=1, limit=0.4, bootstrap_iters=0)
    _compare(ref_out, our_out, "mc")


def test_cloze_bootstrap_stderr_matches_reference():
    """Bootstrappable aggregation (perplexity): the chunked bootstrap —
    Random(i)-seeded chunks of rnd.choices resamples — must reproduce the
    reference's stderr bit-for-bit, and the fewshot k+1-dedup branch
    (no training docs) must consume the rnd stream identically.
    """
    ev, base, metrics = _load_ref_lm_eval()
    from owq_tpu.eval.harness.evaluator import evaluate as our_evaluate

    ref_out = ev.evaluate(lm=DetLM(),
                          task_dict={"cz": _ref_cloze_task(base, metrics)},
                          num_fewshot=2, limit=None, bootstrap_iters=2000)
    our_out = our_evaluate(DetLM(), {"cz": _our_cloze_task()},
                           num_fewshot=2, limit=None, bootstrap_iters=2000)
    _compare(ref_out, our_out, "cz")
    assert "ppl_stderr" in ref_out["results"]["cz"]  # bootstrapped


def test_json_perplexity_matches_reference(tmp_path):
    """The reference's literal "json" registry task (tasks/json.py —
    PerplexityTask over a local JSON file addressed split:key:path) vs our
    "json" dispatch: rolling requests, word/byte perplexity and
    bits_per_byte with the reference's whitespace-count semantics, and NO
    stderr keys (weighted_perplexity is not bootstrappable).
    """
    ev, _, _ = _load_ref_lm_eval()
    from lm_eval.tasks.json import JsonPerplexity as RefJson

    from owq_tpu.eval.harness.evaluator import evaluate as our_evaluate
    from owq_tpu.eval.harness.registry import get_task_dict

    rows = [{"text": f"Sample document {i} with several words. "
                     f"And trailing space {i * 11} "} for i in range(9)]
    path = tmp_path / "fixture.json"
    path.write_text(json.dumps(rows))
    spec = f"train:text:{path}"

    ref_out = ev.evaluate(lm=DetLM(), task_dict={"json": RefJson(spec)},
                          num_fewshot=0, limit=6, bootstrap_iters=1000)
    our_out = our_evaluate(DetLM(), get_task_dict(["json"], data_dir=spec),
                           num_fewshot=0, limit=6, bootstrap_iters=1000)
    _compare(ref_out, our_out, "json")
    for k in ref_out["results"]["json"]:
        assert not k.endswith("_stderr")
    # sanity: the deterministic lls actually produced a finite ppl
    assert math.isfinite(ref_out["results"]["json"]["word_perplexity"])
