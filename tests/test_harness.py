"""Zero-shot harness tests (offline: synthetic tasks, stub tokenizer)."""

import numpy as np
import pytest

import jax.numpy as jnp

from owq_tpu.eval.harness import (
    JaxLM,
    Request,
    MultipleChoiceTask,
    evaluate,
    make_table,
    rolling_token_windows,
)
from owq_tpu.eval.harness.dummy import DummyLM
from owq_tpu.models import import_hf_model
import hf_tiny


class CharTok:
    eos_token_id = 1

    def encode(self, s, add_special_tokens=False):
        return [2 + (ord(c) % 90) for c in s]

    def decode(self, ids):
        return "".join(chr(32 + (i % 90)) for i in ids)


class ToyMC(MultipleChoiceTask):
    """In-memory multiple-choice task (no dataset download)."""

    def __init__(self, n=6, data_dir=None):
        self.n = n
        super().__init__(data_dir)

    def download(self, data_dir=None):
        self.docs = [{"query": f"Question {i}: pick.\nAnswer:",
                      "choices": ["alpha", "beta bets", "gamma!"],
                      "gold": i % 3} for i in range(self.n)]

    def has_validation_docs(self):
        return True

    def has_test_docs(self):
        return False

    def validation_docs(self):
        return list(self.docs)

    def training_docs(self):
        return list(self.docs)

    def doc_to_text(self, doc):
        return doc["query"]


def test_rolling_windows_cover_every_token_once():
    toks = list(range(25))
    wins = rolling_token_windows(toks, prefix_token=99, max_seq_len=10)
    preds = [t for _, pred in wins for t in pred]
    assert preds == toks
    assert wins[0][0] == [99]
    for ctx, pred in wins:
        assert len(ctx) + len(pred) <= 11


def test_evaluate_with_dummy_lm():
    task = ToyMC()
    out = evaluate(DummyLM(), {"toy": task}, num_fewshot=0)
    res = out["results"]["toy"]
    assert 0.0 <= res["acc"] <= 1.0
    assert "acc_stderr" in res
    table = make_table(out)
    assert "toy" in table and "acc" in table


def test_evaluate_fewshot_context():
    task = ToyMC()
    import random

    ctx = task.fewshot_context(task.docs[0], 2, random.Random(0))
    assert task.docs[0]["query"] in ctx
    assert ctx.count("Question") >= 3  # 2 shots + the doc itself


class FixedLM(DummyLM):
    """Always ranks the first choice highest."""

    def loglikelihood(self, requests):
        out = []
        for i, (ctx, cont) in enumerate(requests):
            first = cont.strip().startswith("alpha")
            out.append((0.0 if first else -10.0, first))
        return out


def test_mc_accuracy_computation():
    task = ToyMC(n=6)
    out = evaluate(FixedLM(), {"toy": task}, num_fewshot=0)
    # gold rotates 0,1,2 -> predicting always choice 0 gives acc 1/3
    assert abs(out["results"]["toy"]["acc"] - 1 / 3) < 1e-9


@pytest.fixture(scope="module")
def tiny_lm():
    model = hf_tiny.tiny_opt(hidden=32, ffn=64, layers=2, vocab=97, max_pos=64)
    params, cfg = import_hf_model(model)
    return JaxLM(params, cfg, CharTok(), batch_size=4, max_length=48)


def test_jaxlm_loglikelihood_matches_direct(tiny_lm):
    reqs = [("hello wor", "ld"), ("a", "bc"), ("longer context here", " yes")]
    res = tiny_lm.loglikelihood(reqs)
    assert len(res) == 3

    # direct recomputation of request 0
    from owq_tpu.eval.harness.base import _score_batch

    ctx = tiny_lm.tok_encode("hello wor")
    cont = tiny_lm.tok_encode("ld")
    ids = np.asarray([ctx + cont], np.int32)
    lp, greedy = _score_batch(tiny_lm.params, tiny_lm.cfg, jnp.asarray(ids))
    want = float(np.asarray(lp)[0, len(ctx) - 1:].sum())
    assert abs(res[0][0] - want) < 1e-3


def test_jaxlm_order_restoration(tiny_lm):
    reqs = [("x" * i, "end") for i in (1, 20, 5, 12)]
    res = tiny_lm.loglikelihood(reqs)
    res2 = tiny_lm.loglikelihood(list(reversed(reqs)))
    np.testing.assert_allclose([r[0] for r in res],
                               [r[0] for r in reversed(res2)], atol=1e-3)


def test_jaxlm_rolling(tiny_lm):
    text = "the quick brown fox jumps over the lazy dog " * 8
    (ll,) = tiny_lm.loglikelihood_rolling([text])
    ntok = len(tiny_lm.tok_encode(text))
    assert ll < 0
    # sane per-token logprob for a random model over ~97 tokens
    assert -8.0 < ll / ntok < -2.0


def test_jaxlm_greedy_until(tiny_lm):
    outs = tiny_lm.greedy_until([("abc", ["zzz"])])
    assert isinstance(outs[0], str)


def test_hf_adapter_matches_jax_adapter(tiny_lm):
    """The torch "hf" adapter and the JAX "owq" path must agree on the same
    underlying model — cross-implementation oracle for the whole scoring
    stack (tokenize -> batch -> logprob -> greedy match)."""
    from owq_tpu.eval.harness.hf_model import HFLM

    model = hf_tiny.tiny_opt(hidden=32, ffn=64, layers=2, vocab=97,
                             max_pos=64)
    hf_lm = HFLM(model=model, tok=CharTok(), batch_size=4, max_length=48)

    reqs = [("hello wor", "ld"), ("a", "bc"), ("longer context here", " yes"),
            ("", "empty context")]
    ours = tiny_lm.loglikelihood(reqs)
    theirs = hf_lm.loglikelihood(reqs)
    np.testing.assert_allclose([r[0] for r in ours],
                               [r[0] for r in theirs], atol=2e-3, rtol=1e-3)
    assert [r[1] for r in ours] == [r[1] for r in theirs]

    text = "the quick brown fox jumps over the lazy dog " * 4
    (ll_ours,) = tiny_lm.loglikelihood_rolling([text])
    (ll_hf,) = hf_lm.loglikelihood_rolling([text])
    assert abs(ll_ours - ll_hf) < max(2e-3 * abs(ll_hf), 5e-2)


def test_hf_adapter_registered():
    from owq_tpu.eval.harness.registry import get_model

    assert get_model("hf") is get_model("hf-causal")


def test_caching_lm(tmp_path):
    calls = {"n": 0}

    class CountingLM(DummyLM):
        def loglikelihood(self, requests):
            calls["n"] += len(requests)
            return super().loglikelihood(requests)

    from owq_tpu.eval.harness.caching import CachingLM

    lm = CachingLM(CountingLM(), str(tmp_path / "cache.db"))
    reqs = [("a", "b"), ("c", "d")]
    r1 = lm.loglikelihood(reqs)
    assert calls["n"] == 2
    r2 = lm.loglikelihood(reqs)
    assert calls["n"] == 2  # served from cache
    assert r1 == r2


def test_json_task(tmp_path):
    """JSON-defined custom task (reference tasks/json.py analogue)."""
    import json

    docs = [{"context": f"Q{i}:", "choices": ["alpha", "zzz"], "gold": 0}
            for i in range(4)]
    path = tmp_path / "task.json"
    path.write_text(json.dumps(docs))

    from owq_tpu.eval.harness.registry import get_task

    task = get_task("json", data_dir=str(path))
    out = evaluate(FixedLM(), {"custom": task}, num_fewshot=0)
    assert out["results"]["custom"]["acc"] == 1.0


def test_overlap_scan():
    from owq_tpu.eval.overlap import decontaminate_docs

    train = ["the quick brown fox jumps over the lazy dog every day"]
    evals = ["totally unrelated document about mathematics and physics",
             "someone said the quick brown fox jumps over the lazy dog "
             "every day again"]
    clean, dirty = decontaminate_docs(train, evals, ngram_n=5, window=2)
    assert clean == [0] and dirty == [1]


def test_greedy_until_batched(tiny_lm):
    """Batched greedy_until via the engine: stops honored, order kept."""
    reqs = [("abcd", ["XYZ"]), ("efgh", []), ("ij", ["Q"])]
    outs = tiny_lm.greedy_until(reqs)
    assert len(outs) == 3 and all(isinstance(o, str) for o in outs)
    # parity with per-request generation for the no-stop request
    from owq_tpu.runtime.generate import generate
    import numpy as np

    ctx = tiny_lm.tok_encode("efgh")
    want = generate(tiny_lm.params, tiny_lm.cfg,
                    np.asarray([ctx], np.int32), 8,
                    max_len=tiny_lm.max_length,
                    cache_dtype=jnp.bfloat16)[0].tolist()
    # engine stops at the stub eos token; compare decoded text prefixes
    if tiny_lm.eot_token_id in want:
        want = want[: want.index(tiny_lm.eot_token_id) + 1]
    want_text = tiny_lm.tok.decode(want)
    n = min(len(want_text), len(outs[1]))
    assert n > 0 and outs[1][:n] == want_text[:n]


def test_archiver_roundtrip(tmp_path):
    """zstd jsonl archive write/read parity (reference archiver.py) and
    feeding the overlap scanner from an archive."""
    from owq_tpu.eval.archiver import Archive, Reader, read_corpus
    from owq_tpu.eval.overlap import decontaminate_docs

    path = str(tmp_path / "corpus.jsonl.zst")
    docs = ["the quick brown fox " * 6, "unrelated training text " * 6,
            ["para one", "para two"]]
    ar = Archive(path)
    for i, d in enumerate(docs):
        ar.add_data(d, meta={"i": i})
    ar.commit()

    got = list(Reader().read(path, get_meta=True))
    assert len(got) == 3
    assert got[0][0] == docs[0] and got[0][1] == {"i": 0}
    assert got[2][0] == "para one\n\npara two"  # autojoin_paragraphs

    evals = [docs[0] + " tail", "completely novel evaluation document " * 4]
    clean, dirty = decontaminate_docs(read_corpus([path]), evals)
    assert dirty == [0] and clean == [1]


def test_text_archive_roundtrip(tmp_path):
    from owq_tpu.eval.archiver import TextArchive, TextReader

    path = str(tmp_path / "frags.txt")
    ta = TextArchive(path)
    ta.add_data("alpha")
    ta.add_data("beta\n")
    ta.commit()
    assert list(TextReader(path).read()) == ["alpha", "beta"]
