"""Native translation metrics vs sacrebleu (the reference's scorer).

The reference harness scores wmt tasks with sacrebleu
(/root/reference/lm_eval/metrics.py:111-154); our native implementations
must agree so the tasks give the same numbers with or without the package.
"""

import random

import pytest

from owq_tpu.eval.harness import translation as T

sacrebleu = pytest.importorskip("sacrebleu")

WORDS = ("the a cat dog house tree runs jumps quickly red blue 42 3.5 "
         "don't it's re-run U.S. hello, world. end").split()


def _corpus(seed, n=24, min_len=1, max_len=30):
    rnd = random.Random(seed)
    hyps, refs = [], []
    for _ in range(n):
        ref = [rnd.choice(WORDS) for _ in range(rnd.randint(min_len, max_len))]
        # hypothesis = noisy copy: drops, swaps, substitutions
        hyp = list(ref)
        for _ in range(rnd.randint(0, max(1, len(ref) // 3))):
            op = rnd.choice("dis")
            pos = rnd.randrange(max(1, len(hyp)))
            if op == "d" and len(hyp) > 1:
                hyp.pop(pos % len(hyp))
            elif op == "i":
                hyp.insert(pos, rnd.choice(WORDS))
            else:
                if hyp:
                    hyp[pos % len(hyp)] = rnd.choice(WORDS)
        if rnd.random() < 0.3 and len(hyp) > 4:  # phrase move (TER shifts)
            s = rnd.randrange(len(hyp) - 2)
            phrase = hyp[s:s + 2]
            del hyp[s:s + 2]
            p = rnd.randrange(len(hyp) + 1)
            hyp[p:p] = phrase
        refs.append(" ".join(ref))
        hyps.append(" ".join(hyp))
    return hyps, [refs]


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
def test_bleu_matches_sacrebleu(seed):
    hyps, refs = _corpus(seed)
    ours = T.corpus_bleu(hyps, refs).score
    theirs = sacrebleu.corpus_bleu(hyps, refs).score
    assert ours == pytest.approx(theirs, abs=1e-9)


def test_bleu_multi_reference():
    hyps, refs = _corpus(7)
    refs2 = _corpus(8)[1][0]
    ours = T.corpus_bleu(hyps, [refs[0], refs2]).score
    theirs = sacrebleu.corpus_bleu(hyps, [refs[0], refs2]).score
    assert ours == pytest.approx(theirs, abs=1e-9)


def test_bleu_zero_ngram_smoothing():
    # short/degenerate hypotheses exercise the exp smoothing + bp edge paths
    hyps = ["cat", "", "the the the"]
    refs = [["the cat sat", "a dog", "the cat the dog"]]
    ours = T.corpus_bleu(hyps, refs).score
    theirs = sacrebleu.corpus_bleu(hyps, refs).score
    assert ours == pytest.approx(theirs, abs=1e-9)


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
def test_chrf_matches_sacrebleu(seed):
    hyps, refs = _corpus(seed)
    ours = T.corpus_chrf(hyps, refs).score
    theirs = sacrebleu.corpus_chrf(hyps, refs).score
    assert ours == pytest.approx(theirs, abs=1e-9)


def test_chrf_empty_hypothesis():
    hyps = ["", "abc"]
    refs = [["some reference", "abc"]]
    ours = T.corpus_chrf(hyps, refs).score
    theirs = sacrebleu.corpus_chrf(hyps, refs).score
    assert ours == pytest.approx(theirs, abs=1e-9)


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_ter_matches_sacrebleu(seed):
    hyps, refs = _corpus(seed, n=12, max_len=18)
    ours = T.corpus_ter(hyps, refs).score
    theirs = sacrebleu.corpus_ter(hyps, refs).score
    assert ours == pytest.approx(theirs, abs=1e-9)


def test_ter_perfect_and_shifted():
    assert T.corpus_ter(["a b c"], [["a b c"]]).score == 0.0
    # one shift should cost one edit, not two moves' worth
    ours = T.corpus_ter(["c a b"], [["a b c"]]).score
    theirs = sacrebleu.corpus_ter(["c a b"], [["a b c"]]).score
    assert ours == pytest.approx(theirs, abs=1e-9)


# --------------------------------------------------------------------------
# Benchmark-group aliases: the reference expands wmt14/wmt16/wmt20/iwslt17
# to per-langpair tasks in its registry (lm_eval/tasks/__init__.py:76-87,
# 202-205 via translation.create_tasks_from_benchmarks), so
# ``--tasks wmt16`` resolves.  get_task_dict performs the same expansion.
# --------------------------------------------------------------------------

def test_group_aliases_expand(monkeypatch):
    import owq_tpu.eval.harness.registry as R

    R._ensure_tasks_loaded()
    for group, members in R.TASK_GROUPS.items():
        assert group not in R.TASK_REGISTRY          # alias, not a task
        for m in members:
            assert m in R.TASK_REGISTRY, (group, m)  # members all exist

    made = []
    monkeypatch.setattr(R, "get_task", lambda n, data_dir=None: made.append(n) or n)
    d = R.get_task_dict(["wmt16", "iwslt17-en-ar"])
    assert list(d) == ["wmt16-en-ro", "wmt16-ro-en", "wmt16-de-en",
                       "wmt16-en-de", "iwslt17-en-ar"]
    # overlap between a group and an explicit member dedupes
    d = R.get_task_dict(["wmt14-en-fr", "wmt14"])
    assert list(d) == ["wmt14-en-fr", "wmt14-fr-en"]
