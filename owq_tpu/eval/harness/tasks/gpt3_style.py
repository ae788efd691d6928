"""GPT-3-paper task suites: arithmetic (10), unscramble (5), MGSM (11),
XWinograd (6), and sacrebleu-sourced translation benchmarks
(wmt14 ×2, wmt20 ×22, iwslt17 ×2).

References: lm_eval/tasks/arithmetic.py, unscramble.py (+ the
datasets/unscramble loader pulling OpenAI's gpt-3 repo jsonl.gz dumps),
mgsm.py, xwinograd.py, translation.py.
"""

from __future__ import annotations

import gzip
import json
import os
import re

from .. import metrics as M
from ..metrics import mean
from ..registry import register_task
from ..task import Request, Task
from . import Winogrande, _load


# --------------------------------------------------------------------------
# arithmetic: greedy-match of the exact completion via loglikelihood
# (reference arithmetic.py:29-77 — acc is the `is_greedy` bit).
# --------------------------------------------------------------------------

ARITHMETIC_CONFIGS = {
    "arithmetic_2da": "arithmetic_2da",
    "arithmetic_2ds": "arithmetic_2ds",
    "arithmetic_3da": "arithmetic_3da",
    "arithmetic_3ds": "arithmetic_3ds",
    "arithmetic_4da": "arithmetic_4da",
    "arithmetic_4ds": "arithmetic_4ds",
    "arithmetic_5da": "arithmetic_5da",
    "arithmetic_5ds": "arithmetic_5ds",
    "arithmetic_2dm": "arithmetic_2dm",
    "arithmetic_1dc": "arithmetic_1dc",
}


class ArithmeticTask(Task):
    VERSION = 0
    CONFIG = "arithmetic_2da"

    def download(self, data_dir=None):
        self.data = _load("EleutherAI/arithmetic", self.CONFIG,
                          data_dir=data_dir)

    def has_validation_docs(self):
        return True

    def has_test_docs(self):
        return False

    def validation_docs(self):
        return self.data["validation"]

    def doc_to_text(self, doc):
        return doc["context"]

    def doc_to_target(self, doc):
        return doc["completion"]

    def construct_requests(self, doc, ctx):
        return [Request("loglikelihood", (ctx, doc["completion"]))]

    def process_results(self, doc, results):
        (_, is_greedy), = results
        return {"acc": float(is_greedy)}

    def aggregation(self):
        return {"acc": mean}

    def higher_is_better(self):
        return {"acc": True}


for _name, _cfg in ARITHMETIC_CONFIGS.items():
    register_task(_name)(
        type(f"Arith_{_name}", (ArithmeticTask,), {"CONFIG": _cfg}))


# --------------------------------------------------------------------------
# unscramble: greedy generation until newline, exact string match
# (reference unscramble.py + datasets/unscramble — OpenAI gpt-3 repo data).
# --------------------------------------------------------------------------

UNSCRAMBLE_CONFIGS = {
    "anagrams1": "mid_word_1_anagrams",
    "anagrams2": "mid_word_2_anagrams",
    "cycle_letters": "cycle_letters_in_word",
    "random_insertion": "random_insertion_in_word",
    "reversed_words": "reversed_words",
}

_UNSCRAMBLE_URL = "https://raw.githubusercontent.com/openai/gpt-3/master/data"


class UnscrambleTask(Task):
    VERSION = 0
    CONFIG = "cycle_letters_in_word"

    def download(self, data_dir=None):
        if data_dir:
            path = None
            for suffix in (".jsonl", ".jsonl.gz"):
                cand = os.path.join(data_dir, self.CONFIG + suffix)
                if os.path.exists(cand):
                    path = cand
                    break
            if path is None:
                raise FileNotFoundError(
                    f"{self.CONFIG}.jsonl[.gz] not found in {data_dir}")
            opener = gzip.open if path.endswith(".gz") else open
            with opener(path, "rt") as f:
                self.docs = [json.loads(ln) for ln in f if ln.strip()]
        else:
            data = _load("json",
                         data_files=f"{_UNSCRAMBLE_URL}/{self.CONFIG}.jsonl.gz")
            self.docs = list(data["train"])

    def has_validation_docs(self):
        return True

    def has_test_docs(self):
        return False

    def validation_docs(self):
        return self.docs

    def doc_to_text(self, doc):
        return doc["context"]

    def doc_to_target(self, doc):
        return doc["completion"]

    def construct_requests(self, doc, ctx):
        return [Request("greedy_until", (ctx, ["\n"]))]

    def process_results(self, doc, results):
        return {"acc": float(results[0] == doc["completion"])}

    def aggregation(self):
        return {"acc": mean}

    def higher_is_better(self):
        return {"acc": True}


for _name, _cfg in UNSCRAMBLE_CONFIGS.items():
    register_task(_name)(
        type(f"Unscramble_{_name}", (UnscrambleTask,), {"CONFIG": _cfg}))


# --------------------------------------------------------------------------
# MGSM: multilingual grade-school math, last-integer extraction
# (reference mgsm.py — per-language Question/Answer cue words).
# --------------------------------------------------------------------------

MGSM_CUES = {
    "en": ("Question:", "Step-by-Step Answer:"),
    "es": ("Pregunta:", "Respuesta paso a paso:"),
    "fr": ("Question :", "Réponse étape par étape :"),
    "de": ("Frage:", "Schritt-für-Schritt-Antwort:"),
    "ru": ("Задача:",
           "Пошаговое"
           "решение:"),
    "zh": ("问题:", "逐步解答:"),
    "ja": ("問題:", "ステップごとの"
           "答え:"),
    "th": ("โจทย์:",
           "คำตอบทีละ"
           "ขั้นตอน:"),
    "sw": ("Swali:", "Jibu la Hatua kwa Hatua:"),
    "bn": ("প্রশ্ন:",
           "ধাপে ধাপে "
           "উত্তর:"),
    "te": ("ప్రశ్న:",
           "దశలవారీగా "
           "సమాధానం:"),
}

_MGSM_ANS_RE = re.compile(r"(\-?\d+)")


class MGSMTask(Task):
    VERSION = 0
    LANG = "en"

    @property
    def QUESTION(self):
        return MGSM_CUES[self.LANG][0]

    @property
    def ANSWER(self):
        return MGSM_CUES[self.LANG][1]

    def download(self, data_dir=None):
        self.data = _load("juletxara/mgsm", self.LANG, data_dir=data_dir)

    def has_validation_docs(self):
        return False

    def has_test_docs(self):
        return True

    def training_docs(self):
        return list(self.data["train"])

    def test_docs(self):
        return self.data["test"]

    def doc_to_text(self, doc):
        # train docs carry the worked answer; test docs have answer=None
        # and get the Question cue prefix (reference mgsm.py:74-78).
        if doc["answer"] is not None:
            return doc["question"] + "\n" + self.ANSWER
        return f"{self.QUESTION} {doc['question']}\n{self.ANSWER}"

    def doc_to_target(self, doc):
        if doc["answer"] is not None:
            return " " + doc["answer"][len(self.ANSWER) + 1:]
        return " " + str(doc["answer_number"])

    def construct_requests(self, doc, ctx):
        return [Request("greedy_until", (ctx, ["\n", ":", self.QUESTION]))]

    def process_results(self, doc, results):
        found = _MGSM_ANS_RE.findall(results[0])
        pred = int(found[-1]) if found else None
        return {"acc": float(pred == doc["answer_number"])}

    def aggregation(self):
        return {"acc": mean}

    def higher_is_better(self):
        return {"acc": True}


for _l in MGSM_CUES:
    register_task(f"mgsm_{_l}")(
        type(f"MGSM_{_l}", (MGSMTask,), {"LANG": _l}))


# --------------------------------------------------------------------------
# XWinograd: winogrande-style partial scoring over 6 languages
# (reference xwinograd.py — test split of Muennighoff/xwinograd).
# --------------------------------------------------------------------------

XWINOGRAD_LANGS = ["en", "fr", "jp", "pt", "ru", "zh"]


class XWinogradTask(Winogrande):
    VERSION = 0
    LANG = "en"

    def download(self, data_dir=None):
        self.data = _load("Muennighoff/xwinograd", self.LANG,
                          data_dir=data_dir)

    def has_validation_docs(self):
        return False

    def has_test_docs(self):
        return True

    def test_docs(self):
        return list(self.data["test"])

    def training_docs(self):
        return []


for _l in XWINOGRAD_LANGS:
    register_task(f"xwinograd_{_l}")(
        type(f"XWinograd_{_l}", (XWinogradTask,), {"LANG": _l}))


# --------------------------------------------------------------------------
# sacrebleu-sourced translation benchmarks.  The reference's translation
# tasks (translation.py) read the raw source/reference files that sacrebleu
# downloads and caches under ~/.sacrebleu; metrics are corpus BLEU / chrF /
# TER with zh (jieba) / ja (nagisa) target segmentation.  We fall back to
# per-character segmentation when the segmenter package is absent.
# --------------------------------------------------------------------------

TRANSLATION_BENCHMARKS = {
    "wmt14": ["en-fr", "fr-en"],
    "wmt20": ["cs-en", "de-en", "de-fr", "en-cs", "en-de", "en-iu", "en-ja",
              "en-km", "en-pl", "en-ps", "en-ru", "en-ta", "en-zh", "fr-de",
              "iu-en", "ja-en", "km-en", "pl-en", "ps-en", "ru-en", "ta-en",
              "zh-en"],
    "iwslt17": ["en-ar", "ar-en"],
}

_LANG_NAMES = {
    "ar": "Arabic", "cs": "Czech", "de": "German", "en": "English",
    "fr": "French", "iu": "Inuktitut", "ja": "Japanese", "km": "Khmer",
    "pl": "Polish", "ps": "Pashto", "ro": "Romanian", "ru": "Russian",
    "ta": "Tamil", "zh": "Chinese",
}


def _segment(lang: str, texts):
    """Whitespace-join target-language tokens for BLEU on zh/ja."""
    if lang == "zh":
        try:
            import jieba

            return [" ".join(jieba.cut(t.strip())) for t in texts]
        except ImportError:
            return [" ".join(t.strip()) for t in texts]
    if lang == "ja":
        try:
            import nagisa

            return [" ".join(nagisa.tagging(t.strip()).words) for t in texts]
        except ImportError:
            return [" ".join(t.strip()) for t in texts]
    return texts


class SacrebleuTranslation(Task):
    VERSION = 0
    TESTSET = "wmt14"
    PAIR = "fr-en"

    def download(self, data_dir=None):
        from sacrebleu.utils import download_test_set, smart_open

        files = download_test_set(self.TESTSET, self.PAIR)
        src_file, ref_file = files[0], files[1]
        with smart_open(src_file) as f:
            self.src = [ln.rstrip("\n") for ln in f]
        with smart_open(ref_file) as f:
            self.ref = [ln.rstrip("\n") for ln in f]

    def has_validation_docs(self):
        return False

    def has_test_docs(self):
        return True

    def test_docs(self):
        return [{"src": s, "ref": r} for s, r in zip(self.src, self.ref)]

    def doc_to_text(self, doc):
        src, dst = self.PAIR.split("-")
        return (f"{_LANG_NAMES[src]} phrase: {doc['src']}\n"
                f"{_LANG_NAMES[dst]} phrase:")

    def doc_to_target(self, doc):
        return " " + doc["ref"]

    def construct_requests(self, doc, ctx):
        return [Request("greedy_until", (ctx, ["\n"]))]

    def process_results(self, doc, results):
        dst = self.PAIR.split("-")[1]
        ref = doc["ref"]
        pred = results[0]
        if dst in ("zh", "ja"):
            ref = _segment(dst, [ref])[0]
            pred = _segment(dst, [pred])[0]
        item = ([ref], pred.strip())
        return {"bleu": item, "chrf": item, "ter": item}

    def aggregation(self):
        return {"bleu": M.bleu, "chrf": M.chrf, "ter": M.ter}

    def higher_is_better(self):
        return {"bleu": True, "chrf": True, "ter": False}


for _ts, _pairs in TRANSLATION_BENCHMARKS.items():
    for _p in _pairs:
        register_task(f"{_ts}-{_p}")(
            type(f"T_{_ts}_{_p.replace('-', '_')}", (SacrebleuTranslation,),
                 {"TESTSET": _ts, "PAIR": _p}))
