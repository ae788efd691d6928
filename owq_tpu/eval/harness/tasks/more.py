"""Additional task families: ANLI, RACE, SWAG, multilingual (XCOPA/XNLI/
XStoryCloze/PAWS-X/multilingual LAMBADA), science/medical QA, and
translation (native BLEU scorer, sacrebleu-parity-tested) — further
closing the reference registry."""

from __future__ import annotations

from typing import List

from ..metrics import mean
from ..registry import register_task
from ..task import Request, Task
from . import LambadaOpenAI, _HFMultipleChoice, _load


# --------------------------------------------------------------------------
# ANLI rounds
# --------------------------------------------------------------------------

class _ANLI(_HFMultipleChoice):
    VERSION = 0
    ROUND = 1

    def download(self, data_dir=None):
        self.data = _load("anli", data_dir=data_dir)

    @property
    def SPLIT_VALID(self):  # type: ignore[override]
        return f"dev_r{self.ROUND}"

    @property
    def SPLIT_TRAIN(self):  # type: ignore[override]
        return f"train_r{self.ROUND}"

    def has_validation_docs(self):
        return True

    def has_test_docs(self):
        return False

    def validation_docs(self):
        return map(self._convert, self.data[f"dev_r{self.ROUND}"])

    def training_docs(self):
        return list(map(self._convert, self.data[f"train_r{self.ROUND}"]))

    def _convert(self, doc):
        return {"query": f"{doc['premise']}\nQuestion: {doc['hypothesis']} "
                         "True, False, or Neither?\nAnswer:",
                "choices": ["True", "Neither", "False"],
                "gold": int(doc["label"])}


for _r in (1, 2, 3):
    register_task(f"anli_r{_r}")(type(f"ANLIr{_r}", (_ANLI,), {"ROUND": _r}))


# --------------------------------------------------------------------------
# RACE / SWAG / storycloze-style
# --------------------------------------------------------------------------

@register_task("race")
class RACE(_HFMultipleChoice):
    VERSION = 1
    SPLIT_TEST = "test"

    def download(self, data_dir=None):
        self.data = _load("race", "high", data_dir=data_dir)

    def _convert(self, doc):
        letters = {"A": 0, "B": 1, "C": 2, "D": 3}
        return {"query": f"Article: {doc['article']}\n\nQuestion: "
                         f"{doc['question']}\nAnswer:",
                "choices": doc["options"],
                "gold": letters[doc["answer"]]}


@register_task("swag")
class SWAG(_HFMultipleChoice):
    VERSION = 0

    def download(self, data_dir=None):
        self.data = _load("swag", "regular", data_dir=data_dir)

    def _convert(self, doc):
        return {"query": doc["startphrase"],
                "choices": [doc[f"ending{i}"] for i in range(4)],
                "gold": int(doc["label"])}


@register_task("headqa_en")
class HeadQA(_HFMultipleChoice):
    VERSION = 0
    SPLIT_TEST = "test"

    def download(self, data_dir=None):
        self.data = _load("head_qa", "en", data_dir=data_dir)

    def _convert(self, doc):
        return {"query": f"Question: {doc['qtext']}\nAnswer:",
                "choices": [a["atext"] for a in doc["answers"]],
                "gold": int(doc["ra"]) - 1}


@register_task("logiqa")
class LogiQA(_HFMultipleChoice):
    VERSION = 0
    SPLIT_TEST = "test"

    def download(self, data_dir=None):
        self.data = _load("lucasmccabe/logiqa", data_dir=data_dir)

    def _convert(self, doc):
        return {"query": f"Passage: {doc['context']}\nQuestion: "
                         f"{doc['query']}\nChoices:\n" +
                         "".join(f"{l}. {o}\n" for l, o in
                                 zip("ABCD", doc["options"])) + "Answer:",
                "choices": [f" {o}" for o in doc["options"]],
                "gold": int(doc["correct_option"])}

    def construct_requests(self, doc, ctx):
        return [Request("loglikelihood", (ctx, c)) for c in doc["choices"]]


@register_task("mathqa")
class MathQA(_HFMultipleChoice):
    VERSION = 0
    SPLIT_TEST = "test"

    def download(self, data_dir=None):
        self.data = _load("math_qa", data_dir=data_dir)

    def _convert(self, doc):
        import re

        letters = ["a", "b", "c", "d", "e"]
        choices = [c[4:].rstrip(" ,") for c in
                   re.findall(r"[abcd e]\) .*?, |e\) .*?$", doc["options"])]
        return {"query": f"Question: {doc['Problem']}\nAnswer:",
                "choices": choices if len(choices) == 5 else
                [doc["options"]] * 5,
                "gold": letters.index(doc["correct"])}


@register_task("pubmedqa")
class PubMedQA(_HFMultipleChoice):
    VERSION = 0
    SPLIT_TEST = "train"  # pqa_labeled only has train
    SPLIT_VALID = "train"

    def download(self, data_dir=None):
        self.data = _load("pubmed_qa", "pqa_labeled", data_dir=data_dir)

    def _convert(self, doc):
        ctx = " ".join(doc["context"]["contexts"])
        golds = {"yes": 0, "no": 1, "maybe": 2}
        return {"query": f"Abstract: {ctx}\nQuestion: {doc['question']}\n"
                         "Answer:",
                "choices": ["yes", "no", "maybe"],
                "gold": golds[doc["final_decision"]]}


# --------------------------------------------------------------------------
# multilingual
# --------------------------------------------------------------------------

XCOPA_LANGS = ["et", "ht", "id", "it", "qu", "sw", "ta", "th", "tr", "vi", "zh"]


class _XCopa(_HFMultipleChoice):
    VERSION = 0
    LANG = "et"
    CONNECTOR = {"cause": "because", "effect": "therefore"}

    def download(self, data_dir=None):
        self.data = _load("xcopa", self.LANG, data_dir=data_dir)

    def has_test_docs(self):
        return True

    SPLIT_TEST = "test"

    def _convert(self, doc):
        conn = self.CONNECTOR[doc["question"]]
        return {"query": doc["premise"].strip()[:-1] + f" {conn}",
                "choices": [" " + c[0].lower() + c[1:]
                            for c in (doc["choice1"], doc["choice2"])],
                "gold": int(doc["label"])}

    def construct_requests(self, doc, ctx):
        return [Request("loglikelihood", (ctx, c)) for c in doc["choices"]]


for _l in XCOPA_LANGS:
    register_task(f"xcopa_{_l}")(type(f"XCopa_{_l}", (_XCopa,), {"LANG": _l}))


XNLI_LANGS = ["ar", "bg", "de", "el", "en", "es", "fr", "hi", "ru", "sw",
              "th", "tr", "ur", "vi", "zh"]


class _XNLI(_HFMultipleChoice):
    VERSION = 0
    LANG = "en"

    def download(self, data_dir=None):
        self.data = _load("xnli", self.LANG, data_dir=data_dir)

    def _convert(self, doc):
        return {"query": f"{doc['premise']}\nQuestion: {doc['hypothesis']} "
                         "True, False, or Neither?\nAnswer:",
                "choices": ["True", "Neither", "False"],
                "gold": int(doc["label"])}


for _l in XNLI_LANGS:
    register_task(f"xnli_{_l}")(type(f"XNLI_{_l}", (_XNLI,), {"LANG": _l}))


XSTORY_LANGS = ["ar", "en", "es", "eu", "hi", "id", "my", "ru", "sw", "te", "zh"]


class _XStoryCloze(_HFMultipleChoice):
    VERSION = 0
    LANG = "en"
    SPLIT_VALID = "eval"
    SPLIT_TRAIN = "train"

    def download(self, data_dir=None):
        self.data = _load("juletxara/xstory_cloze", self.LANG,
                          data_dir=data_dir)

    def _convert(self, doc):
        ctx = " ".join(doc[f"input_sentence_{i}"] for i in range(1, 5))
        return {"query": ctx,
                "choices": [" " + doc["sentence_quiz1"],
                            " " + doc["sentence_quiz2"]],
                "gold": int(doc["answer_right_ending"]) - 1}

    def construct_requests(self, doc, ctx):
        return [Request("loglikelihood", (ctx, c)) for c in doc["choices"]]


for _l in XSTORY_LANGS:
    register_task(f"xstory_cloze_{_l}")(
        type(f"XStory_{_l}", (_XStoryCloze,), {"LANG": _l}))


PAWSX_LANGS = ["de", "en", "es", "fr", "ja", "ko", "zh"]


class _PawsX(_HFMultipleChoice):
    VERSION = 0
    LANG = "en"
    SPLIT_TEST = "test"

    def download(self, data_dir=None):
        self.data = _load("paws-x", self.LANG, data_dir=data_dir)

    def _convert(self, doc):
        return {"query": f"Sentence 1: {doc['sentence1']}\nSentence 2: "
                         f"{doc['sentence2']}\nQuestion: Do both sentences "
                         "mean the same thing?\nAnswer:",
                "choices": ["no", "yes"], "gold": int(doc["label"])}


for _l in PAWSX_LANGS:
    register_task(f"pawsx_{_l}")(type(f"PawsX_{_l}", (_PawsX,), {"LANG": _l}))


MLAMBADA_LANGS = ["en", "fr", "de", "it", "es"]


class _MultilingualLambada(LambadaOpenAI):
    VERSION = 0
    LANG = "en"

    def download(self, data_dir=None):
        self.data = _load("EleutherAI/lambada_openai", self.LANG,
                          data_dir=data_dir)


for _l in MLAMBADA_LANGS:
    register_task(f"lambada_openai_mt_{_l}")(
        type(f"MTLambada_{_l}", (_MultilingualLambada,), {"LANG": _l}))


# --------------------------------------------------------------------------
# translation (reference scores via sacrebleu; ours via eval.harness.metrics
# which prefers sacrebleu and falls back to the parity-tested native scorer)
# --------------------------------------------------------------------------

class _WMT(Task):
    VERSION = 0
    DATASET = ("wmt16", "de-en")
    SRC, DST = "de", "en"

    def download(self, data_dir=None):
        self.data = _load(*self.DATASET, data_dir=data_dir)

    def has_validation_docs(self):
        return True

    def has_test_docs(self):
        return True

    def test_docs(self):
        return [d["translation"] for d in self.data["test"]]

    def validation_docs(self):
        return [d["translation"] for d in self.data["validation"]]

    def doc_to_text(self, doc):
        names = {"de": "German", "en": "English", "ro": "Romanian",
                 "fr": "French"}
        return (f"{names[self.SRC]} phrase: {doc[self.SRC]}\n"
                f"{names[self.DST]} phrase:")

    def doc_to_target(self, doc):
        return " " + doc[self.DST]

    def construct_requests(self, doc, ctx):
        return [Request("greedy_until", (ctx, ["\n"]))]

    def process_results(self, doc, results):
        item = ([doc[self.DST]], results[0].strip())
        return {"bleu": item, "chrf": item, "ter": item}

    def aggregation(self):
        from ..metrics import bleu, chrf, ter

        return {"bleu": bleu, "chrf": chrf, "ter": ter}

    def higher_is_better(self):
        return {"bleu": True, "chrf": True, "ter": False}


for pair, src, dst in [(("wmt16", "de-en"), "de", "en"),
                       (("wmt16", "de-en"), "en", "de"),
                       (("wmt16", "ro-en"), "ro", "en"),
                       (("wmt16", "ro-en"), "en", "ro")]:
    name = f"wmt16-{src}-{dst}"
    register_task(name)(type(f"WMT_{src}_{dst}", (_WMT,),
                             {"DATASET": pair, "SRC": src, "DST": dst}))
