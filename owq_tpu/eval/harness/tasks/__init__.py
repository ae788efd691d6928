"""Task library.

The reference vendors ~64 task modules / ~223 registry entries
(lm_eval/tasks).  This library implements the tasks exercised by the
reference's documented workflows (hellaswag / lambada_openai / piqa in
README.md:100-116 + scripts/opt_end_to_end_evaluation.sh) plus the common
zero-shot suite; the registry is open for extension.

All data comes from HF datasets (offline cache friendly).
"""

from __future__ import annotations

import re
from typing import Optional

from ..metrics import mean, perplexity
from ..registry import register_task
from ..task import MultipleChoiceTask, PerplexityTask, Request, Task


def _load(name, config=None, **kw):
    from datasets import load_dataset

    return load_dataset(name, config, **kw)


# --------------------------------------------------------------------------
# multiple-choice tasks
# --------------------------------------------------------------------------

class _HFMultipleChoice(MultipleChoiceTask):
    DATASET: tuple = ()
    SPLIT_VALID = "validation"
    SPLIT_TEST: Optional[str] = None
    SPLIT_TRAIN = "train"

    def download(self, data_dir=None):
        self.data = _load(*self.DATASET, data_dir=data_dir)

    def has_validation_docs(self):
        return self.SPLIT_VALID in self.data

    def has_test_docs(self):
        return self.SPLIT_TEST is not None and self.SPLIT_TEST in self.data

    def validation_docs(self):
        return map(self._convert, self.data[self.SPLIT_VALID])

    def test_docs(self):
        return map(self._convert, self.data[self.SPLIT_TEST])

    def training_docs(self):
        if self.SPLIT_TRAIN in self.data:
            return list(map(self._convert, self.data[self.SPLIT_TRAIN]))
        return []

    def _convert(self, doc: dict) -> dict:
        raise NotImplementedError

    def doc_to_text(self, doc):
        return doc["query"]


@register_task("hellaswag")
class HellaSwag(_HFMultipleChoice):
    VERSION = 0
    DATASET = ("hellaswag",)

    @staticmethod
    def _preprocess(text: str) -> str:
        text = text.strip()
        text = text.replace(" [title]", ". ")
        text = re.sub(r"\[.*?\]", "", text)
        text = text.replace("  ", " ")
        return text

    def _convert(self, doc):
        ctx = doc["ctx_a"] + " " + doc["ctx_b"].capitalize()
        return {
            "query": self._preprocess(doc["activity_label"] + ": " + ctx),
            "choices": [self._preprocess(e) for e in doc["endings"]],
            "gold": int(doc["label"]),
        }


@register_task("piqa")
class PiQA(_HFMultipleChoice):
    VERSION = 0
    DATASET = ("piqa",)

    def _convert(self, doc):
        return {"query": "Question: " + doc["goal"] + "\nAnswer:",
                "choices": [doc["sol1"], doc["sol2"]],
                "gold": int(doc["label"])}


class _ARC(_HFMultipleChoice):
    VERSION = 0
    SPLIT_TEST = "test"

    def _convert(self, doc):
        letters = {"A": 0, "B": 1, "C": 2, "D": 3, "E": 4,
                   "1": 0, "2": 1, "3": 2, "4": 3, "5": 4}
        return {"query": "Question: " + doc["question"] + "\nAnswer:",
                "choices": doc["choices"]["text"],
                "gold": letters[doc["answerKey"]]}


@register_task("arc_easy")
class ARCEasy(_ARC):
    DATASET = ("ai2_arc", "ARC-Easy")


@register_task("arc_challenge")
class ARCChallenge(_ARC):
    DATASET = ("ai2_arc", "ARC-Challenge")


@register_task("openbookqa")
class OpenBookQA(_HFMultipleChoice):
    VERSION = 0
    DATASET = ("openbookqa", "main")
    SPLIT_TEST = "test"

    def _convert(self, doc):
        letters = {"A": 0, "B": 1, "C": 2, "D": 3}
        return {"query": doc["question_stem"],
                "choices": doc["choices"]["text"],
                "gold": letters[doc["answerKey"].strip()]}


@register_task("boolq")
class BoolQ(_HFMultipleChoice):
    VERSION = 1
    DATASET = ("super_glue", "boolq")

    def _convert(self, doc):
        return {"query": f"{doc['passage']}\nQuestion: {doc['question']}?\n"
                         "Answer:",
                "choices": ["no", "yes"], "gold": int(doc["label"])}


@register_task("copa")
class Copa(_HFMultipleChoice):
    VERSION = 0
    DATASET = ("super_glue", "copa")

    def _convert(self, doc):
        connector = {"cause": "because", "effect": "therefore"}[doc["question"]]
        def strip_choice(c):
            return c[0].lower() + c[1:]
        return {"query": doc["premise"].strip()[:-1] + f" {connector}",
                "choices": [" " + strip_choice(doc["choice1"]),
                            " " + strip_choice(doc["choice2"])],
                "gold": int(doc["label"])}

    def construct_requests(self, doc, ctx):
        return [Request("loglikelihood", (ctx, choice))
                for choice in doc["choices"]]


@register_task("rte")
class RTE(_HFMultipleChoice):
    VERSION = 0
    DATASET = ("glue", "rte")

    def _convert(self, doc):
        return {"query": f"{doc['sentence1']}\nQuestion: {doc['sentence2']} "
                         "True or False?\nAnswer:",
                "choices": ["True", "False"], "gold": int(doc["label"])}


@register_task("sciq")
class SciQ(_HFMultipleChoice):
    VERSION = 0
    DATASET = ("sciq",)
    SPLIT_TEST = "test"

    def _convert(self, doc):
        choices = [doc["distractor1"], doc["distractor2"],
                   doc["distractor3"], doc["correct_answer"]]
        src = doc.get("support", "").strip()
        query = (src + "\n" if src else "") + \
            f"Question: {doc['question']}\nAnswer:"
        return {"query": query, "choices": choices, "gold": 3}


# --------------------------------------------------------------------------
# winogrande (partial-sentence scoring)
# --------------------------------------------------------------------------

@register_task("winogrande")
class Winogrande(Task):
    VERSION = 0

    def download(self, data_dir=None):
        self.data = _load("winogrande", "winogrande_xl", data_dir=data_dir)

    def has_validation_docs(self):
        return True

    def has_test_docs(self):
        return False

    def validation_docs(self):
        return list(self.data["validation"])

    def training_docs(self):
        return list(self.data["train"])

    @staticmethod
    def partial(doc, option):
        idx = doc["sentence"].index("_")
        return doc["sentence"][:idx] + option, doc["sentence"][idx + 1:]

    def doc_to_text(self, doc):
        return self.partial(doc, doc["option" + doc["answer"]])[0]

    def doc_to_target(self, doc):
        return self.partial(doc, doc["option" + doc["answer"]])[1]

    def construct_requests(self, doc, ctx):
        # note: fewshot context prepends rendered examples; the partial
        # scoring uses the raw doc like the upstream task
        reqs = []
        for opt in (doc["option1"], doc["option2"]):
            context, target = self.partial(doc, opt)
            reqs.append(Request("loglikelihood", (context, target)))
        return reqs

    def process_results(self, doc, results):
        gold = int(doc["answer"]) - 1
        lls = [ll for ll, _ in results]
        return {"acc": 1.0 if int(max(range(2), key=lls.__getitem__)) == gold
                else 0.0}

    def aggregation(self):
        return {"acc": mean}

    def higher_is_better(self):
        return {"acc": True}


# --------------------------------------------------------------------------
# lambada (last-word prediction: ppl + acc)
# --------------------------------------------------------------------------

@register_task("lambada_openai")
class LambadaOpenAI(Task):
    VERSION = 0
    DATASET = ("EleutherAI/lambada_openai", "en")

    def download(self, data_dir=None):
        self.data = _load(*self.DATASET, data_dir=data_dir)

    def has_validation_docs(self):
        return False

    def has_test_docs(self):
        return True

    def test_docs(self):
        return list(self.data["test"])

    def doc_to_text(self, doc):
        return doc["text"].rsplit(" ", 1)[0]

    def doc_to_target(self, doc):
        return " " + doc["text"].rsplit(" ", 1)[1]

    def construct_requests(self, doc, ctx):
        return [Request("loglikelihood", (ctx, self.doc_to_target(doc)))]

    def process_results(self, doc, results):
        ll, is_greedy = results[0]
        return {"ppl": (ll, 1), "acc": 1.0 if is_greedy else 0.0}

    def aggregation(self):
        return {"ppl": perplexity, "acc": mean}

    def higher_is_better(self):
        return {"ppl": False, "acc": True}


@register_task("lambada_standard")
class LambadaStandard(LambadaOpenAI):
    VERSION = 0
    DATASET = ("lambada",)

    def has_validation_docs(self):
        return True

    def validation_docs(self):
        return list(self.data["validation"])


# --------------------------------------------------------------------------
# wikitext rolling perplexity
# --------------------------------------------------------------------------

def wikitext_detokenize(s: str) -> str:
    """Standard moses-ish detokenizer used by the upstream wikitext task."""
    s = s.replace("s '", "s'")
    s = re.sub(r"/' [0-9]/", r"/'[0-9]/", s)
    s = s.replace(" @-@ ", "-").replace(" @,@ ", ",").replace(" @.@ ", ".")
    s = s.replace(" : ", ": ").replace(" ; ", "; ")
    s = s.replace(" . ", ". ").replace(" ! ", "! ").replace(" ? ", "? ")
    s = s.replace(" , ", ", ")
    s = re.sub(r"\(\s*([^\)]*?)\s*\)", r"(\1)", s)
    s = re.sub(r"\[\s*([^\]]*?)\s*\]", r"[\1]", s)
    s = re.sub(r'"\s*([^"]*?)\s*"', r'"\1"', s)
    s = re.sub(r"'\s*([^']*?)\s*'", r"'\1'", s)
    s = s.replace("= = = =", "====").replace("= = =", "===").replace("= =", "==")
    s = s.replace(" " + chr(176) + " ", chr(176)).replace(" \n", "\n")
    s = s.replace("\n ", "\n").replace(" N ", " 1 ").replace(" 's", "'s")
    return s.strip()


from . import extended  # noqa: E402,F401  (registers MMLU/GLUE/gen tasks)
from . import more  # noqa: E402,F401  (ANLI/RACE/multilingual/translation)
from . import bigbench  # noqa: E402,F401  (bigbench MC subset + json tasks)
from . import minimal_pairs  # noqa: E402,F401  (BLiMP + CrowS-Pairs)
from . import chinese  # noqa: E402,F401  (CMMLU + C-Eval)
from . import pile  # noqa: E402,F401  (Pile per-subset perplexity)
from . import gpt3_style  # noqa: E402,F401  (arithmetic/unscramble/mgsm/xwinograd/wmt)
from . import qa  # noqa: E402,F401  (babi/coqa/drop/squad2/record/mutual/...)
from . import ethics_math  # noqa: E402,F401  (ETHICS x6, MATH x7, asdiv)
from . import truthful_misc  # noqa: E402,F401  (truthfulqa/toxigen/cbt/korean)
from . import scrolls  # noqa: E402,F401  (scrolls_* + qasper)


@register_task("wikitext")
class WikiText(PerplexityTask):
    VERSION = 1

    def download(self, data_dir=None):
        self.data = _load("wikitext", "wikitext-2-raw-v1", data_dir=data_dir)

    def has_validation_docs(self):
        return True

    def has_test_docs(self):
        return True

    def _docs(self, split):
        text = "".join(self.data[split]["text"])
        return [wikitext_detokenize(text)]

    def validation_docs(self):
        return self._docs("validation")

    def test_docs(self):
        return self._docs("test")

    def count_words(self, doc):
        return len(re.split(r"\s+", self.doc_to_target(doc)))
