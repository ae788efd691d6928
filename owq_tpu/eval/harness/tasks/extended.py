"""Extended task families: MMLU (hendrycks_test), GLUE/SuperGLUE, gsm8k,
lambada multilingual, and friends — the bulk of the reference registry's
entry count (lm_eval/tasks/__init__.py:98+)."""

from __future__ import annotations

import re
from typing import List

from ..metrics import f1_score, matthews_corrcoef, mean
from ..registry import register_task
from ..task import Request, Task
from . import _HFMultipleChoice, _load


# --------------------------------------------------------------------------
# MMLU / hendrycks_test: 57 subjects, 5-shot standard
# --------------------------------------------------------------------------

MMLU_SUBJECTS = [
    "abstract_algebra", "anatomy", "astronomy", "business_ethics",
    "clinical_knowledge", "college_biology", "college_chemistry",
    "college_computer_science", "college_mathematics", "college_medicine",
    "college_physics", "computer_security", "conceptual_physics",
    "econometrics", "electrical_engineering", "elementary_mathematics",
    "formal_logic", "global_facts", "high_school_biology",
    "high_school_chemistry", "high_school_computer_science",
    "high_school_european_history", "high_school_geography",
    "high_school_government_and_politics", "high_school_macroeconomics",
    "high_school_mathematics", "high_school_microeconomics",
    "high_school_physics", "high_school_psychology",
    "high_school_statistics", "high_school_us_history",
    "high_school_world_history", "human_aging", "human_sexuality",
    "international_law", "jurisprudence", "logical_fallacies",
    "machine_learning", "management", "marketing", "medical_genetics",
    "miscellaneous", "moral_disputes", "moral_scenarios", "nutrition",
    "philosophy", "prehistory", "professional_accounting",
    "professional_law", "professional_medicine", "professional_psychology",
    "public_relations", "security_studies", "sociology",
    "us_foreign_policy", "virology", "world_religions",
]


class _MMLU(_HFMultipleChoice):
    VERSION = 1
    SUBJECT = ""
    SPLIT_TEST = "test"
    SPLIT_VALID = "validation"
    SPLIT_TRAIN = "dev"

    def download(self, data_dir=None):
        self.data = _load("cais/mmlu", self.SUBJECT, data_dir=data_dir)

    def fewshot_description(self):
        subj = self.SUBJECT.replace("_", " ")
        return (f"The following are multiple choice questions (with answers)"
                f" about {subj}.")

    def _convert(self, doc):
        keys = ["A", "B", "C", "D"]
        query = doc["question"].strip()
        for k, choice in zip(keys, doc["choices"]):
            query += f"\n{k}. {choice}"
        query += "\nAnswer:"
        return {"query": query, "choices": keys, "gold": int(doc["answer"])}

    def construct_requests(self, doc, ctx):
        return [Request("loglikelihood", (ctx, f" {k}"))
                for k in doc["choices"]]


def _register_mmlu():
    for subject in MMLU_SUBJECTS:
        cls = type(f"MMLU_{subject}", (_MMLU,), {"SUBJECT": subject})
        register_task(f"hendrycksTest-{subject}")(cls)
        register_task(f"mmlu_{subject}")(cls)


_register_mmlu()


# --------------------------------------------------------------------------
# GLUE
# --------------------------------------------------------------------------

@register_task("cola")
class CoLA(_HFMultipleChoice):
    VERSION = 0
    DATASET = ("glue", "cola")

    def _convert(self, doc):
        return {"query": f"{doc['sentence']}\nQuestion: Does this sentence "
                         "make sense?\nAnswer:",
                "choices": ["no", "yes"], "gold": int(doc["label"])}

    def process_results(self, doc, results):
        pred = int(results[1][0] > results[0][0])
        return {"mcc": (doc["gold"], pred)}

    def aggregation(self):
        return {"mcc": matthews_corrcoef}

    def higher_is_better(self):
        return {"mcc": True}


@register_task("sst")
class SST(_HFMultipleChoice):
    VERSION = 0
    DATASET = ("glue", "sst2")

    def _convert(self, doc):
        return {"query": f"{doc['sentence']}\nQuestion: Is this sentence "
                         "positive or negative?\nAnswer:",
                "choices": ["negative", "positive"], "gold": int(doc["label"])}


class _NLI(_HFMultipleChoice):
    FIELDS = ("premise", "hypothesis")
    LABELS = ["True", "Neither", "False"]

    def _convert(self, doc):
        a, b = (doc[self.FIELDS[0]], doc[self.FIELDS[1]])
        return {"query": f"{a}\nQuestion: {b} True, False or Neither?\nAnswer:",
                "choices": self.LABELS, "gold": int(doc["label"])}


@register_task("mnli")
class MNLI(_NLI):
    VERSION = 0
    DATASET = ("glue", "mnli")
    SPLIT_VALID = "validation_matched"


@register_task("mnli_mismatched")
class MNLIMM(_NLI):
    VERSION = 0
    DATASET = ("glue", "mnli")
    SPLIT_VALID = "validation_mismatched"


@register_task("qnli")
class QNLI(_HFMultipleChoice):
    VERSION = 0
    DATASET = ("glue", "qnli")

    def _convert(self, doc):
        return {"query": f"{doc['question']}\n{doc['sentence']}\nQuestion: "
                         "Does this response answer the question?\nAnswer:",
                "choices": ["yes", "no"], "gold": int(doc["label"])}


@register_task("wnli")
class WNLI(_HFMultipleChoice):
    VERSION = 1
    DATASET = ("glue", "wnli")

    def _convert(self, doc):
        return {"query": f"{doc['sentence1']}\nQuestion: {doc['sentence2']} "
                         "True or False?\nAnswer:",
                "choices": ["False", "True"], "gold": int(doc["label"])}


@register_task("qqp")
class QQP(_HFMultipleChoice):
    VERSION = 0
    DATASET = ("glue", "qqp")

    def _convert(self, doc):
        return {"query": f"Question 1: {doc['question1']}\nQuestion 2: "
                         f"{doc['question2']}\nQuestion: Do both questions "
                         "ask the same thing?\nAnswer:",
                "choices": ["no", "yes"], "gold": int(doc["label"])}

    def process_results(self, doc, results):
        pred = int(results[1][0] > results[0][0])
        return {"acc": float(pred == doc["gold"]),
                "f1": (doc["gold"], pred)}

    def aggregation(self):
        return {"acc": mean, "f1": f1_score}

    def higher_is_better(self):
        return {"acc": True, "f1": True}


@register_task("mrpc")
class MRPC(QQP):
    VERSION = 0
    DATASET = ("glue", "mrpc")

    def _convert(self, doc):
        return {"query": f"Sentence 1: {doc['sentence1']}\nSentence 2: "
                         f"{doc['sentence2']}\nQuestion: Do both sentences "
                         "mean the same thing?\nAnswer:",
                "choices": ["no", "yes"], "gold": int(doc["label"])}


# --------------------------------------------------------------------------
# SuperGLUE extras
# --------------------------------------------------------------------------

@register_task("cb")
class CB(_HFMultipleChoice):
    VERSION = 1
    DATASET = ("super_glue", "cb")

    def _convert(self, doc):
        return {"query": f"{doc['premise']}\nQuestion: {doc['hypothesis']}. "
                         "True, False or Neither?\nAnswer:",
                "choices": ["True", "False", "Neither"],
                "gold": int(doc["label"])}


@register_task("wic")
class WiC(_HFMultipleChoice):
    VERSION = 0
    DATASET = ("super_glue", "wic")

    def _convert(self, doc):
        return {"query": f"Sentence 1: {doc['sentence1']}\nSentence 2: "
                         f"{doc['sentence2']}\nQuestion: Is the word "
                         f"'{doc['word']}' used in the same way in the two "
                         "sentences above?\nAnswer:",
                "choices": ["no", "yes"], "gold": int(doc["label"])}


@register_task("wsc")
class WSC(_HFMultipleChoice):
    VERSION = 0
    DATASET = ("super_glue", "wsc.fixed")

    def _convert(self, doc):
        raw = doc["text"]
        return {"query": f"Passage: {raw}\nQuestion: In the passage above, "
                         f"does the pronoun \"{doc['span2_text']}\" refer to "
                         f"\"{doc['span1_text']}\"?\nAnswer:",
                "choices": ["no", "yes"], "gold": int(doc["label"])}


@register_task("multirc")
class MultiRC(_HFMultipleChoice):
    VERSION = 1
    DATASET = ("super_glue", "multirc")

    def _convert(self, doc):
        return {"query": f"{doc['paragraph']}\nQuestion: {doc['question']}\n"
                         f"Answer: {doc['answer']}\nIs the answer correct?",
                "choices": ["no", "yes"], "gold": int(doc["label"])}


# --------------------------------------------------------------------------
# generation tasks (greedy_until)
# --------------------------------------------------------------------------

@register_task("gsm8k")
class GSM8K(Task):
    VERSION = 0

    def download(self, data_dir=None):
        self.data = _load("gsm8k", "main", data_dir=data_dir)

    def has_validation_docs(self):
        return False

    def has_test_docs(self):
        return True

    def test_docs(self):
        return list(self.data["test"])

    def training_docs(self):
        return list(self.data["train"])

    def doc_to_text(self, doc):
        return "Question: " + doc["question"] + "\nAnswer:"

    def doc_to_target(self, doc):
        return " " + doc["answer"]

    def construct_requests(self, doc, ctx):
        return [Request("greedy_until", (ctx, ["\n", "Question:"]))]

    @staticmethod
    def _extract(answer: str):
        m = re.findall(r"(-?[0-9][0-9.,]*)", answer)
        if not m:
            return None
        return m[-1].rstrip(".").replace(",", "")

    def process_results(self, doc, results):
        gold = self._extract(doc["answer"].split("####")[-1])
        pred = self._extract(results[0])
        return {"acc": float(pred is not None and pred == gold)}

    def aggregation(self):
        return {"acc": mean}

    def higher_is_better(self):
        return {"acc": True}


@register_task("triviaqa")
class TriviaQA(Task):
    VERSION = 0

    def download(self, data_dir=None):
        self.data = _load("trivia_qa", "rc.nocontext", data_dir=data_dir)

    def has_validation_docs(self):
        return True

    def has_test_docs(self):
        return False

    def validation_docs(self):
        return list(self.data["validation"])

    def training_docs(self):
        return list(self.data["train"])

    def doc_to_text(self, doc):
        return f"Question: {doc['question']}\nAnswer:"

    def doc_to_target(self, doc):
        return " " + doc["answer"]["value"]

    def construct_requests(self, doc, ctx):
        return [Request("loglikelihood", (ctx, " " + alias))
                for alias in doc["answer"]["aliases"][:8]]

    def process_results(self, doc, results):
        return {"acc": float(any(greedy for _, greedy in results))}

    def aggregation(self):
        return {"acc": mean}

    def higher_is_better(self):
        return {"acc": True}
