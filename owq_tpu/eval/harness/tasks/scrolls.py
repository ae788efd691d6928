"""SCROLLS long-document suite + standalone Qasper.

References: lm_eval/tasks/scrolls.py (Qasper/QuALITY/NarrativeQA/
ContractNLI/GovReport/SummScreenFD/QMSum, registered as scrolls_*),
lm_eval/tasks/qasper.py (the "qasper" registry entry).

The reference downloads the official scrolls metric script from the HF hub
at task-construction time (scrolls.py:72-81 — impossible offline); the
same metric semantics are computed natively here: token-F1 and ROUGE
F-measures, max over the reference answers, scaled to 0-100.
"""

from __future__ import annotations

import re

import numpy as np

from .. import qa_metrics as Q
from ..metrics import mean
from ..registry import register_task
from ..task import Request, Task
from . import _load


def _process_doc_prepended_question(doc):
    # query prepended to the text with two newlines (scrolls.py:85-96)
    inp = doc["input"]
    split = inp.find("\n\n")
    return {"id": doc["id"], "pid": doc.get("pid"), "input": inp,
            "outputs": doc["outputs"], "question": inp[:split],
            "text": inp[split + 2:]}


def _dedup_inputs(split_data):
    """Merge rows sharing an id into one doc with an ``outputs`` list
    (scrolls.py:99-115)."""
    by_id = {}
    order = []
    for doc in split_data:
        d = dict(doc)
        if d["id"] in by_id:
            by_id[d["id"]]["outputs"].append(d["output"])
            continue
        d["outputs"] = [d.pop("output")]
        by_id[d["id"]] = d
        order.append(d["id"])
    return [by_id[i] for i in order]


def _max_token_f1(pred: str, refs) -> float:
    return 100.0 * max(Q.compute_f1(r, pred) for r in refs)


def _max_rouge(pred: str, refs, key: str) -> float:
    return 100.0 * max(Q.rouge(r, pred)[key] for r in refs)


class _SCROLLSTask(Task):
    VERSION = 0
    CONFIG = None

    def download(self, data_dir=None):
        raw = _load("tau/scrolls", self.CONFIG, data_dir=data_dir)
        self.data = {split: _dedup_inputs(raw[split])
                     for split in ("train", "validation") if split in raw}

    def has_validation_docs(self):
        return True

    def has_test_docs(self):
        return False

    def _process_doc(self, doc):
        return [doc]

    def training_docs(self):
        for doc in self.data["train"]:
            yield from self._process_doc(doc)

    def validation_docs(self):
        for doc in self.data["validation"]:
            yield from self._process_doc(doc)

    def doc_to_text(self, doc):
        return f"{doc['text']}\n\nQuestion: {doc['question']}\nAnswer:"

    def doc_to_target(self, doc):
        return " " + ", ".join(doc["outputs"])


class _SCROLLSMultipleChoiceTask(_SCROLLSTask):
    def aggregation(self):
        return {"em": mean, "acc": mean, "acc_norm": mean}

    def higher_is_better(self):
        return {"em": True, "acc": True, "acc_norm": True}

    def construct_requests(self, doc, ctx):
        return [Request("loglikelihood", (ctx, " {}".format(c)))
                for c in doc["choices"]]

    def process_results(self, doc, results):
        gold = doc["gold"]
        lls = np.array([ll for ll, _ in results])
        acc = 1.0 if int(np.argmax(lls)) == gold else 0.0
        lens = np.array([float(len(c)) for c in doc["choices"]])
        acc_norm = 1.0 if int(np.argmax(lls / lens)) == gold else 0.0
        return {"acc": acc, "acc_norm": acc_norm, "em": acc_norm * 100.0}


class _SCROLLSSummaryTask(_SCROLLSTask):
    def doc_to_text(self, doc):
        return (f"{doc['input']}\n\nQuestion: What is a summary of the "
                "preceding text?\nAnswer:")

    def construct_requests(self, doc, ctx):
        return [Request("greedy_until", (ctx, ["\n"]))]

    def process_results(self, doc, results):
        pred = results[0]
        return {"rouge1": _max_rouge(pred, doc["outputs"], "rouge1"),
                "rouge2": _max_rouge(pred, doc["outputs"], "rouge2"),
                "rougeL": _max_rouge(pred, doc["outputs"], "rougeL")}

    def aggregation(self):
        return {"rouge1": mean, "rouge2": mean, "rougeL": mean}

    def higher_is_better(self):
        return {"rouge1": True, "rouge2": True, "rougeL": True}


@register_task("scrolls_qasper")
class ScrollsQasper(_SCROLLSTask):
    CONFIG = "qasper"

    def _process_doc(self, doc):
        doc = _process_doc_prepended_question(doc)
        doc["is_yes_no"] = all(
            Q.normalize_answer(o) in ("yes", "no") for o in doc["outputs"])
        return [doc]

    def construct_requests(self, doc, ctx):
        if doc["is_yes_no"]:
            return [Request("loglikelihood", (ctx, " yes")),
                    Request("loglikelihood", (ctx, " no"))]
        return [Request("greedy_until", (ctx, ["\n"]))]

    def process_results(self, doc, results):
        if doc["is_yes_no"]:
            pred = " yes" if results[0][0] > results[1][0] else " no"
        elif len(results[0].strip()) == 0:
            pred = "Unanswerable"
        else:
            pred = results[0]
        return {"f1": _max_token_f1(pred, doc["outputs"])}

    def aggregation(self):
        return {"f1": mean}

    def higher_is_better(self):
        return {"f1": True}


@register_task("scrolls_quality")
class ScrollsQuALITY(_SCROLLSMultipleChoiceTask):
    CONFIG = "quality"
    _pattern = re.compile(r" *\([A-D]\) *")

    @staticmethod
    def _norm(text):
        return " ".join(text.split()).strip()

    def _process_doc(self, doc):
        doc = _process_doc_prepended_question(doc)
        split = doc["text"].find("\n\n", doc["text"].find("(D)"))
        choices_text = doc["text"][:split]
        doc["text"] = doc["text"][split:].strip()
        doc["choices"] = [self._norm(c) for c in
                          re.split(self._pattern, choices_text)[1:]]
        doc["gold"] = doc["choices"].index(self._norm(doc["outputs"][0]))
        return [doc]


@register_task("scrolls_narrativeqa")
class ScrollsNarrativeQA(_SCROLLSTask):
    CONFIG = "narrative_qa"

    def _process_doc(self, doc):
        return [_process_doc_prepended_question(doc)]

    def construct_requests(self, doc, ctx):
        return [Request("greedy_until", (ctx, ["\n"]))]

    def process_results(self, doc, results):
        return {"f1": _max_token_f1(results[0], doc["outputs"])}

    def aggregation(self):
        return {"f1": mean}

    def higher_is_better(self):
        return {"f1": True}


@register_task("scrolls_contractnli")
class ScrollsContractNLI(_SCROLLSMultipleChoiceTask):
    CONFIG = "contract_nli"
    CHOICES = ["Not mentioned", "Entailment", "Contradiction"]

    def _process_doc(self, doc):
        doc = _process_doc_prepended_question(doc)
        doc["choices"] = self.CHOICES
        doc["gold"] = self.CHOICES.index(doc["outputs"][0])
        return [doc]

    def doc_to_text(self, doc):
        return f"{doc['text']}\n\nHypothesis: {doc['question']}\nConclusion:"


@register_task("scrolls_govreport")
class ScrollsGovReport(_SCROLLSSummaryTask):
    CONFIG = "gov_report"


@register_task("scrolls_summscreenfd")
class ScrollsSummScreenFD(_SCROLLSSummaryTask):
    CONFIG = "summ_screen_fd"


@register_task("scrolls_qmsum")
class ScrollsQMSum(_SCROLLSSummaryTask):
    CONFIG = "qmsum"

    def _process_doc(self, doc):
        return [_process_doc_prepended_question(doc)]

    def doc_to_text(self, doc):
        return f"{doc['text']}\n\nQuestion: {doc['question']}\nAnswer:"


# --------------------------------------------------------------------------
# qasper standalone (qasper.py): per-answer-type scoring over allenai/qasper
# --------------------------------------------------------------------------

def _categorise_answer(blob):
    if blob["unanswerable"]:
        return "unanswerable", "unanswerable"
    if blob["yes_no"]:
        return "yes", "bool"
    if blob["free_form_answer"]:
        return blob["free_form_answer"], "free form answer"
    if blob["extractive_spans"]:
        return blob["extractive_spans"], "extractive_spans"
    return "unanswerable", "unanswerable"


@register_task("qasper")
class QASPER(Task):
    VERSION = 0

    def download(self, data_dir=None):
        try:
            self.data = _load("allenai/qasper", data_dir=data_dir)
        except Exception:
            self.data = _load("qasper", data_dir=data_dir)

    def has_validation_docs(self):
        return True

    def has_test_docs(self):
        return False

    @staticmethod
    def _flatten(doc):
        out = []
        for question, answer_list in zip(doc["qas"]["question"],
                                         doc["qas"]["answers"]):
            for blob in answer_list["answer"]:
                answer, answer_type = _categorise_answer(blob)
                out.append({"title": doc["title"],
                            "abstract": doc["abstract"],
                            "question": question, "answer": answer,
                            "answer_type": answer_type})
        return out

    def training_docs(self):
        for doc in self.data["train"]:
            yield from self._flatten(doc)

    def validation_docs(self):
        for doc in self.data["validation"]:
            yield from self._flatten(doc)

    def doc_to_text(self, doc):
        return ("TITLE: " + doc["title"] + "\n" + "ABSTRACT: " +
                doc["abstract"] + "\n\n" + "Q: " + doc["question"] +
                "\n\n" + "A:")

    def doc_to_target(self, doc):
        answer = doc["answer"]
        if isinstance(answer, list):
            answer = ", ".join(answer)
        return " " + answer

    def construct_requests(self, doc, ctx):
        if doc["answer_type"] == "free form answer":
            return [Request("greedy_until", (ctx, ["\n"]))]
        if doc["answer_type"] == "bool":
            return [Request("loglikelihood", (ctx, " yes")),
                    Request("loglikelihood", (ctx, " no"))]
        return []

    def process_results(self, doc, results):
        out = {}
        if doc["answer_type"] == "bool":
            gold = 1 if doc["answer"] == "yes" else 0
            pred = int(results[0][0] > results[1][0])
            out["f1_yesno"] = (gold, pred)
        if doc["answer_type"] == "free form answer":
            out["f1_abstractive"] = Q.compute_f1(doc["answer"], results[0])
        return out

    def aggregation(self):
        from ..metrics import f1_score

        return {"f1_yesno": f1_score, "f1_abstractive": mean}

    def higher_is_better(self):
        return {"f1_yesno": True, "f1_abstractive": True}
