"""Reading-comprehension / open-domain QA tasks.

Covers the reference registry entries: babi, webqs, prost, qa4mre_2011-13,
headqa(_es/_en), nq_open, naturalqs, squad2, coqa, drop, quac, mutual(_plus),
mc_taco, wsc273, record.  References: the same-named modules under
lm_eval/tasks/ (babi.py, webqs.py, prost.py, qa4mre.py, headqa.py,
nqopen.py, naturalqs.py, squad.py, coqa.py, drop.py, quac.py, mutual.py,
mc_taco.py, wsc273.py, superglue.py:276-366).

naturalqs and quac raise NotImplementedError at evaluation time in the
reference (naturalqs.py:279-322, quac.py:536-579); here both are fully
implemented (greedy generation scored with EM / token-F1).
"""

from __future__ import annotations

import collections
from functools import partial

import numpy as np

from .. import qa_metrics as Q
from ..metrics import mean
from ..registry import register_task
from ..task import MultipleChoiceTask, Request, Task
from . import _load


# --------------------------------------------------------------------------
# babi (babi.py): greedy answer, exact match
# --------------------------------------------------------------------------

@register_task("babi")
class Babi(Task):
    VERSION = 0

    def download(self, data_dir=None):
        self.data = _load("Muennighoff/babi", data_dir=data_dir)

    def has_validation_docs(self):
        return True

    def has_test_docs(self):
        return True

    def training_docs(self):
        return list(self.data["train"])

    def validation_docs(self):
        return self.data["valid"]

    def test_docs(self):
        return self.data["test"]

    def doc_to_text(self, doc):
        return doc["passage"] + doc["question"]

    def doc_to_target(self, doc):
        return " " + doc["answer"]

    def construct_requests(self, doc, ctx):
        return [Request("greedy_until", (ctx, ["\n"]))]

    def process_results(self, doc, results):
        return {"em": float(doc["answer"].strip() == results[0].strip())}

    def aggregation(self):
        return {"em": mean}

    def higher_is_better(self):
        return {"em": True}


# --------------------------------------------------------------------------
# webqs (webqs.py): any-alias greedy-match via loglikelihood is_greedy bits
# --------------------------------------------------------------------------

@register_task("webqs")
class WebQs(Task):
    VERSION = 0

    def download(self, data_dir=None):
        self.data = _load("web_questions", data_dir=data_dir)

    def has_validation_docs(self):
        return False

    def has_test_docs(self):
        return True

    def training_docs(self):
        if self._training_docs is None:
            self._training_docs = list(self.data["train"])
        return self._training_docs

    def test_docs(self):
        return self.data["test"]

    def doc_to_text(self, doc):
        return "Question: " + doc["question"] + "\nAnswer:"

    def doc_to_target(self, doc):
        return " " + doc["answers"][0]

    @staticmethod
    def _remove_prefixes(aliases):
        # drop aliases that strictly extend another (webqs.py:73-81)
        aliases = sorted(aliases)
        out = [aliases[0]]
        for a in aliases[1:]:
            if not a.startswith(out[-1]):
                out.append(a)
        return out

    def construct_requests(self, doc, ctx):
        return [Request("loglikelihood", (ctx, " " + alias))
                for alias in self._remove_prefixes(doc["answers"])]

    def process_results(self, doc, results):
        return {"acc": float(any(is_greedy for _, is_greedy in results))}

    def aggregation(self):
        return {"acc": mean}

    def higher_is_better(self):
        return {"acc": True}


# --------------------------------------------------------------------------
# prost (prost.py): zero-shot-only 4-way MC
# --------------------------------------------------------------------------

@register_task("prost")
class PROST(MultipleChoiceTask):
    VERSION = 0

    def download(self, data_dir=None):
        self.data = _load("corypaik/prost", data_dir=data_dir)

    def has_validation_docs(self):
        return False

    def has_test_docs(self):
        return True

    def test_docs(self):
        return [self._process(d) for d in self.data["test"]]

    def fewshot_context(self, doc, num_fewshot, rnd):
        assert num_fewshot == 0, \
            "PROST is designed to probe models in a zero-shot fashion only."
        return super().fewshot_context(doc, num_fewshot, rnd)

    @staticmethod
    def _process(doc):
        return {
            "query": f"{doc['context']}\nQuestion: {doc['ex_question']}\nAnswer:",
            "choices": [doc["A"], doc["B"], doc["C"], doc["D"]],
            "gold": doc["label"],
        }

    def doc_to_text(self, doc):
        return doc["query"]


# --------------------------------------------------------------------------
# qa4mre (qa4mre.py): MC over the train split
# --------------------------------------------------------------------------

class QA4MRE(MultipleChoiceTask):
    VERSION = 0
    CONFIG = "2011.main.EN"

    def download(self, data_dir=None):
        self.data = _load("qa4mre", self.CONFIG, data_dir=data_dir)

    def has_validation_docs(self):
        return False

    def has_test_docs(self):
        return True

    def test_docs(self):
        return [self._process(d) for d in self.data["train"]]

    @staticmethod
    def _process(doc):
        return {
            "source": doc["document_str"].strip().replace("'", "'"),
            "query": doc["question_str"],
            "choices": doc["answer_options"]["answer_str"],
            "gold": int(doc["correct_answer_id"]) - 1,
        }

    def doc_to_text(self, doc):
        return "{}\nQuestion: {}\nAnswer:".format(doc["source"], doc["query"])


for _year in ("2011", "2012", "2013"):
    register_task(f"qa4mre_{_year}")(
        type(f"QA4MRE_{_year}", (QA4MRE,), {"CONFIG": f"{_year}.main.EN"}))


# --------------------------------------------------------------------------
# headqa (headqa.py): Spanish/English healthcare exams MC
# --------------------------------------------------------------------------

class HeadQA(MultipleChoiceTask):
    VERSION = 0
    LANG = "en"

    def download(self, data_dir=None):
        try:
            self.data = _load("dvilares/head_qa", self.LANG, data_dir=data_dir)
        except Exception:
            self.data = _load("head_qa", self.LANG, data_dir=data_dir)

    def has_validation_docs(self):
        return True

    def has_test_docs(self):
        return True

    def training_docs(self):
        if self._training_docs is None:
            self._training_docs = [self._process(d) for d in self.data["train"]]
        return self._training_docs

    def validation_docs(self):
        return [self._process(d) for d in self.data["validation"]]

    def test_docs(self):
        return [self._process(d) for d in self.data["test"]]

    @staticmethod
    def _process(doc):
        return {
            "query": "Question: " + doc["qtext"] + "\nAnswer:",
            "choices": [a["atext"] for a in doc["answers"]],
            "gold": int(doc["ra"]) - 1,
        }

    def doc_to_text(self, doc):
        return doc["query"]


register_task("headqa_en")(type("HeadQAEn", (HeadQA,), {"LANG": "en"}))
register_task("headqa_es")(type("HeadQAEs", (HeadQA,), {"LANG": "es"}))
# deprecated alias kept for reference-CLI compatibility (headqa.py:80-87)
register_task("headqa")(type("HeadQAEsDeprecated", (HeadQA,), {"LANG": "es"}))


# --------------------------------------------------------------------------
# nq_open (nqopen.py): open-domain NQ, normalized EM over answer aliases
# --------------------------------------------------------------------------

@register_task("nq_open")
class NQOpen(Task):
    VERSION = 0

    def download(self, data_dir=None):
        self.data = _load("nq_open", data_dir=data_dir)

    def has_validation_docs(self):
        return True

    def has_test_docs(self):
        return False

    def training_docs(self):
        return list(self.data["train"])

    def validation_docs(self):
        return self.data["validation"]

    def doc_to_text(self, doc):
        return f"Q: {doc['question']}\nA:"

    def doc_to_target(self, doc):
        return " " + doc["answer"][0]

    def construct_requests(self, doc, ctx):
        return [Request("greedy_until", (ctx, ["\n", ".", ","]))]

    @staticmethod
    def _normalize(text):
        import re
        import string

        text = text.strip().lower().translate(
            str.maketrans("", "", string.punctuation))
        text = re.sub(r"\b(a|an|the)\b", " ", text)
        return " ".join(text.split())

    def process_results(self, doc, results):
        pred = self._normalize(results[0])
        return {"em": float(pred in [self._normalize(a)
                                     for a in doc["answer"]])}

    def aggregation(self):
        return {"em": mean}

    def higher_is_better(self):
        return {"em": True}


# --------------------------------------------------------------------------
# naturalqs (naturalqs.py — evaluation unimplemented in the reference;
# implemented here: greedy answer vs the annotated short answers)
# --------------------------------------------------------------------------

@register_task("naturalqs")
class NaturalQs(Task):
    VERSION = 0

    def download(self, data_dir=None):
        self.data = _load("natural_questions", data_dir=data_dir)

    def has_validation_docs(self):
        return True

    def has_test_docs(self):
        return False

    def training_docs(self):
        if self._training_docs is None:
            from itertools import islice

            self._training_docs = list(islice(self.data["train"], 0, 100000))
        return self._training_docs

    def validation_docs(self):
        return self.data["validation"]

    def doc_to_text(self, doc):
        return "Q: " + doc["question"]["text"] + "\n\n" + "A:"

    @staticmethod
    def _short_answers(doc):
        outs = []
        for ann in doc["annotations"]["short_answers"]:
            for text in ann.get("text", []):
                if text:
                    outs.append(text)
        return outs

    def doc_to_target(self, doc):
        shorts = self._short_answers(doc)
        return " " + (shorts[0] if shorts else "unanswerable")

    def construct_requests(self, doc, ctx):
        return [Request("greedy_until", (ctx, ["\n"]))]

    def process_results(self, doc, results):
        golds = self._short_answers(doc) or ["unanswerable"]
        pred = results[0].strip()
        return {
            "em": Q.metric_max_over_ground_truths(Q.compute_exact, pred, golds),
            "f1": Q.metric_max_over_ground_truths(Q.compute_f1, pred, golds),
        }

    def aggregation(self):
        return {"em": mean, "f1": mean}

    def higher_is_better(self):
        return {"em": True, "f1": True}


# --------------------------------------------------------------------------
# squad2 (squad.py): generation + unanswerable probability, squad_v2 metrics
# --------------------------------------------------------------------------

@register_task("squad2")
class SQuAD2(Task):
    VERSION = 1

    def download(self, data_dir=None):
        self.data = _load("squad_v2", data_dir=data_dir)

    def has_validation_docs(self):
        return True

    def has_test_docs(self):
        return False

    def training_docs(self):
        return self.data["train"]

    def validation_docs(self):
        return self.data["validation"]

    def doc_to_text(self, doc):
        return ("Title: " + doc["title"] + "\n\n" + "Background: " +
                doc["context"] + "\n\n" + "Question: " + doc["question"] +
                "\n\n" + "Answer:")

    def doc_to_target(self, doc):
        texts = doc["answers"]["text"]
        return " " + (texts[0] if texts else "unanswerable")

    def construct_requests(self, doc, ctx):
        return [Request("greedy_until", (ctx, ["\n"])),
                Request("loglikelihood", (ctx, " unanswerable"))]

    def process_results(self, doc, results):
        from math import exp

        continuation, (ll_unans, _) = results
        pred = {"id": doc["id"], "prediction_text": continuation,
                "no_answer_probability": exp(ll_unans)}
        ref = {"id": doc["id"], "answers": doc["answers"]}
        keys = ("exact", "f1", "HasAns_exact", "HasAns_f1", "NoAns_exact",
                "NoAns_f1", "best_exact", "best_f1")
        return {k: (pred, ref) for k in keys}

    def aggregation(self):
        keys = ("exact", "f1", "HasAns_exact", "HasAns_f1", "NoAns_exact",
                "NoAns_f1", "best_exact", "best_f1")
        return {k: partial(Q.squad2_agg, k) for k in keys}

    def higher_is_better(self):
        return {k: True for k in ("exact", "f1", "HasAns_exact", "HasAns_f1",
                                  "NoAns_exact", "NoAns_f1", "best_exact",
                                  "best_f1")}


# --------------------------------------------------------------------------
# coqa (coqa.py): conversational QA, leave-one-out EM/F1 over gold variants
# --------------------------------------------------------------------------

@register_task("coqa")
class CoQA(Task):
    VERSION = 1

    def download(self, data_dir=None):
        try:
            self.data = _load("stanfordnlp/coqa", data_dir=data_dir)
        except Exception:
            self.data = _load("coqa", data_dir=data_dir)

    def has_validation_docs(self):
        return True

    def has_test_docs(self):
        return False

    def training_docs(self):
        return self.data["train"]

    def validation_docs(self):
        return self.data["validation"]

    @staticmethod
    def _qa_lists(doc):
        qs = doc["questions"]
        ans = doc["answers"]
        if isinstance(qs, dict):  # original schema: {"input_text": [...]}
            qs = qs["input_text"]
        if isinstance(ans, dict):
            ans = ans["input_text"]
        return qs, ans

    def doc_to_text(self, doc):
        from itertools import zip_longest

        qs, ans = self._qa_lists(doc)
        text = doc["story"] + "\n\n"
        for q, a in zip_longest(qs, ans[:-1]):
            text += f"Q: {q}\n\n"
            text += f"A: {a}\n\n" if a is not None else "A:"
        return text

    @classmethod
    def get_answers(cls, doc, turn_id):
        qs, ans = cls._qa_lists(doc)
        answers = [ans[turn_id - 1]]
        additional = doc.get("additional_answers")
        if additional:
            for key in additional:
                extra = additional[key]["input_text"][turn_id - 1]
                if extra.lower() not in map(str.lower, answers):
                    answers.append(extra)
        return answers

    def doc_to_target(self, doc):
        _, ans = self._qa_lists(doc)
        return " " + ans[-1]

    def construct_requests(self, doc, ctx):
        return [Request("greedy_until", (ctx, ["\nQ:"]))]

    @staticmethod
    def compute_scores(gold_list, pred):
        # leave-one-out over multiple golds (coqa.py:103-124)
        f1_sum = em_sum = 0.0
        if len(gold_list) > 1:
            for i in range(len(gold_list)):
                golds = gold_list[:i] + gold_list[i + 1:]
                em_sum += max(Q.compute_exact(a, pred) for a in golds)
                f1_sum += max(Q.compute_f1(a, pred) for a in golds)
        else:
            em_sum += max(Q.compute_exact(a, pred) for a in gold_list)
            f1_sum += max(Q.compute_f1(a, pred) for a in gold_list)
        n = max(1, len(gold_list))
        return {"em": em_sum / n, "f1": f1_sum / n}

    def process_results(self, doc, results):
        qs, _ = self._qa_lists(doc)
        golds = self.get_answers(doc, len(qs))
        pred = results[0].strip().split("\n")[0]
        return self.compute_scores(golds, pred)

    def aggregation(self):
        return {"em": mean, "f1": mean}

    def higher_is_better(self):
        return {"em": True, "f1": True}


# --------------------------------------------------------------------------
# drop (drop.py): typed-bag EM/F1 with number gating + optimal alignment
# --------------------------------------------------------------------------

@register_task("drop")
class DROP(Task):
    VERSION = 1

    def download(self, data_dir=None):
        try:
            self.data = _load("ucinlp/drop", data_dir=data_dir)
        except Exception:
            self.data = _load("drop", data_dir=data_dir)

    def has_validation_docs(self):
        return True

    def has_test_docs(self):
        return False

    @staticmethod
    def _process(doc):
        # HF drop exposes answers_spans; the official validated-answer set
        # (reference drop.py:70-99) is not in this distribution, so the
        # gold set is the single annotated answer tuple.
        spans = tuple(doc["answers_spans"]["spans"])
        return {
            "id": doc["query_id"],
            "passage": doc["passage"],
            "question": doc["question"],
            "answers": [spans if spans else ("",)],
        }

    def training_docs(self):
        if self._training_docs is None:
            self._training_docs = [self._process(d) for d in self.data["train"]]
        return self._training_docs

    def validation_docs(self):
        return [self._process(d) for d in self.data["validation"]]

    def doc_to_text(self, doc):
        return (f"Passage: {doc['passage']}\nQuestion: {doc['question']}\n"
                "Answer:")

    def doc_to_target(self, doc):
        return " " + ", ".join(doc["answers"][0])

    def construct_requests(self, doc, ctx):
        return [Request("greedy_until", (ctx, ["."]))]

    def process_results(self, doc, results):
        max_em = max_f1 = 0.0
        for gold in doc["answers"]:
            em, f1 = Q.drop_metrics(results, gold)
            if gold[0].strip():
                max_em = max(max_em, em)
                max_f1 = max(max_f1, f1)
        return {"em": max_em, "f1": max_f1}

    def aggregation(self):
        return {"em": mean, "f1": mean}

    def higher_is_better(self):
        return {"em": True, "f1": True}


# --------------------------------------------------------------------------
# quac (quac.py — evaluation unimplemented in the reference; implemented
# here: per-turn greedy answers scored with max EM/F1 over gold texts)
# --------------------------------------------------------------------------

@register_task("quac")
class QuAC(Task):
    VERSION = 0

    def download(self, data_dir=None):
        try:
            self.data = _load("allenai/quac", data_dir=data_dir)
        except Exception:
            self.data = _load("quac", data_dir=data_dir)

    def has_validation_docs(self):
        return True

    def has_test_docs(self):
        return False

    @staticmethod
    def _flatten(dialogue):
        title = (dialogue["wikipedia_page_title"] + " - " +
                 dialogue["section_title"])
        ans = dialogue["answers"]
        for i, q in enumerate(dialogue["questions"]):
            texts = [t for t in ans["texts"][i] if t] or ["CANNOTANSWER"]
            yield {"title": title, "paragraph": dialogue["context"],
                   "question": q, "answers": texts}

    def training_docs(self):
        if self._training_docs is None:
            self._training_docs = [d for dia in self.data["train"]
                                   for d in self._flatten(dia)]
        return self._training_docs

    def validation_docs(self):
        for dia in self.data["validation"]:
            yield from self._flatten(dia)

    def doc_to_text(self, doc):
        return ("TITLE: " + doc["title"] + "\n" + "PARAGRAPH: " +
                doc["paragraph"] + "\n\n" + "Q: " + doc["question"] +
                "\n\n" + "A: ")

    def doc_to_target(self, doc):
        return doc["answers"][0]

    def construct_requests(self, doc, ctx):
        return [Request("greedy_until", (ctx, ["\n"]))]

    def process_results(self, doc, results):
        pred = results[0].strip()
        return {
            "em": Q.metric_max_over_ground_truths(Q.compute_exact, pred,
                                                  doc["answers"]),
            "f1": Q.metric_max_over_ground_truths(Q.compute_f1, pred,
                                                  doc["answers"]),
        }

    def aggregation(self):
        return {"em": mean, "f1": mean}

    def higher_is_better(self):
        return {"em": True, "f1": True}


# --------------------------------------------------------------------------
# mutual (mutual.py): 4-way next-utterance ranking -> r@1, r@2, MRR
# --------------------------------------------------------------------------

class MuTualBase(Task):
    VERSION = 1
    CONFIG = "mutual"
    CHOICES = ["A", "B", "C", "D"]

    def download(self, data_dir=None):
        if data_dir:  # local clone of the MuTual repo data dir
            import json
            import os

            self.data = {}
            for split, sub in [("train", "train"), ("validation", "dev")]:
                docs = []
                root = os.path.join(data_dir, self.CONFIG, sub)
                for fn in sorted(os.listdir(root)):
                    with open(os.path.join(root, fn)) as f:
                        docs.append(json.load(f))
                self.data[split] = docs
        else:
            self.data = _load("EleutherAI/mutual", self.CONFIG,
                              data_dir=data_dir)

    def has_validation_docs(self):
        return True

    def has_test_docs(self):
        return False

    def training_docs(self):
        return list(self.data["train"])

    def validation_docs(self):
        return list(self.data["validation"])

    @staticmethod
    def detokenize(text):
        for a, b in [(" '", "'"), (" \n", "\n"), ("\n ", "\n"),
                     (" n't", "n't"), ("`` ", '"'), ("''", '"'),
                     (" :", ":"), (" ;", ";"), (" !", "!"), (" ?", "?"),
                     (" ,", ","), (" .", ".")]:
            text = text.replace(a, b)
        return text

    def doc_to_text(self, doc):
        return self.detokenize(doc["article"])

    def doc_to_target(self, doc):
        return " " + self.detokenize(
            doc["options"][self.CHOICES.index(doc["answers"])])

    def construct_requests(self, doc, ctx):
        return [Request("loglikelihood", (ctx, f" {self.detokenize(o)}"))
                for o in doc["options"]]

    def process_results(self, doc, results):
        lls = [ll for ll, _ in results]
        gold = self.CHOICES.index(doc["answers"])
        r1 = float(int(np.argmax(lls)) == gold)
        ranks = sorted(lls, reverse=True)
        r2 = float(ranks.index(lls[gold]) == 1) + r1
        mrr = 1.0 / (ranks.index(lls[gold]) + 1)
        return {"r@1": r1, "r@2": r2, "mrr": mrr}

    def aggregation(self):
        return {"r@1": mean, "r@2": mean, "mrr": mean}

    def higher_is_better(self):
        return {"r@1": True, "r@2": True, "mrr": True}


register_task("mutual")(type("MuTual", (MuTualBase,), {"CONFIG": "mutual"}))
register_task("mutual_plus")(
    type("MuTualPlus", (MuTualBase,), {"CONFIG": "mutual_plus"}))


# --------------------------------------------------------------------------
# mc_taco (mc_taco.py): plausibility yes/no with question-grouped EM/F1
# --------------------------------------------------------------------------

def _mctaco_em(items):
    acc = collections.defaultdict(list)
    for gold, pred, question in items:
        acc[question].append(pred == gold)
    return float(np.mean([int(all(a)) for a in acc.values()]))


def _mctaco_f1(items):
    gold_pos = collections.defaultdict(list)
    pred_pos = collections.defaultdict(list)
    for gold, pred, question in items:
        gold_pos[question].append(gold)
        pred_pos[question].append(pred)
    f1s = []
    for q in gold_pos:
        gp, pp = sum(gold_pos[q]), sum(pred_pos[q])
        tp = sum(np.logical_and(gold_pos[q], pred_pos[q]))
        p = tp / pp if pp > 0 else 1.0
        r = tp / gp if gp > 0 else 1.0
        if p + r > 0:
            f1s.append(2 * p * r / (p + r))
    return float(np.mean(f1s)) if f1s else 0.0


@register_task("mc_taco")
class MCTACO(Task):
    VERSION = 0

    def download(self, data_dir=None):
        self.data = _load("mc_taco", data_dir=data_dir)

    def has_validation_docs(self):
        return True

    def has_test_docs(self):
        return True

    def validation_docs(self):
        return self.data["validation"]

    def test_docs(self):
        return self.data["test"]

    def doc_to_text(self, doc):
        return (f"{doc['sentence']}\nQuestion: {doc['question']}\n"
                f"Answer: {doc['answer']}\nPlausible:")

    def doc_to_target(self, doc):
        return " " + ["no", "yes"][doc["label"]]

    def construct_requests(self, doc, ctx):
        return [Request("loglikelihood", (ctx, " no")),
                Request("loglikelihood", (ctx, " yes"))]

    def process_results(self, doc, results):
        (ll_no, _), (ll_yes, _) = results
        pred = int(ll_yes > ll_no)
        item = (doc["label"], pred,
                " ".join([doc["sentence"], doc["question"]]))
        return {"em": item, "f1": item}

    def aggregation(self):
        return {"em": _mctaco_em, "f1": _mctaco_f1}

    def higher_is_better(self):
        return {"em": True, "f1": True}


# --------------------------------------------------------------------------
# wsc273 (wsc273.py): partial-evaluation Winograd schemas
# --------------------------------------------------------------------------

@register_task("wsc273")
class WSC273(Task):
    VERSION = 0

    upper_pronouns = ["A", "An", "The", "She", "He", "It", "They", "My",
                      "His", "Her", "Their"]

    def download(self, data_dir=None):
        self.data = _load("winograd_wsc", "wsc273", data_dir=data_dir)

    def has_validation_docs(self):
        return False

    def has_test_docs(self):
        return True

    def test_docs(self):
        return [self._process(dict(d)) for d in self.data["test"]]

    def _process(self, doc):
        doc["text"] = doc["text"].replace("  ", " ")
        doc["options"] = [self._normalize_option(doc, o)
                          for o in doc["options"]]
        return doc

    def _normalize_option(self, doc, option):
        if doc["pronoun"].lower() in ("my", "his", "her", "our", "their"):
            option += "'s"
        pronoun = option.split()[0]
        start_of_sentence = doc["text"][doc["pronoun_loc"] - 2] == "."
        if not start_of_sentence and pronoun in self.upper_pronouns:
            return option.replace(pronoun, pronoun.lower())
        return option

    @classmethod
    def partial_context(cls, doc, option):
        return doc["text"][: doc["pronoun_loc"]] + option

    @classmethod
    def partial_target(cls, doc):
        start = doc["pronoun_loc"] + len(doc["pronoun"])
        return " " + doc["text"][start:].strip()

    def doc_to_text(self, doc):
        return self.partial_context(doc, doc["options"][doc["label"]])

    def doc_to_target(self, doc):
        return self.partial_target(doc)

    @classmethod
    def append_context(cls, ctx, partial_ctx):
        parts = ctx.split("\n\n")
        parts.pop()
        return "\n\n".join([*parts, partial_ctx]) if parts else partial_ctx

    def construct_requests(self, doc, ctx):
        target = self.partial_target(doc)
        return [Request("loglikelihood",
                        (self.append_context(ctx,
                                              self.partial_context(doc, o)),
                         target))
                for o in doc["options"]]

    def process_results(self, doc, results):
        lls = [ll for ll, _ in results]
        return {"acc": float(int(np.argmax(lls)) == doc["label"])}

    def aggregation(self):
        return {"acc": mean}

    def higher_is_better(self):
        return {"acc": True}


# --------------------------------------------------------------------------
# record (superglue.py:276-366): entity-filled cloze, EM/F1 vs answer set
# --------------------------------------------------------------------------

@register_task("record")
class ReCoRD(Task):
    VERSION = 0

    def download(self, data_dir=None):
        self.data = _load("super_glue", "record", data_dir=data_dir)

    def has_validation_docs(self):
        return True

    def has_test_docs(self):
        return False

    @staticmethod
    def _process(doc):
        return {
            "passage": doc["passage"],
            "query": doc["query"],
            "entities": sorted(set(doc["entities"])),
            "answers": sorted(set(doc["answers"])),
        }

    def training_docs(self):
        if self._training_docs is None:
            self._training_docs = [self._process(d)
                                   for d in self.data["train"]]
        return self._training_docs

    def validation_docs(self):
        for d in self.data["validation"]:
            yield self._process(d)

    def doc_to_text(self, doc):
        initial_text, *highlights = doc["passage"].strip().split(
            "\n@highlight\n")
        text = initial_text + "\n\n"
        for h in highlights:
            text += f"  - {h}.\n"
        return text

    @classmethod
    def format_answer(cls, query, entity):
        return f"  - {query}".replace("@placeholder", entity)

    def doc_to_target(self, doc):
        return self.format_answer(doc["query"], doc["answers"][0])

    def construct_requests(self, doc, ctx):
        return [Request("loglikelihood",
                        (ctx, self.format_answer(doc["query"], entity)))
                for entity in doc["entities"]]

    def process_results(self, doc, results):
        lls = [ll for ll, _ in results]
        pred = doc["entities"][int(np.argmax(lls))]
        return {
            "f1": Q.metric_max_over_ground_truths(Q.compute_f1, pred,
                                                  doc["answers"]),
            "em": Q.metric_max_over_ground_truths(Q.compute_exact, pred,
                                                  doc["answers"]),
        }

    def aggregation(self):
        return {"f1": mean, "em": mean}

    def higher_is_better(self):
        return {"f1": True, "em": True}
