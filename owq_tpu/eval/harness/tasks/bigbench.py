"""BIG-bench (lite subset) + JSON-defined custom tasks.

The reference registers bigbench multiple-choice tasks and supports tasks
defined by a JSON file (lm_eval/tasks/json.py).  BIG-bench data loads from
the HF "tasksource/bigbench" mirror (multiple-choice subset)."""

from __future__ import annotations

import json as _json
from typing import List, Optional

from ..metrics import mean
from ..registry import TASK_REGISTRY, register_task
from ..task import MultipleChoiceTask, Request, Task
from . import _load

BIGBENCH_MC_TASKS = [
    "abstract_narrative_understanding", "anachronisms", "analogical_similarity",
    "arithmetic", "causal_judgment", "date_understanding", "disambiguation_qa",
    "emoji_movie", "empirical_judgments", "fantasy_reasoning",
    "general_knowledge", "implicatures", "intent_recognition",
    "logical_deduction", "movie_dialog_same_or_different", "moral_permissibility",
    "novel_concepts", "presuppositions_as_nli", "ruin_names", "snarks",
    "sports_understanding", "temporal_sequences", "understanding_fables",
]


class _BigBenchMC(MultipleChoiceTask):
    VERSION = 0
    TASK = ""

    def download(self, data_dir=None):
        self.data = _load("tasksource/bigbench", self.TASK, data_dir=data_dir)

    def has_validation_docs(self):
        return "validation" in self.data

    def has_test_docs(self):
        return False

    def validation_docs(self):
        return [d for d in map(self._convert, self.data["validation"])
                if d is not None]

    def training_docs(self):
        if "train" not in self.data:
            return []
        return [d for d in map(self._convert, self.data["train"])
                if d is not None]

    def _convert(self, doc):
        choices = doc.get("multiple_choice_targets") or []
        scores = doc.get("multiple_choice_scores") or []
        if not choices or 1 not in scores:
            return None
        return {"query": doc["inputs"], "choices": choices,
                "gold": scores.index(1)}

    def doc_to_text(self, doc):
        return doc["query"]


for _t in BIGBENCH_MC_TASKS:
    register_task(f"bigbench_{_t}")(
        type(f"BigBench_{_t}", (_BigBenchMC,), {"TASK": _t}))


@register_task("json")
class JsonTask(Task):
    """Task defined by a JSON/JSONL file of docs (reference tasks/json.py).

    Use via data_dir="<path>.json[l]"; each doc needs either
    {"context", "choices", "gold"} (multiple choice) or
    {"context", "continuation"} (loglikelihood scoring).
    """

    VERSION = 0

    def download(self, data_dir: Optional[str] = None):
        assert data_dir, "json task needs data_dir=<file.json|.jsonl>"
        if data_dir.endswith(".jsonl"):
            with open(data_dir) as f:
                self.docs = [_json.loads(line) for line in f if line.strip()]
        else:
            with open(data_dir) as f:
                self.docs = _json.load(f)

    def has_validation_docs(self):
        return True

    def has_test_docs(self):
        return False

    def validation_docs(self):
        return list(self.docs)

    def doc_to_text(self, doc):
        return doc["context"]

    def doc_to_target(self, doc):
        if "choices" in doc:
            return " " + doc["choices"][doc["gold"]]
        return doc["continuation"]

    def construct_requests(self, doc, ctx):
        if "choices" in doc:
            return [Request("loglikelihood", (ctx, " " + c))
                    for c in doc["choices"]]
        return [Request("loglikelihood", (ctx, doc["continuation"]))]

    def process_results(self, doc, results):
        if "choices" in doc:
            lls = [ll for ll, _ in results]
            pred = int(max(range(len(lls)), key=lls.__getitem__))
            return {"acc": float(pred == doc["gold"])}
        return {"acc": float(results[0][1])}  # greedy match

    def aggregation(self):
        return {"acc": mean}

    def higher_is_better(self):
        return {"acc": True}
