"""BIG-bench (lite subset) + JSON-defined custom tasks.

The reference registers bigbench multiple-choice tasks and supports tasks
defined by a JSON file (lm_eval/tasks/json.py).  BIG-bench data loads from
the HF "tasksource/bigbench" mirror (multiple-choice subset)."""

from __future__ import annotations

import json as _json
from typing import List, Optional

from ..metrics import mean
from ..registry import TASK_REGISTRY, register_task
from ..task import MultipleChoiceTask, PerplexityTask, Request, Task
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


# --------------------------------------------------------------------------
# Reference-compatible JSON perplexity task (lm_eval/tasks/json.py): the
# reference's literal "json" registry entry is a PerplexityTask over a
# LOCAL json/jsonl file, addressed as data_dir="split:text:/abs/path.json"
# (colons escapable with backslashes, utils.escaped_split).  The "json"
# key dispatches on the data_dir shape: the reference spec goes here, a
# bare file path keeps the extended JsonTask above (beyond-reference
# choices/continuation docs).
# --------------------------------------------------------------------------

def escaped_split(text: str, sep: str, maxsplit: int = -1) -> List[str]:
    """Split on ``sep`` unless backslash-escaped (reference
    lm_eval/utils.py:26-61 semantics); escapes are unescaped in the
    output."""
    assert len(sep) == 1
    parts, buf, n = [], [], 0
    i = 0
    while i < len(text):
        c = text[i]
        if c == "\\" and i + 1 < len(text) and text[i + 1] == sep:
            buf.append(sep)
            i += 2
            continue
        if c == sep and (maxsplit < 0 or n < maxsplit):
            parts.append("".join(buf))
            buf = []
            n += 1
            i += 1
            continue
        buf.append(c)
        i += 1
    parts.append("".join(buf))
    return parts


class JsonPerplexity(PerplexityTask):
    """Rolling perplexity over a local JSON dataset (reference
    lm_eval/tasks/json.py).  Docs are the ``key`` field of each row; the
    split name is accepted for reference-CLI compatibility (a flat json
    file is a single split)."""

    VERSION = 0

    def __init__(self, data_dir: Optional[str] = None):
        assert data_dir, "json ppl task needs data_dir='split:key:path.json'"
        self._split, self._key, path = escaped_split(data_dir, ":", 2)
        if path.endswith(".jsonl"):
            with open(path) as f:
                rows = [_json.loads(ln) for ln in f if ln.strip()]
        else:
            with open(path) as f:
                rows = _json.load(f)
        self._rows = rows
        super().__init__(data_dir=None)

    def download(self, data_dir: Optional[str] = None):
        pass

    def has_validation_docs(self):
        return False

    def has_test_docs(self):
        return True

    def test_docs(self):
        return [row[self._key] for row in self._rows]


_JSON_FILE_TASK = TASK_REGISTRY["json"]


def _json_dispatch(data_dir: Optional[str] = None):
    if data_dir and data_dir.count(":") >= 2:
        return JsonPerplexity(data_dir=data_dir)
    return _JSON_FILE_TASK(data_dir=data_dir)


TASK_REGISTRY["json"] = _json_dispatch
