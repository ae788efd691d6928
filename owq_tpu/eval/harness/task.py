"""Task abstractions: request construction + result processing.

Mirrors the behavioral contract of the reference harness's Task /
MultipleChoiceTask / PerplexityTask (lm_eval/base.py:683-1071): a task
yields documents, renders them to text, emits typed requests, converts LM
responses to per-doc metrics, and declares aggregation + higher-is-better
metadata.
"""

from __future__ import annotations

import abc
from typing import Any, Dict, Iterable, List, Optional, Sequence

from . import metrics as M

__all__ = ["Task", "MultipleChoiceTask", "PerplexityTask", "Request"]


class Request:
    __slots__ = ("kind", "args")

    def __init__(self, kind: str, args):
        self.kind = kind      # loglikelihood | loglikelihood_rolling | greedy_until
        self.args = args

    def __repr__(self):
        return f"Request({self.kind}, {self.args!r})"


class Task(abc.ABC):
    VERSION = 0

    def __init__(self, data_dir: Optional[str] = None):
        self._training_docs = None
        self._fewshot_docs = None
        self.download(data_dir)

    # -- data ----------------------------------------------------------
    def download(self, data_dir: Optional[str] = None) -> None:
        """Load datasets (HF datasets by default); override or no-op."""

    @abc.abstractmethod
    def has_validation_docs(self) -> bool: ...

    @abc.abstractmethod
    def has_test_docs(self) -> bool: ...

    def validation_docs(self) -> Iterable[dict]:
        return []

    def test_docs(self) -> Iterable[dict]:
        return []

    def training_docs(self) -> Iterable[dict]:
        return []

    def eval_docs(self) -> List[dict]:
        if self.has_test_docs():
            return list(self.test_docs())
        if self.has_validation_docs():
            return list(self.validation_docs())
        raise RuntimeError(f"{type(self).__name__} has no eval docs")

    # -- rendering -----------------------------------------------------
    @abc.abstractmethod
    def doc_to_text(self, doc: dict) -> str: ...

    @abc.abstractmethod
    def doc_to_target(self, doc: dict) -> str: ...

    def fewshot_description(self) -> str:
        return ""

    def has_training_docs(self) -> bool:
        """Whether a dedicated training split exists for fewshot draws.

        The reference declares this per task (base.py abstract); default
        here probes training_docs() once and caches the materialized list
        (also the fewshot pool) so the answer is free afterwards.
        """
        if self._training_docs is None:
            self._training_docs = list(self.training_docs())
        return bool(self._training_docs)

    def fewshot_examples(self, k: int, rnd) -> List[dict]:
        """k examples from the training split (reference base.py:811-815:
        plain rnd.sample, NO dedup against the evaluated doc)."""
        if self._training_docs is None:
            self._training_docs = list(self.training_docs())
        return rnd.sample(self._training_docs, k)

    def fewshot_context(self, doc: dict, num_fewshot: int, rnd) -> str:
        """Assemble k-shot prompt (reference base.py:887-954 semantics).

        Training-split tasks draw exactly k examples (no overlap filter);
        tasks without a training split draw k+1 from validation/test and
        drop the evaluated doc if sampled — branch AND rnd-consumption
        order match the reference so identical seeds give identical
        prompts.
        """
        description = self.fewshot_description()
        prefix = description + "\n\n" if description else ""
        if num_fewshot == 0:
            return prefix + self.doc_to_text(doc)
        if self.has_training_docs():
            examples = self.fewshot_examples(num_fewshot, rnd)
        else:
            if self._fewshot_docs is None:
                self._fewshot_docs = list(
                    self.validation_docs() if self.has_validation_docs()
                    else self.test_docs())
            examples = rnd.sample(self._fewshot_docs,
                                  min(num_fewshot + 1,
                                      len(self._fewshot_docs)))
            examples = [e for e in examples if e != doc][:num_fewshot]
        shots = "\n\n".join(self.doc_to_text(e) + self.doc_to_target(e)
                            for e in examples)
        return prefix + shots + "\n\n" + self.doc_to_text(doc)

    # -- requests ------------------------------------------------------
    @abc.abstractmethod
    def construct_requests(self, doc: dict, ctx: str) -> List[Request]: ...

    @abc.abstractmethod
    def process_results(self, doc: dict, results: List[Any]) -> Dict[str, Any]:
        ...

    def aggregation(self) -> Dict[str, Any]:
        return {"acc": M.mean}

    def higher_is_better(self) -> Dict[str, bool]:
        return {"acc": True}


class MultipleChoiceTask(Task):
    """Per-choice loglikelihood -> acc / acc_norm (base.py:956-990)."""

    def doc_to_target(self, doc: dict) -> str:
        return " " + doc["choices"][doc["gold"]]

    def construct_requests(self, doc: dict, ctx: str) -> List[Request]:
        return [Request("loglikelihood", (ctx, " " + choice))
                for choice in doc["choices"]]

    def process_results(self, doc: dict, results) -> Dict[str, Any]:
        gold = doc["gold"]
        lls = [ll for ll, _ in results]
        acc = 1.0 if int(max(range(len(lls)), key=lls.__getitem__)) == gold else 0.0
        completion_len = [float(len(c)) for c in doc["choices"]]
        norm = [ll / max(L, 1.0) for ll, L in zip(lls, completion_len)]
        acc_norm = 1.0 if int(max(range(len(norm)),
                                  key=norm.__getitem__)) == gold else 0.0
        return {"acc": acc, "acc_norm": acc_norm}

    def aggregation(self):
        return {"acc": M.mean, "acc_norm": M.mean}

    def higher_is_better(self):
        return {"acc": True, "acc_norm": True}


class PerplexityTask(Task):
    """Rolling loglikelihood -> word/byte perplexity (base.py:992-1071)."""

    def has_training_docs(self) -> bool:
        return False

    def doc_to_text(self, doc) -> str:
        return ""

    def doc_to_target(self, doc) -> str:
        return doc if isinstance(doc, str) else doc["text"]

    def fewshot_context(self, doc, num_fewshot, rnd) -> str:
        return ""

    def construct_requests(self, doc, ctx: str) -> List[Request]:
        return [Request("loglikelihood_rolling", (self.doc_to_target(doc),))]

    def count_words(self, doc) -> int:
        # reference semantics (base.py:1069-1071): re.split(r"\s+") — which,
        # unlike str.split(), counts empty fields at leading/trailing
        # whitespace; word_perplexity depends on this exact count
        import re

        return len(re.split(r"\s+", self.doc_to_target(doc)))

    def count_bytes(self, doc) -> int:
        return len(self.doc_to_target(doc).encode("utf-8"))

    def process_results(self, doc, results) -> Dict[str, Any]:
        (ll,) = results
        words = self.count_words(doc)
        nbytes = self.count_bytes(doc)
        return {
            "word_perplexity": (ll, words),
            "byte_perplexity": (ll, nbytes),
            "bits_per_byte": (ll, nbytes),
        }

    def aggregation(self):
        return {"word_perplexity": M.weighted_perplexity,
                "byte_perplexity": M.weighted_perplexity,
                "bits_per_byte": M.bits_per_byte}

    def higher_is_better(self):
        return {"word_perplexity": False, "byte_perplexity": False,
                "bits_per_byte": False}
