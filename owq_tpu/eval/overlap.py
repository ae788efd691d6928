"""Train/eval overlap scanning (the reference's decontaminate.py).

Registers a training corpus into the Janitor, then scans task documents for
13-gram contamination; returns per-task clean/dirty doc indices so the
evaluator can report decontaminated metrics.
"""

from __future__ import annotations

from typing import Dict, Iterable, List, Sequence, Tuple

from .decontamination import Janitor

__all__ = ["scan_tasks", "decontaminate_docs"]


def decontaminate_docs(train_texts: Iterable[str], eval_texts: Sequence[str],
                       *, ngram_n: int = 13, window: int = 200
                       ) -> Tuple[List[int], List[int]]:
    """Returns (clean_indices, dirty_indices) of eval_texts."""
    janitor = Janitor(ngram_n=ngram_n, window_to_remove=window)
    for text in train_texts:
        janitor.register_contaminant(text)
    clean, dirty = [], []
    for i, text in enumerate(eval_texts):
        frags = janitor.clean(text)
        if len(frags) == 1 and frags[0] == text:
            clean.append(i)
        else:
            dirty.append(i)
    return clean, dirty


def scan_tasks(task_dict: Dict, train_texts: Iterable[str],
               *, ngram_n: int = 13) -> Dict[str, Dict[str, List[int]]]:
    """Scan every task's eval docs against a training corpus.

    Returns {task_name: {"clean": [...], "dirty": [...]}} — the analogue of
    the reference's train-set overlap scan (decontaminate.py:24-169).
    """
    train_texts = list(train_texts)
    out: Dict[str, Dict[str, List[int]]] = {}
    for name, task in task_dict.items():
        docs = task.eval_docs()
        texts = [task.doc_to_text(d) + task.doc_to_target(d) for d in docs]
        clean, dirty = decontaminate_docs(train_texts, texts,
                                          ngram_n=ngram_n)
        out[name] = {"clean": clean, "dirty": dirty}
    return out
