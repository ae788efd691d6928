"""Task and model registries (lm_eval/tasks/__init__.py analogue)."""

from __future__ import annotations

from typing import Callable, Dict, Optional, Sequence

__all__ = ["TASK_REGISTRY", "MODEL_REGISTRY", "TASK_GROUPS", "register_task",
           "get_task", "get_task_dict", "get_model", "list_tasks"]

TASK_REGISTRY: Dict[str, Callable] = {}
MODEL_REGISTRY: Dict[str, Callable] = {}

# Benchmark-group aliases: the reference expands these dicts into
# per-langpair registry entries (lm_eval/tasks/__init__.py:76-87 ->
# translation.create_tasks_from_benchmarks), so ``--tasks wmt16`` resolves
# to every member task.  Members must exist in TASK_REGISTRY.
TASK_GROUPS: Dict[str, Sequence[str]] = {
    "wmt14": ["wmt14-en-fr", "wmt14-fr-en"],
    "wmt16": ["wmt16-en-ro", "wmt16-ro-en", "wmt16-de-en", "wmt16-en-de"],
    "wmt20": ["wmt20-" + p for p in (
        "cs-en", "de-en", "de-fr", "en-cs", "en-de", "en-iu", "en-ja",
        "en-km", "en-pl", "en-ps", "en-ru", "en-ta", "en-zh", "fr-de",
        "iu-en", "ja-en", "km-en", "pl-en", "ps-en", "ru-en", "ta-en",
        "zh-en")],
    "iwslt17": ["iwslt17-en-ar", "iwslt17-ar-en"],
}


def register_task(name: str):
    def deco(cls):
        TASK_REGISTRY[name] = cls
        return cls
    return deco


def register_model(name: str):
    def deco(cls):
        MODEL_REGISTRY[name] = cls
        return cls
    return deco


def _ensure_tasks_loaded() -> None:
    from . import tasks  # noqa: F401  (registers on import)


def list_tasks():
    _ensure_tasks_loaded()
    return sorted(TASK_REGISTRY)


def get_task(name: str, data_dir: Optional[str] = None):
    _ensure_tasks_loaded()
    return TASK_REGISTRY[name](data_dir=data_dir)


def get_task_dict(names: Sequence[str], data_dir: Optional[str] = None):
    _ensure_tasks_loaded()
    expanded = []
    for n in names:
        members = TASK_GROUPS.get(n, [n]) if n not in TASK_REGISTRY else [n]
        for m in members:
            if m not in expanded:
                expanded.append(m)
    return {n: get_task(n, data_dir=data_dir) for n in expanded}


def get_model(name: str):
    from .dummy import DummyLM  # registers
    from . import api_models  # noqa: F401  (gpt3 / anthropic / textsynth)
    from . import hf_model  # noqa: F401  (registers "hf"/"hf-causal")
    from . import owq_model  # noqa: F401  (registers "owq")
    from . import seq2seq_model  # noqa: F401  (registers "hf-seq2seq")

    # reference-registry aliases (lm_eval/models/__init__.py:9-20)
    MODEL_REGISTRY.setdefault("gpt2", MODEL_REGISTRY["hf"])
    MODEL_REGISTRY.setdefault("hf-causal-experimental", MODEL_REGISTRY["hf"])
    MODEL_REGISTRY.setdefault("hf-causal-owq", MODEL_REGISTRY["owq"])
    return MODEL_REGISTRY[name]
