"""Task and model registries (lm_eval/tasks/__init__.py analogue)."""

from __future__ import annotations

from typing import Callable, Dict, Optional, Sequence

__all__ = ["TASK_REGISTRY", "MODEL_REGISTRY", "register_task", "get_task",
           "get_task_dict", "get_model", "list_tasks"]

TASK_REGISTRY: Dict[str, Callable] = {}
MODEL_REGISTRY: Dict[str, Callable] = {}


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
    return {n: get_task(n, data_dir=data_dir) for n in names}


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
