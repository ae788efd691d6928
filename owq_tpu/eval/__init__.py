from .ppl import eval_ppl, window_nll

# harness / decontamination / overlap import lazily (datasets-dependent)
_LAZY = {
    "simple_evaluate": "harness.evaluator",
    "evaluate": "harness.evaluator",
    "make_table": "harness.evaluator",
    "Janitor": "decontamination",
    "scan_tasks": "overlap",
    "Archive": "archiver",
    "Reader": "archiver",
    "TextArchive": "archiver",
    "TextReader": "archiver",
    "read_corpus": "archiver",
}


def __getattr__(name):
    if name in _LAZY:
        import importlib

        mod = importlib.import_module(f".{_LAZY[name]}", __name__)
        return getattr(mod, name)
    raise AttributeError(name)
