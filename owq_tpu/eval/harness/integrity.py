"""Task-registry integrity checks.

The reference exposes ``zeroshot.py --check_integrity`` which invokes
pytest on a tests/ directory that is absent from the repo, so the flag
always crashes (lm_eval/utils.py:249-286, SURVEY.md §8).  This is the
working equivalent: structural validation of every registered task class
that needs no network and no dataset downloads.

Checks per task class:
  * VERSION attribute present (task versioning contract),
  * the metric contract is consistent: ``aggregation()`` and
    ``higher_is_better()`` expose the same metric keys,
  * doc-level methods are overridden coherently (at least one of
    validation/test docs is advertised),
  * the class can be instantiated structurally (``__new__`` + contract
    methods callable without ``download``).
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence

__all__ = ["check_task_integrity", "run_integrity_checks"]


def check_task_integrity(name: str, cls) -> List[str]:
    """Returns a list of problems (empty == clean)."""
    problems: List[str] = []
    if not hasattr(cls, "VERSION"):
        problems.append("missing VERSION")

    try:
        t = cls.__new__(cls)
    except Exception as e:  # pragma: no cover - defensive
        return problems + [f"__new__ failed: {e}"]

    # metric contract: aggregation keys == higher_is_better keys
    agg = hib = None
    try:
        agg = t.aggregation()
    except Exception as e:
        problems.append(f"aggregation() raised: {e}")
    try:
        hib = t.higher_is_better()
    except Exception as e:
        problems.append(f"higher_is_better() raised: {e}")
    if isinstance(agg, dict) and isinstance(hib, dict):
        if set(agg) != set(hib):
            problems.append(
                f"metric keys differ: aggregation={sorted(agg)} "
                f"higher_is_better={sorted(hib)}")
        for k, fn in agg.items():
            if not callable(fn):
                problems.append(f"aggregation[{k}] is not callable")
        for k, v in hib.items():
            if not isinstance(v, bool):
                problems.append(f"higher_is_better[{k}] is not a bool")

    # split contract: the evaluator needs at least one scored split
    try:
        has_any = bool(t.has_validation_docs()) or bool(t.has_test_docs())
        if not has_any:
            problems.append("advertises neither validation nor test docs")
    except Exception:
        # implementations that consult downloaded data can't answer
        # structurally; that's acceptable
        pass

    return problems


def run_integrity_checks(names: Optional[Sequence[str]] = None,
                         verbose: bool = True) -> Dict[str, List[str]]:
    """Check ``names`` (default: the whole registry).

    Returns {task_name: [problems]} for tasks with problems only.
    """
    from .registry import TASK_REGISTRY, _ensure_tasks_loaded

    _ensure_tasks_loaded()
    names = list(names) if names else sorted(TASK_REGISTRY)
    bad: Dict[str, List[str]] = {}
    for n in names:
        if n not in TASK_REGISTRY:
            bad[n] = ["not in registry"]
            continue
        problems = check_task_integrity(n, TASK_REGISTRY[n])
        if problems:
            bad[n] = problems
    if verbose:
        if bad:
            for n, ps in bad.items():
                print(f"INTEGRITY {n}: " + "; ".join(ps))
        print(f"integrity: {len(names) - len(bad)}/{len(names)} tasks clean")
    return bad
