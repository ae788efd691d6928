"""Evaluator core: request grouping, execution, aggregation, tables.

Mirrors the reference evaluator's flow (lm_eval/evaluator.py:142-391): per
task, deterministically SHUFFLE the docs with a Random seeded 42 and chop
the first ``limit`` (fractional limits are a doc-count ratio,
evaluator.py:243-244); the SAME rnd then drives fewshot sampling (the
reference reuses its shuffle generator for fewshot_context,
evaluator.py:229-232,254-255).  Requests group by type and run in one
batched call per type; responses route back to each task's
``process_results``; aggregation adds bootstrap stderr.  Global seeds
1234 (random/np) are set in simple_evaluate (evaluator.py:67-68).
Protocol equality with the reference's own vendored lm_eval is asserted
head-to-head in tests/test_reference_protocol.py (shared local-JSON
fixture + injected LM).
"""

from __future__ import annotations

import random
from typing import Any, Dict, List, Optional, Sequence

from .base import LM
from .metrics import stderr_for
from .registry import get_task_dict
from .task import Request, Task

__all__ = ["evaluate", "simple_evaluate", "make_table"]


def evaluate(lm: LM, task_dict: Dict[str, Task], *, num_fewshot: int = 0,
             limit: Optional[int] = None, bootstrap_iters: int = 1000,
             seed: int = 42) -> Dict[str, Any]:
    requests: Dict[str, List] = {}
    request_origin: Dict[str, List] = {}
    docs: Dict[str, List[dict]] = {}

    for task_name, task in task_dict.items():
        eval_docs = task.eval_docs()
        # deterministic shuffle-then-limit, same generator reused for
        # fewshot sampling (reference evaluator.py:229-246)
        rnd = random.Random()
        rnd.seed(seed)
        rnd.shuffle(eval_docs)
        if limit is not None:
            n = int(len(eval_docs) * limit) if limit < 1.0 else int(limit)
            eval_docs = eval_docs[:n]
        docs[task_name] = eval_docs
        for doc_id, doc in enumerate(eval_docs):
            ctx = task.fewshot_context(doc, num_fewshot, rnd)
            for req_i, req in enumerate(task.construct_requests(doc, ctx)):
                requests.setdefault(req.kind, []).append(req.args)
                request_origin.setdefault(req.kind, []).append(
                    (task_name, doc_id, req_i))

    # run each request type in one batched call
    responses: Dict[str, List] = {}
    for kind, args in requests.items():
        fn = getattr(lm, kind)
        if kind == "loglikelihood_rolling":
            responses[kind] = fn([a[0] for a in args])
        else:
            responses[kind] = fn(args)

    # route responses back per (task, doc)
    per_doc: Dict[tuple, Dict[int, Any]] = {}
    for kind, origins in request_origin.items():
        for resp, (task_name, doc_id, req_i) in zip(responses[kind], origins):
            per_doc.setdefault((task_name, doc_id), {})[req_i] = resp

    # metrics
    vals: Dict[tuple, List] = {}
    for task_name, task in task_dict.items():
        for doc_id, doc in enumerate(docs[task_name]):
            reqs = per_doc.get((task_name, doc_id), {})
            ordered = [reqs[i] for i in sorted(reqs)]
            for metric, value in task.process_results(doc, ordered).items():
                vals.setdefault((task_name, metric), []).append(value)

    results: Dict[str, Dict[str, float]] = {}
    versions: Dict[str, int] = {}
    for (task_name, metric), items in vals.items():
        task = task_dict[task_name]
        agg = task.aggregation()[metric]
        results.setdefault(task_name, {})[metric] = agg(items)
        # analytic stderrs (mean/acc_all) always emit — the reference's
        # bootstrap_iters only sizes the resampling; bootstrappable
        # metrics skip their stderr when iters <= 0
        se = stderr_for(metric, agg, items, iters=bootstrap_iters)
        if se is not None:  # reference omits the key when no stderr
            results[task_name][metric + "_stderr"] = se
        versions[task_name] = task.VERSION
    return {"results": results, "versions": versions}


def simple_evaluate(*, model, tasks: Sequence[str], model_args: str = "",
                    num_fewshot: int = 0, limit: Optional[int] = None,
                    bootstrap_iters: int = 1000, no_cache: bool = True,
                    cache_db: str = "lm_cache.db",
                    data_dir: Optional[str] = None) -> Dict[str, Any]:
    """Instantiate model + tasks and evaluate (evaluator.py:16-135 analogue).

    ``model`` is an LM instance or a registry name ("owq", "dummy") with
    comma-separated ``model_args``.
    """
    import numpy as np

    from .registry import get_model

    random.seed(1234)
    np.random.seed(1234)

    if isinstance(model, str):
        kwargs = {}
        if model_args:
            for pair in model_args.split(","):
                k, v = pair.split("=", 1)
                kwargs[k] = v
        lm = get_model(model)(**kwargs)
    else:
        lm = model

    if not no_cache:
        from .caching import CachingLM

        lm = CachingLM(lm, cache_db)

    task_dict = get_task_dict(tasks, data_dir=data_dir)
    out = evaluate(lm, task_dict, num_fewshot=num_fewshot, limit=limit,
                   bootstrap_iters=bootstrap_iters)
    out["config"] = {"model": model if isinstance(model, str) else
                     type(model).__name__,
                     "num_fewshot": num_fewshot, "limit": limit}
    return out


def make_table(result_dict: Dict[str, Any]) -> str:
    """Markdown results table (evaluator.make_table analogue)."""
    lines = ["|Task|Version|Metric|Value|±|Stderr|",
             "|---|---|---|---|---|---|"]
    for task_name, metrics in sorted(result_dict["results"].items()):
        version = result_dict.get("versions", {}).get(task_name, "")
        for metric, value in sorted(metrics.items()):
            if metric.endswith("_stderr"):
                continue
            stderr = metrics.get(metric + "_stderr")
            if stderr is not None:
                lines.append(f"|{task_name}|{version}|{metric}|{value:.4f}"
                             f"|±|{stderr:.4f}|")
            else:
                lines.append(f"|{task_name}|{version}|{metric}|{value:.4f}|||")
    return "\n".join(lines)
