"""Profiling and timing utilities.

The reference has only ad-hoc wall-clock prints (SURVEY.md §5); here we
provide (a) a jax.profiler trace context that produces TensorBoard-viewable
traces, (b) a robust device timer that forces completion via a
data-dependent readback (plain block_until_ready can be an async ack on
relayed backends — see runtime/generate._bench_scan), and (c) a roofline
helper for the v5e targets.
"""

from __future__ import annotations

import contextlib
import time
from typing import Callable, Dict, Optional

import numpy as np

__all__ = ["trace", "device_timeit", "roofline_tokens_per_s", "Timer"]

V5E_HBM_GBPS = 819.0
V5E_BF16_TFLOPS = 197.0


@contextlib.contextmanager
def trace(logdir: str = "/tmp/owq_trace"):
    """jax.profiler trace context (view with tensorboard/xprof)."""
    import jax

    jax.profiler.start_trace(logdir)
    try:
        yield logdir
    finally:
        jax.profiler.stop_trace()


def device_timeit(fn: Callable, *args, iters: int = 50,
                  rounds: int = 3) -> float:
    """Min-of-rounds mean seconds per call, dispatch-chained with one
    terminal sync per round (robust on async/relayed device runtimes)."""
    import jax

    y = fn(*args)
    jax.block_until_ready(y)
    best = float("inf")
    for _ in range(rounds):
        t0 = time.perf_counter()
        for _ in range(iters):
            y = fn(*args)
        jax.block_until_ready(y)
        best = min(best, (time.perf_counter() - t0) / iters)
    return best


def roofline_tokens_per_s(weight_bytes: int,
                          hbm_gbps: float = V5E_HBM_GBPS) -> float:
    """Weight-bandwidth decode ceiling: every weight byte read once/token."""
    return hbm_gbps * 1e9 / weight_bytes


class Timer:
    """Named wall-clock section accumulator (prints a summary table)."""

    def __init__(self):
        self.acc: Dict[str, float] = {}

    @contextlib.contextmanager
    def section(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.acc[name] = self.acc.get(name, 0.0) + time.perf_counter() - t0

    def summary(self) -> str:
        total = sum(self.acc.values()) or 1.0
        lines = [f"{k:30s} {v:8.2f}s {100*v/total:5.1f}%"
                 for k, v in sorted(self.acc.items(), key=lambda kv: -kv[1])]
        return "\n".join(lines)
