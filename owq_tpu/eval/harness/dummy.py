"""DummyLM: random logprobs, lets the evaluator pipeline run modelless
(the reference's lm_eval/models/dummy.py analogue)."""

from __future__ import annotations

import random
from typing import List, Tuple

from .base import LM
from .registry import register_model


@register_model("dummy")
class DummyLM(LM):
    def __init__(self, seed: int = 0, **kwargs):
        self.rnd = random.Random(int(seed))

    def loglikelihood(self, requests) -> List[Tuple[float, bool]]:
        return [(-self.rnd.random() * 10.0, False) for _ in requests]

    def loglikelihood_rolling(self, requests) -> List[float]:
        return [-self.rnd.random() * 100.0 for _ in requests]

    def greedy_until(self, requests) -> List[str]:
        return ["lorem ipsum" for _ in requests]
