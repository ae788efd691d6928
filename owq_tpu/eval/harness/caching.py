"""Request-level result cache (the reference's CachingLM, base.py:1094-1132).

Uses sqlite3 directly (the reference uses sqlitedict); keys are the request
type + repr of the arguments.
"""

from __future__ import annotations

import json
import sqlite3
from typing import List

from .base import LM

__all__ = ["CachingLM"]


class CachingLM(LM):
    def __init__(self, lm: LM, cache_db: str):
        self.lm = lm
        self.db = sqlite3.connect(cache_db)
        self.db.execute(
            "CREATE TABLE IF NOT EXISTS cache (key TEXT PRIMARY KEY, val TEXT)")

    def _cached_call(self, kind: str, requests: List):
        keys = [f"{kind}::{r!r}" for r in requests]
        hits = {}
        for k in keys:
            row = self.db.execute("SELECT val FROM cache WHERE key=?",
                                  (k,)).fetchone()
            if row is not None:
                hits[k] = json.loads(row[0])
        # dedupe on key: a request repeated within one batch must be
        # computed once and every occurrence must get that same result
        missing_keys: List[str] = []
        missing_reqs: List = []
        for k, r in zip(keys, requests):
            if k not in hits and k not in missing_keys:
                missing_keys.append(k)
                missing_reqs.append(r)
        if missing_reqs:
            fresh = getattr(self.lm, kind)(missing_reqs)
            for k, v in zip(missing_keys, fresh):
                hits[k] = v
                self.db.execute(
                    "INSERT OR REPLACE INTO cache VALUES (?, ?)",
                    (k, json.dumps(v)))
            self.db.commit()
        out = [hits[k] for k in keys]
        # loglikelihood results round-trip through json as lists
        if kind == "loglikelihood":
            out = [tuple(v) for v in out]
        return out

    def loglikelihood(self, requests):
        return self._cached_call("loglikelihood", list(requests))

    def loglikelihood_rolling(self, requests):
        return self._cached_call("loglikelihood_rolling", list(requests))

    def greedy_until(self, requests):
        return self._cached_call("greedy_until", list(requests))
