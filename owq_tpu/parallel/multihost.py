"""Multi-host initialization and pod-slice mesh construction.

N>=2 host serving (BASELINE llama-2-70b / opt-66b config): standard JAX
distributed initialization — each host calls ``initialize`` with the same
coordinator, ``jax.devices()`` becomes the global device list, and the
(dp, tp) mesh spans the slice.  In-slice collectives ride ICI; cross-slice
traffic rides DCN, handled transparently by GSPMD (SURVEY.md §2.5: no
custom communication backend to write — the sharding layout of the packed
arrays is the design surface, and that is identical to single-host TP).

Typical 70B deployment on 2 hosts x 8 chips: ``tp=16`` (or tp=8, dp=2 with
replicated weights if HBM allows).  Every host runs the same program; use
``is_primary()`` to gate logging/serving frontends.
"""

from __future__ import annotations

import os
from typing import Optional

import jax

from .mesh import make_mesh

__all__ = ["initialize", "is_primary", "pod_mesh"]


def initialize(coordinator_address: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None) -> None:
    """jax.distributed.initialize with env-var fallbacks
    (COORDINATOR_ADDRESS / NUM_PROCESSES / PROCESS_ID, or TPU metadata
    auto-detection when no arguments are given)."""
    kwargs = {}
    addr = coordinator_address or os.environ.get("COORDINATOR_ADDRESS")
    if addr:
        kwargs["coordinator_address"] = addr
    if num_processes or os.environ.get("NUM_PROCESSES"):
        kwargs["num_processes"] = int(num_processes
                                      or os.environ["NUM_PROCESSES"])
    if process_id is not None or os.environ.get("PROCESS_ID"):
        kwargs["process_id"] = int(process_id
                                   if process_id is not None
                                   else os.environ["PROCESS_ID"])
    jax.distributed.initialize(**kwargs)


def is_primary() -> bool:
    return jax.process_index() == 0


def pod_mesh(dp: int = 1, tp: Optional[int] = None):
    """Mesh over the global (all-hosts) device list."""
    return make_mesh(dp=dp, tp=tp, devices=jax.devices())
