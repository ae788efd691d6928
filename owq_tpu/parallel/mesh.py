"""Device mesh construction for (data, tensor) parallelism.

Reference parallelism is a naive per-GPU pipeline split (main.py:269-302);
the TPU-native replacement is a 2D ('dp', 'tp') mesh with GSPMD/shard_map
sharding (SURVEY.md §2.5).  Multi-host initialization is the standard
``jax.distributed.initialize`` + global device list — no custom backend.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh

__all__ = ["make_mesh", "DP_AXIS", "TP_AXIS"]

DP_AXIS = "dp"
TP_AXIS = "tp"


def make_mesh(dp: int = 1, tp: Optional[int] = None,
              devices: Optional[Sequence] = None) -> Mesh:
    """Build a [dp, tp] mesh; tp defaults to using all remaining devices."""
    devices = list(devices if devices is not None else jax.devices())
    if tp is None:
        if len(devices) % dp:
            raise ValueError(f"{len(devices)} devices not divisible by dp={dp}")
        tp = len(devices) // dp
    n = dp * tp
    if n > len(devices):
        raise ValueError(f"need {n} devices, have {len(devices)}")
    grid = np.asarray(devices[:n]).reshape(dp, tp)
    return Mesh(grid, (DP_AXIS, TP_AXIS))
