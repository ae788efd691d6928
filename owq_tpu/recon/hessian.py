"""Calibration Hessian accumulation.

The reference accumulates, per linear layer, a running mean
``H = (2/N) * sum_s X_s X_s^T`` over N calibration samples via forward hooks
(reference: owq/recon.py:35-57).  Here the accumulation is a single jitted
MXU contraction per batch; under data parallelism the per-shard partial
Hessians are combined with a psum over the 'data' mesh axis (SURVEY.md §2.5).

Accumulation is f32 regardless of activation dtype — GPTQ's Cholesky solve
is numerically sensitive (SURVEY.md §7.4.3).
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp


@jax.jit
def batch_outer(x: jnp.ndarray) -> jnp.ndarray:
    """X^T X over all leading axes.  x: [..., k] -> [k, k] f32."""
    x = x.reshape(-1, x.shape[-1]).astype(jnp.float32)
    return jnp.dot(x.T, x, preferred_element_type=jnp.float32)


@dataclasses.dataclass
class HessianAccumulator:
    """Streaming E[2 x x^T]-style Hessian, matching reference semantics.

    The reference normalizes by the number of *samples* (calibration
    sequences), not tokens: each ``update`` with activations of one sample
    (shape [seq, k] or [b, seq, k] with b counted as b samples) contributes
    2 * X^T X, and ``finalize`` divides by the number of samples seen.
    """

    columns: int
    H: Optional[jnp.ndarray] = None
    nsamples: int = 0

    def update(self, x: jnp.ndarray, num_samples: Optional[int] = None) -> None:
        if num_samples is None:
            num_samples = int(x.shape[0]) if x.ndim >= 3 else 1
        part = batch_outer(x)
        if self.H is None:
            self.H = part
        else:
            self.H = self.H + part
        self.nsamples += num_samples

    def finalize(self) -> jnp.ndarray:
        if self.H is None or self.nsamples == 0:
            return jnp.zeros((self.columns, self.columns), jnp.float32)
        return (2.0 / self.nsamples) * self.H


def psum_hessian(H_local: jnp.ndarray, axis_name: str) -> jnp.ndarray:
    """Combine per-shard partial Hessians inside shard_map/pmap."""
    return jax.lax.psum(H_local, axis_name)
