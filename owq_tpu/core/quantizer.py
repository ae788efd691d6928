"""Per-channel uniform quantization parameter solvers.

TPU-native rebuild of the reference scale/zero-point machinery
(reference: owq/quant.py:19-182 `Quantizer.find_params`).  The reference
solves, per output channel, either

  * a min/max fit (``tuning='minmax'``), or
  * an MSE grid search (``tuning='mse'``) scanning ``num`` shrink levels of
    the dynamic range and, for asymmetric quantization, all ``2**bits``
    zero-point offsets, minimizing the p=2.4 power loss
    (reference: owq/quant.py:77-131).

Here everything is expressed as vectorized, jit-able jnp functions over all
channels at once.  The sequential torch loops of the reference become
`lax.fori_loop`s whose bodies are full-tensor VPU ops, so a whole
[out_features, in_features] weight matrix is solved in one XLA program.

Semantics are kept bit-compatible with the reference (same grid, same
tie-breaking: a candidate replaces the incumbent only on strictly smaller
score, iterating shrink levels in ascending order and zero-point offsets in
ascending order).
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

__all__ = [
    "QuantSpec",
    "find_params_minmax",
    "find_params_mse",
    "find_params",
    "fake_quant",
    "quantize_to_int",
    "dequantize_int",
]

_EPS = 1e-8


@dataclasses.dataclass(frozen=True)
class QuantSpec:
    """Static description of a uniform quantization grid.

    Mirrors the integer grid of the reference (owq/quant.py:35-40):
      asymmetric: q in [0, 2**bits - 1]
      symmetric:  q in [-(2**(bits-1)), 2**(bits-1) - 1]
    """

    bits: int
    sym: bool = False

    @property
    def n_levels(self) -> int:
        return 2 ** self.bits

    @property
    def minq(self) -> int:
        if self.sym:
            return -((self.n_levels - 1) // 2 + 1)
        return 0

    @property
    def maxq(self) -> int:
        if self.sym:
            return (self.n_levels - 1) // 2
        return self.n_levels - 1


def _lp_loss(pred: jnp.ndarray, tgt: jnp.ndarray, p: float) -> jnp.ndarray:
    """Mean per-channel |pred - tgt|**p (rows are channels)."""
    return jnp.mean(jnp.abs(pred - tgt) ** p, axis=1)


def fake_quant(x: jnp.ndarray, scale: jnp.ndarray, zero: jnp.ndarray,
               spec: QuantSpec) -> jnp.ndarray:
    """Quantize-dequantize ``x`` on the uniform grid (owq/quant.py:11-13)."""
    q = jnp.clip(jnp.round(x / scale) + zero, spec.minq, spec.maxq)
    return scale * (q - zero)


def quantize_to_int(x: jnp.ndarray, scale: jnp.ndarray, zero: jnp.ndarray,
                    spec: QuantSpec) -> jnp.ndarray:
    """Integer codes on the grid; int32 in [minq, maxq]."""
    q = jnp.clip(jnp.round(x / scale) + zero, spec.minq, spec.maxq)
    return q.astype(jnp.int32)


def dequantize_int(q: jnp.ndarray, scale: jnp.ndarray, zero: jnp.ndarray) -> jnp.ndarray:
    return scale * (q.astype(scale.dtype) - zero)


def _channel_range(x: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Per-row (xmin<=0, xmax>=0) as in the reference (owq/quant.py:73-75)."""
    xmin = jnp.minimum(jnp.min(x, axis=1), 0.0)
    xmax = jnp.maximum(jnp.max(x, axis=1), 0.0)
    return xmin, xmax


def find_params_minmax(x: jnp.ndarray, spec: QuantSpec) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Min/max scale & zero per channel (owq/quant.py:132-148).

    x: [channels, k] float; returns (scale[channels], zero[channels]).
    """
    x = x.astype(jnp.float32)
    xmin, xmax = _channel_range(x)

    if spec.sym:
        xmax = jnp.maximum(jnp.abs(xmin), xmax)
        xmin = jnp.where(xmin < 0, -xmax, xmin)

    both_zero = (xmin == 0) & (xmax == 0)
    xmin = jnp.where(both_zero, -1.0, xmin)
    xmax = jnp.where(both_zero, 1.0, xmax)

    if spec.sym:
        scale = xmax / (-spec.minq)
        zero = jnp.zeros_like(scale)
    else:
        scale = (xmax - xmin) / spec.maxq
        zero = jnp.round(-xmin / scale)
    return scale, zero


def find_params_mse(x: jnp.ndarray, spec: QuantSpec, num: int = 100,
                    norm: float = 2.4) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """MSE grid search for scale & zero per channel (owq/quant.py:77-131).

    Scans ``num`` shrink fractions of the per-channel range; for asymmetric
    grids additionally scans every integer zero-point offset.  Scored with
    the p-power loss (p=2.4 by default, as in the reference).

    Channels are independent, so large matrices are processed in row
    chunks via lax.map (the grid search's temporaries would otherwise
    multiply a [4096, 11008] weight several times over in HBM).

    x: [channels, k] float; returns (scale[channels], zero[channels]).
    """
    rows, cols = x.shape
    _CHUNK_ELEMS = 8 << 20
    if rows * cols > _CHUNK_ELEMS and rows > 8:
        blk = max(8, min(rows, _CHUNK_ELEMS // max(cols, 1)) // 8 * 8)
        rows_pad = -(-rows // blk) * blk
        xp = jnp.pad(x, ((0, rows_pad - rows), (0, 0)))
        chunks = xp.reshape(rows_pad // blk, blk, cols)
        s, z = jax.lax.map(
            lambda xb: find_params_mse(xb, spec, num=num, norm=norm), chunks)
        return s.reshape(rows_pad)[:rows], z.reshape(rows_pad)[:rows]

    x = x.astype(jnp.float32)
    minq, maxq = float(spec.minq), float(spec.maxq)
    xmin, xmax = _channel_range(x)

    if spec.sym:
        xrange = jnp.maximum(jnp.abs(xmin), xmax)

        def body(i, carry):
            best_score, best_max = carry
            tmp_max = xrange / num * i.astype(jnp.float32)
            scale = jnp.maximum(tmp_max / (-minq), _EPS)
            xq = fake_quant(x, scale[:, None], 0.0, spec)
            score = _lp_loss(xq, x, norm)
            better = score < best_score
            best_max = jnp.where(better, tmp_max, best_max)
            best_score = jnp.minimum(score, best_score)
            return best_score, best_max

        init = (jnp.full_like(xmin, 1e10), xmax)
        _, best_max = jax.lax.fori_loop(1, num + 1, body, init)
        max_val = jnp.maximum(best_max, 0.0)
        scale = jnp.maximum(max_val / (-minq), _EPS)
        zero = jnp.zeros_like(scale)
        return scale, zero

    xrange = xmax - xmin
    n_levels = spec.n_levels

    def body(i, carry):
        best_score, best_min, best_max = carry
        tmp_max = xrange / num * i.astype(jnp.float32)
        # tmp_min is identically zero in the reference asymmetric path.
        delta = jnp.maximum(tmp_max / (maxq - minq), _EPS)
        x_round = jnp.round(x / delta[:, None])

        def zp_body(zp, inner):
            b_score, b_min, b_max = inner
            zpf = zp.astype(jnp.float32)
            new_min = -zpf * delta
            new_max = tmp_max - zpf * delta
            zero = jnp.clip(minq - jnp.round(new_min / delta), minq, maxq)
            q = jnp.clip(x_round + zero[:, None], minq, maxq)
            xq = delta[:, None] * (q - zero[:, None])
            score = _lp_loss(xq, x, norm)
            better = score < b_score
            b_min = jnp.where(better, new_min, b_min)
            b_max = jnp.where(better, new_max, b_max)
            b_score = jnp.minimum(b_score, score)
            return b_score, b_min, b_max

        return jax.lax.fori_loop(0, n_levels, zp_body,
                                 (best_score, best_min, best_max))

    init = (jnp.full_like(xmin, 1e10), xmin, xmax)
    _, best_min, best_max = jax.lax.fori_loop(1, num + 1, body, init)

    min_val = jnp.minimum(best_min, 0.0)
    max_val = jnp.maximum(best_max, 0.0)
    scale = jnp.maximum((max_val - min_val) / (maxq - minq), _EPS)
    zero = jnp.clip(minq - jnp.round(min_val / scale), minq, maxq)
    return scale, zero


@partial(jax.jit, static_argnames=("spec", "mse", "num", "norm"))
def find_params(x: jnp.ndarray, spec: QuantSpec, *, mse: bool = True,
                num: int = 100, norm: float = 2.4) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Dispatch to the MSE or min/max solver.  x: [channels, k]."""
    if mse:
        return find_params_mse(x, spec, num=num, norm=norm)
    return find_params_minmax(x, spec)
