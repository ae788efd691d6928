"""TPU-friendly sub-byte weight packing.

The reference packs 3-bit values densely across int32 word boundaries
(10+1+10+1+10 values per 3 words, owq/quant.py:321-341) because CUDA threads
can cheaply do per-thread unaligned bit surgery.  On TPU we instead want every
int32 lane to decode independently with a single shift+mask so the VPU can
unpack a whole [sublane, lane] tile per instruction.  We therefore use a
*plane-chunk* layout:

  V = values per 32-bit word (10 for 3-bit, 8 for 4-bit)
  nw = padded_in // V          (number of packed words per column)

  qweight[w, c] = sum_p  q[p * nw + w, c] << offset(p)      p in [0, V)

with *paired half-word offsets*: the first V/2 planes live in the low 16
bits (offset bits*p) and the last V/2 planes in the high 16 bits (offset
16 + bits*(p - V/2)).

Row assignment is *pair-interleaved*: word ``w`` of pair ``k`` packs
logical input row ``k*2*nw + 2*w`` in its low half and row
``k*2*nw + 2*w + 1`` in its high half.  This makes the decode fast path
transpose-free: ``((q >> bits*k) & 0x000m000m) | 0x43004300`` bitcast to
bf16 yields TWO dequantized-plus-128 values per VPU op sequence, and the
TPU int32->bf16 bitcast interleaves sublanes (row 2w = low half, row
2w+1 = high half) — which under this row assignment is exactly
``x[k*2*nw : (k+1)*2*nw]`` in NATURAL order, so the activation operand is
a free reshape (kernels/gemv_dma.py).  A contiguous-chunk assignment
(round 1) forced a materialized [rows, nw, 2] lane transpose of the
activations per matmul call — ~0.4 ms per llama-7b decode step — because
Mosaic cannot lower 16-bit lane interleaves in-kernel.

The generic plane view is still available anywhere jnp strided slicing is
free (XLA paths, interpret mode): plane p = (q >> offset(p)) & mask holds
logical rows ``k*2*nw + 2*i + h`` where (k, h) = (p, 0) for p < V/2 and
(p - V/2, 1) otherwise.  No transposes, no gathers, no cross-word
straddling in any path.

The tail of the input dimension is padded; padded rows are filled with the
per-channel zero-point so they dequantize to exactly 0 (the same trick the
reference uses to null out outlier columns, owq/quant.py:307-309).

3-bit storage efficiency is 30/32 bits per word (~3.2 bits/value after
padding) vs. the reference's dense 3.0; the ~6% byte overhead buys
straddle-free vectorized decode.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "values_per_word",
    "padded_infeatures",
    "pack_int_weights",
    "unpack_int_weights",
    "pack_np",
    "unpack_np",
]

_VPW = {3: 10, 4: 8}
# Words-per-column must stay a multiple of the int32 sublane tile (8) so every
# plane slice is tile-aligned in VMEM.
_NW_ALIGN = 8


def values_per_word(bits: int) -> int:
    if bits not in _VPW:
        raise ValueError(f"Only 3/4-bit packing is supported, got {bits}")
    return _VPW[bits]


def plane_offset(bits: int, p: int) -> int:
    """Bit offset of plane p in the paired half-word layout."""
    half = values_per_word(bits) // 2
    if p < half:
        return bits * p
    return 16 + bits * (p - half)


def padded_infeatures(infeatures: int, bits: int) -> Tuple[int, int]:
    """Return (in_padded, nw) for the plane-chunk layout."""
    v = values_per_word(bits)
    nw = -(-infeatures // v)            # ceil
    nw = -(-nw // _NW_ALIGN) * _NW_ALIGN  # align sublane tile
    return nw * v, nw


def pack_np(q: np.ndarray, bits: int, zero: np.ndarray | None = None) -> np.ndarray:
    """Pack int codes [in, out] -> int32 [nw, out] (numpy reference).

    ``zero`` ([out] int) fills padded rows so they dequantize to 0; when None,
    padding rows are 0.
    """
    v = values_per_word(bits)
    infeat, out = q.shape
    in_pad, nw = padded_infeatures(infeat, bits)
    qp = np.zeros((in_pad, out), dtype=np.uint32)
    qp[:infeat] = q.astype(np.int64) & ((1 << bits) - 1)
    if zero is not None and in_pad > infeat:
        qp[infeat:] = (zero.astype(np.int64) & ((1 << bits) - 1))[None, :]
    half = v // 2
    # logical row k*2*nw + 2*i + h -> pair k, word i, half h
    qv = qp.reshape(half, nw, 2, out)
    words = np.zeros((nw, out), dtype=np.uint32)
    for p in range(v):
        k, h = (p, 0) if p < half else (p - half, 1)
        words |= qv[k, :, h, :] << np.uint32(plane_offset(bits, p))
    return words.view(np.int32)


def unpack_np(words: np.ndarray, bits: int, infeatures: int) -> np.ndarray:
    """Unpack int32 [nw, out] -> int32 codes [infeatures, out] (numpy)."""
    v = values_per_word(bits)
    half = v // 2
    nw = words.shape[0]
    out = words.shape[1]
    mask = np.uint32((1 << bits) - 1)
    w = words.view(np.uint32)
    planes = [(w >> np.uint32(plane_offset(bits, p))) & mask for p in range(v)]
    lo = np.stack(planes[:half])            # [half, nw, out]
    hi = np.stack(planes[half:])
    full = np.stack([lo, hi], axis=2).reshape(v * nw, out).astype(np.int32)
    return full[:infeatures]


@partial(jax.jit, static_argnames=("bits",))
def pack_int_weights(q: jnp.ndarray, bits: int) -> jnp.ndarray:
    """Pack int codes [in_pad, out] (already padded) -> int32 [nw, out]."""
    v = values_per_word(bits)
    half = v // 2
    in_pad, out = q.shape
    nw = in_pad // v
    qp = q.astype(jnp.uint32) & ((1 << bits) - 1)
    qv = qp.reshape(half, nw, 2, out)
    words = jnp.zeros((nw, out), dtype=jnp.uint32)
    for p in range(v):
        k, h = (p, 0) if p < half else (p - half, 1)
        words = words | (qv[k, :, h, :] << plane_offset(bits, p))
    return words.astype(jnp.int32)


@partial(jax.jit, static_argnames=("bits",))
def unpack_int_weights(words: jnp.ndarray, bits: int) -> jnp.ndarray:
    """Unpack int32 [nw, out] -> int32 codes [nw * V, out]."""
    v = values_per_word(bits)
    half = v // 2
    nw, out = words.shape
    w = words.astype(jnp.uint32)
    mask = jnp.uint32((1 << bits) - 1)
    planes = [((w >> plane_offset(bits, p)) & mask).astype(jnp.int32)
              for p in range(v)]
    lo = jnp.stack(planes[:half])
    hi = jnp.stack(planes[half:])
    return jnp.stack([lo, hi], axis=2).reshape(v * nw, out)
