"""W4A8 decode: int8-MXU quantized matvec (beyond-reference serving mode).

The exact decode path unpacks 4-bit codes to bf16 and feeds the bf16 MXU
(gemv_dma.py).  The v5e MXU also runs int8 x int8 -> int32 natively, and
4-bit codes live on nibble boundaries — so the whole unpack collapses to
TWO vreg-ops per FOUR values with no type converts:

    lo = bitcast(q & 0x0F0F0F0F, int8)          # planes 0,2,4,6
    hi = bitcast((q >> 4) & 0x0F0F0F0F, int8)   # planes 1,3,5,7

and the activations are quantized per row to int8 (dynamic absmax).
Measured on-chip: ~663 GB/s effective vs ~587 for the bf16 4-bit plane
path on a 4096x4096 layer (xplane profiling, tools/bench_unpack.py r2).

Numerics — why this composes unusually well with OWQ:

  * the weight-code product x8 @ codes is EXACT (int32 accumulation);
  * the zero-point correction uses the FP activation sum (exact);
  * the weak (activation-outlier) columns bypass activation quantization
    entirely — they are served by the full-precision side matmul on the
    ORIGINAL bf16 activations (gemv.quant_matmul).  The columns whose
    outliers would wreck per-row absmax scaling are exactly the columns
    OWQ already routed around the quantized path.

  y = (s_x/127)*(x8 @ codes)*s - sum(x)*s*z + x[:, weak] @ W_weak

The only approximation is rounding non-weak activations to 8 bits.

3-bit codes straddle nibble boundaries, so A8 is a 4-bit-only mode; other
configurations fall back to the exact path automatically
(gemv.quant_matmul handles dispatch; enable with OWQ_A8=1 or
kernel="pallas-a8").
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..core.packing import values_per_word

__all__ = ["packed_matvec_a8", "a8_applicable", "quantize_rows_int8",
           "a8_base_reference"]

_SLOTS = 4
_MAX_ROWS = 16


def _pick_tile(out: int, nw: int) -> int:
    for to in (512, 256, 128):
        if out % to == 0 and _SLOTS * nw * to * 4 <= 12 << 20:
            return to
    return 0


def a8_applicable(bits: int, rows: int, out: int, nw: int) -> bool:
    return bits == 4 and rows <= _MAX_ROWS and _pick_tile(out, nw) != 0


def quantize_rows_int8(x: jnp.ndarray):
    """Per-row dynamic absmax int8: returns (x8 int8, s_x f32 [rows, 1])."""
    xf = x.astype(jnp.float32)
    s = jnp.max(jnp.abs(xf), axis=-1, keepdims=True)
    s = jnp.maximum(s, 1e-8)
    x8 = jnp.clip(jnp.round(xf * (127.0 / s)), -127, 127).astype(jnp.int8)
    return x8, s


def byte_interleave(x8: jnp.ndarray, nw: int):
    """[rows, 8*nw] int8 -> [rows, 2, 4*nw] matching the int8 bitcast rows.

    Byte b of word i holds plane 2b (low nibble) and 2b+1 (high).  Under
    the pair-interleaved layout, plane p has (k, h) = (p % 4 if p < 4 else
    p - 4, p // 4) and holds logical row k*2*nw + 2*i + h; the int8 view's
    row 4*i + b therefore maps to (k_b, h_b) = [(0,0),(2,0),(0,1),(2,1)]
    for the low nibbles and [(1,0),(3,0),(1,1),(3,1)] for the high.
    """
    rows = x8.shape[0]
    # k = 2a + c with a = b % 2, h = b // 2 and b the byte index: the
    # needed (k_b, h_b) sequences [(0,0),(2,0),(0,1),(2,1)] (lo) and
    # [(1,0),(3,0),(1,1),(3,1)] (hi) are c=0 / c=1 slices of ONE
    # transpose each (cheaper than per-(k,h) gathers)
    Y = x8.reshape(rows, 2, 2, nw, 2)       # [r, a, c, i, h]
    lo = Y[:, :, 0].transpose(0, 2, 3, 1)   # [r, i, h, a]; b = 2h + a
    hi = Y[:, :, 1].transpose(0, 2, 3, 1)
    return jnp.stack([lo.reshape(rows, 4 * nw),
                      hi.reshape(rows, 4 * nw)], axis=1)


def _a8_kernel(x_ref, sz_ref, row_ref, q_hbm, o_ref, scratch, sems, *,
               to: int, n_tiles: int, slots: int, out_dtype):
    def get_dma(slot, tile):
        return pltpu.make_async_copy(
            q_hbm.at[:, pl.ds(tile * to, to)],
            scratch.at[slot],
            sems.at[slot],
        )

    for s in range(min(slots - 1, n_tiles)):
        get_dma(s, s).start()

    sx = row_ref[:, 0:1]      # s_x / 127 per row
    xsum = row_ref[:, 1:2]    # FP sum(x) per row

    def body(tile, _):
        slot = tile % slots

        @pl.when(tile + slots - 1 < n_tiles)
        def _():
            get_dma((tile + slots - 1) % slots, tile + slots - 1).start()

        get_dma(slot, tile).wait()
        q = scratch[slot]
        nib = jnp.int32(0x0F0F0F0F)
        lo = pltpu.bitcast(q & nib, jnp.int8)
        hi = pltpu.bitcast(jax.lax.shift_right_logical(q, 4) & nib, jnp.int8)
        acc = jnp.dot(x_ref[:, 0, :], lo, preferred_element_type=jnp.int32)
        acc = acc + jnp.dot(x_ref[:, 1, :], hi,
                            preferred_element_type=jnp.int32)
        s = sz_ref[0:1, pl.ds(tile * to, to)]
        c = sz_ref[1:2, pl.ds(tile * to, to)]
        y = acc.astype(jnp.float32) * (sx * s) - xsum * c
        o_ref[:, pl.ds(tile * to, to)] = y.astype(out_dtype)
        return ()

    jax.lax.fori_loop(0, n_tiles, body, ())


@functools.partial(jax.jit, static_argnames=("out_dtype",))
def packed_matvec_a8(x: jnp.ndarray, qweight: jnp.ndarray,
                     scales: jnp.ndarray, zeros: jnp.ndarray, *,
                     out_dtype=jnp.bfloat16) -> jnp.ndarray:
    """x [rows<=16, in_pad] @ dequant4(codes) via int8 MXU, corrected.

    Returns the corrected base product (weak columns / bias NOT included).
    """
    rows, in_pad = x.shape
    nw, out = qweight.shape
    assert in_pad == nw * values_per_word(4)
    to = _pick_tile(out, nw)
    assert to, f"no tile divides out={out}"
    rows_pad = 8 if rows <= 8 else _MAX_ROWS
    assert rows <= rows_pad
    if rows < rows_pad:
        x = jnp.pad(x, ((0, rows_pad - rows), (0, 0)))

    x8, sx = quantize_rows_int8(x)
    xp = byte_interleave(x8, nw)
    xsum = jnp.sum(x.astype(jnp.float32), axis=-1, keepdims=True)
    rowaux = jnp.concatenate([sx / 127.0, xsum], axis=1)        # [rows, 2]
    s32 = scales.astype(jnp.float32)
    sz = jnp.stack([s32, s32 * zeros.astype(jnp.float32)])      # [2, out]

    y = pl.pallas_call(
        functools.partial(_a8_kernel, to=to, n_tiles=out // to,
                          slots=_SLOTS, out_dtype=out_dtype),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            # HBM-pinned weights: ANY lets XLA restage qweight into VMEM
            # inside the decode loop (see gemv_dma.packed_matvec_dma)
            pl.BlockSpec(memory_space=pltpu.HBM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((rows_pad, out), out_dtype),
        scratch_shapes=[
            pltpu.VMEM((_SLOTS, nw, to), jnp.int32),
            pltpu.SemaphoreType.DMA((_SLOTS,)),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * rows_pad * in_pad * out,
            bytes_accessed=qweight.nbytes + xp.nbytes + 2 * rows_pad * out,
            transcendentals=0),
        name="owq_gemv_a8",
    )(xp, sz, rowaux, qweight)
    return y[:rows]


def a8_base_reference(x: jnp.ndarray, codes: jnp.ndarray,
                      scales: jnp.ndarray, zeros: jnp.ndarray) -> jnp.ndarray:
    """Pure-jnp semantic reference for the A8 base product (same math,
    no Pallas): used by the CPU fallback and the tests."""
    x8, sx = quantize_rows_int8(x)
    acc = jnp.dot(x8.astype(jnp.int32), codes.astype(jnp.int32))
    xsum = jnp.sum(x.astype(jnp.float32), axis=-1, keepdims=True)
    s32 = scales.astype(jnp.float32)
    return (acc.astype(jnp.float32) * (sx / 127.0) * s32[None, :]
            - xsum * (s32 * zeros.astype(jnp.float32))[None, :])


# ---------------------------------------------------------------------------
# A8 weight layout: byte-interleaved repack so the int8 bitcast matches
# NATURAL activation order — no int8 activation shuffles at all.
#
# Word i, byte b: low nibble = code of logical row 4*i + b, high nibble =
# code of logical row 4*nw + 4*i + b.  Then
#     lo = bitcast(q & 0x0F0F0F0F, int8)  rows 4i+b  ->  x[:, :4*nw]
#     hi = bitcast((q>>4) & ..., int8)    rows 4nw+4i+b -> x[:, 4*nw:]
# i.e. both MXU operands take free slices of the per-row-quantized x8.
# The e2e profile of the paired-layout A8 path showed ~3.3 ms/step of
# Mosaic/XLA int8 lane relayouts doing exactly this interleave — the
# repack moves it to load time, once.
# ---------------------------------------------------------------------------

@functools.partial(jax.jit)
def a8_repack(qweight: jnp.ndarray) -> jnp.ndarray:
    """Pair-interleaved packed words [nw, out] -> A8 byte layout (4-bit)."""
    from ..core.packing import unpack_int_weights

    nw, out = qweight.shape
    codes = unpack_int_weights(qweight, 4).astype(jnp.uint32)  # [8nw, out]
    C = codes.reshape(2, nw, 4, out)          # [h, i, b, out]
    w = jnp.zeros((nw, out), jnp.uint32)
    for b in range(4):
        w = w | (C[0, :, b, :] << (8 * b)) | (C[1, :, b, :] << (8 * b + 4))
    return w.astype(jnp.int32)


@functools.partial(jax.jit)
def a8_unpack(qweight_a8: jnp.ndarray) -> jnp.ndarray:
    """A8 byte layout -> int32 codes [8*nw, out] in natural row order."""
    nw, out = qweight_a8.shape
    w = qweight_a8.astype(jnp.uint32)
    mask = jnp.uint32(0xF)
    lo = jnp.stack([(w >> (8 * b)) & mask for b in range(4)],
                   axis=2)                    # [nw, out, b] -> want [i,b]
    hi = jnp.stack([(w >> (8 * b + 4)) & mask for b in range(4)], axis=2)
    lo = lo.transpose(0, 2, 1).reshape(4 * nw, out)   # row 4i+b
    hi = hi.transpose(0, 2, 1).reshape(4 * nw, out)
    return jnp.concatenate([lo, hi], axis=0).astype(jnp.int32)


def _a8n_kernel(x_ref, sz_ref, row_ref, q_hbm, o_ref, scratch, sems, *,
                to: int, n_tiles: int, slots: int, nw4: int, out_dtype):
    def get_dma(slot, tile):
        return pltpu.make_async_copy(
            q_hbm.at[:, pl.ds(tile * to, to)],
            scratch.at[slot],
            sems.at[slot],
        )

    for s in range(min(slots - 1, n_tiles)):
        get_dma(s, s).start()

    sx = row_ref[:, 0:1]
    xsum = row_ref[:, 1:2]
    x_lo = x_ref[:, :nw4]
    x_hi = x_ref[:, nw4:]

    def body(tile, _):
        slot = tile % slots

        @pl.when(tile + slots - 1 < n_tiles)
        def _():
            get_dma((tile + slots - 1) % slots, tile + slots - 1).start()

        get_dma(slot, tile).wait()
        q = scratch[slot]
        nib = jnp.int32(0x0F0F0F0F)
        lo = pltpu.bitcast(q & nib, jnp.int8)
        hi = pltpu.bitcast(jax.lax.shift_right_logical(q, 4) & nib, jnp.int8)
        acc = jnp.dot(x_lo, lo, preferred_element_type=jnp.int32)
        acc = acc + jnp.dot(x_hi, hi, preferred_element_type=jnp.int32)
        s = sz_ref[0:1, pl.ds(tile * to, to)]
        c = sz_ref[1:2, pl.ds(tile * to, to)]
        y = acc.astype(jnp.float32) * (sx * s) - xsum * c
        o_ref[:, pl.ds(tile * to, to)] = y.astype(out_dtype)
        return ()

    jax.lax.fori_loop(0, n_tiles, body, ())


@functools.partial(jax.jit, static_argnames=("out_dtype",))
def packed_matvec_a8_natural(x: jnp.ndarray, qweight_a8: jnp.ndarray,
                             scales: jnp.ndarray, zeros: jnp.ndarray, *,
                             out_dtype=jnp.bfloat16) -> jnp.ndarray:
    """A8-layout decode matvec: NO activation shuffles.

    x [rows<=16, in_pad] (weak columns already zeroed by the caller);
    qweight_a8 in the byte layout from ``a8_repack``.
    """
    rows, in_pad = x.shape
    nw, out = qweight_a8.shape
    assert in_pad == nw * 8
    to = _pick_tile(out, nw)
    assert to, f"no tile divides out={out}"
    rows_pad = 8 if rows <= 8 else _MAX_ROWS
    assert rows <= rows_pad
    if rows < rows_pad:
        x = jnp.pad(x, ((0, rows_pad - rows), (0, 0)))

    x8, sx = quantize_rows_int8(x)
    xsum = jnp.sum(x.astype(jnp.float32), axis=-1, keepdims=True)
    rowaux = jnp.concatenate([sx / 127.0, xsum], axis=1)
    s32 = scales.astype(jnp.float32)
    sz = jnp.stack([s32, s32 * zeros.astype(jnp.float32)])

    y = pl.pallas_call(
        functools.partial(_a8n_kernel, to=to, n_tiles=out // to,
                          slots=_SLOTS, nw4=4 * nw, out_dtype=out_dtype),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            # HBM-pinned weights: ANY lets XLA restage qweight into VMEM
            # inside the decode loop (see gemv_dma.packed_matvec_dma)
            pl.BlockSpec(memory_space=pltpu.HBM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((rows_pad, out), out_dtype),
        scratch_shapes=[
            pltpu.VMEM((_SLOTS, nw, to), jnp.int32),
            pltpu.SemaphoreType.DMA((_SLOTS,)),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * rows_pad * in_pad * out,
            bytes_accessed=qweight_a8.nbytes + x8.nbytes + 2 * rows_pad * out,
            transcendentals=0),
        name="owq_gemv_a8n",
    )(x8, sz, rowaux, qweight_a8)
    return y[:rows]
