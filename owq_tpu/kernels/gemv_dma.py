"""Decode gemv: paired bf16-magic unpack + deep-buffered explicit DMA.

The B=1..16-row decode matvec is the BASELINE headline (reference protocol
main.py:305-353).  Round-1 shipped the generic plane-loop kernel
(gemv.py::_plane_kernel) which profiles at ~510 GB/s effective on v5e —
VPU-bound at ~3 vreg-ops per weight value (shift, mask, int32->bf16
convert).  This kernel reaches ~650 GB/s (the measured pure-DMA ceiling on
this chip is ~755 GB/s of the 819 spec) by combining two things, both
found by on-device xplane profiling (tools/bench_unpack.py):

1. **Paired bf16-magic unpack — no type converts.**  The plane-chunk
   layout (core/packing.py) stores plane k in the low half-word and plane
   k+V/2 in the high half-word at the same in-half bit offset.  So

       ((q >> bits*k) & 0x0007_0007) | 0x4300_4300        (3-bit)

   builds the bf16 bit patterns of (128 + code) for TWO planes in one
   int32 vreg-op sequence (shift+and+or = 3 ops per 2 values), and the
   32->16 bitcast reinterprets them as a [2*nw, TO] bf16 MXU operand with
   rows interleaved (even row = plane k, odd = plane k+V/2).  The
   activation operand is pre-interleaved once per token to match
   (``interleave_pairs``).  No int->float convert instructions at all —
   Mosaic lowers those as multi-op sequences which round-1 misattributed
   to "operand relayout".  The uniform +128 offset is linear and exits
   through the zero-point correction: y = s*acc - (z+128)*s*sum(x).

2. **Four-slot explicit DMA.**  The auto-pipelined grid (2 VMEM buffers)
   leaves the HBM stream idle during each tile's compute tail; a manual
   make_async_copy ring with 3 outstanding fetches keeps the stream
   saturated (653 GB/s vs 614 at 2 slots, measured).

Numerics: pair values (128+code) are exact in bf16; accumulation is f32.
The scale/zero correction (which also removes the uniform +128) runs
fused in-kernel: y = s*acc - s*(z+128)*sum(x); weak columns and bias are
added by the caller (gemv.quant_matmul).

The reference's CUDA analogue is VecQuant3MatMulKernelFaster
(owq/kernel/gemv.cu:88-176): per-thread 64-entry half2 LUT + hfma2 with
atomicAdd.  Here there are no LUTs and no atomics — each program owns the
whole output and the unpack is pure vector ALU.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..core.packing import values_per_word

__all__ = ["packed_matvec_dma", "interleave_pairs", "MAX_DMA_ROWS"]

MAX_DMA_ROWS = 32
_SLOTS = 4
_BF16_MAGIC = 0x43004300  # bf16(128.0) in both halves of an int32 lane


def interleave_pairs(x: jnp.ndarray, bits: int, nw: int) -> jnp.ndarray:
    """[rows, in_pad] -> [rows, V/2, 2*nw] matching the bitcast interleave.

    With the pair-interleaved row assignment (core/packing.py) the
    bitcast's sublane interleave IS natural input order, so this is a FREE
    reshape — no transpose, no copy.  (The round-1 contiguous-chunk layout
    needed a materialized lane transpose here; Mosaic cannot lower 16-bit
    lane interleaves in-kernel at all.)
    """
    v = values_per_word(bits)
    half = v // 2
    rows = x.shape[0]
    return x.reshape(rows, half, 2 * nw)


def _paired_tile(x_ref, q, bits: int, half: int):
    pair_mask = jnp.uint32(((1 << bits) - 1) * 0x00010001)
    magic = jnp.uint32(_BF16_MAGIC)
    qu = q.astype(jnp.uint32)
    acc = None
    for k in range(half):
        pair = ((qu >> (bits * k)) & pair_mask) | magic
        wk = pltpu.bitcast(pair.astype(jnp.int32), jnp.bfloat16)
        part = jnp.dot(x_ref[:, k, :], wk, preferred_element_type=jnp.float32)
        acc = part if acc is None else acc + part
    return acc


def _dma_kernel(x_ref, sz_ref, q_hbm, o_ref, scratch, sems, *, bits: int,
                half: int, to: int, n_tiles: int, slots: int, out_dtype):
    def get_dma(slot, tile):
        return pltpu.make_async_copy(
            q_hbm.at[:, pl.ds(tile * to, to)],
            scratch.at[slot],
            sems.at[slot],
        )

    for s in range(min(slots - 1, n_tiles)):
        get_dma(s, s).start()

    # the scale/zero correction runs fused in-kernel: y = s*acc - c*sum(x)
    # with c = s*(z+128) precomputed by the caller (sz_ref rows: [s; c]).
    # Saves ~150 us/step of small XLA ops (xsum reduce + two multiplies +
    # f32->bf16 convert per call) on a llama-7b decode step.
    xs2 = jnp.sum(x_ref[:].astype(jnp.float32), axis=2)   # [rows, half]
    xsum = jnp.sum(xs2, axis=1, keepdims=True)             # [rows, 1]

    def body(tile, _):
        slot = tile % slots

        @pl.when(tile + slots - 1 < n_tiles)
        def _():
            get_dma((tile + slots - 1) % slots, tile + slots - 1).start()

        get_dma(slot, tile).wait()
        acc = _paired_tile(x_ref, scratch[slot], bits, half)
        s = sz_ref[0:1, pl.ds(tile * to, to)]
        c = sz_ref[1:2, pl.ds(tile * to, to)]
        y = acc * s - xsum * c
        o_ref[:, pl.ds(tile * to, to)] = y.astype(out_dtype)
        return ()

    jax.lax.fori_loop(0, n_tiles, body, ())


def _pick_tile(out: int, nw: int) -> int:
    # VMEM ring budget: _SLOTS * nw * TO * 4B; 512 is fastest when it fits
    # (11008-in llama down-proj: 4*1376*512*4 = 11.3MB — still OK, but be
    # conservative at wide inputs).
    for to in (512, 256, 128):
        if out % to == 0 and _SLOTS * nw * to * 4 <= 12 << 20:
            return to
    return 0


def dma_applicable(rows: int, out: int, nw: int) -> bool:
    return rows <= MAX_DMA_ROWS and _pick_tile(out, nw) != 0


@functools.partial(jax.jit, static_argnames=("bits", "out_dtype"))
def packed_matvec_dma(x: jnp.ndarray, qweight: jnp.ndarray,
                      scales: jnp.ndarray, zeros: jnp.ndarray, *, bits: int,
                      out_dtype=jnp.bfloat16) -> jnp.ndarray:
    """x [rows<=16, in_pad] @ dequant(codes) -> [rows, out], corrected.

    Returns the scale/zero-corrected base product (weak columns and bias
    are NOT included — the caller adds them).  Decode-oriented (small row
    count); the correction runs fused in-kernel.
    """
    rows, in_pad = x.shape
    nw, out = qweight.shape
    v = values_per_word(bits)
    half = v // 2
    assert in_pad == nw * v
    to = _pick_tile(out, nw)
    assert to, f"no tile divides out={out}"
    n_tiles = out // to
    rows_pad = 8 if rows <= 8 else (16 if rows <= 16 else MAX_DMA_ROWS)
    assert rows <= rows_pad, f"decode kernel supports <= {MAX_DMA_ROWS} rows"
    if rows < rows_pad:
        x = jnp.pad(x, ((0, rows_pad - rows), (0, 0)))
    xp = interleave_pairs(x.astype(jnp.bfloat16), bits, nw)
    s32 = scales.astype(jnp.float32)
    corr = s32 * (zeros.astype(jnp.float32) + 128.0)  # +128 = magic offset
    sz = jnp.stack([s32, corr])                        # [2, out]

    y = pl.pallas_call(
        functools.partial(_dma_kernel, bits=bits, half=half, to=to,
                          n_tiles=n_tiles, slots=_SLOTS,
                          out_dtype=out_dtype),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            # Pin the packed weights to HBM.  pl.ANY lets XLA's memory
            # space assignment "helpfully" prefetch whole qweight buffers
            # into VMEM inside the decode loop (xplane: per-step
            # copy-start/slice-start of s32[416,22016] etc.), restaging
            # bytes the kernel already streams exactly once via its own
            # DMA ring.
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
            bytes_accessed=qweight.nbytes + x.nbytes + 2 * rows_pad * out,
            transcendentals=0),
        name=f"owq_gemv_dma_{bits}b",
    )(xp, sz, qweight)
    return y[:rows]


# ---------------------------------------------------------------------------
# Dense bf16 matvec with the same deep-buffered DMA ring — used for the
# lm_head (the one large dense matmul left in a packed decode step: llama-7b
# streams 262MB of bf16 lm_head per token; XLA's reduce-fusion matvec runs
# ~694 GB/s vs ~755 for the explicit ring).
# ---------------------------------------------------------------------------

def _dense_kernel(x_ref, w_hbm, o_ref, scratch, sems, *, to: int,
                  n_tiles: int, slots: int, out_dtype):
    def get_dma(slot, tile):
        return pltpu.make_async_copy(
            w_hbm.at[:, pl.ds(tile * to, to)],
            scratch.at[slot],
            sems.at[slot],
        )

    for s in range(min(slots - 1, n_tiles)):
        get_dma(s, s).start()

    def body(tile, _):
        slot = tile % slots

        @pl.when(tile + slots - 1 < n_tiles)
        def _():
            get_dma((tile + slots - 1) % slots, tile + slots - 1).start()

        get_dma(slot, tile).wait()
        y = jnp.dot(x_ref[:], scratch[slot],
                    preferred_element_type=jnp.float32)
        o_ref[:, pl.ds(tile * to, to)] = y.astype(out_dtype)
        return ()

    jax.lax.fori_loop(0, n_tiles, body, ())


def _pick_tile_dense(out: int, infeat: int) -> int:
    for to in (512, 256, 128):
        if out % to == 0 and _SLOTS * infeat * to * 2 <= 12 << 20:
            return to
    return 0


def dense_dma_applicable(rows: int, out: int, infeat: int) -> bool:
    return (rows <= MAX_DMA_ROWS and infeat % 128 == 0
            and _pick_tile_dense(out, infeat) != 0)


@functools.partial(jax.jit, static_argnames=("out_dtype",))
def dense_matvec_dma(x: jnp.ndarray, w: jnp.ndarray, *,
                     out_dtype=jnp.bfloat16) -> jnp.ndarray:
    """x [rows<=16, in] @ w [in, out] (bf16 stream) -> [rows, out]."""
    rows, infeat = x.shape
    infeat_w, out = w.shape
    assert infeat == infeat_w
    to = _pick_tile_dense(out, infeat)
    assert to, f"no tile divides out={out}"
    rows_pad = 8 if rows <= 8 else (16 if rows <= 16 else MAX_DMA_ROWS)
    assert rows <= rows_pad
    if rows < rows_pad:
        x = jnp.pad(x, ((0, rows_pad - rows), (0, 0)))

    y = pl.pallas_call(
        functools.partial(_dense_kernel, to=to, n_tiles=out // to,
                          slots=_SLOTS, out_dtype=out_dtype),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.HBM),  # see packed_matvec_dma
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((rows_pad, out), out_dtype),
        scratch_shapes=[
            pltpu.VMEM((_SLOTS, infeat, to), jnp.bfloat16),
            pltpu.SemaphoreType.DMA((_SLOTS,)),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * rows_pad * infeat * out,
            bytes_accessed=w.nbytes + x.nbytes + 2 * rows_pad * out,
            transcendentals=0),
        name="owq_dense_matvec_dma",
    )(x.astype(jnp.bfloat16), w.astype(jnp.bfloat16))
    return y[:rows]
