"""Fused Pallas quantized matmul (decode gemv + prefill).

TPU-native replacement for the reference CUDA kernels
(owq/kernel/gemv.cu: VecQuant{3,4}{Outlier}MatMulKernel{Faster};
owq/kernel/dequant.cu): one kernel covers matvec (decode), batched decode
and prefill.

Design (see core/packing.py for the plane-chunk layout):

    y[b, c] = s_c * sum_p ( x[b, p*nw:(p+1)*nw] @ plane_p )[c]
              - s_c z_c * sum(x[b, :])
    plane_p = (qweight >> bits*p) & mask          # pure VPU shift+mask

  * every int32 word decodes independently — no cross-word straddling, no
    LUTs, no atomics (the reference needs atomicAdd across row blocks,
    gemv.cu:83; here each grid cell owns its output tile outright)
  * the per-plane operand feeds the MXU directly as bf16 (codes < 16 are
    exact in bf16); accumulation is f32 — strictly more accurate than the
    reference's fp16 hfma2 "faster" path
  * scale/zero-point are folded into one per-column correction outside the
    hot loop; weak columns contribute via a small dense matmul on gathered
    activations (mathematically identical to gemv.cu:400-406's fused form)

Grid: (out_tiles, row_tiles); qweight streams from HBM exactly once per
row-tile sweep.
"""

from __future__ import annotations

import functools
import os
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..core.packing import plane_offset, values_per_word

# Tuning knobs (A/B via tools/bench_unpack.py xplane profiling; wall-clock
# microbenchmarks of single pallas calls are unreliable on relayed
# backends — round 1 mis-ranked the paired scheme that way):
_TO_OVERRIDE = int(os.environ.get("OWQ_GEMV_TO", "0"))
_PAIRED = os.environ.get("OWQ_GEMV_PAIRED", "") == "1"
_USE_COST = os.environ.get("OWQ_GEMV_NO_COST", "") != "1"
# Decode (<=16 rows) default: paired-unpack deep-buffered DMA kernel
# (gemv_dma.py, ~650 GB/s effective vs ~510 for the plane grid kernel on
# v5e).  OWQ_GEMV_DMA=0 falls back to the grid kernel.
_USE_DMA = os.environ.get("OWQ_GEMV_DMA", "1") != "0"
# W4A8 force-on knob, cached at import like the other knobs: a trace-time
# read would silently ignore flips after a forward has been jitted.
_FORCE_A8 = os.environ.get("OWQ_A8", "") == "1"

__all__ = ["quant_matmul", "packed_matmul_kernel"]

_BF16_128 = 0x43004300  # bf16(128.0) in both halves of an int32 lane


def _plane_kernel(x_ref, q_ref, o_ref, *, bits: int, nw: int, acc_dtype):
    """Generic path: one shift+mask+convert per plane (any x dtype).

    Two planes get a free op: plane 0 sits at offset 0 (no shift) and the
    top plane of the high half reaches bit 31's zeroed spare bit(s), so a
    logical shift alone isolates it (no mask).
    """
    v = values_per_word(bits)
    mask = jnp.int32((1 << bits) - 1)
    q = q_ref[:]
    top = plane_offset(bits, v - 1)
    acc = None
    for p in range(v):
        off = plane_offset(bits, p)
        if off == 0:
            field = q & mask
        elif off + bits >= 32:
            field = jax.lax.shift_right_logical(q, off)
        else:
            field = jax.lax.shift_right_logical(q, off) & mask
        plane = field.astype(x_ref.dtype)
        xs = x_ref[:, p * nw:(p + 1) * nw]
        # TPU f32 matmuls default to bf16-reduced passes; the exact path
        # (f32 activations, the reference's non-faster kernels) needs full
        # precision.  bf16 operands are multiplied exactly regardless.
        prec = (jax.lax.Precision.HIGHEST
                if x_ref.dtype == jnp.float32 else None)
        part = jnp.dot(xs, plane, preferred_element_type=acc_dtype,
                       precision=prec)
        acc = part if acc is None else acc + part
    o_ref[:] = acc


def _paired_kernel(x_ref, q_ref, o_ref, *, bits: int, nw: int):
    """Fast path: one shift+mask+or per TWO values via bf16 bitcast.

    The paired half-word layout (core/packing.py) puts plane k in the low
    16 bits and plane k+V/2 in the high 16 bits at the same in-half offset.
    ``((q >> bits*k) & pair_mask) | bf16(128)`` therefore builds bf16 values
    (128 + code) for both planes at once, and the TPU int32->bf16 bitcast
    interleaves sublanes (row 2i = low half = plane k, row 2i+1 = high half
    = plane k+V/2) — exactly the contraction layout the MXU wants when x is
    pre-interleaved the same way (x_ref holds [pairs, 2nw]).

    The uniform +128 offset is linear and is removed by the caller together
    with the zero-point: y = s*acc - s*(z + 128)*sum(x).
    """
    v = values_per_word(bits)
    half = v // 2
    pair_mask = jnp.uint32(((1 << bits) - 1) * 0x00010001)
    magic = jnp.uint32(_BF16_128)
    q = q_ref[:].astype(jnp.uint32)
    acc = None
    for k in range(half):
        pair = ((q >> (bits * k)) & pair_mask) | magic
        wk = pltpu.bitcast(pair.astype(jnp.int32), jnp.bfloat16)  # [2nw, to]
        xs = x_ref[:, k, :]                                        # [tb, 2nw]
        part = jnp.dot(xs, wk, preferred_element_type=jnp.float32)
        acc = part if acc is None else acc + part
    o_ref[:] = acc


@functools.partial(jax.jit, static_argnames=("bits", "interpret", "paired"))
def packed_matmul_kernel(x: jnp.ndarray, qweight: jnp.ndarray, *, bits: int,
                         interpret: bool = False, paired: bool = False
                         ) -> jnp.ndarray:
    """Integer-plane product: x [rows, in_pad] @ codes [in_pad, out] -> f32.

    With ``paired`` (bf16 bitcast fast path) the result includes a uniform
    +128 per code; callers fold it into the zero-point correction.
    (Scale/zero correction applied by the caller either way.)
    """
    rows, in_pad = x.shape
    nw, out = qweight.shape
    v = values_per_word(bits)
    assert in_pad == nw * v

    # Tile selection under the ~16MB VMEM budget: prefer TO=512 (fastest
    # measured on v5e, see tools/bench_e2e.py) and large row tiles for
    # prefill, shrinking until double-buffered x/q blocks + in-kernel
    # plane temporaries fit (wide layers like llama's 11008-dim down-proj
    # OOM VMEM at tr=128 x TO=512).
    def vmem_bytes(tr_, to_):
        return (2 * (tr_ * in_pad * 2 + nw * to_ * 4)   # x + q, 2 buffers
                + nw * to_ * 2                           # plane temp (bf16)
                + 2 * tr_ * to_ * 4)                     # out, 2 buffers

    budget = 11 << 20
    to_cands = ((_TO_OVERRIDE,) if _TO_OVERRIDE else (512, 256, 128))
    tr_cands = (8,) if rows <= 8 else (128, 64, 32, 16, 8)
    tr, to = tr_cands[-1], None
    for tr_ in tr_cands:
        for to_ in to_cands:
            if to_ and out % to_ == 0 and vmem_bytes(tr_, to_) <= budget:
                tr, to = tr_, to_
                break
        if to is not None:
            break
    if to is None:
        to = out if out < 128 else 128
        tr = 8
    # Output widths that no tile divides (possible on toy/synthetic shapes;
    # real model dims are 128-multiples) are zero-padded so the grid covers
    # every column — a partial grid leaves the tail of the output buffer
    # unwritten (garbage under jit).
    out_pad = -(-out // to) * to
    if out_pad != out:
        qweight = jnp.pad(qweight, ((0, 0), (0, out_pad - out)))
    rows_pad = -(-rows // tr) * tr
    if rows_pad != rows:
        x = jnp.pad(x, ((0, rows_pad - rows), (0, 0)))
    grid = (out_pad // to, rows_pad // tr)
    cost = pl.CostEstimate(
        flops=2 * rows_pad * in_pad * out_pad,
        bytes_accessed=qweight.nbytes + x.nbytes + 4 * rows_pad * out_pad,
        transcendentals=0) if _USE_COST else None

    if paired:
        half = v // 2
        # pair-interleaved row assignment (core/packing.py): the bitcast's
        # sublane interleave IS natural x order — a free reshape
        xp = x.astype(jnp.bfloat16).reshape(rows_pad, half, 2 * nw)
        y = pl.pallas_call(
            functools.partial(_paired_kernel, bits=bits, nw=nw),
            grid=grid,
            in_specs=[
                pl.BlockSpec((tr, half, 2 * nw), lambda j, i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((nw, to), lambda j, i: (0, j),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((tr, to), lambda j, i: (i, j),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((rows_pad, out_pad), jnp.float32),
            cost_estimate=cost,
            interpret=interpret,
        )(xp, qweight)
        return y[:rows, :out]

    # plane-slot order for the generic kernel: slot p holds logical rows
    # k*2nw + 2i + h with p = h*half + k (pair-interleaved layout,
    # core/packing.py) — one transpose, only on this fallback path
    half = v // 2
    x = x.reshape(rows_pad, half, nw, 2).transpose(0, 3, 1, 2)
    x = x.reshape(rows_pad, in_pad)
    y = pl.pallas_call(
        functools.partial(_plane_kernel, bits=bits, nw=nw,
                          acc_dtype=jnp.float32),
        grid=grid,
        in_specs=[
            pl.BlockSpec((tr, in_pad), lambda j, i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((nw, to), lambda j, i: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tr, to), lambda j, i: (i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((rows_pad, out_pad), jnp.float32),
        cost_estimate=cost,
        interpret=interpret,
    )(x, qweight)
    return y[:rows, :out]


def quant_matmul(p, x: jnp.ndarray, interpret: Optional[bool] = None,
                 a8: bool = False) -> jnp.ndarray:
    """PackedLinear apply via the fused Pallas kernel (all input shapes).

    ``a8``: W4A8 serving mode — int8-MXU base product on per-row absmax
    int8 activations, FP weak columns (kernels/gemv_a8.py).  Falls back to
    the exact path when not applicable (3-bit, large rows, non-TPU uses a
    jnp simulation with identical semantics).  OWQ_A8=1 forces it on for
    every eligible call (A/B runs).
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    a8 = a8 or _FORCE_A8 or getattr(p, "layout", "paired") == "a8"
    # Decode (<=16 rows) runs the paired bf16-magic unpack via the DMA
    # kernel below.  The GRID kernel (prefill/batched) keeps the plane
    # loop by default: prefill is MXU-bound, and Mosaic's live-temporary
    # footprint for the unrolled paired pairs blows the VMEM budget on
    # wide layers (13b down-proj at tr=128: 18MB scoped vmem).
    # OWQ_GEMV_PAIRED=1 opts the grid kernel into the paired unpack.
    paired = _PAIRED and not interpret and x.dtype != jnp.float32
    dtype = x.dtype
    in_pad = p.in_padded
    pad = in_pad - x.shape[-1]
    lead = x.shape[:-1]
    xf = x.reshape(-1, x.shape[-1])
    xp = jnp.pad(xf, ((0, 0), (0, pad))) if pad else xf

    a8_layout = getattr(p, "layout", "paired") == "a8"
    use_a8 = False
    if a8 and dtype != jnp.float32:
        from .gemv_a8 import a8_applicable

        nw_q, out_q = p.qweight.shape
        use_a8 = a8_applicable(p.bits, xp.shape[0], out_q, nw_q)
    if a8_layout and not use_a8:
        # A8-laid weights can only be decoded by the a8 kernel or the
        # layout-aware exact XLA path — never by the paired-layout
        # kernels.  Non-applicable calls (large rows = prefill, odd tile
        # widths, f32) take the exact path; A8 is best-effort per layer.
        from ..runtime.quant_linear import _apply_xla

        return _apply_xla(p, x)
    if use_a8:
        # Zero the weak columns out of the a8 base input: their base
        # contribution is exactly zero anyway (codes hold the zero-point,
        # so s*x*z - s*z*x cancels), and excluding them keeps activation
        # outliers out of the per-row absmax — the whole point of pairing
        # A8 with OWQ.  They are served in full precision below.
        xa = xp
        if p.n_out > 0:
            xa = xa.at[:, p.out_ids].set(0)
        if interpret:
            # CPU/interpret: jnp simulation with identical A8 semantics
            from .gemv_a8 import a8_base_reference, a8_unpack
            from ..core.packing import unpack_int_weights

            qw_sg = jax.lax.stop_gradient(p.qweight)
            codes = a8_unpack(qw_sg) if a8_layout else \
                unpack_int_weights(qw_sg, p.bits)
            y = a8_base_reference(xa, codes,
                                  jax.lax.stop_gradient(p.scales),
                                  jax.lax.stop_gradient(p.zeros))
        elif a8_layout:
            # byte-layout weights: zero activation shuffles
            from .gemv_a8 import packed_matvec_a8_natural

            y = packed_matvec_a8_natural(
                xa, jax.lax.stop_gradient(p.qweight),
                jax.lax.stop_gradient(p.scales),
                jax.lax.stop_gradient(p.zeros), out_dtype=jnp.float32)
        else:
            from .gemv_a8 import packed_matvec_a8

            y = packed_matvec_a8(xa, jax.lax.stop_gradient(p.qweight),
                                 jax.lax.stop_gradient(p.scales),
                                 jax.lax.stop_gradient(p.zeros),
                                 out_dtype=jnp.float32)
        if p.n_out > 0:
            xo = jnp.take(xf, p.out_ids, axis=-1)
            y = y + jnp.dot(xo, p.oweight.astype(dtype),
                            preferred_element_type=jnp.float32)
        y = y.astype(dtype)
        if p.bias is not None:
            y = y + p.bias.astype(dtype)
        return y.reshape(*lead, p.out_features)

    use_dma = False
    if _USE_DMA and not interpret and dtype != jnp.float32:
        # f32 activations = the reference's exact "non-faster" mode
        # (quant.py:361-363): keep the full-precision plane path; the DMA
        # kernel computes with bf16 operands like the "faster" kernels.
        from .gemv_dma import dma_applicable

        nw_q, out_q = p.qweight.shape
        use_dma = dma_applicable(xp.shape[0], out_q, nw_q)
    if use_dma:
        from .gemv_dma import packed_matvec_dma

        # decode fast path: paired-magic unpack with a 4-slot DMA ring;
        # the scale/zero(+128) correction runs fused in-kernel
        y = packed_matvec_dma(xp, jax.lax.stop_gradient(p.qweight),
                              jax.lax.stop_gradient(p.scales),
                              jax.lax.stop_gradient(p.zeros),
                              bits=p.bits, out_dtype=jnp.float32)
    else:
        acc = packed_matmul_kernel(xp, jax.lax.stop_gradient(p.qweight),
                                   bits=p.bits, interpret=interpret,
                                   paired=paired)
        scales = jax.lax.stop_gradient(p.scales).astype(jnp.float32)
        zeros = jax.lax.stop_gradient(p.zeros).astype(jnp.float32)
        if paired:
            zeros = zeros + 128.0  # remove the bf16-bitcast +128 offset
        xsum = jnp.sum(xp.astype(jnp.float32), axis=-1, keepdims=True)
        y = acc * scales[None, :] - xsum * (scales * zeros)[None, :]

    if p.n_out > 0:
        xo = jnp.take(xf, p.out_ids, axis=-1)
        y = y + jnp.dot(xo, p.oweight.astype(dtype),
                        preferred_element_type=jnp.float32,
                        precision=(jax.lax.Precision.HIGHEST
                                   if dtype == jnp.float32 else None))
    y = y.astype(dtype)
    if p.bias is not None:
        y = y + p.bias.astype(dtype)
    return y.reshape(*lead, p.out_features)
