"""Fused decode attention + o-projection: cache append, masked softmax
attention AND the quantized o-proj matvec in ONE pallas kernel per layer.

Motivation (xplane, llama-7b B=1 decode, round 4): after the matmul
fusion (gemv_fused.py) the per-layer attention small-op chain costs
~0.4 ms/token of XLA ops at S=128 — and every microsecond of it is DEAD
TIME for the HBM weight stream, because the packed-weight DMA rings live
inside the pallas kernels and cannot span the gaps between them.  The
round-3 STANDALONE attention kernel (attn_decode.py) made this worse, not
better (bench ablation: 5.056 vs 4.852 ms/token): it still sits between
two weight-streaming kernels, paying its own slab-DMA wait + launch
latency in dead stream time.

The fix is structural: attention is a PROLOGUE of the o-projection matvec,
exactly like rmsnorm is a prologue of the qkv matvec and swiglu of the
down matvec (gemv_fused.py).  The kernel starts the o-proj packed-weight
DMA ring FIRST, then computes the attention (slab reads, softmax, AV)
while the weights stream, then runs the matvec + weak columns + residual
epilogue.  Attention compute is VPU work hidden entirely under the
weight-stream DMAs — the stream never idles:

    ring.start(tiles 0..slots-2)              (HBM weight stream begins)
    K/V slab reads + new-token row writes     (in-place cache append)
    ctx  = softmax(mask(q @ K^T)) @ V         (while weights stream)
    xb   = [ctx.flatten(); 0-pad rows]
    y    = (paired-unpack matvec)(xb) * s - sum(ctx) * c
         + (xb @ sel) @ ow + res              (weak columns, residual)

GQA: queries arrive [rep, Hkv, hd] (head g*rep+r in row r, matching the
repeat_interleave pairing).  ctx flattens in that row order, so for
rep > 1 the o-proj packed INPUT ROWS are permuted at serving-prep time
(runtime/fuse.py) to match — a pure re-layout of the integer codes, no
math change.

Numerics match attn_decode.py + gemv_fused.py exactly: bf16 slabs, f32
scores/softmax, bf16 probabilities, f32-accumulated AV and matvec.

Reference mapping: the reference has no such kernel; its decode attention
is stock HF torch sdpa between owq_cuda matvec launches
(/root/reference/owq/quant.py:413-429, main.py:305-353).  On TPU the B=1
cost model is stream-idle-time-bound, which is what this fusion removes.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..core.packing import values_per_word

__all__ = ["attn_o_step", "attn_o_reference", "attn_o_applicable"]

_SLOTS = 4
_BF16_MAGIC = 0x43004300
# VMEM: 2 cache slabs (bf16) + f32 temps + the weight ring + aux
_VMEM_BYTES = 48 << 20


def _pick_tile(out: int, nw: int) -> int:
    for to in (512, 256, 128):
        if out % to == 0 and _SLOTS * nw * to * 4 <= 12 << 20:
            return to
    return 0


def attn_o_applicable(S: int, Hkv: int, hd: int, rep: int, out: int,
                      nw: int) -> bool:
    return (hd % 128 == 0 and S % 8 == 0 and rep >= 1
            and _pick_tile(out, nw) != 0
            and S * Hkv * hd * 12 + _SLOTS * nw * _pick_tile(out, nw) * 4
            <= _VMEM_BYTES)


def _kernel(pos_ref, q_ref, kn_ref, vn_ref, sz_ref, sel_ref, ow_ref,
            res_ref, bias_ref, k_hbm, v_hbm, w_hbm,
            o_ref, ko_ref, vo_ref,
            kslab, vslab, knew_s, vnew_s, wring, wsem, csem, *,
            bits: int, half: int, two_nw: int, to: int, n_tiles: int,
            slots: int, S: int, rep: int, layer: int, scale: float,
            in_true: int, pad_cols: int, rows_pad: int, has_sel: bool,
            has_res: bool, has_bias: bool, out_dtype):
    pos = pos_ref[0, 0]

    # 1. the o-proj weight stream starts FIRST — it is the critical path
    def ring_dma(slot, tile):
        return pltpu.make_async_copy(
            w_hbm.at[:, pl.ds(tile * to, to)], wring.at[slot],
            wsem.at[slot])

    for s in range(min(slots - 1, n_tiles)):
        ring_dma(s, s).start()

    # 2. cache slab reads + in-place new-row writes (attn_decode.py design:
    # row ``pos`` of the slab read is discarded, so no ordering hazard)
    kread = pltpu.make_async_copy(k_hbm.at[layer, 0], kslab, csem.at[0])
    vread = pltpu.make_async_copy(v_hbm.at[layer, 0], vslab, csem.at[1])
    kread.start()
    vread.start()
    knew_s[:] = kn_ref[:]
    vnew_s[:] = vn_ref[:]
    kwrite = pltpu.make_async_copy(
        knew_s, k_hbm.at[layer, 0, pl.ds(pos, 1)], csem.at[2])
    vwrite = pltpu.make_async_copy(
        vnew_s, v_hbm.at[layer, 0, pl.ds(pos, 1)], csem.at[3])
    kwrite.start()
    vwrite.start()

    # 3. attention while the weight ring streams
    sidx = jax.lax.broadcasted_iota(jnp.int32, (S, 1), 0)
    valid = sidx <= pos
    is_new = sidx == pos
    is_new3 = is_new[:, :, None]
    kf_new = kn_ref[:].astype(jnp.float32)                  # [1, Hkv, hd]
    vf_new = vn_ref[:]

    kread.wait()
    vread.wait()
    kf = kslab[:].astype(jnp.float32)                       # [S, Hkv, hd]
    vpat = jnp.where(is_new3, vf_new, vslab[:]).astype(jnp.float32)

    ctxs = []
    for r in range(rep):
        qr = q_ref[r:r + 1].astype(jnp.float32)             # [1, Hkv, hd]
        scores = jnp.sum(kf * qr, axis=-1)                  # [S, Hkv]
        snew = jnp.sum(kf_new * qr, axis=-1)
        scores = jnp.where(is_new, snew, scores) * scale
        scores = jnp.where(valid, scores, -1e30)
        m = jnp.max(scores, axis=0, keepdims=True)
        e = jnp.exp(scores - m)
        probs = (e / jnp.sum(e, axis=0, keepdims=True)).astype(jnp.bfloat16)
        pb = probs.astype(jnp.float32)[:, :, None]
        ctxs.append(jnp.sum(pb * vpat, axis=0))             # [Hkv, hd]
    ctx = ctxs[0] if rep == 1 else jnp.concatenate(ctxs, axis=0)

    # 4. matvec operand: row 0 = ctx flattened (rep-major — the packed
    # input rows were permuted to this order at prep time), rows 1.. zero.
    # ctx rounds through bf16 BEFORE the xsum so the correction term sees
    # exactly the values the matvec sees (gemv_fused.py numerics).
    xrow_b = ctx.reshape(1, in_true).astype(jnp.bfloat16)
    xrow_f = xrow_b.astype(jnp.float32)
    xsum = jnp.pad(jnp.sum(xrow_f, axis=1, keepdims=True),
                   ((0, rows_pad - 1), (0, 0)))             # [rows, 1] f32
    xb = jnp.pad(xrow_b, ((0, rows_pad - 1), (0, pad_cols)))
    if has_sel:
        xo = jnp.dot(xb[:, :in_true] if pad_cols else xb, sel_ref[:],
                     preferred_element_type=jnp.float32).astype(jnp.bfloat16)

    pair_mask = jnp.uint32(((1 << bits) - 1) * 0x00010001)
    magic = jnp.uint32(_BF16_MAGIC)

    def body(tile, _):
        slot = tile % slots

        @pl.when(tile + slots - 1 < n_tiles)
        def _():
            ring_dma((tile + slots - 1) % slots, tile + slots - 1).start()

        ring_dma(slot, tile).wait()
        qu = wring[slot].astype(jnp.uint32)
        acc = None
        for k in range(half):
            pair = ((qu >> (bits * k)) & pair_mask) | magic
            wk = pltpu.bitcast(pair.astype(jnp.int32), jnp.bfloat16)
            xs = jax.lax.slice_in_dim(xb, k * two_nw, (k + 1) * two_nw,
                                      axis=1)
            part = jnp.dot(xs, wk, preferred_element_type=jnp.float32)
            acc = part if acc is None else acc + part
        s = sz_ref[0:1, pl.ds(tile * to, to)]
        c = sz_ref[1:2, pl.ds(tile * to, to)]
        y = acc * s - xsum * c
        if has_sel:
            y = y + jnp.dot(xo, ow_ref[:, pl.ds(tile * to, to)],
                            preferred_element_type=jnp.float32)
        if has_res:
            y = y + res_ref[:, pl.ds(tile * to, to)].astype(jnp.float32)
        if has_bias:
            y = y + bias_ref[0:1, pl.ds(tile * to, to)]
        o_ref[:, pl.ds(tile * to, to)] = y.astype(out_dtype)
        return ()

    jax.lax.fori_loop(0, n_tiles, body, ())

    kwrite.wait()
    vwrite.wait()
    del ko_ref, vo_ref  # aliased to k_hbm/v_hbm; updated via the DMAs


@functools.partial(jax.jit,
                   static_argnames=("bits", "layer", "scale", "out_dtype"),
                   donate_argnums=(3, 4))
def attn_o_step(q: jnp.ndarray, k_new: jnp.ndarray, v_new: jnp.ndarray,
                k_stack: jnp.ndarray, v_stack: jnp.ndarray,
                pos: jnp.ndarray, qweight: jnp.ndarray, sz: jnp.ndarray, *,
                bits: int, layer: int, scale: float,
                sel: Optional[jnp.ndarray] = None,
                ow: Optional[jnp.ndarray] = None,
                res: Optional[jnp.ndarray] = None,
                bias: Optional[jnp.ndarray] = None,
                out_dtype=jnp.bfloat16
                ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """One layer's decode attention + o-projection, cache updated in place.

    q: [rep, Hkv, hd] bf16 (roped; head g*rep+r in row r)
    k_new/v_new: [1, Hkv, hd] bf16; k_stack/v_stack: [L, 1, S, Hkv, hd]
    (DONATED, aliased into the outputs); pos: int32 scalar.
    qweight/sz/sel/ow/bias: the o-proj PackedLinear's fused-kernel aux
    (make_fast_aux) — for rep > 1 the packed input rows must be permuted
    to rep-major ctx order (fuse.py::_permute_packed_rows).
    res: [1, out] residual added in-kernel.
    Returns (y [1, out], k_stack, v_stack).
    """
    L, B, S, Hkv, hd = k_stack.shape
    rep = q.shape[0]
    nw, out = qweight.shape
    v = values_per_word(bits)
    in_true = rep * Hkv * hd
    in_pad = nw * v
    assert B == 1 and q.shape == (rep, Hkv, hd)
    assert k_new.shape == (1, Hkv, hd) and in_true <= in_pad
    assert attn_o_applicable(S, Hkv, hd, rep, out, nw)
    assert k_stack.dtype == jnp.bfloat16 and v_stack.dtype == jnp.bfloat16
    to = _pick_tile(out, nw)
    rows_pad = 8

    has_sel = sel is not None
    has_res = res is not None
    has_bias = bias is not None
    one_f = jnp.zeros((1, 1), jnp.float32)
    one_b = jnp.zeros((1, 1), jnp.bfloat16)
    if res is not None:
        res = jnp.pad(res.astype(jnp.bfloat16), ((0, rows_pad - 1), (0, 0)))

    y, k_out, v_out = pl.pallas_call(
        functools.partial(
            _kernel, bits=bits, half=v // 2, two_nw=2 * nw, to=to,
            n_tiles=out // to, slots=_SLOTS, S=S, rep=rep, layer=layer,
            scale=scale, in_true=in_true, pad_cols=in_pad - in_true,
            rows_pad=rows_pad, has_sel=has_sel, has_res=has_res,
            has_bias=has_bias, out_dtype=out_dtype),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),   # pos
            pl.BlockSpec(memory_space=pltpu.VMEM),   # q
            pl.BlockSpec(memory_space=pltpu.VMEM),   # k_new
            pl.BlockSpec(memory_space=pltpu.VMEM),   # v_new
            pl.BlockSpec(memory_space=pltpu.VMEM),   # sz
            pl.BlockSpec(memory_space=pltpu.VMEM),   # sel
            pl.BlockSpec(memory_space=pltpu.VMEM),   # ow
            pl.BlockSpec(memory_space=pltpu.VMEM),   # res
            pl.BlockSpec(memory_space=pltpu.VMEM),   # bias
            pl.BlockSpec(memory_space=pltpu.ANY),    # k_stack
            pl.BlockSpec(memory_space=pltpu.ANY),    # v_stack
            pl.BlockSpec(memory_space=pltpu.HBM),    # o qweight stream
        ],
        out_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((rows_pad, out), out_dtype),
            jax.ShapeDtypeStruct(k_stack.shape, k_stack.dtype),
            jax.ShapeDtypeStruct(v_stack.shape, v_stack.dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((S, Hkv, hd), k_stack.dtype),
            pltpu.VMEM((S, Hkv, hd), v_stack.dtype),
            pltpu.VMEM((1, Hkv, hd), k_stack.dtype),
            pltpu.VMEM((1, Hkv, hd), v_stack.dtype),
            pltpu.VMEM((_SLOTS, nw, to), jnp.int32),
            pltpu.SemaphoreType.DMA((_SLOTS,)),
            pltpu.SemaphoreType.DMA((4,)),
        ],
        input_output_aliases={9: 1, 10: 2},
        cost_estimate=pl.CostEstimate(
            flops=2 * rows_pad * in_pad * out + 4 * rep * S * Hkv * hd,
            bytes_accessed=qweight.nbytes + 2 * S * Hkv * hd * 2 + 2 * out,
            transcendentals=rep * S),
        name=f"owq_attn_o_{bits}b",
    )(pos.reshape(1, 1).astype(jnp.int32),
      q.astype(jnp.bfloat16), k_new.astype(jnp.bfloat16),
      v_new.astype(jnp.bfloat16), sz,
      sel if sel is not None else one_b,
      ow if ow is not None else one_b,
      res if res is not None else one_b,
      bias if bias is not None else one_f,
      k_stack, v_stack, qweight)
    return y[:1], k_out, v_out


def attn_o_reference(q, k_new, v_new, k_stack, v_stack, pos, qweight, sz, *,
                     bits, layer, scale, sel=None, ow=None, res=None,
                     bias=None, out_dtype=jnp.bfloat16):
    """Pure-jnp reference with identical math (CPU tests / fallback)."""
    from .attn_decode import attn_decode_reference
    from .gemv_fused import fused_matvec_reference

    rep, Hkv, hd = q.shape
    ctx, k2, v2 = attn_decode_reference(q, k_new, v_new, k_stack, v_stack,
                                        pos, layer=layer, scale=scale)
    # rep-major flatten matches the kernel (and the prep-time row permute)
    xrow = ctx.astype(jnp.float32).reshape(1, rep * Hkv * hd)
    y = fused_matvec_reference(xrow, qweight, sz, bits=bits, sel=sel, ow=ow,
                               res=res, bias=bias, out_dtype=out_dtype)
    return y, k2, v2
