"""Decode attention PHASE as one pallas kernel: rmsnorm -> qkv matvec ->
rope -> cache append -> masked softmax attention -> o-proj matvec ->
residual, with the HBM weight stream busy end to end.

Why a phase kernel (xplane + bench ablations, round 4): B=1 decode is a
serial chain on one core, so the HBM stream idles during ANY compute that
is not weight streaming.  The per-matmul kernels (gemv_fused.py) already
fold the norms/corrections/weak columns into the streams, but attention
still ran BETWEEN two kernels: as XLA ops (4.852 ms/token — XLA hides the
cache-slab reads by issuing them layers ahead, but the softmax chain
itself is dead stream time) or as a standalone/prologue pallas kernel
(5.056 / 5.067 ms — worse: a 4-slot ring buffers ~4 us of stream against
a ~15 us attention prologue).  The fix needs BOTH weight streams and the
attention inside one kernel, with buffering deep enough to cover the
attention compute:

    t=0   start qkv ring (4 slots) AND the FULL o-proj weight prefetch
          (all tiles — o is the smallest projection) AND the K/V cache
          slab reads: every byte the phase needs is in flight up front
    ...   qkv matvec consumes its ring while o weights + slabs land
    ...   rope (tables sliced outside, one tiny op per STEP, not layer),
          in-place cache row writes, softmax attention — pure VPU work,
          by now the stream has already delivered everything
    ...   o matvec reads VMEM-resident tiles; weak columns + residual
          epilogue writes the post-attention hidden state

GQA: o's packed input rows are permuted at prep time to the kernel's
rep-major ctx order (runtime/fuse.py::_permute_packed_rows).

Numerics: identical to the generic fastpath chain — gemv_fused.py matvec
numerics (bf16 magic-pair unpack, f32 accumulate, bf16-rounded operands
for the zero-point correction), apply_rope's f32 multiply -> bf16 round
(models/layers.py:112-132), attn_decode.py's f32 softmax with bf16
probabilities.

Reference mapping: the reference decode step is 7 owq_cuda matvec
launches + torch sdpa per block (owq/quant.py:413-429, main.py:305-353);
this kernel is the TPU restructuring of its attention half-block into a
single stream-saturating program.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..core.packing import values_per_word

__all__ = ["attn_block_step", "attn_block_reference",
           "attn_block_applicable", "layer_block_step",
           "layer_block_reference", "layer_block_applicable"]

_SLOTS = 4
_BF16_MAGIC = 0x43004300
_VMEM_BYTES = 44 << 20


def _pick_tile(out: int, nw: int, budget: int) -> int:
    for to in (512, 256, 128):
        if out % to == 0 and nw * to * 4 <= budget:
            return to
    return 0


def _tiles(out_q, nw_q, out_o, nw_o):
    to_q = _pick_tile(out_q, nw_q, (12 << 20) // _SLOTS)
    to_o = _pick_tile(out_o, nw_o, 2 << 20)
    return to_q, to_o


def attn_block_applicable(S: int, Hkv: int, hd: int, rep: int,
                          out_q: int, nw_q: int, out_o: int, nw_o: int
                          ) -> bool:
    to_q, to_o = _tiles(out_q, nw_q, out_o, nw_o)
    if to_q == 0 or to_o == 0:
        return False
    vmem = (_SLOTS * nw_q * to_q * 4          # qkv ring
            + nw_o * out_o * 4                # o full prefetch
            + 2 * S * Hkv * hd * 2            # cache slabs (bf16)
            + 8 * out_q * 4)                  # qkv scratch row
    return (hd % 128 == 0 and S % 8 == 0 and rep >= 1
            and vmem <= _VMEM_BYTES)


def _matvec_acc(xb, q, bits: int, half: int, two_nw: int):
    pair_mask = jnp.uint32(((1 << bits) - 1) * 0x00010001)
    magic = jnp.uint32(_BF16_MAGIC)
    qu = q.astype(jnp.uint32)
    acc = None
    for k in range(half):
        pair = ((qu >> (bits * k)) & pair_mask) | magic
        wk = pltpu.bitcast(pair.astype(jnp.int32), jnp.bfloat16)
        xs = jax.lax.slice_in_dim(xb, k * two_nw, (k + 1) * two_nw, axis=1)
        part = jnp.dot(xs, wk, preferred_element_type=jnp.float32)
        acc = part if acc is None else acc + part
    return acc


def _kernel(pos_ref, x_ref, g1_ref, qsz_ref, qsel_ref, qow_ref, qbias_ref,
            crow_ref, srow_ref, osz_ref, osel_ref, oow_ref, obias_ref,
            k_hbm, v_hbm, wq_hbm, wo_hbm,
            h_ref, ko_ref, vo_ref,
            qring, obuf, kslab, vslab, knew_s, vnew_s, qkv_s,
            qsem, osem, csem, *,
            bits: int, half: int, to_q: int, n_q: int, to_o: int, n_o: int,
            slots: int, S: int, rep: int, Hkv: int, hd: int, layer: int,
            scale: float, eps: float, in_q: int, pad_q: int, in_o: int,
            pad_o: int, q_has_sel: bool, q_has_bias: bool, o_has_sel: bool,
            o_has_bias: bool, rows_pad: int, out_dtype):
    pos = pos_ref[0, 0]
    two_nw_q = 2 * (wq_hbm.shape[0])
    two_nw_o = 2 * (wo_hbm.shape[0])

    # --- every byte the phase needs goes in flight up front --------------
    def qdma(slot, tile):
        return pltpu.make_async_copy(
            wq_hbm.at[:, pl.ds(tile * to_q, to_q)], qring.at[slot],
            qsem.at[slot])

    def odma(tile):
        return pltpu.make_async_copy(
            wo_hbm.at[:, pl.ds(tile * to_o, to_o)], obuf.at[tile],
            osem.at[tile])

    for s in range(min(slots - 1, n_q)):
        qdma(s, s).start()
    for t in range(n_o):
        odma(t).start()
    kread = pltpu.make_async_copy(k_hbm.at[layer, 0], kslab, csem.at[0])
    vread = pltpu.make_async_copy(v_hbm.at[layer, 0], vslab, csem.at[1])
    kread.start()
    vread.start()

    # --- qkv matvec with rmsnorm prologue (gemv_fused numerics) ----------
    xf = x_ref[:].astype(jnp.float32)                       # [rows, in_q]
    ms = jnp.sum(xf * xf, axis=1, keepdims=True) * (1.0 / in_q)
    xn = xf * jax.lax.rsqrt(ms + eps) * g1_ref[:].astype(jnp.float32)
    xb = xn.astype(jnp.bfloat16)
    xsum = jnp.sum(xn, axis=1, keepdims=True)               # [rows, 1]
    if q_has_sel:
        xo = jnp.dot(xb, qsel_ref[:], preferred_element_type=jnp.float32
                     ).astype(jnp.bfloat16)
    if pad_q:
        xb = jnp.pad(xb, ((0, 0), (0, pad_q)))

    def qbody(tile, _):
        slot = tile % slots

        @pl.when(tile + slots - 1 < n_q)
        def _():
            qdma((tile + slots - 1) % slots, tile + slots - 1).start()

        qdma(slot, tile).wait()
        acc = _matvec_acc(xb, qring[slot], bits, half, two_nw_q)
        s = qsz_ref[0:1, pl.ds(tile * to_q, to_q)]
        c = qsz_ref[1:2, pl.ds(tile * to_q, to_q)]
        y = acc * s - xsum * c
        if q_has_sel:
            y = y + jnp.dot(xo, qow_ref[:, pl.ds(tile * to_q, to_q)],
                            preferred_element_type=jnp.float32)
        if q_has_bias:
            y = y + qbias_ref[0:1, pl.ds(tile * to_q, to_q)]
        qkv_s[:, pl.ds(tile * to_q, to_q)] = y
        return ()

    jax.lax.fori_loop(0, n_q, qbody, ())

    # --- split + rope + cache append -------------------------------------
    Hq = rep * Hkv
    q_all = qkv_s[0:1, 0:Hq * hd].reshape(Hq, hd)           # f32
    k_lin = qkv_s[0:1, Hq * hd:(Hq + Hkv) * hd].reshape(Hkv, hd)
    v_lin = qkv_s[0:1, (Hq + Hkv) * hd:(Hq + 2 * Hkv) * hd].reshape(Hkv, hd)

    crow = crow_ref[:]                                      # [1, hd] f32
    srow = srow_ref[:]
    hh = hd // 2

    def rope(t):  # apply_rope 'half' numerics: f32 math, bf16 round
        rot = jnp.concatenate(
            [-jax.lax.slice_in_dim(t, hh, hd, axis=1),
             jax.lax.slice_in_dim(t, 0, hh, axis=1)], axis=1)
        return (t * crow + rot * srow).astype(jnp.bfloat16)

    # the generic path ropes the BF16-ROUNDED projections (fused_call
    # returns bf16); round first for bit parity
    qr = rope(q_all.astype(jnp.bfloat16).astype(jnp.float32))
    kr = rope(k_lin.astype(jnp.bfloat16).astype(jnp.float32))
    vb = v_lin.astype(jnp.bfloat16)

    knew_s[:] = kr.reshape(1, Hkv, hd)
    vnew_s[:] = vb.reshape(1, Hkv, hd)
    kwrite = pltpu.make_async_copy(
        knew_s, k_hbm.at[layer, 0, pl.ds(pos, 1)], csem.at[2])
    vwrite = pltpu.make_async_copy(
        vnew_s, v_hbm.at[layer, 0, pl.ds(pos, 1)], csem.at[3])
    kwrite.start()
    vwrite.start()

    # --- attention (attn_decode numerics) --------------------------------
    sidx = jax.lax.broadcasted_iota(jnp.int32, (S, 1), 0)
    valid = sidx <= pos
    is_new = sidx == pos
    is_new3 = is_new[:, :, None]
    kf_new = kr.astype(jnp.float32).reshape(1, Hkv, hd)
    vf_new = vb.reshape(1, Hkv, hd)

    kread.wait()
    vread.wait()
    kf = kslab[:].astype(jnp.float32)
    vpat = jnp.where(is_new3, vf_new, vslab[:]).astype(jnp.float32)

    qrf = qr.astype(jnp.float32).reshape(Hkv, rep, hd)
    ctxs = []
    for r in range(rep):
        # query head g*rep + r lives at row g*rep + r of qr — static
        # middle-dim index of the [Hkv, rep, hd] view pairs each r with
        # its kv group g (sublane shuffle, rep known at compile time)
        qh = qrf[:, r, :].reshape(1, Hkv, hd)
        scores = jnp.sum(kf * qh, axis=-1)                  # [S, Hkv]
        snew = jnp.sum(kf_new * qh, axis=-1)
        scores = jnp.where(is_new, snew, scores) * scale
        scores = jnp.where(valid, scores, -1e30)
        m = jnp.max(scores, axis=0, keepdims=True)
        e = jnp.exp(scores - m)
        probs = (e / jnp.sum(e, axis=0, keepdims=True)).astype(jnp.bfloat16)
        pb = probs.astype(jnp.float32)[:, :, None]
        ctxs.append(jnp.sum(pb * vpat, axis=0))             # [Hkv, hd]
    ctx = ctxs[0] if rep == 1 else jnp.concatenate(ctxs, axis=0)

    # --- o matvec from the resident tiles + residual epilogue ------------
    xrow_b = ctx.reshape(1, in_o).astype(jnp.bfloat16)
    xrow_f = xrow_b.astype(jnp.float32)
    xsum_o = jnp.pad(jnp.sum(xrow_f, axis=1, keepdims=True),
                     ((0, rows_pad - 1), (0, 0)))
    xb_o = jnp.pad(xrow_b, ((0, rows_pad - 1), (0, pad_o)))
    if o_has_sel:
        xo_o = jnp.dot(xb_o[:, :in_o] if pad_o else xb_o, osel_ref[:],
                       preferred_element_type=jnp.float32
                       ).astype(jnp.bfloat16)

    def obody(tile, _):
        odma(tile).wait()
        acc = _matvec_acc(xb_o, obuf[tile], bits, half, two_nw_o)
        s = osz_ref[0:1, pl.ds(tile * to_o, to_o)]
        c = osz_ref[1:2, pl.ds(tile * to_o, to_o)]
        y = acc * s - xsum_o * c
        if o_has_sel:
            y = y + jnp.dot(xo_o, oow_ref[:, pl.ds(tile * to_o, to_o)],
                            preferred_element_type=jnp.float32)
        if o_has_bias:
            y = y + obias_ref[0:1, pl.ds(tile * to_o, to_o)]
        y = y + x_ref[:, pl.ds(tile * to_o, to_o)].astype(jnp.float32)
        h_ref[:, pl.ds(tile * to_o, to_o)] = y.astype(out_dtype)
        return ()

    jax.lax.fori_loop(0, n_o, obody, ())

    kwrite.wait()
    vwrite.wait()
    del ko_ref, vo_ref  # aliased; updated by the row-write DMAs


@functools.partial(jax.jit,
                   static_argnames=("bits", "layer", "scale", "eps",
                                    "rep", "out_dtype"),
                   donate_argnums=(1, 2))
def attn_block_step(x: jnp.ndarray,
                    k_stack: jnp.ndarray, v_stack: jnp.ndarray,
                    pos: jnp.ndarray, crow: jnp.ndarray, srow: jnp.ndarray,
                    wq: jnp.ndarray, qaux, wo: jnp.ndarray, oaux,
                    gamma: jnp.ndarray, *, bits: int, layer: int,
                    scale: float, eps: float, rep: int,
                    out_dtype=jnp.bfloat16
                    ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """One layer's full decode attention phase; caches updated in place.

    x: [1, hidden] bf16 raw block input (also the residual).
    k_stack/v_stack: [L, 1, S, Hkv, hd] bf16 (DONATED, aliased to outputs).
    pos: int32 scalar; crow/srow: [1, hd] f32 rope rows at pos.
    wq/qaux: fused qkv PackedLinear qweight + make_fast_aux dict
    (sz/sel/ow/bias; gamma passed separately).  wo/oaux: o-proj, rows
    rep-major-permuted for rep > 1.
    Returns (h [1, hidden] post-attention hidden, k_stack, v_stack).
    """
    L, B, S, Hkv, hd = k_stack.shape
    nw_q, out_q = wq.shape
    nw_o, out_o = wo.shape
    v = values_per_word(bits)
    in_q = x.shape[1]
    in_o = rep * Hkv * hd
    assert B == 1 and x.shape == (1, in_q)
    assert out_q == (rep + 2) * Hkv * hd and out_o == in_q
    assert attn_block_applicable(S, Hkv, hd, rep, out_q, nw_q, out_o, nw_o)
    assert k_stack.dtype == jnp.bfloat16 and v_stack.dtype == jnp.bfloat16
    to_q, to_o = _tiles(out_q, nw_q, out_o, nw_o)
    rows_pad = 8

    q_has_sel = qaux["sel"] is not None
    q_has_bias = qaux["bias"] is not None
    o_has_sel = oaux["sel"] is not None
    o_has_bias = oaux["bias"] is not None
    one_f = jnp.zeros((1, 1), jnp.float32)
    one_b = jnp.zeros((1, 1), jnp.bfloat16)
    xp = jnp.pad(x.astype(jnp.bfloat16), ((0, rows_pad - 1), (0, 0)))

    h, k_out, v_out = pl.pallas_call(
        functools.partial(
            _kernel, bits=bits, half=v // 2, to_q=to_q, n_q=out_q // to_q,
            to_o=to_o, n_o=out_o // to_o, slots=_SLOTS, S=S, rep=rep,
            Hkv=Hkv, hd=hd, layer=layer, scale=scale, eps=eps, in_q=in_q,
            pad_q=nw_q * v - in_q, in_o=in_o, pad_o=nw_o * v - in_o,
            q_has_sel=q_has_sel, q_has_bias=q_has_bias, o_has_sel=o_has_sel,
            o_has_bias=o_has_bias, rows_pad=rows_pad, out_dtype=out_dtype),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),   # pos
            pl.BlockSpec(memory_space=pltpu.VMEM),   # x
            pl.BlockSpec(memory_space=pltpu.VMEM),   # gamma
            pl.BlockSpec(memory_space=pltpu.VMEM),   # qkv sz
            pl.BlockSpec(memory_space=pltpu.VMEM),   # qkv sel
            pl.BlockSpec(memory_space=pltpu.VMEM),   # qkv ow
            pl.BlockSpec(memory_space=pltpu.VMEM),   # qkv bias
            pl.BlockSpec(memory_space=pltpu.VMEM),   # cos row
            pl.BlockSpec(memory_space=pltpu.VMEM),   # sin row
            pl.BlockSpec(memory_space=pltpu.VMEM),   # o sz
            pl.BlockSpec(memory_space=pltpu.VMEM),   # o sel
            pl.BlockSpec(memory_space=pltpu.VMEM),   # o ow
            pl.BlockSpec(memory_space=pltpu.VMEM),   # o bias
            pl.BlockSpec(memory_space=pltpu.ANY),    # k_stack
            pl.BlockSpec(memory_space=pltpu.ANY),    # v_stack
            pl.BlockSpec(memory_space=pltpu.HBM),    # wq stream
            pl.BlockSpec(memory_space=pltpu.HBM),    # wo stream
        ],
        out_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((rows_pad, out_o), out_dtype),
            jax.ShapeDtypeStruct(k_stack.shape, k_stack.dtype),
            jax.ShapeDtypeStruct(v_stack.shape, v_stack.dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((_SLOTS, nw_q, to_q), jnp.int32),      # qkv ring
            pltpu.VMEM((out_o // to_o, nw_o, to_o), jnp.int32),  # o resident
            pltpu.VMEM((S, Hkv, hd), k_stack.dtype),
            pltpu.VMEM((S, Hkv, hd), v_stack.dtype),
            pltpu.VMEM((1, Hkv, hd), k_stack.dtype),
            pltpu.VMEM((1, Hkv, hd), v_stack.dtype),
            pltpu.VMEM((rows_pad, out_q), jnp.float32),       # qkv result
            pltpu.SemaphoreType.DMA((_SLOTS,)),
            pltpu.SemaphoreType.DMA((out_o // to_o,)),
            pltpu.SemaphoreType.DMA((4,)),
        ],
        input_output_aliases={13: 1, 14: 2},
        # the o-proj full prefetch + qkv ring + cache slabs exceed the
        # default 16MB scoped-vmem limit at 7b shapes; raise it (v5e has
        # 128MB physical VMEM, attn_block_applicable budgets 44MB)
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_BYTES + (8 << 20)),
        cost_estimate=pl.CostEstimate(
            flops=2 * rows_pad * (nw_q * v * out_q + nw_o * v * out_o)
            + 4 * rep * S * Hkv * hd,
            bytes_accessed=wq.nbytes + wo.nbytes + 2 * S * Hkv * hd * 2,
            transcendentals=rep * S),
        name=f"owq_attn_block_{bits}b",
    )(pos.reshape(1, 1).astype(jnp.int32), xp,
      gamma.astype(jnp.bfloat16),
      qaux["sz"],
      qaux["sel"] if q_has_sel else one_b,
      qaux["ow"] if q_has_sel else one_b,
      qaux["bias"] if q_has_bias else one_f,
      crow.astype(jnp.float32), srow.astype(jnp.float32),
      oaux["sz"],
      oaux["sel"] if o_has_sel else one_b,
      oaux["ow"] if o_has_sel else one_b,
      oaux["bias"] if o_has_bias else one_f,
      k_stack, v_stack, wq, wo)
    return h[:1], k_out, v_out


def attn_block_reference(x, k_stack, v_stack, pos, crow, srow, wq, qaux,
                         wo, oaux, gamma, *, bits, layer, scale, eps, rep,
                         out_dtype=jnp.bfloat16):
    """Pure-jnp twin with identical math (CPU tests / fallback)."""
    from .attn_decode import attn_decode_reference
    from .gemv_fused import fused_matvec_reference

    L, B, S, Hkv, hd = k_stack.shape
    Hq = rep * Hkv
    qkv = fused_matvec_reference(
        x.astype(jnp.bfloat16), wq, qaux["sz"], bits=bits, pre="rmsnorm",
        gamma=gamma.reshape(1, -1).astype(jnp.bfloat16), sel=qaux["sel"],
        ow=qaux["ow"], bias=qaux["bias"], eps=eps, out_dtype=jnp.bfloat16)
    q_all = qkv[0, :Hq * hd].reshape(Hq, hd)
    k_lin = qkv[0, Hq * hd:(Hq + Hkv) * hd].reshape(Hkv, hd)
    v_lin = qkv[0, (Hq + Hkv) * hd:].reshape(Hkv, hd)

    def rope(t):
        tf = t.astype(jnp.float32)
        hh = hd // 2
        rot = jnp.concatenate([-tf[:, hh:], tf[:, :hh]], axis=1)
        return (tf * crow.astype(jnp.float32)
                + rot * srow.astype(jnp.float32)).astype(jnp.bfloat16)

    qr, kr = rope(q_all), rope(k_lin)
    # attn_decode_reference wants [rep, Hkv, hd] with head g*rep+r at
    # row r — rep-strided rows of the head-major qr
    qg = qr.reshape(Hkv, rep, hd).transpose(1, 0, 2)
    ctx, k2, v2 = attn_decode_reference(
        qg, kr.reshape(1, Hkv, hd), v_lin.reshape(1, Hkv, hd),
        k_stack, v_stack, pos, layer=layer, scale=scale)
    xrow = ctx.astype(jnp.float32).reshape(1, rep * Hkv * hd)
    h = fused_matvec_reference(
        xrow, wo, oaux["sz"], bits=bits, sel=oaux["sel"], ow=oaux["ow"],
        res=x.reshape(1, -1), bias=oaux["bias"], out_dtype=out_dtype)
    return h, k2, v2


# ---------------------------------------------------------------------------
# Full-LAYER kernel: the attention phase above + ln2 -> gate|up matvec ->
# swiglu -> down matvec -> residual, all in ONE program.  The phase split
# still paid two launches + a VMEM->XLA->VMEM staging of the hidden state
# per layer and re-warmed the weight ring twice; here the gate|up ring is
# issued while the o matvec runs and the down ring during swiglu, so the
# HBM stream crosses the attention/mlp boundary without a gap.
# ---------------------------------------------------------------------------

_DN_SLOTS = 4


def layer_block_applicable(S: int, Hkv: int, hd: int, rep: int,
                           out_q: int, nw_q: int, out_o: int, nw_o: int,
                           out_g: int, nw_g: int, out_d: int, nw_d: int
                           ) -> bool:
    to_q, to_o = _tiles(out_q, nw_q, out_o, nw_o)
    to_g = _pick_tile(out_g, nw_g, (12 << 20) // _SLOTS)
    to_d = _pick_tile(out_d, nw_d, (12 << 20) // _DN_SLOTS)
    if 0 in (to_q, to_o, to_g, to_d):
        return False
    vmem = (_SLOTS * nw_q * to_q * 4          # qkv ring
            + nw_o * out_o * 4                # o full prefetch
            + _SLOTS * nw_g * to_g * 4        # gate|up ring
            + _DN_SLOTS * nw_d * to_d * 4     # down ring
            + 2 * S * Hkv * hd * 2            # cache slabs
            + 8 * out_q * 4 + 8 * out_g * 2)  # qkv f32 + gu bf16 scratch
    return (hd % 128 == 0 and S % 8 == 0 and rep >= 1
            and vmem <= _VMEM_BYTES)


def _layer_kernel(pos_ref, x_ref, g1_ref, qsz_ref, qsel_ref, qow_ref,
                  qbias_ref, crow_ref, srow_ref, osz_ref, osel_ref, oow_ref,
                  obias_ref, g2_ref, gsz_ref, gsel_ref, gow_ref, gbias_ref,
                  dsz_ref, dsel_ref, dow_ref, dbias_ref,
                  k_hbm, v_hbm, wq_hbm, wo_hbm, wg_hbm, wd_hbm,
                  h_ref, ko_ref, vo_ref,
                  qring, obuf, gring, dring, kslab, vslab, knew_s, vnew_s,
                  qkv_s, gu_s, qsem, osem, gsem, dsem, csem, *,
                  bits: int, half: int, to_q: int, n_q: int, to_o: int,
                  n_o: int, to_g: int, n_g: int, to_d: int, n_d: int,
                  slots: int, dslots: int, S: int, rep: int, Hkv: int,
                  hd: int, layer: int, scale: float, eps: float, in_q: int,
                  pad_q: int, in_o: int, pad_o: int, in_d: int, pad_d: int,
                  q_has_sel: bool, q_has_bias: bool, o_has_sel: bool,
                  o_has_bias: bool, g_has_sel: bool, g_has_bias: bool,
                  d_has_sel: bool, d_has_bias: bool, rows_pad: int,
                  out_dtype):
    pos = pos_ref[0, 0]
    two_nw_q = 2 * wq_hbm.shape[0]
    two_nw_o = 2 * wo_hbm.shape[0]
    two_nw_g = 2 * wg_hbm.shape[0]
    two_nw_d = 2 * wd_hbm.shape[0]

    def ring(w_hbm, buf, sem, to):
        def dma(slot, tile):
            return pltpu.make_async_copy(
                w_hbm.at[:, pl.ds(tile * to, to)], buf.at[slot],
                sem.at[slot])
        return dma

    qdma = ring(wq_hbm, qring, qsem, to_q)
    gdma = ring(wg_hbm, gring, gsem, to_g)
    ddma = ring(wd_hbm, dring, dsem, to_d)

    def odma(tile):
        return pltpu.make_async_copy(
            wo_hbm.at[:, pl.ds(tile * to_o, to_o)], obuf.at[tile],
            osem.at[tile])

    # --- in flight up front: qkv ring, o full, cache slabs ---------------
    for s in range(min(slots - 1, n_q)):
        qdma(s, s).start()
    for t in range(n_o):
        odma(t).start()
    kread = pltpu.make_async_copy(k_hbm.at[layer, 0], kslab, csem.at[0])
    vread = pltpu.make_async_copy(v_hbm.at[layer, 0], vslab, csem.at[1])
    kread.start()
    vread.start()

    # --- qkv matvec with rmsnorm prologue --------------------------------
    xf = x_ref[:].astype(jnp.float32)
    ms = jnp.sum(xf * xf, axis=1, keepdims=True) * (1.0 / in_q)
    xn = xf * jax.lax.rsqrt(ms + eps) * g1_ref[:].astype(jnp.float32)
    xb = xn.astype(jnp.bfloat16)
    xsum = jnp.sum(xn, axis=1, keepdims=True)
    if q_has_sel:
        xo = jnp.dot(xb, qsel_ref[:], preferred_element_type=jnp.float32
                     ).astype(jnp.bfloat16)
    if pad_q:
        xb = jnp.pad(xb, ((0, 0), (0, pad_q)))

    def qbody(tile, _):
        slot = tile % slots

        @pl.when(tile + slots - 1 < n_q)
        def _():
            qdma((tile + slots - 1) % slots, tile + slots - 1).start()

        qdma(slot, tile).wait()
        acc = _matvec_acc(xb, qring[slot], bits, half, two_nw_q)
        s = qsz_ref[0:1, pl.ds(tile * to_q, to_q)]
        c = qsz_ref[1:2, pl.ds(tile * to_q, to_q)]
        y = acc * s - xsum * c
        if q_has_sel:
            y = y + jnp.dot(xo, qow_ref[:, pl.ds(tile * to_q, to_q)],
                            preferred_element_type=jnp.float32)
        if q_has_bias:
            y = y + qbias_ref[0:1, pl.ds(tile * to_q, to_q)]
        qkv_s[:, pl.ds(tile * to_q, to_q)] = y
        return ()

    jax.lax.fori_loop(0, n_q, qbody, ())

    # --- split + rope + cache append -------------------------------------
    Hq = rep * Hkv
    q_all = qkv_s[0:1, 0:Hq * hd].reshape(Hq, hd)
    k_lin = qkv_s[0:1, Hq * hd:(Hq + Hkv) * hd].reshape(Hkv, hd)
    v_lin = qkv_s[0:1, (Hq + Hkv) * hd:(Hq + 2 * Hkv) * hd].reshape(Hkv, hd)
    crow = crow_ref[:]
    srow = srow_ref[:]
    hh = hd // 2

    def rope(t):
        rot = jnp.concatenate(
            [-jax.lax.slice_in_dim(t, hh, hd, axis=1),
             jax.lax.slice_in_dim(t, 0, hh, axis=1)], axis=1)
        return (t * crow + rot * srow).astype(jnp.bfloat16)

    qr = rope(q_all.astype(jnp.bfloat16).astype(jnp.float32))
    kr = rope(k_lin.astype(jnp.bfloat16).astype(jnp.float32))
    vb = v_lin.astype(jnp.bfloat16)
    knew_s[:] = kr.reshape(1, Hkv, hd)
    vnew_s[:] = vb.reshape(1, Hkv, hd)
    kwrite = pltpu.make_async_copy(
        knew_s, k_hbm.at[layer, 0, pl.ds(pos, 1)], csem.at[2])
    vwrite = pltpu.make_async_copy(
        vnew_s, v_hbm.at[layer, 0, pl.ds(pos, 1)], csem.at[3])
    kwrite.start()
    vwrite.start()

    # --- attention --------------------------------------------------------
    sidx = jax.lax.broadcasted_iota(jnp.int32, (S, 1), 0)
    valid = sidx <= pos
    is_new = sidx == pos
    is_new3 = is_new[:, :, None]
    kf_new = kr.astype(jnp.float32).reshape(1, Hkv, hd)
    vf_new = vb.reshape(1, Hkv, hd)
    kread.wait()
    vread.wait()
    kf = kslab[:].astype(jnp.float32)
    vpat = jnp.where(is_new3, vf_new, vslab[:]).astype(jnp.float32)
    qrf = qr.astype(jnp.float32).reshape(Hkv, rep, hd)
    ctxs = []
    for r in range(rep):
        qh = qrf[:, r, :].reshape(1, Hkv, hd)
        scores = jnp.sum(kf * qh, axis=-1)
        snew = jnp.sum(kf_new * qh, axis=-1)
        scores = jnp.where(is_new, snew, scores) * scale
        scores = jnp.where(valid, scores, -1e30)
        m = jnp.max(scores, axis=0, keepdims=True)
        e = jnp.exp(scores - m)
        probs = (e / jnp.sum(e, axis=0, keepdims=True)).astype(jnp.bfloat16)
        pb = probs.astype(jnp.float32)[:, :, None]
        ctxs.append(jnp.sum(pb * vpat, axis=0))
    ctx = ctxs[0] if rep == 1 else jnp.concatenate(ctxs, axis=0)

    # --- o matvec (resident tiles); gate|up ring starts streaming now ----
    for s in range(min(slots - 1, n_g)):
        gdma(s, s).start()

    xrow_b = ctx.reshape(1, in_o).astype(jnp.bfloat16)
    xrow_f = xrow_b.astype(jnp.float32)
    xsum_o = jnp.pad(jnp.sum(xrow_f, axis=1, keepdims=True),
                     ((0, rows_pad - 1), (0, 0)))
    xb_o = jnp.pad(xrow_b, ((0, rows_pad - 1), (0, pad_o)))
    if o_has_sel:
        xo_o = jnp.dot(xb_o[:, :in_o] if pad_o else xb_o, osel_ref[:],
                       preferred_element_type=jnp.float32
                       ).astype(jnp.bfloat16)

    def obody(tile, _):
        odma(tile).wait()
        acc = _matvec_acc(xb_o, obuf[tile], bits, half, two_nw_o)
        s = osz_ref[0:1, pl.ds(tile * to_o, to_o)]
        c = osz_ref[1:2, pl.ds(tile * to_o, to_o)]
        y = acc * s - xsum_o * c
        if o_has_sel:
            y = y + jnp.dot(xo_o, oow_ref[:, pl.ds(tile * to_o, to_o)],
                            preferred_element_type=jnp.float32)
        if o_has_bias:
            y = y + obias_ref[0:1, pl.ds(tile * to_o, to_o)]
        y = y + x_ref[:, pl.ds(tile * to_o, to_o)].astype(jnp.float32)
        h_ref[:, pl.ds(tile * to_o, to_o)] = y.astype(out_dtype)
        return ()

    jax.lax.fori_loop(0, n_o, obody, ())

    # --- ln2 + gate|up matvec --------------------------------------------
    h1 = h_ref[:].astype(jnp.float32)                  # post-attn hidden
    ms2 = jnp.sum(h1 * h1, axis=1, keepdims=True) * (1.0 / in_q)
    hn = h1 * jax.lax.rsqrt(ms2 + eps) * g2_ref[:].astype(jnp.float32)
    hb = hn.astype(jnp.bfloat16)
    hsum = jnp.sum(hn, axis=1, keepdims=True)
    if g_has_sel:
        ho = jnp.dot(hb, gsel_ref[:], preferred_element_type=jnp.float32
                     ).astype(jnp.bfloat16)
    if pad_q:
        hb = jnp.pad(hb, ((0, 0), (0, pad_q)))

    def gbody(tile, _):
        slot = tile % slots

        @pl.when(tile + slots - 1 < n_g)
        def _():
            gdma((tile + slots - 1) % slots, tile + slots - 1).start()

        gdma(slot, tile).wait()
        acc = _matvec_acc(hb, gring[slot], bits, half, two_nw_g)
        s = gsz_ref[0:1, pl.ds(tile * to_g, to_g)]
        c = gsz_ref[1:2, pl.ds(tile * to_g, to_g)]
        y = acc * s - hsum * c
        if g_has_sel:
            y = y + jnp.dot(ho, gow_ref[:, pl.ds(tile * to_g, to_g)],
                            preferred_element_type=jnp.float32)
        if g_has_bias:
            y = y + gbias_ref[0:1, pl.ds(tile * to_g, to_g)]
        gu_s[:, pl.ds(tile * to_g, to_g)] = y.astype(jnp.bfloat16)
        return ()

    jax.lax.fori_loop(0, n_g, gbody, ())

    # --- swiglu + down matvec; down ring streams during the swiglu -------
    for s in range(min(dslots - 1, n_d)):
        ddma(s, s).start()

    gu = gu_s[:].astype(jnp.float32)                   # [rows, 2*in_d]
    g = jax.lax.slice_in_dim(gu, 0, in_d, axis=1)
    u = jax.lax.slice_in_dim(gu, in_d, 2 * in_d, axis=1)
    xd_f = g * jax.lax.logistic(g) * u
    xd = xd_f.astype(jnp.bfloat16)
    dsum = jnp.sum(xd_f, axis=1, keepdims=True)
    if d_has_sel:
        do = jnp.dot(xd, dsel_ref[:], preferred_element_type=jnp.float32
                     ).astype(jnp.bfloat16)
    if pad_d:
        xd = jnp.pad(xd, ((0, 0), (0, pad_d)))

    def dbody(tile, _):
        slot = tile % dslots

        @pl.when(tile + dslots - 1 < n_d)
        def _():
            ddma((tile + dslots - 1) % dslots, tile + dslots - 1).start()

        ddma(slot, tile).wait()
        acc = _matvec_acc(xd, dring[slot], bits, half, two_nw_d)
        s = dsz_ref[0:1, pl.ds(tile * to_d, to_d)]
        c = dsz_ref[1:2, pl.ds(tile * to_d, to_d)]
        y = acc * s - dsum * c
        if d_has_sel:
            y = y + jnp.dot(do, dow_ref[:, pl.ds(tile * to_d, to_d)],
                            preferred_element_type=jnp.float32)
        if d_has_bias:
            y = y + dbias_ref[0:1, pl.ds(tile * to_d, to_d)]
        y = y + h_ref[:, pl.ds(tile * to_d, to_d)].astype(jnp.float32)
        h_ref[:, pl.ds(tile * to_d, to_d)] = y.astype(out_dtype)
        return ()

    jax.lax.fori_loop(0, n_d, dbody, ())

    kwrite.wait()
    vwrite.wait()
    del ko_ref, vo_ref


@functools.partial(jax.jit,
                   static_argnames=("bits", "layer", "scale", "eps",
                                    "rep", "out_dtype"),
                   donate_argnums=(1, 2))
def layer_block_step(x: jnp.ndarray,
                     k_stack: jnp.ndarray, v_stack: jnp.ndarray,
                     pos: jnp.ndarray, crow: jnp.ndarray, srow: jnp.ndarray,
                     wq: jnp.ndarray, qaux, wo: jnp.ndarray, oaux,
                     wg: jnp.ndarray, gaux, wd: jnp.ndarray, daux, *,
                     bits: int, layer: int, scale: float, eps: float,
                     rep: int, out_dtype=jnp.bfloat16
                     ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """One FULL llama-class decoder layer at B=T=1; caches in place.

    x: [1, hidden] bf16.  qaux/gaux carry the rmsnorm gammas
    (make_fast_aux(..., gamma=lnX)); oaux/daux the o/down epilogues (o
    rows rep-major-permuted for rep > 1).  Returns (h [1, hidden],
    k_stack, v_stack).
    """
    L, B, S, Hkv, hd = k_stack.shape
    nw_q, out_q = wq.shape
    nw_o, out_o = wo.shape
    nw_g, out_g = wg.shape
    nw_d, out_d = wd.shape
    v = values_per_word(bits)
    in_q = x.shape[1]
    in_o = rep * Hkv * hd
    in_d = out_g // 2
    assert B == 1 and x.shape == (1, in_q)
    assert out_q == (rep + 2) * Hkv * hd and out_o == in_q and out_d == in_q
    assert layer_block_applicable(S, Hkv, hd, rep, out_q, nw_q, out_o,
                                  nw_o, out_g, nw_g, out_d, nw_d)
    assert k_stack.dtype == jnp.bfloat16 and v_stack.dtype == jnp.bfloat16
    to_q, to_o = _tiles(out_q, nw_q, out_o, nw_o)
    to_g = _pick_tile(out_g, nw_g, (12 << 20) // _SLOTS)
    to_d = _pick_tile(out_d, nw_d, (12 << 20) // _DN_SLOTS)
    rows_pad = 8

    flags = {}
    for name, aux in (("q", qaux), ("o", oaux), ("g", gaux), ("d", daux)):
        flags[f"{name}_has_sel"] = aux["sel"] is not None
        flags[f"{name}_has_bias"] = aux["bias"] is not None
    one_f = jnp.zeros((1, 1), jnp.float32)
    one_b = jnp.zeros((1, 1), jnp.bfloat16)

    def opt(aux, key, dummy):
        val = aux[key]
        return val if val is not None else dummy

    xp = jnp.pad(x.astype(jnp.bfloat16), ((0, rows_pad - 1), (0, 0)))

    h, k_out, v_out = pl.pallas_call(
        functools.partial(
            _layer_kernel, bits=bits, half=v // 2, to_q=to_q,
            n_q=out_q // to_q, to_o=to_o, n_o=out_o // to_o, to_g=to_g,
            n_g=out_g // to_g, to_d=to_d, n_d=out_d // to_d, slots=_SLOTS,
            dslots=_DN_SLOTS, S=S, rep=rep, Hkv=Hkv, hd=hd, layer=layer,
            scale=scale, eps=eps, in_q=in_q, pad_q=nw_q * v - in_q,
            in_o=in_o, pad_o=nw_o * v - in_o, in_d=in_d,
            pad_d=nw_d * v - in_d, rows_pad=rows_pad, out_dtype=out_dtype,
            **flags),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)]
        + [pl.BlockSpec(memory_space=pltpu.VMEM)] * 21
        + [pl.BlockSpec(memory_space=pltpu.ANY)] * 2
        + [pl.BlockSpec(memory_space=pltpu.HBM)] * 4,
        out_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((rows_pad, out_d), out_dtype),
            jax.ShapeDtypeStruct(k_stack.shape, k_stack.dtype),
            jax.ShapeDtypeStruct(v_stack.shape, v_stack.dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((_SLOTS, nw_q, to_q), jnp.int32),
            pltpu.VMEM((out_o // to_o, nw_o, to_o), jnp.int32),
            pltpu.VMEM((_SLOTS, nw_g, to_g), jnp.int32),
            pltpu.VMEM((_DN_SLOTS, nw_d, to_d), jnp.int32),
            pltpu.VMEM((S, Hkv, hd), k_stack.dtype),
            pltpu.VMEM((S, Hkv, hd), v_stack.dtype),
            pltpu.VMEM((1, Hkv, hd), k_stack.dtype),
            pltpu.VMEM((1, Hkv, hd), v_stack.dtype),
            pltpu.VMEM((rows_pad, out_q), jnp.float32),
            pltpu.VMEM((rows_pad, out_g), jnp.bfloat16),
            pltpu.SemaphoreType.DMA((_SLOTS,)),
            pltpu.SemaphoreType.DMA((out_o // to_o,)),
            pltpu.SemaphoreType.DMA((_SLOTS,)),
            pltpu.SemaphoreType.DMA((_DN_SLOTS,)),
            pltpu.SemaphoreType.DMA((4,)),
        ],
        input_output_aliases={22: 1, 23: 2},
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_BYTES + (8 << 20)),
        cost_estimate=pl.CostEstimate(
            flops=2 * rows_pad * v * (nw_q * out_q + nw_o * out_o
                                      + nw_g * out_g + nw_d * out_d)
            + 4 * rep * S * Hkv * hd,
            bytes_accessed=(wq.nbytes + wo.nbytes + wg.nbytes + wd.nbytes
                            + 2 * S * Hkv * hd * 2),
            transcendentals=rep * S + rows_pad * in_d,
        ),
        name=f"owq_layer_block_{bits}b",
    )(pos.reshape(1, 1).astype(jnp.int32), xp,
      qaux["gamma"], qaux["sz"], opt(qaux, "sel", one_b),
      opt(qaux, "ow", one_b), opt(qaux, "bias", one_f),
      crow.astype(jnp.float32), srow.astype(jnp.float32),
      oaux["sz"], opt(oaux, "sel", one_b), opt(oaux, "ow", one_b),
      opt(oaux, "bias", one_f),
      gaux["gamma"], gaux["sz"], opt(gaux, "sel", one_b),
      opt(gaux, "ow", one_b), opt(gaux, "bias", one_f),
      daux["sz"], opt(daux, "sel", one_b), opt(daux, "ow", one_b),
      opt(daux, "bias", one_f),
      k_stack, v_stack, wq, wo, wg, wd)
    return h[:1], k_out, v_out


def layer_block_reference(x, k_stack, v_stack, pos, crow, srow, wq, qaux,
                          wo, oaux, wg, gaux, wd, daux, *, bits, layer,
                          scale, eps, rep, out_dtype=jnp.bfloat16):
    """Pure-jnp twin: attention phase reference + fused gu/down math."""
    from .gemv_fused import fused_matvec_reference

    h1, k2, v2 = attn_block_reference(
        x, k_stack, v_stack, pos, crow, srow, wq, qaux, wo, oaux,
        qaux["gamma"], bits=bits, layer=layer, scale=scale, eps=eps,
        rep=rep)
    gu = fused_matvec_reference(
        h1.astype(jnp.bfloat16), wg, gaux["sz"], bits=bits, pre="rmsnorm",
        gamma=gaux["gamma"], sel=gaux["sel"], ow=gaux["ow"],
        bias=gaux["bias"], eps=eps, out_dtype=jnp.bfloat16)
    h2 = fused_matvec_reference(
        gu, wd, daux["sz"], bits=bits, pre="swiglu", sel=daux["sel"],
        ow=daux["ow"], res=h1, bias=daux["bias"], eps=eps,
        out_dtype=out_dtype)
    return h2, k2, v2
