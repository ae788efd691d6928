"""Fused decode matvec: rmsnorm / weak-columns / correction / residual
in ONE pallas kernel around the deep-buffered DMA weight stream.

Motivation (xplane, full llama-7b decode step, round 3): the quantized
matmul kernels run at the HBM streaming ceiling (~3.35 ms/token) but the
step spends ~0.7 ms/token in per-call XLA glue *between* kernels —
re-stacking the scale/zero correction every step (lax.scan does not hoist
params-derived ops out of the loop body), gathering weak-column
activations, adding the weak-column product, casting, and the block
norms.  Every one of those is a small launch that idles the weight
stream.  This kernel folds them all into the matmul:

    xn   = rmsnorm(x) * gamma                  (optional prologue)
    acc  = paired-unpack matmul (gemv_dma.py)  (4-slot DMA ring)
    y    = acc * s - sum(xn) * c               (c = s*(z+128), precomputed)
         + (xn @ sel) @ ow                     (weak columns, one-hot sel)
         + res + bias                          (optional epilogue)

Weak columns use a ONE-HOT selection matmul instead of a gather: Mosaic
has no cheap dynamic lane gather, but x[8,in] @ onehot[in,n] is a single
trivially-small MXU op that picks the weak activations exactly.  All
aux operands (sz, sel, ow, gamma) are precomputed ONCE at serving-prep
time (runtime/fuse.py::prepare_decode_fast) so the scan body holds no
params-derived arithmetic at all.

Reference mapping: this is the TPU fusion of what owq/kernel/gemv.cu's
VecQuant*OutlierMatMul kernels + the surrounding torch glue
(owq/quant.py:221-259 QuantMatMul.forward) do as separate passes.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..core.packing import values_per_word

__all__ = ["fused_matvec", "fused_matvec_reference", "fused_applicable",
           "make_fast_aux", "fused_call"]

_SLOTS = 4
_BF16_MAGIC = 0x43004300  # bf16(128.0) in both halves of an int32 lane
MAX_ROWS = 32  # engine slot counts up to 32 ride the fused path


def _paired_acc(xb, q, bits: int, half: int, two_nw: int):
    """Paired bf16-magic unpack matmul for one weight tile.

    xb: [rows, in_pad] bf16 in natural order; slab k is the static lane
    slice [k*2nw, (k+1)*2nw) — misaligned lane offsets cost a few vreg
    shuffles, noise next to the MXU work.
    """
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


def _fused_kernel(x_ref, sz_ref, gamma_ref, sel_ref, ow_ref, res_ref,
                  bias_ref, q_hbm, o_ref, scratch, sems, *, bits: int,
                  half: int, two_nw: int, to: int, n_tiles: int, slots: int,
                  pre: Optional[str], has_sel: bool, has_res: bool,
                  has_bias: bool, inv_n: float, eps: float, pad_cols: int,
                  out_dtype):
    def get_dma(slot, tile):
        return pltpu.make_async_copy(
            q_hbm.at[:, pl.ds(tile * to, to)],
            scratch.at[slot],
            sems.at[slot],
        )

    for s in range(min(slots - 1, n_tiles)):
        get_dma(s, s).start()

    xf = x_ref[:].astype(jnp.float32)                      # [rows, n_true]
    if pre == "rmsnorm":
        ms = jnp.sum(xf * xf, axis=1, keepdims=True) * inv_n
        xf = xf * jax.lax.rsqrt(ms + eps) * gamma_ref[:].astype(jnp.float32)
    elif pre == "swiglu":
        # x is the raw gate|up row [rows, 2n]: silu(g)*u runs in-kernel,
        # removing the standalone activation fusion + re-pad per block
        n = xf.shape[1] // 2
        g = xf[:, :n]
        xf = g * jax.lax.logistic(g) * xf[:, n:]
    xb = xf.astype(jnp.bfloat16)
    xsum = jnp.sum(xf, axis=1, keepdims=True)              # [rows, 1] f32
    if has_sel:
        # one-hot pick of the weak-column activations: [rows, n_pad]
        xo = jnp.dot(xb, sel_ref[:], preferred_element_type=jnp.float32
                     ).astype(jnp.bfloat16)
    if pad_cols:
        # zero-pad to in_pad in registers (packing pads rows with the
        # zero-point code; zero activations cancel via the correction)
        xb = jnp.pad(xb, ((0, 0), (0, pad_cols)))

    def body(tile, _):
        slot = tile % slots

        @pl.when(tile + slots - 1 < n_tiles)
        def _():
            get_dma((tile + slots - 1) % slots, tile + slots - 1).start()

        get_dma(slot, tile).wait()
        acc = _paired_acc(xb, scratch[slot], bits, half, two_nw)
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


def _pick_tile(out: int, nw: int) -> int:
    for to in (512, 256, 128):
        if out % to == 0 and _SLOTS * nw * to * 4 <= 12 << 20:
            return to
    return 0


def fused_applicable(rows: int, out: int, nw: int) -> bool:
    return rows <= MAX_ROWS and _pick_tile(out, nw) != 0


def make_fast_aux(p, gamma: Optional[jnp.ndarray] = None, n_pad_min: int = 8):
    """Precompute the serving-time aux arrays for ``fused_matvec``.

    Returns a dict of arrays (pytree leaves — NO params-derived arithmetic
    remains inside the jitted decode step):
      sz    f32 [2, out]         rows [s ; s*(z+128)]
      sel   bf16 [in_true, n_pad]  one-hot weak-column selector (or None)
      ow    bf16 [n_pad, out]      weak-column weights (or None)
      gamma bf16 [1, in_true]      rmsnorm weight (or None)
      bias  f32 [1, out]           (or None)
    """
    import numpy as np

    s32 = np.asarray(p.scales, np.float32)
    z32 = np.asarray(p.zeros, np.float32)
    sz = jnp.asarray(np.stack([s32, s32 * (z32 + 128.0)]))
    aux = {"sz": sz, "sel": None, "ow": None, "gamma": None, "bias": None}
    if p.n_out > 0:
        ids = np.asarray(p.out_ids)
        n_pad = max(n_pad_min, -(-ids.size // 8) * 8)
        sel = np.zeros((p.in_features, n_pad), np.float32)
        sel[ids, np.arange(ids.size)] = 1.0
        ow = np.zeros((n_pad, p.out_features), np.float32)
        ow[:ids.size] = np.asarray(p.oweight, np.float32)
        aux["sel"] = jnp.asarray(sel, jnp.bfloat16)
        aux["ow"] = jnp.asarray(ow, jnp.bfloat16)
    if gamma is not None:
        aux["gamma"] = jnp.asarray(
            np.asarray(gamma, np.float32).reshape(1, -1), jnp.bfloat16)
    if p.bias is not None:
        aux["bias"] = jnp.asarray(
            np.asarray(p.bias, np.float32).reshape(1, -1))
    return aux


@functools.partial(jax.jit, static_argnames=("bits", "pre", "eps",
                                             "out_dtype"))
def fused_matvec(x: jnp.ndarray, qweight: jnp.ndarray, sz: jnp.ndarray, *,
                 bits: int, pre: Optional[str] = None,
                 gamma: Optional[jnp.ndarray] = None,
                 sel: Optional[jnp.ndarray] = None,
                 ow: Optional[jnp.ndarray] = None,
                 res: Optional[jnp.ndarray] = None,
                 bias: Optional[jnp.ndarray] = None,
                 eps: float = 1e-5,
                 out_dtype=jnp.bfloat16) -> jnp.ndarray:
    """x [rows<=16, in_true] (RAW, natural order, unpadded) -> [rows, out].

    Applies optional rmsnorm prologue, the packed base product with the
    fused scale/zero(+128) correction, the weak-column product, and
    optional residual/bias epilogues.  Zero-padding to the packed input
    width happens in registers inside the kernel.
    """
    rows, xw = x.shape
    n_true = xw // 2 if pre == "swiglu" else xw
    nw, out = qweight.shape
    v = values_per_word(bits)
    in_pad = nw * v
    assert n_true <= in_pad
    to = _pick_tile(out, nw)
    assert to, f"no tile divides out={out}"
    rows_pad = 8 if rows <= 8 else (16 if rows <= 16 else MAX_ROWS)
    assert rows <= rows_pad
    if rows < rows_pad:
        x = jnp.pad(x, ((0, rows_pad - rows), (0, 0)))
        if res is not None:
            res = jnp.pad(res, ((0, rows_pad - rows), (0, 0)))

    has_sel = sel is not None
    has_res = res is not None
    has_bias = bias is not None
    one_f = jnp.zeros((1, 1), jnp.float32)
    one_b = jnp.zeros((1, 1), jnp.bfloat16)
    inv_n = 1.0 / float(n_true)

    y = pl.pallas_call(
        functools.partial(
            _fused_kernel, bits=bits, half=v // 2, two_nw=2 * nw, to=to,
            n_tiles=out // to, slots=_SLOTS, pre=pre, has_sel=has_sel,
            has_res=has_res, has_bias=has_bias, inv_n=inv_n, eps=eps,
            pad_cols=in_pad - n_true, out_dtype=out_dtype),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),   # x
            pl.BlockSpec(memory_space=pltpu.VMEM),   # sz
            pl.BlockSpec(memory_space=pltpu.VMEM),   # gamma
            pl.BlockSpec(memory_space=pltpu.VMEM),   # sel
            pl.BlockSpec(memory_space=pltpu.VMEM),   # ow
            pl.BlockSpec(memory_space=pltpu.VMEM),   # res
            pl.BlockSpec(memory_space=pltpu.VMEM),   # bias
            # HBM-pinned weight stream (see gemv_dma.packed_matvec_dma)
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
        name=f"owq_fused_gemv_{bits}b",
    )(x.astype(jnp.bfloat16), sz,
      gamma if gamma is not None else one_b,
      sel if sel is not None else one_b,
      ow if ow is not None else one_b,
      res if res is not None else one_b,
      bias if bias is not None else one_f,
      qweight)
    return y[:rows]


def fused_call(x: jnp.ndarray, p, aux, *, pre: Optional[str] = None,
               res: Optional[jnp.ndarray] = None, eps: float = 1e-5
               ) -> jnp.ndarray:
    """Apply a PackedLinear through the fused kernel (TPU) or the jnp
    reference (CPU tests keep the fastpath wiring exercised).

    x: [B, T, in] or [rows, in]; returns matching leading shape.
    ``aux`` is the dict from make_fast_aux.
    """
    if hasattr(p, "local"):   # row-parallel ShardedPackedLinear inside
        p = p.local()         # shard_map: leading-dim-1 local slice
    lead = x.shape[:-1]
    x2 = x.reshape(-1, x.shape[-1])
    res2 = res.reshape(-1, res.shape[-1]) if res is not None else None
    fn = (fused_matvec if jax.default_backend() == "tpu"
          else fused_matvec_reference)
    sg = jax.lax.stop_gradient

    def sga(k):
        v = aux[k]
        if v is None:
            return None
        if k in ("sel", "ow") and v.ndim == 3:
            v = v[0]  # per-shard aux (make_fast_aux_sharded) local slice
        return sg(v)

    y = fn(x2, sg(p.qweight), sg(aux["sz"]), bits=p.bits, pre=pre,
           gamma=sga("gamma"), sel=sga("sel"), ow=sga("ow"), res=res2,
           bias=sga("bias"), eps=eps)
    return y.reshape(*lead, y.shape[-1])


def fused_matvec_reference(x, qweight, sz, *, bits, pre=None, gamma=None,
                           sel=None, ow=None, res=None, bias=None,
                           eps=1e-5, out_dtype=jnp.bfloat16):
    """Pure-jnp reference with IDENTICAL math (CPU tests / fallback)."""
    from ..core.packing import unpack_int_weights

    rows, xw = x.shape
    n_true = xw // 2 if pre == "swiglu" else xw
    v = values_per_word(bits)
    in_pad = qweight.shape[0] * v
    inv_n = 1.0 / float(n_true)
    xf = x.astype(jnp.float32)
    if pre == "rmsnorm":
        ms = jnp.sum(xf * xf, axis=1, keepdims=True) * inv_n
        xf = xf * jax.lax.rsqrt(ms + eps) * gamma.astype(jnp.float32)
    elif pre == "swiglu":
        g = xf[:, :n_true]
        xf = g * jax.lax.logistic(g) * xf[:, n_true:]
    xb = xf.astype(jnp.bfloat16)
    xsum = jnp.sum(xf, axis=1, keepdims=True)
    if sel is not None:
        xo = jnp.dot(xb, sel, preferred_element_type=jnp.float32
                     ).astype(jnp.bfloat16)
    if in_pad > n_true:
        xb = jnp.pad(xb, ((0, 0), (0, in_pad - n_true)))
    codes = unpack_int_weights(qweight, bits).astype(jnp.float32) + 128.0
    acc = jnp.dot(xb, codes.astype(jnp.bfloat16),
                  preferred_element_type=jnp.float32)
    y = acc * sz[0:1] - xsum * sz[1:2]
    if sel is not None:
        y = y + jnp.dot(xo, ow, preferred_element_type=jnp.float32)
    if res is not None:
        y = y + res.astype(jnp.float32)
    if bias is not None:
        y = y + bias
    return y.astype(out_dtype)
