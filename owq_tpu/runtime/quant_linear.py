"""Packed mixed-precision linear layers (the reference's ``QuantLinear``).

Reference behavior (owq/quant.py:184-480): a drop-in linear whose weight is
stored as bit-packed int words + per-output-channel scale/zero + a small set
of full-precision "weak" input columns (``oweight`` at ``outlieridx``).  The
packed codes hold the zero-point at weak/padded positions so they dequantize
to exactly zero and the weak-column contribution is added separately.

Here the layer is a pytree dataclass; ``apply`` is pure and jit-safe.  Two
execution paths:

  * ``apply(..., kernel='xla')`` — reference path: unpack + dequantize the
    full matrix and let XLA fuse the matmul (analogue of the reference's
    prefill dequant+cuBLAS path, owq/quant.py:461-463).
  * ``kernel='pallas'`` — fused Pallas plane-loop kernels (see
    owq_tpu.kernels) that never materialize the dequantized matrix.

Weights are stored transposed relative to torch: logical dense weight is
``[in_features, out_features]`` (x @ W + b).
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..core.packing import (
    pack_int_weights,
    padded_infeatures,
    plane_offset,
    unpack_int_weights,
    values_per_word,
)
from ..core.quantizer import QuantSpec

__all__ = ["DenseLinear", "PackedLinear", "ShardedPackedLinear",
           "pack_linear", "dequantize_weight", "shard_packed_rowwise"]


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class DenseLinear:
    """Plain (or fake-quantized) linear: y = x @ w + b."""

    w: jnp.ndarray                      # [in, out]
    b: Optional[jnp.ndarray] = None    # [out]

    @property
    def in_features(self) -> int:
        return self.w.shape[0]

    @property
    def out_features(self) -> int:
        return self.w.shape[1]

    def apply(self, x: jnp.ndarray, kernel: str = "xla") -> jnp.ndarray:
        import os

        if (os.environ.get("OWQ_DENSE_DMA", "") == "1"
                and kernel.startswith("pallas")
                and x.dtype in (jnp.bfloat16, jnp.float16)
                and jax.default_backend() == "tpu"):
            # Experimental (OWQ_DENSE_DMA=1): stream the dense matrix
            # through the 4-slot DMA ring.  Isolated microbenchmarks show
            # ~755 GB/s, but IN the decode step it measures ~623 vs ~694
            # GB/s for XLA's reduce-fusion matvec (xplane, llama-7b
            # lm_head) — XLA overlaps the reduction with neighbours better
            # than the standalone kernel boundary allows, so the XLA path
            # stays the default.
            from ..kernels.gemv_dma import dense_dma_applicable

            lead = x.shape[:-1]
            rows = 1
            for d in lead:
                rows *= d
            if dense_dma_applicable(rows, self.w.shape[1], self.w.shape[0]):
                y = _dense_mv(x.reshape(rows, x.shape[-1]), self.w)
                y = y.reshape(*lead, self.w.shape[1])
                if self.b is not None:
                    y = y + self.b.astype(x.dtype)
                return y
        y = jnp.dot(x, self.w.astype(x.dtype), preferred_element_type=x.dtype)
        if self.b is not None:
            y = y + self.b.astype(x.dtype)
        return y


@jax.custom_vjp
def _dense_mv(x2: jnp.ndarray, w: jnp.ndarray) -> jnp.ndarray:
    """Pallas dense matvec with a standard-dot VJP (pallas_call has no
    autodiff rule; dense weights DO take gradients, e.g. LoRA bases)."""
    from ..kernels.gemv_dma import dense_matvec_dma

    return dense_matvec_dma(x2, w, out_dtype=x2.dtype)


def _dense_mv_fwd(x2, w):
    return _dense_mv(x2, w), (x2, w)


def _dense_mv_bwd(res, g):
    x2, w = res
    gx = jnp.dot(g.astype(jnp.float32), w.astype(jnp.float32).T)
    gw = jnp.dot(x2.astype(jnp.float32).T, g.astype(jnp.float32))
    return gx.astype(x2.dtype), gw.astype(w.dtype)


_dense_mv.defvjp(_dense_mv_fwd, _dense_mv_bwd)


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class PackedLinear:
    """OWQ packed linear.

    Array fields:
      qweight   int32 [nw, out]  plane-chunk packed codes (see core.packing)
      scales    f32   [out]      per-output-channel scale
      zeros     f32   [out]      per-output-channel integer zero-point
      oweight   [n_out, out]     weak-column weights, full precision
      out_ids   int32 [n_out]    sorted weak-column input indices
      bias      [out] or None
    """

    qweight: jnp.ndarray
    scales: jnp.ndarray
    zeros: jnp.ndarray
    oweight: jnp.ndarray
    out_ids: jnp.ndarray
    bias: Optional[jnp.ndarray]
    bits: int = dataclasses.field(metadata=dict(static=True))
    in_features: int = dataclasses.field(metadata=dict(static=True))
    # "paired" (core/packing.py, every exact path) or "a8" (byte layout
    # for the W4A8 decode kernel, kernels/gemv_a8.py::a8_repack — a
    # load-time serving transform, not a checkpoint format)
    layout: str = dataclasses.field(default="paired",
                                    metadata=dict(static=True))

    @property
    def out_features(self) -> int:
        return self.qweight.shape[1]

    @property
    def n_out(self) -> int:
        return self.oweight.shape[0]

    @property
    def in_padded(self) -> int:
        return self.qweight.shape[0] * values_per_word(self.bits)

    def apply(self, x: jnp.ndarray, kernel: str = "xla") -> jnp.ndarray:
        if kernel == "pallas":
            from ..kernels import quant_matmul_pallas

            return quant_matmul_pallas(self, x)
        if kernel == "pallas-a8":
            # W4A8 serving mode (kernels/gemv_a8.py): int8-MXU base
            # product, FP weak columns; non-4-bit layers fall back to the
            # exact path inside quant_matmul
            from ..kernels import quant_matmul_pallas

            return quant_matmul_pallas(self, x, a8=True)
        return _apply_xla(self, x)


def dequantize_weight(p: PackedLinear, dtype=jnp.float32) -> jnp.ndarray:
    """Materialize the dequantized base matrix [in_padded, out].

    Weak columns and padding rows dequantize to exactly 0 (codes hold the
    zero-point there); weak columns are NOT scattered back here — use
    ``_apply_xla`` / the kernels for the full product.
    """
    if getattr(p, "layout", "paired") == "a8":
        from ..kernels.gemv_a8 import a8_unpack

        q = a8_unpack(p.qweight)
    else:
        q = unpack_int_weights(p.qweight, p.bits)
    w = q.astype(jnp.float32) * p.scales[None, :] - (p.scales * p.zeros)[None, :]
    return w.astype(dtype)


def _apply_xla(p: PackedLinear, x: jnp.ndarray) -> jnp.ndarray:
    """Plane-sum dequant-matmul (XLA path).

    Instead of materializing the dequantized matrix (the reference's prefill
    path, owq/quant.py:221-238), the product is decomposed per bit-plane:

        y_c = s_c * sum_p (x_chunk_p @ q_plane_p)_c  -  s_c z_c * sum(x)

    Each plane operand is a pure shift+mask of the packed words, which XLA
    can fuse into the dot's operand read; the zero-point term folds into a
    single per-column correction.  Mathematically identical to dequantizing
    (weak/padded rows cancel exactly: q == z there).
    """
    dtype = x.dtype
    in_pad = p.in_padded
    pad = in_pad - x.shape[-1]
    xp = jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(0, pad)]) if pad else x
    lead = xp.shape[:-1]
    nw = p.qweight.shape[0]
    v = in_pad // nw
    half = v // 2
    qw = jax.lax.stop_gradient(p.qweight).astype(jnp.uint32)
    mask = jnp.uint32((1 << p.bits) - 1)

    # TPU f32 matmuls default to bf16-reduced passes; keep the exact path
    # (f32 activations) at full precision
    prec = jax.lax.Precision.HIGHEST if dtype == jnp.float32 else None
    acc = None
    if getattr(p, "layout", "paired") == "a8":
        # A8 byte layout (4-bit only): nibble (b, h) at offset 8b+4h holds
        # logical rows h*4*nw + 4*i + b
        xv8 = xp.reshape(-1, 2, nw, 4)
        for b in range(4):
            for h in range(2):
                qpl = ((qw >> (8 * b + 4 * h)) & mask
                       ).astype(jnp.int32).astype(dtype)
                part = jnp.dot(xv8[:, h, :, b], qpl,
                               preferred_element_type=jnp.float32,
                               precision=prec)
                acc = part if acc is None else acc + part
    else:
        # pair-interleaved row assignment (core/packing.py): plane (k, h)
        # holds logical rows k*2*nw + 2*i + h
        xv = xp.reshape(-1, half, nw, 2)
        for pl in range(v):
            k, h = (pl, 0) if pl < half else (pl - half, 1)
            # (uint32 -> float is not a legal cast on TPU; hop via int32)
            qpl = ((qw >> plane_offset(p.bits, pl)) & mask
                   ).astype(jnp.int32).astype(dtype)
            part = jnp.dot(xv[:, k, :, h], qpl,
                           preferred_element_type=jnp.float32,
                           precision=prec)
            acc = part if acc is None else acc + part

    scales = jax.lax.stop_gradient(p.scales).astype(jnp.float32)
    zeros = jax.lax.stop_gradient(p.zeros).astype(jnp.float32)
    xsum = jnp.sum(xp.reshape(-1, in_pad).astype(jnp.float32), axis=-1,
                   keepdims=True)
    y = acc * scales[None, :] - xsum * (scales * zeros)[None, :]
    y = y.reshape(*lead, p.out_features)

    if p.n_out > 0:
        xo = jnp.take(x, p.out_ids, axis=-1)
        y = y + jnp.dot(xo, p.oweight.astype(dtype),
                        preferred_element_type=jnp.float32,
                        precision=(jax.lax.Precision.HIGHEST
                                   if dtype == jnp.float32 else None))
    y = y.astype(dtype)
    if p.bias is not None:
        y = y + p.bias.astype(dtype)
    return y


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class ShardedPackedLinear:
    """Row-parallel (input-axis sharded) packed linear for tensor parallelism.

    The plane-chunk layout packs whole input chunks into each word, so an
    input-sharded packed matrix cannot be sliced mid-array; instead each TP
    shard gets its own independently packed block, stacked on a leading
    shard axis (sharded with PartitionSpec('tp', ...)).  Inside shard_map the
    local slice has leading dim 1 — ``local()`` squeezes it into a plain
    PackedLinear whose outlier indices are local to the shard's input slice.

    ``bias`` is pre-divided by the shard count so the post-matmul psum
    reconstitutes it exactly once.
    """

    qweight: jnp.ndarray    # [S, nw_local, out]
    scales: jnp.ndarray     # [out] replicated
    zeros: jnp.ndarray      # [out] replicated
    oweight: jnp.ndarray    # [S, n_max, out]  zero rows where padded
    out_ids: jnp.ndarray    # [S, n_max] local indices (0 where padded)
    bias: Optional[jnp.ndarray]
    bits: int = dataclasses.field(metadata=dict(static=True))
    in_features_local: int = dataclasses.field(metadata=dict(static=True))

    @property
    def num_shards(self) -> int:
        return self.qweight.shape[0]

    def local(self) -> PackedLinear:
        """View the (shard-local, leading dim 1) slice as a PackedLinear."""
        return PackedLinear(
            qweight=self.qweight[0], scales=self.scales, zeros=self.zeros,
            oweight=self.oweight[0], out_ids=self.out_ids[0], bias=self.bias,
            bits=self.bits, in_features=self.in_features_local)

    def apply(self, x: jnp.ndarray, kernel: str = "xla") -> jnp.ndarray:
        return self.local().apply(x, kernel=kernel)


def shard_packed_rowwise(p: PackedLinear, shards: int) -> ShardedPackedLinear:
    """Re-pack a PackedLinear into ``shards`` independent input-row blocks."""
    from ..core.packing import pack_np, unpack_np

    if getattr(p, "layout", "paired") != "paired":
        raise NotImplementedError(
            "TP sharding of A8-layout weights is not supported; apply "
            "repack_model_a8 AFTER shard_model_tp (or serve A8 single-chip)")

    infeat, out = p.in_features, p.out_features
    if infeat % shards:
        raise ValueError(f"in_features {infeat} not divisible by {shards} shards")
    loc = infeat // shards
    codes = unpack_np(np.asarray(p.qweight), p.bits, infeat)  # [in, out]
    zeros_i = np.asarray(p.zeros).astype(np.int32)
    out_ids = np.asarray(p.out_ids)
    ow = np.asarray(p.oweight, np.float32)

    per_shard = [out_ids[(out_ids >= s * loc) & (out_ids < (s + 1) * loc)]
                 for s in range(shards)]
    n_max = max((len(ids) for ids in per_shard), default=0)
    n_max = max(n_max, 1) if p.n_out > 0 else 0

    qws, oids, ows = [], [], []
    for s in range(shards):
        qws.append(pack_np(codes[s * loc:(s + 1) * loc], p.bits, zero=zeros_i))
        ids = per_shard[s]
        pad = n_max - len(ids)
        lids = np.concatenate([ids - s * loc,
                               np.zeros(pad, np.int32)]).astype(np.int32)
        # rows of oweight for this shard's ids (zeros where padded)
        rows = np.zeros((n_max, out), np.float32)
        if len(ids):
            sel = np.searchsorted(out_ids, ids)
            rows[: len(ids)] = ow[sel]
        oids.append(lids)
        ows.append(rows)

    bias = None
    if p.bias is not None:
        bias = (np.asarray(p.bias, np.float32) / shards).astype(np.float32)
    return ShardedPackedLinear(
        qweight=jnp.asarray(np.stack(qws)),
        scales=p.scales, zeros=p.zeros,
        oweight=jnp.asarray(np.stack(ows), dtype=p.oweight.dtype),
        out_ids=jnp.asarray(np.stack(oids)),
        bias=None if bias is None else jnp.asarray(bias, dtype=p.scales.dtype),
        bits=p.bits, in_features_local=loc)


def pack_linear(W: np.ndarray, scale: np.ndarray, zero: np.ndarray,
                out_ids: np.ndarray, bits: int, *,
                sym: bool = False,
                bias: Optional[np.ndarray] = None,
                weight_dtype=jnp.bfloat16) -> PackedLinear:
    """Build a PackedLinear from a reconstructed weight.

    W: [out, in] float (fake-quantized base + full-precision weak columns,
    as produced by gptq_quantize — reference packs from the same layout,
    owq/quant.py:290-353).  scale/zero: [out].  out_ids: sorted weak-column
    indices into the input dim.  For symmetric grids the zero-point is
    shifted by 2**(bits-1) into the unsigned storage range, exactly like the
    reference (owq/quant.py:293-294).
    """
    W = np.asarray(W, np.float32)
    scale = np.asarray(scale, np.float32)
    zero = np.asarray(zero, np.float32)
    if sym:
        zero = zero + 2.0 ** (bits - 1)
    out_ids = np.asarray(out_ids, np.int32)
    out, infeat = W.shape
    in_pad, nw = padded_infeatures(infeat, bits)

    # weak columns -> full precision side matrix [n_out, out]
    oweight = W[:, out_ids].T.copy() if out_ids.size else np.zeros((0, out), np.float32)

    # integer codes; weak + padded positions carry the zero-point
    q = np.round(W / scale[:, None] + zero[:, None])
    q = np.clip(q, 0, 2 ** bits - 1).astype(np.int32)  # asym grid (packed runtime)
    q[:, out_ids] = zero.astype(np.int32)[:, None]
    qT = np.full((in_pad, out), 0, np.int32)
    qT[:infeat] = q.T
    if in_pad > infeat:
        qT[infeat:] = zero.astype(np.int32)[None, :]

    from ..native import fast_pack

    qweight = fast_pack(qT, bits)  # C++ fast path (None when unavailable)
    if qweight is None:
        qweight = np.asarray(pack_int_weights(jnp.asarray(qT), bits))
    return PackedLinear(
        qweight=jnp.asarray(qweight),
        scales=jnp.asarray(scale),
        zeros=jnp.asarray(zero),
        oweight=jnp.asarray(oweight, dtype=weight_dtype),
        out_ids=jnp.asarray(out_ids),
        bias=None if bias is None else jnp.asarray(bias, dtype=weight_dtype),
        bits=bits,
        in_features=infeat,
    )
