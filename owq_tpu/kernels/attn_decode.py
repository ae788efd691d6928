"""Fused single-token decode attention: cache append + masked softmax
attention in ONE pallas kernel per layer.

Motivation (xplane, llama-7b B=1 decode step, round 3): after the matmul
fusion (gemv_fused.py) the remaining per-layer glue is the attention
small-op chain — per-layer cache slice, two dynamic-update-slices for the
new token's K/V, the QK product, softmax, the AV product, and their
casts/fusions — ~8 separate XLA launches per layer, ~0.25 ms/token total
at S=128.  Each is microseconds of work wearing a launch's worth of
overhead.  This kernel replaces the whole chain:

    (q, k_new, v_new roped, [L,1,S,Hkv,hd] caches, pos) ->
        ctx = softmax(mask(q @ K[<=pos]^T)) @ V[<=pos]
        K[layer, 0, pos] = k_new ; V[layer, 0, pos] = v_new  (in-place DMA)

Design notes:

* The caches are taken in their NATIVE [L, B=1, S, Hkv, hd] shape and
  aliased input->output.  In that layout only the trailing (Hkv, hd)
  dims are tiled, so S is freely sliceable: the new token's K/V row is
  ONE in-place 8KB DMA at a dynamic offset — no XLA
  dynamic-update-slice restage, no per-layer cache slice op, and no
  outside reshape (an [L,S,Hkv*hd] flatten is NOT layout-free against
  the (8,128)-tiled 5D buffer and costs two 8MB cache copies per step —
  measured before this design).
* Compute stays in the value layout the slab loads with ([S, Hkv, hd],
  leading S untiled): QK is an elementwise product with a lane reduce
  over hd, softmax runs over the untiled S axis, and AV is a broadcast
  multiply with an S reduce.  The only relayout is the tiny [S, Hkv]
  probability array growing a lane dim — 16KB, noise.
* The new token never touches the cached slab in VMEM: its QK score and
  V row are patched in with ``where(s == pos, ...)`` masks, so the slab
  read / row write DMAs have no ordering hazard (row ``pos`` of the
  read is discarded).
* GQA folds the group dimension into the kernel: queries arrive as
  [rep, Hkv, hd] (head g*rep+r in row r, matching HF repeat_interleave);
  each row runs the same pipeline against the shared KV slab.

Numerics match models/layers.py::attention_core: bf16 inputs, f32 QK
products and softmax, probabilities cast to bf16 before the f32-accumulated
AV product (HF upcasting behavior).

Reference mapping: the reference has no decode-attention kernel at all —
its decode step crosses Python->CUDA once per QuantLinear and runs
attention through stock HF modules (torch sdpa); the TPU cost model is
launch-overhead-bound at B=1, which is why this fusion exists here.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["attn_decode_step", "attn_decode_reference",
           "attn_decode_applicable"]

# VMEM budget: ~12 bytes/element of [S, Hkv*hd] across slabs + f32 temps.
_VMEM_BYTES = 24 << 20


def attn_decode_applicable(S: int, Hkv: int, hd: int, rep: int) -> bool:
    # hd is the LANE dim of the [S, Hkv, hd] slabs — it must be a full
    # 128-lane tile itself; an (Hkv*hd) % 128 check alone would admit
    # e.g. Hkv=2, hd=64, a shape the kernel is not validated on.
    return (hd % 128 == 0 and S % 8 == 0 and rep >= 1
            and S * Hkv * hd * 12 <= _VMEM_BYTES)


def _attn_kernel(pos_ref, q_ref, kn_ref, vn_ref, k_hbm, v_hbm,
                 ctx_ref, ko_ref, vo_ref,
                 kslab, vslab, knew_s, vnew_s, sems, *,
                 layer: int, S: int, rep: int, scale: float):
    pos = pos_ref[0, 0]

    kread = pltpu.make_async_copy(k_hbm.at[layer, 0], kslab, sems.at[0])
    vread = pltpu.make_async_copy(v_hbm.at[layer, 0], vslab, sems.at[1])
    kread.start()
    vread.start()

    # stage the new row and send it to the cache while the slabs stream in
    # (S is an untiled dim of the 5D cache layout, so the 1-row dynamic
    # slice is legal; row ``pos`` of the slab read is discarded below, so
    # the read/write overlap has no ordering hazard)
    knew_s[:] = kn_ref[:]
    vnew_s[:] = vn_ref[:]
    kwrite = pltpu.make_async_copy(
        knew_s, k_hbm.at[layer, 0, pl.ds(pos, 1)], sems.at[2])
    vwrite = pltpu.make_async_copy(
        vnew_s, v_hbm.at[layer, 0, pl.ds(pos, 1)], sems.at[3])
    kwrite.start()
    vwrite.start()

    sidx = jax.lax.broadcasted_iota(jnp.int32, (S, 1), 0)
    valid = sidx <= pos                                     # [S, 1]
    is_new = sidx == pos
    is_new3 = is_new[:, :, None]                            # [S, 1, 1]

    kf_new = kn_ref[:].astype(jnp.float32)                  # [1, Hkv, hd]
    vf_new = vn_ref[:]                                      # [1, Hkv, hd]

    kread.wait()
    vread.wait()
    kf = kslab[:].astype(jnp.float32)                       # [S, Hkv, hd]
    # row ``pos`` of the slab is stale (pre-write) — patch locally
    vpat = jnp.where(is_new3, vf_new, vslab[:]).astype(jnp.float32)

    for r in range(rep):
        qr = q_ref[r:r + 1].astype(jnp.float32)             # [1, Hkv, hd]
        scores = jnp.sum(kf * qr, axis=-1)                  # [S, Hkv]
        snew = jnp.sum(kf_new * qr, axis=-1)                # [1, Hkv]
        scores = jnp.where(is_new, snew, scores) * scale
        scores = jnp.where(valid, scores, -1e30)
        m = jnp.max(scores, axis=0, keepdims=True)
        e = jnp.exp(scores - m)
        probs = (e / jnp.sum(e, axis=0, keepdims=True)).astype(jnp.bfloat16)
        pb = probs.astype(jnp.float32)[:, :, None]          # [S, Hkv, 1]
        ctx = jnp.sum(pb * vpat, axis=0, keepdims=True)     # [1, Hkv, hd]
        ctx_ref[r:r + 1] = ctx.astype(ctx_ref.dtype)

    kwrite.wait()
    vwrite.wait()
    del ko_ref, vo_ref  # aliased to k_hbm/v_hbm; updated via the DMAs


@functools.partial(jax.jit, static_argnames=("layer", "scale"),
                   donate_argnums=(3, 4))
def attn_decode_step(q: jnp.ndarray, k_new: jnp.ndarray, v_new: jnp.ndarray,
                     k_stack: jnp.ndarray, v_stack: jnp.ndarray,
                     pos: jnp.ndarray, *, layer: int, scale: float
                     ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """One layer's single-token decode attention, cache updated in place.

    q: [rep, Hkv, hd] bf16 (roped, query head g*rep+r in row r)
    k_new/v_new: [1, Hkv, hd] bf16 (roped new token)
    k_stack/v_stack: [L, 1, S, Hkv, hd] cache (aliased into the outputs)
    pos: int32 scalar — number of tokens already cached
    Returns (ctx [rep, Hkv, hd] bf16, k_stack, v_stack).

    The stacks are DONATED: when this runs as a top-level jit (tests,
    tools), the pallas input_output_aliases would otherwise force XLA
    copy-insertion of both full [L,1,S,Hkv,hd] stacks every call.  Inside
    the jitted decode scan the loop carry already runs in place and the
    donation is a no-op.
    """
    L, B, S, Hkv, hd = k_stack.shape
    rep = q.shape[0]
    assert B == 1 and q.shape == (rep, Hkv, hd)
    assert k_new.shape == (1, Hkv, hd)
    assert attn_decode_applicable(S, Hkv, hd, rep)
    # slabs/scratch are cache-dtype; bf16 inputs land in them directly
    assert k_stack.dtype == jnp.bfloat16 and v_stack.dtype == jnp.bfloat16

    ctx, k_out, v_out = pl.pallas_call(
        functools.partial(_attn_kernel, layer=layer, S=S, rep=rep,
                          scale=scale),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),   # pos [1,1]
            pl.BlockSpec(memory_space=pltpu.VMEM),   # q
            pl.BlockSpec(memory_space=pltpu.VMEM),   # k_new
            pl.BlockSpec(memory_space=pltpu.VMEM),   # v_new
            pl.BlockSpec(memory_space=pltpu.ANY),    # k_stack
            pl.BlockSpec(memory_space=pltpu.ANY),    # v_stack
        ],
        out_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),   # ctx
            pl.BlockSpec(memory_space=pltpu.ANY),    # k_stack (alias)
            pl.BlockSpec(memory_space=pltpu.ANY),    # v_stack (alias)
        ],
        out_shape=[
            jax.ShapeDtypeStruct((rep, Hkv, hd), jnp.bfloat16),
            jax.ShapeDtypeStruct(k_stack.shape, k_stack.dtype),
            jax.ShapeDtypeStruct(v_stack.shape, v_stack.dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((S, Hkv, hd), k_stack.dtype),
            pltpu.VMEM((S, Hkv, hd), v_stack.dtype),
            pltpu.VMEM((1, Hkv, hd), k_stack.dtype),
            pltpu.VMEM((1, Hkv, hd), v_stack.dtype),
            pltpu.SemaphoreType.DMA((4,)),
        ],
        input_output_aliases={4: 1, 5: 2},
        cost_estimate=pl.CostEstimate(
            flops=4 * rep * S * Hkv * hd,
            bytes_accessed=2 * S * Hkv * hd * 2 + 4 * Hkv * hd,
            transcendentals=rep * S),
        name="owq_attn_decode",
    )(pos.reshape(1, 1).astype(jnp.int32),
      q.astype(jnp.bfloat16), k_new.astype(jnp.bfloat16),
      v_new.astype(jnp.bfloat16), k_stack, v_stack)
    return ctx, k_out, v_out


def attn_decode_reference(q, k_new, v_new, k_stack, v_stack, pos, *,
                          layer: int, scale: float):
    """Pure-jnp reference with identical math (CPU tests / fallback)."""
    L, B, S, Hkv, hd = k_stack.shape
    rep = q.shape[0]
    k_stack = jax.lax.dynamic_update_slice(
        k_stack, k_new.astype(k_stack.dtype)[None, None],
        (layer, 0, pos, 0, 0))
    v_stack = jax.lax.dynamic_update_slice(
        v_stack, v_new.astype(v_stack.dtype)[None, None],
        (layer, 0, pos, 0, 0))
    kf = k_stack[layer, 0].astype(jnp.float32)              # [S, Hkv, hd]
    vf = v_stack[layer, 0].astype(jnp.float32)
    sidx = jnp.arange(S, dtype=jnp.int32)[:, None]
    valid = sidx <= pos
    outs = []
    for r in range(rep):
        qr = q[r:r + 1].astype(jnp.float32)
        scores = jnp.sum(kf * qr, axis=-1) * scale          # [S, Hkv]
        scores = jnp.where(valid, scores, -1e30)
        m = jnp.max(scores, axis=0, keepdims=True)
        e = jnp.exp(scores - m)
        probs = (e / jnp.sum(e, axis=0, keepdims=True)).astype(jnp.bfloat16)
        pb = probs.astype(jnp.float32)[:, :, None]
        outs.append(jnp.sum(pb * vf, axis=0, keepdims=True))
    ctx = jnp.concatenate(outs, axis=0).astype(jnp.bfloat16)
    return ctx, k_stack, v_stack
