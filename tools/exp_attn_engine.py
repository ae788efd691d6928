"""[EXPERIMENT — parked with receipts, lives under tools/ not the package]

Batched decode attention for the continuous-batching engine: per-slot
VALID-LENGTH cache reads + in-place appends on the [L, B, S, Hkv, hd]
stacks, as one pallas program per layer.

Why (xplane on the engine window, tools/profile_engine.py, round 4): the
XLA attention chain at B slots reads the FULL [B, S_pool] cache slice
every step regardless of how much history each slot actually holds, and
the slice → dynamic-update → attend → scatter-back chain adds staging
copies on top.  At b8/S=160 on llama-7b that is ~42 MB/layer/step of
mostly-dead reads (~1.8 ms/step of the 6.4 ms device step).  This kernel
reads each slot's K/V in C-row chunks with a DYNAMIC trip count
ceil(pos_b / C) — a slot with 30 tokens of history reads one chunk, not
S_pool rows — double-buffered so chunk DMAs overlap the softmax math,
and appends the new K/V rows in place via input_output_aliases (no XLA
scatter, no staging copy).

Numerics: online (flash-style) softmax over chunks in f32, initialized
from the new token's own score (exp(0) = 1), weighted-V accumulation in
f32.  The jnp twin computes the same two-pass; parity is ~1e-7 rel-MSE
(f32 reassociation only).

Reference mapping: the reference has no batched serving engine at all —
its benchmark decodes B=1 with torch sdpa per block
(/root/reference/main.py:305-353).  This kernel is the TPU-native
attention for the beyond-reference engine (BASELINE config #4 analogue).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["engine_attn_step", "engine_attn_reference",
           "engine_attn_applicable"]

_VMEM_BYTES = 40 << 20


def _pick_chunk(S: int) -> int:
    """Largest divisor of S that is a multiple of 8 and <= 256.

    Chunks trade DMA descriptor overhead (~a few us apiece on this part,
    so chunks should carry >= ~1 MB) against valid-length granularity (a
    slot reads ceil(pos/C) chunks, not the whole pool).  256 rows at
    llama-7b MHA is a 2 MB k-chunk; short pools (S <= 256) use one
    full-slab DMA per slot and win purely by skipping XLA's staging.
    """
    best = 0
    c = 8
    while c <= min(S, 256):
        if S % c == 0:
            best = c
        c += 8
    return best


def engine_attn_applicable(B: int, S: int, Hkv: int, hd: int, rep: int
                           ) -> bool:
    C = _pick_chunk(S)
    if C == 0 or hd % 128 != 0 or rep < 1 or B < 1 or B > 32:
        return False
    vmem = (2 * 4 * C * Hkv * hd * 2          # k/v chunk rings (4 slots)
            + 3 * B * rep * Hkv * hd * 4)     # q + ctx staging
    return vmem <= _VMEM_BYTES


def _kernel(pos_ref, q_ref, kn_ref, vn_ref, k_hbm, v_hbm,
            ctx_ref, ko_ref, vo_ref,
            kring, vring, sched_b, sched_c, ksem, vsem, wsem, *,
            B: int, S: int, C: int, Hkv: int, hd: int, rep: int,
            layer: int, scale: float):
    Hq = rep * Hkv
    maxn = B * (S // C)

    # start the appends first: B small row writes, fully overlapped with
    # the attention math below (pos clamped — a slot that hit EOS
    # mid-window keeps "advancing" on garbage like the XLA path, where
    # OOB scatter rows are dropped; here they land on row S-1, which the
    # slot's next prefill overwrites wholesale)
    writes = []
    for b in range(B):
        pw = jnp.minimum(pos_ref[b], S - 1)
        kw = pltpu.make_async_copy(
            kn_ref.at[pl.ds(b, 1)], k_hbm.at[layer, b, pl.ds(pw, 1)],
            wsem.at[2 * b])
        vw = pltpu.make_async_copy(
            vn_ref.at[pl.ds(b, 1)], v_hbm.at[layer, b, pl.ds(pw, 1)],
            wsem.at[2 * b + 1])
        kw.start()
        vw.start()
        writes.append((kw, vw))

    def init_state(b):
        """Online-softmax state after the new token's own position:
        m = its score, l = exp(0) = 1, acc = v_new.  ``b`` may be traced
        (pl.ds dynamic row loads)."""
        qb = q_ref[pl.ds(b, 1)].astype(jnp.float32).reshape(Hkv, rep, hd)
        kn = kn_ref[pl.ds(b, 1)].astype(jnp.float32).reshape(Hkv, hd)
        vn = vn_ref[pl.ds(b, 1)].astype(jnp.float32).reshape(Hkv, hd)
        m0 = jnp.stack([jnp.sum(kn * qb[:, r, :], axis=-1) * scale
                        for r in range(rep)])                  # [rep, Hkv]
        l0 = jnp.ones((rep, Hkv), jnp.float32)
        acc0 = jnp.broadcast_to(vn[None], (rep, Hkv, hd)
                                ) + jnp.zeros((rep, Hkv, hd), jnp.float32)
        return qb, m0, l0, acc0

    # every slot's no-history answer up front (softmax over the new token
    # alone = v_new); slots with chunks get overwritten by their flush
    for b in range(B):
        vn = vn_ref[b].astype(jnp.float32)
        out0 = jnp.broadcast_to(vn[:, None], (Hkv, rep, hd)
                                ).reshape(Hq, hd)
        ctx_ref[b] = out0.astype(ctx_ref.dtype)

    # --- flat (slot, chunk) schedule in SMEM: chunks of every slot laid
    # out back to back so the 2-slot DMA ring streams across slot
    # boundaries without a gap -------------------------------------------
    def build(b, n):
        pos = jnp.minimum(pos_ref[b], S - 1)
        nch = (pos + C - 1) // C

        def put(c, n):
            sched_b[n] = b
            sched_c[n] = c
            return n + 1

        return jax.lax.fori_loop(0, nch, put, n)

    total = jax.lax.fori_loop(0, B, build, 0)
    # pad one lookahead entry so the i+1 prefetch read never goes OOB
    sched_b[jnp.minimum(total, maxn)] = 0
    sched_c[jnp.minimum(total, maxn)] = 0

    def kdma(slot, b, c):
        return pltpu.make_async_copy(
            k_hbm.at[layer, b, pl.ds(c * C, C)], kring.at[slot],
            ksem.at[slot])

    def vdma(slot, b, c):
        return pltpu.make_async_copy(
            v_hbm.at[layer, b, pl.ds(c * C, C)], vring.at[slot],
            vsem.at[slot])

    for j in range(3):  # prime the 4-slot ring 3 deep
        @pl.when(j < total)
        def _(j=j):
            kdma(j, sched_b[j], sched_c[j]).start()
            vdma(j, sched_b[j], sched_c[j]).start()

    cidx = jax.lax.broadcasted_iota(jnp.int32, (C, 1), 0)
    qb0, m0, l0, acc0 = init_state(0)

    def body(i, carry):
        qb, m, l, acc = carry
        b = sched_b[i]
        c = sched_c[i]
        slot = jax.lax.rem(i, 4)

        @pl.when(i + 3 < total)
        def _():
            nslot = jax.lax.rem(i + 3, 4)
            kdma(nslot, sched_b[i + 3], sched_c[i + 3]).start()
            vdma(nslot, sched_b[i + 3], sched_c[i + 3]).start()

        # first chunk of a slot: swap in its fresh state (pl.when can't
        # rebind the carry, so select)
        is_first = c == 0
        qbn, mn, ln, accn = init_state(b)
        sel = lambda a, bb: jnp.where(is_first, a, bb)  # noqa: E731
        qb = sel(qbn, qb)
        m, l, acc = sel(mn, m), sel(ln, l), sel(accn, acc)

        kdma(slot, b, c).wait()
        vdma(slot, b, c).wait()
        kc = kring[slot].astype(jnp.float32)                   # [C,Hkv,hd]
        vc = vring[slot].astype(jnp.float32)
        pos = jnp.minimum(pos_ref[b], S - 1)
        valid = (c * C + cidx) < pos                           # [C, 1]
        ms, ls, accs = [], [], []
        for r in range(rep):
            s = jnp.sum(kc * qb[:, r, :][None], axis=-1) * scale
            s = jnp.where(valid, s, -1e30)                     # [C, Hkv]
            mr = jnp.maximum(m[r], jnp.max(s, axis=0))         # [Hkv]
            alpha = jnp.exp(m[r] - mr)
            p = jnp.exp(s - mr[None, :])                       # [C, Hkv]
            ls.append(alpha * l[r] + jnp.sum(p, axis=0))
            accs.append(alpha[:, None] * acc[r]
                        + jnp.sum(p[:, :, None] * vc, axis=0))
            ms.append(mr)
        m = jnp.stack(ms)
        l = jnp.stack(ls)
        acc = jnp.stack(accs)

        # last chunk of this slot: flush its context row
        is_last = jnp.logical_or(i + 1 >= total, sched_b[i + 1] != b)

        @pl.when(is_last)
        def _():
            ctx = acc / l[:, :, None]                          # [rep,Hkv,hd]
            out = ctx.transpose(1, 0, 2).reshape(Hq, hd)       # head-major
            ctx_ref[pl.ds(b, 1)] = out[None].astype(ctx_ref.dtype)

        return (qb, m, l, acc)

    jax.lax.fori_loop(0, total, body, (qb0, m0, l0, acc0))

    for kw, vw in writes:
        kw.wait()
        vw.wait()
    del ko_ref, vo_ref  # aliased; updated by the row-write DMAs


@functools.partial(jax.jit,
                   static_argnames=("layer", "scale", "rep"),
                   donate_argnums=(3, 4))
def engine_attn_step(q: jnp.ndarray, k_new: jnp.ndarray, v_new: jnp.ndarray,
                     k_stack: jnp.ndarray, v_stack: jnp.ndarray,
                     pos: jnp.ndarray, *, layer: int, scale: float,
                     rep: int) -> Tuple[jnp.ndarray, jnp.ndarray,
                                        jnp.ndarray]:
    """One engine decode step's attention for every slot; caches in place.

    q [B, Hq, hd] / k_new, v_new [B, Hkv, hd]: post-rope bf16.
    k_stack/v_stack [L, B, S, Hkv, hd] bf16, updated IN PLACE (donated).
    pos [B]: per-slot write index (rows < pos are valid history).
    Returns (ctx [B, Hq*hd] bf16 head-major, k_stack, v_stack).
    """
    L, B, S, Hkv, hd = k_stack.shape
    Hq = rep * Hkv
    assert q.shape == (B, Hq, hd)
    assert k_new.shape == (B, Hkv, hd) and v_new.shape == (B, Hkv, hd)
    C = _pick_chunk(S)
    assert engine_attn_applicable(B, S, Hkv, hd, rep)

    ctx, k_out, v_out = pl.pallas_call(
        functools.partial(_kernel, B=B, S=S, C=C, Hkv=Hkv, hd=hd, rep=rep,
                          layer=layer, scale=scale),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, Hq, hd), jnp.bfloat16),
            jax.ShapeDtypeStruct(k_stack.shape, k_stack.dtype),
            jax.ShapeDtypeStruct(v_stack.shape, v_stack.dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((4, C, Hkv, hd), k_stack.dtype),
            pltpu.VMEM((4, C, Hkv, hd), v_stack.dtype),
            pltpu.SMEM((B * (S // C) + 1,), jnp.int32),
            pltpu.SMEM((B * (S // C) + 1,), jnp.int32),
            pltpu.SemaphoreType.DMA((4,)),
            pltpu.SemaphoreType.DMA((4,)),
            pltpu.SemaphoreType.DMA((2 * B,)),
        ],
        input_output_aliases={4: 1, 5: 2},
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_BYTES + (8 << 20)),
        cost_estimate=pl.CostEstimate(
            flops=4 * B * rep * S * Hkv * hd,
            bytes_accessed=2 * B * S * Hkv * hd * 2,
            transcendentals=B * rep * S,
        ),
        name="owq_engine_attn",
    )(pos.astype(jnp.int32),
      q.astype(jnp.bfloat16), k_new.astype(jnp.bfloat16),
      v_new.astype(jnp.bfloat16), k_stack, v_stack)
    return ctx.reshape(B, Hq * hd), k_out, v_out


def engine_attn_reference(q, k_new, v_new, k_stack, v_stack, pos, *,
                          layer, scale, rep):
    """Pure-jnp twin: two-pass masked softmax per slot (CPU tests /
    fallback)."""
    L, B, S, Hkv, hd = k_stack.shape
    Hq = rep * Hkv
    pw = jnp.minimum(pos, S - 1)                               # [B]
    bidx = jnp.arange(B)
    k2 = k_stack.at[layer, bidx, pw].set(k_new.astype(k_stack.dtype))
    v2 = v_stack.at[layer, bidx, pw].set(v_new.astype(v_stack.dtype))
    kf = k2[layer].astype(jnp.float32)                         # [B,S,Hkv,hd]
    vf = v2[layer].astype(jnp.float32)
    qf = q.astype(jnp.float32).reshape(B, Hkv, rep, hd)
    sidx = jnp.arange(S)[None, :]                              # [1, S]
    valid = (sidx < pw[:, None]) | (sidx == pw[:, None])       # [B, S]
    outs = []
    for r in range(rep):
        qh = qf[:, :, r, :]                                    # [B,Hkv,hd]
        s = jnp.einsum("bshd,bhd->bsh", kf, qh) * scale        # [B,S,Hkv]
        s = jnp.where(valid[:, :, None], s, -1e30)
        p = jax.nn.softmax(s, axis=1)
        outs.append(jnp.einsum("bsh,bshd->bhd", p, vf))        # [B,Hkv,hd]
    ctx = jnp.stack(outs, axis=2)                              # [B,Hkv,rep,hd]
    ctx = ctx.reshape(B, Hq, hd)  # head-major: h = g*rep + r
    return (ctx.reshape(B, Hq * hd).astype(jnp.bfloat16), k2, v2)
