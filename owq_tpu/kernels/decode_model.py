"""WHOLE-MODEL B=1 decode step as ONE pallas program.

The full-layer mega kernel (decode_block.py) removed every in-layer gap,
but a 32-layer decode still paid 32 kernel launches, 32 XLA hidden-state
stagings between them, 32 weight-ring warmups — and then left the final
rmsnorm + dense lm_head matvec (262 MB bf16 on llama-7b) as separate XLA
ops.  At ~110 us of weight stream per layer, each boundary bubble is pure
dead HBM time on a B=1 serial chain.

This kernel runs the ENTIRE model in one program:

    copy x into a VMEM-resident hidden-state buffer
    fori_loop over layers:                       # dynamic layer index l
        DMA layer l's aux bundles (scale/zero rows, weak-column
            selectors/side-products — ~1.4 MB, waited lazily under the
            ring warmup; the norm gammas stay fully VMEM-resident)
        qkv ring | o full prefetch | cache slabs  (decode_block.py flow)
        rmsnorm -> qkv matvec -> rope -> in-place cache row write ->
        masked softmax attention -> o matvec (+residual) ->
        ln2 -> gate|up ring -> swiglu -> down ring (+residual)
        ... the weight stream crosses the layer boundary WITHOUT leaving
        the program: no launch, no staging, no re-warmed ring
    final rmsnorm -> dense bf16 lm_head ring -> logits

Weights are stacked per kind ([L, nw, out] int32) so the rings index
layer l dynamically in their DMA slices; the o projection's packed rows
are rep-major permuted per layer exactly like the per-layer kernel
(runtime/fuse.py::_permute_packed_rows).  All per-layer epilogue data is
pre-bundled at prep time (runtime/fuse.py::prepare_model_kernel) into
FOUR stacked arrays — f32 scale/zero rows [L, 2, ΣOUT], bf16 weak-column
selectors, bf16 side-product rows [L, C, ΣOUT], bf16 norm gammas — so a
layer costs 5 aux DMAs, not 14.  Weak-column counts are zero-padded to a
common width C: zero selector/side-product columns are mathematically
no-ops, so heterogeneous n_out per projection/layer needs no branches.

Numerics: identical to the composed layer_block_step chain — same matvec
accumulation, rope rounding, f32 softmax, bf16 hidden carries; the head
matvec is a bf16 dot with f32 accumulation rounded to bf16 logits like
the XLA unembed path.

Reference mapping: the reference's whole decode step is 7·L CUDA matvec
launches + torch sdpa + an fp16 cuBLAS head (owq/quant.py:413-429,
main.py:305-353); this is its TPU restructuring into a single
stream-saturating program.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..core.packing import values_per_word
from .decode_block import (_DN_SLOTS, _SLOTS, _VMEM_BYTES, _matvec_acc,
                           _pick_tile, _tiles)

__all__ = ["model_block_step", "model_block_reference",
           "model_block_applicable"]


def _vmem_base(L, S, Hkv, hd, out_q, nw_q, to_q, out_o, nw_o, to_o,
               out_g, nw_g, to_g, out_d, nw_d, to_d, vocab, cols) -> int:
    """VMEM bytes excluding the head ring."""
    hidden = out_o
    out_tot = out_q + out_o + out_g + out_d
    in_d = out_g // 2
    return (_SLOTS * nw_q * to_q * 4          # qkv ring
            + nw_o * out_o * 4                # o full prefetch
            + _SLOTS * nw_g * to_g * 4        # gate|up ring
            + _DN_SLOTS * nw_d * to_d * 4     # down ring
            + 2 * S * Hkv * hd * 2            # cache slabs
            + 8 * out_q * 4 + 8 * out_g * 2   # qkv f32 + gu bf16 scratch
            + 2 * 8 * hidden * 2              # hidden carries (x, h)
            + 2 * out_tot * 4                 # aux: sz bundle
            + hidden * 3 * cols * 2           #   sel q|o|g
            + in_d * cols * 2                 #   sel d
            + cols * out_tot * 2              #   ow bundle
            + L * 2 * hidden * 2              # gammas (fully resident)
            + 2 * vocab * 4 + hidden * 8 * 2 + 8 * vocab * 2  # head aux
            + 8 * vocab * 2)                  # logits


def _head_tile(vocab: int, hidden: int, budget: int = 10 << 20,
               nw_h: int = 0) -> int:
    """Largest lane tile whose 4-slot ring fits ``budget`` — bigger tiles
    mean longer contiguous DMA strips for the head stream.  ``nw_h`` > 0
    sizes a PACKED head ring (int32 words) instead of dense bf16."""
    for to in (1024, 512, 256, 128):
        slot = nw_h * to * 4 if nw_h else hidden * to * 2
        if vocab % to == 0 and _SLOTS * slot <= budget:
            return to
    return 0


def model_block_applicable(L: int, S: int, Hkv: int, hd: int, rep: int,
                           out_q: int, nw_q: int, out_o: int, nw_o: int,
                           out_g: int, nw_g: int, out_d: int, nw_d: int,
                           vocab: int, cols: int, nw_h: int = 0) -> bool:
    from .decode_block import layer_block_applicable

    if not layer_block_applicable(S, Hkv, hd, rep, out_q, nw_q, out_o,
                                  nw_o, out_g, nw_g, out_d, nw_d):
        return False
    hidden = out_o
    if rep * Hkv * hd != hidden or cols % 8 != 0:
        return False
    to_q, to_o = _tiles(out_q, nw_q, out_o, nw_o)
    to_g = _pick_tile(out_g, nw_g, (12 << 20) // _SLOTS)
    to_d = _pick_tile(out_d, nw_d, (12 << 20) // _DN_SLOTS)
    base = _vmem_base(L, S, Hkv, hd, out_q, nw_q, to_q, out_o, nw_o, to_o,
                      out_g, nw_g, to_g, out_d, nw_d, to_d, vocab, cols)
    to_h = _head_tile(vocab, hidden, _VMEM_BYTES - base, nw_h)
    return to_h != 0


def _model_kernel(pos_ref, x_ref, crow_ref, srow_ref, gf_ref, gam_ref,
                  hsz_ref, hsel_ref, how_ref,
                  sz_hbm, selqog_hbm, seld_hbm, ow_hbm,
                  k_hbm, v_hbm, wq_hbm, wo_hbm, wg_hbm, wd_hbm, head_hbm,
                  logits_ref, ko_ref, vo_ref,
                  qring, obuf, gring, dring, hring,
                  kslab, vslab, knew_s, vnew_s, qkv_s, gu_s, x_s, h_s,
                  sz_b, selqog_b, seld_b, ow_b,
                  qsem, osem, gsem, dsem, hsem, csem, asem, *,
                  L: int, bits: int, half: int, to_q: int, n_q: int,
                  to_o: int, n_o: int, to_g: int, n_g: int, to_d: int,
                  n_d: int, to_h: int, n_h: int, slots: int, dslots: int,
                  S: int, rep: int, Hkv: int, hd: int, scale: float,
                  eps: float, in_q: int, pad_q: int, in_o: int, pad_o: int,
                  in_d: int, pad_d: int, cols: int, rows_pad: int,
                  head_packed: bool, nw_h: int, pad_h: int, out_dtype):
    pos = pos_ref[0, 0]
    two_nw_q = 2 * wq_hbm.shape[1]
    two_nw_o = 2 * wo_hbm.shape[1]
    two_nw_g = 2 * wg_hbm.shape[1]
    two_nw_d = 2 * wd_hbm.shape[1]
    # static column offsets of each projection inside the ΣOUT bundles
    off_q = 0
    off_o = n_q * to_q
    off_g = off_o + n_o * to_o
    off_d = off_g + n_g * to_g

    x_s[:] = x_ref[:]

    def aux_dmas(l):
        return (pltpu.make_async_copy(sz_hbm.at[l], sz_b, asem.at[0]),
                pltpu.make_async_copy(selqog_hbm.at[l], selqog_b,
                                      asem.at[1]),
                pltpu.make_async_copy(seld_hbm.at[l], seld_b, asem.at[2]),
                pltpu.make_async_copy(ow_hbm.at[l], ow_b, asem.at[3]))

    for d in aux_dmas(0):
        d.start()

    def layer_body(l, _):
        def ring(w_hbm, rbuf, sem, to):
            def dma(slot, tile):
                return pltpu.make_async_copy(
                    w_hbm.at[l, :, pl.ds(tile * to, to)], rbuf.at[slot],
                    sem.at[slot])
            return dma

        qdma = ring(wq_hbm, qring, qsem, to_q)
        gdma = ring(wg_hbm, gring, gsem, to_g)
        ddma = ring(wd_hbm, dring, dsem, to_d)

        def odma(tile):
            return pltpu.make_async_copy(
                wo_hbm.at[l, :, pl.ds(tile * to_o, to_o)], obuf.at[tile],
                osem.at[tile])

        # layer l's aux bundles were PREFETCHED at the end of layer
        # l-1 (prologue for l=0) into the single aux buffers — safe
        # because every read of them finishes before the down loop ends,
        # and they hold a full layer's flight time before first use.
        # The norm gammas live fully VMEM-resident ([L, 2, hidden]).
        a_sz, a_sel, a_sd, a_ow = aux_dmas(l)

        # qkv ring + cache slabs in flight up front.  The o prefetch
        # and gate|up warmup are deliberately issued LATE (inside the
        # last qkv tile, below): issued up front they land during the
        # qkv stream and the bus then sits idle through the rope +
        # attention VPU phase — issued late, their ~10 MB stream covers
        # exactly that compute.
        for s in range(min(slots - 1, n_q)):
            qdma(s, s).start()
        kread = pltpu.make_async_copy(k_hbm.at[l, 0], kslab, csem.at[0])
        vread = pltpu.make_async_copy(v_hbm.at[l, 0], vslab, csem.at[1])
        kread.start()
        vread.start()

        g1 = gam_ref[l, 0:1, :]
        g2 = gam_ref[l, 1:2, :]

        # --- rmsnorm + qkv matvec ------------------------------------
        xf = x_s[:].astype(jnp.float32)
        ms = jnp.sum(xf * xf, axis=1, keepdims=True) * (1.0 / in_q)
        xn = xf * jax.lax.rsqrt(ms + eps) * g1.astype(jnp.float32)
        xb = xn.astype(jnp.bfloat16)
        xsum = jnp.sum(xn, axis=1, keepdims=True)
        a_sel.wait()
        # selqog is stored TRANSPOSED [3C, hidden] (128-aligned lane dim
        # for the layer-sliced HBM DMA); contract lanes against lanes
        xo = jax.lax.dot_general(
            xb, selqog_b[0:cols, :], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32).astype(jnp.bfloat16)
        if pad_q:
            xb = jnp.pad(xb, ((0, 0), (0, pad_q)))
        a_sz.wait()
        a_ow.wait()

        def qbody(tile, _):
            slot = tile % slots

            @pl.when(tile + slots - 1 < n_q)
            def _():
                qdma((tile + slots - 1) % slots, tile + slots - 1).start()

            @pl.when(tile == n_q - 1)
            def _():
                for t in range(n_o):
                    odma(t).start()
                for sg_ in range(min(slots - 1, n_g)):
                    gdma(sg_, sg_).start()

            qdma(slot, tile).wait()
            acc = _matvec_acc(xb, qring[slot], bits, half, two_nw_q)
            s = sz_b[0:1, pl.ds(off_q + tile * to_q, to_q)]
            c = sz_b[1:2, pl.ds(off_q + tile * to_q, to_q)]
            y = acc * s - xsum * c
            y = y + jnp.dot(xo, ow_b[:, pl.ds(off_q + tile * to_q, to_q)],
                            preferred_element_type=jnp.float32)
            qkv_s[:, pl.ds(tile * to_q, to_q)] = y
            return ()

        jax.lax.fori_loop(0, n_q, qbody, ())

        # --- split + rope + cache append -----------------------------
        Hq = rep * Hkv
        q_all = qkv_s[0:1, 0:Hq * hd].reshape(Hq, hd)
        k_lin = qkv_s[0:1, Hq * hd:(Hq + Hkv) * hd].reshape(Hkv, hd)
        v_lin = qkv_s[0:1, (Hq + Hkv) * hd:(Hq + 2 * Hkv) * hd
                      ].reshape(Hkv, hd)
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
            knew_s, k_hbm.at[l, 0, pl.ds(pos, 1)], csem.at[2])
        vwrite = pltpu.make_async_copy(
            vnew_s, v_hbm.at[l, 0, pl.ds(pos, 1)], csem.at[3])
        kwrite.start()
        vwrite.start()

        # --- attention ------------------------------------------------
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
            probs = (e / jnp.sum(e, axis=0, keepdims=True)
                     ).astype(jnp.bfloat16)
            pb = probs.astype(jnp.float32)[:, :, None]
            ctxs.append(jnp.sum(pb * vpat, axis=0))
        ctx = ctxs[0] if rep == 1 else jnp.concatenate(ctxs, axis=0)

        # --- o matvec (tiles landed during attention) ------------------
        xrow_b = ctx.reshape(1, in_o).astype(jnp.bfloat16)
        xrow_f = xrow_b.astype(jnp.float32)
        xsum_o = jnp.pad(jnp.sum(xrow_f, axis=1, keepdims=True),
                         ((0, rows_pad - 1), (0, 0)))
        xb_o = jnp.pad(xrow_b, ((0, rows_pad - 1), (0, pad_o)))
        xo_o = jax.lax.dot_general(
            xb_o[:, :in_o] if pad_o else xb_o,
            selqog_b[cols:2 * cols, :], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32).astype(jnp.bfloat16)

        def obody(tile, _):
            odma(tile).wait()
            acc = _matvec_acc(xb_o, obuf[tile], bits, half, two_nw_o)
            s = sz_b[0:1, pl.ds(off_o + tile * to_o, to_o)]
            c = sz_b[1:2, pl.ds(off_o + tile * to_o, to_o)]
            y = acc * s - xsum_o * c
            y = y + jnp.dot(xo_o, ow_b[:, pl.ds(off_o + tile * to_o, to_o)],
                            preferred_element_type=jnp.float32)
            y = y + x_s[:, pl.ds(tile * to_o, to_o)].astype(jnp.float32)
            h_s[:, pl.ds(tile * to_o, to_o)] = y.astype(jnp.bfloat16)
            return ()

        jax.lax.fori_loop(0, n_o, obody, ())

        # --- ln2 + gate|up matvec -------------------------------------
        h1 = h_s[:].astype(jnp.float32)
        ms2 = jnp.sum(h1 * h1, axis=1, keepdims=True) * (1.0 / in_q)
        hn = h1 * jax.lax.rsqrt(ms2 + eps) * g2.astype(jnp.float32)
        hb = hn.astype(jnp.bfloat16)
        hsum = jnp.sum(hn, axis=1, keepdims=True)
        ho = jax.lax.dot_general(
            hb, selqog_b[2 * cols:3 * cols, :], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32).astype(jnp.bfloat16)
        if pad_q:
            hb = jnp.pad(hb, ((0, 0), (0, pad_q)))

        def gbody(tile, _):
            slot = tile % slots

            @pl.when(tile + slots - 1 < n_g)
            def _():
                gdma((tile + slots - 1) % slots, tile + slots - 1).start()

            gdma(slot, tile).wait()
            acc = _matvec_acc(hb, gring[slot], bits, half, two_nw_g)
            s = sz_b[0:1, pl.ds(off_g + tile * to_g, to_g)]
            c = sz_b[1:2, pl.ds(off_g + tile * to_g, to_g)]
            y = acc * s - hsum * c
            y = y + jnp.dot(ho, ow_b[:, pl.ds(off_g + tile * to_g, to_g)],
                            preferred_element_type=jnp.float32)
            gu_s[:, pl.ds(tile * to_g, to_g)] = y.astype(jnp.bfloat16)
            return ()

        jax.lax.fori_loop(0, n_g, gbody, ())

        # --- swiglu + down matvec -------------------------------------
        for s in range(min(dslots - 1, n_d)):
            ddma(s, s).start()

        gu = gu_s[:].astype(jnp.float32)
        g = jax.lax.slice_in_dim(gu, 0, in_d, axis=1)
        u = jax.lax.slice_in_dim(gu, in_d, 2 * in_d, axis=1)
        xd_f = g * jax.lax.logistic(g) * u
        xd = xd_f.astype(jnp.bfloat16)
        dsum = jnp.sum(xd_f, axis=1, keepdims=True)
        a_sd.wait()
        do = jax.lax.dot_general(
            xd[:, :in_d] if pad_d else xd, seld_b[:],
            (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32).astype(jnp.bfloat16)
        if pad_d:
            xd = jnp.pad(xd, ((0, 0), (0, pad_d)))

        def dbody(tile, _):
            slot = tile % dslots

            @pl.when(tile + dslots - 1 < n_d)
            def _():
                ddma((tile + dslots - 1) % dslots, tile + dslots - 1).start()

            ddma(slot, tile).wait()
            acc = _matvec_acc(xd, dring[slot], bits, half, two_nw_d)
            s = sz_b[0:1, pl.ds(off_d + tile * to_d, to_d)]
            c = sz_b[1:2, pl.ds(off_d + tile * to_d, to_d)]
            y = acc * s - dsum * c
            y = y + jnp.dot(do, ow_b[:, pl.ds(off_d + tile * to_d, to_d)],
                            preferred_element_type=jnp.float32)
            y = y + x_s[:, pl.ds(tile * to_d, to_d)].astype(jnp.float32)
            x_s[:, pl.ds(tile * to_d, to_d)] = y.astype(jnp.bfloat16)
            return ()

        jax.lax.fori_loop(0, n_d, dbody, ())

        # prefetch layer l+1's aux bundles (all reads of the current
        # ones are complete once the down loop has run)
        @pl.when(l + 1 < L)
        def _():
            for d in aux_dmas(l + 1):
                d.start()

        kwrite.wait()
        vwrite.wait()
        return ()

    jax.lax.fori_loop(0, L, layer_body, (), unroll=False)

    # --- final rmsnorm + lm_head ring (dense bf16 OR packed words) ----
    def hdma(slot, tile):
        return pltpu.make_async_copy(
            head_hbm.at[:, pl.ds(tile * to_h, to_h)], hring.at[slot],
            hsem.at[slot])

    for s in range(min(_SLOTS - 1, n_h)):
        hdma(s, s).start()

    xf = x_s[:].astype(jnp.float32)
    ms = jnp.sum(xf * xf, axis=1, keepdims=True) * (1.0 / in_q)
    hn = xf * jax.lax.rsqrt(ms + eps) * gf_ref[:].astype(jnp.float32)
    hb = hn.astype(jnp.bfloat16)
    if head_packed:
        hsum = jnp.sum(hn, axis=1, keepdims=True)
        xo_h = jnp.dot(hb, hsel_ref[:],
                       preferred_element_type=jnp.float32
                       ).astype(jnp.bfloat16)
        if pad_h:
            hb = jnp.pad(hb, ((0, 0), (0, pad_h)))

    def hbody(tile, _):
        slot = tile % _SLOTS

        @pl.when(tile + _SLOTS - 1 < n_h)
        def _():
            hdma((tile + _SLOTS - 1) % _SLOTS, tile + _SLOTS - 1).start()

        hdma(slot, tile).wait()
        if head_packed:
            acc = _matvec_acc(hb, hring[slot], bits, half, 2 * nw_h)
            sh = hsz_ref[0:1, pl.ds(tile * to_h, to_h)]
            ch = hsz_ref[1:2, pl.ds(tile * to_h, to_h)]
            y = acc * sh - hsum * ch
            y = y + jnp.dot(xo_h, how_ref[:, pl.ds(tile * to_h, to_h)],
                            preferred_element_type=jnp.float32)
        else:
            y = jnp.dot(hb, hring[slot], preferred_element_type=jnp.float32)
        logits_ref[:, pl.ds(tile * to_h, to_h)] = y.astype(out_dtype)
        return ()

    jax.lax.fori_loop(0, n_h, hbody, ())
    del ko_ref, vo_ref  # aliased; updated by the per-layer row-write DMAs


@functools.partial(jax.jit,
                   static_argnames=("bits", "scale", "eps", "rep",
                                    "out_dtype"),
                   donate_argnums=(1, 2))
def model_block_step(x: jnp.ndarray,
                     k_stack: jnp.ndarray, v_stack: jnp.ndarray,
                     pos: jnp.ndarray, crow: jnp.ndarray, srow: jnp.ndarray,
                     fm, *, bits: int, scale: float, eps: float, rep: int,
                     out_dtype=jnp.bfloat16
                     ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """One WHOLE-MODEL decode step at B=T=1; caches updated in place.

    x: [1, hidden] bf16.  ``fm`` is the prepare_model_kernel bundle dict:
    wq/wo/wg/wd [L, nw, out] int32 (o rows rep-major permuted), sz
    [L, 2, ΣOUT] f32, selqog [L, hidden, 3C] bf16, seld [L, in_d, C]
    bf16, ow [L, C, ΣOUT] bf16, gam [L, 2, hidden] bf16, gf [1, hidden]
    bf16, head [hidden, vocab] bf16.  Returns (logits [1, vocab],
    k_stack, v_stack).
    """
    L, B, S, Hkv, hd = k_stack.shape
    wq, wo, wg, wd = fm["wq"], fm["wo"], fm["wg"], fm["wd"]
    _, nw_q, out_q = wq.shape
    _, nw_o, out_o = wo.shape
    _, nw_g, out_g = wg.shape
    _, nw_d, out_d = wd.shape
    vocab = fm["head"].shape[1]
    head_packed = "hsz" in fm
    nw_h = fm["head"].shape[0] if head_packed else 0
    cols = fm["selqog"].shape[1] // 3
    v = values_per_word(bits)
    in_q = x.shape[1]
    in_o = rep * Hkv * hd
    in_d = out_g // 2
    assert B == 1 and x.shape == (1, in_q)
    assert model_block_applicable(L, S, Hkv, hd, rep, out_q, nw_q, out_o,
                                  nw_o, out_g, nw_g, out_d, nw_d, vocab,
                                  cols, nw_h)
    assert k_stack.dtype == jnp.bfloat16 and v_stack.dtype == jnp.bfloat16
    to_q, to_o = _tiles(out_q, nw_q, out_o, nw_o)
    to_g = _pick_tile(out_g, nw_g, (12 << 20) // _SLOTS)
    to_d = _pick_tile(out_d, nw_d, (12 << 20) // _DN_SLOTS)
    to_h = _head_tile(vocab, in_q, _VMEM_BYTES - _vmem_base(
        L, S, Hkv, hd, out_q, nw_q, to_q, out_o, nw_o, to_o,
        out_g, nw_g, to_g, out_d, nw_d, to_d, vocab, cols), nw_h)
    rows_pad = 8
    one_f = jnp.zeros((1, 1), jnp.float32)
    one_b = jnp.zeros((1, 1), jnp.bfloat16)
    out_tot = out_q + out_o + out_g + out_d

    xp = jnp.pad(x.astype(jnp.bfloat16), ((0, rows_pad - 1), (0, 0)))

    logits, k_out, v_out = pl.pallas_call(
        functools.partial(
            _model_kernel, L=L, bits=bits, half=v // 2, to_q=to_q,
            n_q=out_q // to_q, to_o=to_o, n_o=out_o // to_o, to_g=to_g,
            n_g=out_g // to_g, to_d=to_d, n_d=out_d // to_d, to_h=to_h,
            n_h=vocab // to_h, slots=_SLOTS, dslots=_DN_SLOTS, S=S,
            rep=rep, Hkv=Hkv, hd=hd, scale=scale, eps=eps, in_q=in_q,
            pad_q=nw_q * v - in_q, in_o=in_o, pad_o=nw_o * v - in_o,
            in_d=in_d, pad_d=nw_d * v - in_d, cols=cols,
            rows_pad=rows_pad, head_packed=head_packed, nw_h=nw_h,
            pad_h=(nw_h * v - in_q) if head_packed else 0,
            out_dtype=out_dtype),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)]
        + [pl.BlockSpec(memory_space=pltpu.VMEM)] * 8
        + [pl.BlockSpec(memory_space=pltpu.HBM)] * 4
        + [pl.BlockSpec(memory_space=pltpu.ANY)] * 2
        + [pl.BlockSpec(memory_space=pltpu.HBM)] * 5,
        out_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((rows_pad, vocab), out_dtype),
            jax.ShapeDtypeStruct(k_stack.shape, k_stack.dtype),
            jax.ShapeDtypeStruct(v_stack.shape, v_stack.dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((_SLOTS, nw_q, to_q), jnp.int32),
            pltpu.VMEM((out_o // to_o, nw_o, to_o), jnp.int32),
            pltpu.VMEM((_SLOTS, nw_g, to_g), jnp.int32),
            pltpu.VMEM((_DN_SLOTS, nw_d, to_d), jnp.int32),
            (pltpu.VMEM((_SLOTS, nw_h, to_h), jnp.int32) if head_packed
             else pltpu.VMEM((_SLOTS, in_q, to_h), jnp.bfloat16)),
            pltpu.VMEM((S, Hkv, hd), k_stack.dtype),
            pltpu.VMEM((S, Hkv, hd), v_stack.dtype),
            pltpu.VMEM((1, Hkv, hd), k_stack.dtype),
            pltpu.VMEM((1, Hkv, hd), v_stack.dtype),
            pltpu.VMEM((rows_pad, out_q), jnp.float32),
            pltpu.VMEM((rows_pad, out_g), jnp.bfloat16),
            pltpu.VMEM((rows_pad, in_q), jnp.bfloat16),   # x carry
            pltpu.VMEM((rows_pad, in_q), jnp.bfloat16),   # h (post-attn)
            pltpu.VMEM((2, out_tot), jnp.float32),        # sz bundle
            pltpu.VMEM((3 * cols, in_q), jnp.bfloat16),   # sel q|o|g (T)
            pltpu.VMEM((cols, in_d), jnp.bfloat16),       # sel d (T)
            pltpu.VMEM((cols, out_tot), jnp.bfloat16),    # ow bundle
            pltpu.SemaphoreType.DMA((_SLOTS,)),
            pltpu.SemaphoreType.DMA((out_o // to_o,)),
            pltpu.SemaphoreType.DMA((_SLOTS,)),
            pltpu.SemaphoreType.DMA((_DN_SLOTS,)),
            pltpu.SemaphoreType.DMA((_SLOTS,)),
            pltpu.SemaphoreType.DMA((4,)),
            pltpu.SemaphoreType.DMA((4,)),
        ],
        input_output_aliases={13: 1, 14: 2},
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_BYTES + (8 << 20)),
        cost_estimate=pl.CostEstimate(
            flops=2 * rows_pad * (v * (nw_q * out_q + nw_o * out_o
                                       + nw_g * out_g + nw_d * out_d) * L
                                  + in_q * vocab)
            + 4 * rep * S * Hkv * hd * L,
            bytes_accessed=(wq.nbytes + wo.nbytes + wg.nbytes + wd.nbytes
                            + fm["head"].nbytes + 2 * S * Hkv * hd * 2 * L),
            transcendentals=(rep * S + rows_pad * in_d) * L,
        ),
        name=f"owq_model_block_{bits}b",
    )(pos.reshape(1, 1).astype(jnp.int32), xp,
      crow.astype(jnp.float32), srow.astype(jnp.float32), fm["gf"],
      fm["gam"],
      fm.get("hsz", one_f), fm.get("hsel", one_b), fm.get("how", one_b),
      fm["sz"], fm["selqog"], fm["seld"], fm["ow"],
      k_stack, v_stack, wq, wo, wg, wd, fm["head"])
    return logits[:1], k_out, v_out


def model_block_reference(x, k_stack, v_stack, pos, crow, srow, fm, *,
                          bits, scale, eps, rep, out_dtype=jnp.bfloat16):
    """Pure-jnp twin: per-layer layer_block_reference chain + final norm
    + dense head (unembed numerics)."""
    from .decode_block import layer_block_reference

    L = k_stack.shape[0]
    cols = fm["selqog"].shape[1] // 3
    h = x
    ks, vs = k_stack, v_stack
    for l in range(L):
        def aux(sz_sl, sel, ow_sl, gamma=None):
            d = {"sz": sz_sl, "sel": sel, "ow": ow_sl, "bias": None}
            if gamma is not None:
                d["gamma"] = gamma
            return d

        out_q = fm["wq"].shape[2]
        out_o = fm["wo"].shape[2]
        out_g = fm["wg"].shape[2]
        off_o = out_q
        off_g = off_o + out_o
        off_d = off_g + out_g
        qaux = aux(fm["sz"][l][:, :out_q], fm["selqog"][l][:cols].T,
                   fm["ow"][l][:, :out_q], fm["gam"][l][0:1])
        oaux = aux(fm["sz"][l][:, off_o:off_g],
                   fm["selqog"][l][cols:2 * cols].T,
                   fm["ow"][l][:, off_o:off_g])
        gaux = aux(fm["sz"][l][:, off_g:off_d],
                   fm["selqog"][l][2 * cols:3 * cols].T,
                   fm["ow"][l][:, off_g:off_d], fm["gam"][l][1:2])
        daux = aux(fm["sz"][l][:, off_d:], fm["seld"][l].T,
                   fm["ow"][l][:, off_d:])
        h, ks, vs = layer_block_reference(
            h, ks, vs, pos, crow, srow, fm["wq"][l], qaux, fm["wo"][l],
            oaux, fm["wg"][l], gaux, fm["wd"][l], daux, bits=bits,
            layer=l, scale=scale, eps=eps, rep=rep, out_dtype=jnp.bfloat16)
    if "hsz" in fm:  # packed lm_head (fused final-norm + packed matvec)
        from .gemv_fused import fused_matvec_reference

        logits = fused_matvec_reference(
            h.astype(jnp.bfloat16), fm["head"], fm["hsz"], bits=bits,
            pre="rmsnorm", gamma=fm["gf"], sel=fm["hsel"], ow=fm["how"],
            eps=eps, out_dtype=out_dtype)
        return logits, ks, vs
    hf = h.astype(jnp.float32)
    ms = jnp.mean(hf * hf, axis=1, keepdims=True)
    hn = ((hf * jax.lax.rsqrt(ms + eps)).astype(jnp.bfloat16)
          * fm["gf"]).astype(jnp.bfloat16)
    logits = jnp.dot(hn, fm["head"],
                     preferred_element_type=jnp.float32).astype(out_dtype)
    return logits, ks, vs
