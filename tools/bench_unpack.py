"""Unpack-scheme shootout for the quantized decode matvec.

The B=1 decode path is VPU-bound on code unpacking (PARITY.md): the
generic plane loop spends ~3 vreg-ops per weight value (shift, mask,
int32->bf16 convert), capping throughput at ~60% of the weight-bandwidth
roofline.  This tool A/Bs unpack schemes on real llama-7b layer shapes.

Schemes (all share the plane-chunk packed layout, core/packing.py — the
paired half-word offsets mean the SAME qweight array serves every one):

  plane    — the shipping generic loop (1024 values per vreg-op)
  paired   — int32-domain shift+mask+or + 32->16 bitcast per pair
  maskcvt  — ONE 32->16 bitcast per tile, then per plane-pair just
             ``(q16 & (7<<3k)).astype(bf16)`` = bf16(code * 8^k) EXACTLY
             (<=3 significant bits); the 8^-k is folded into the tiny x
             operand.  2 vreg-ops per pair over 2048 lanes = ~1 op/value.
             No shifts at all (v5e Mosaic can't lower sub-32-bit shifts).
  stream   — bitcast-only + one dot: the in-kernel streaming floor (no
             unpack); an upper bound for any scheme.

Timing: the axon relay adds O(100us) per dispatch, so each variant runs
ITERS chained applications inside ONE jitted lax.fori_loop (serialised by
a data dependence) and reports wall/ITERS.

Usage: python tools/bench_unpack.py [--shape 4096x4096] [--bits 3]
       [--rows 8] [--iters 50] [--rounds 4]
"""

import argparse
import functools
import sys
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--shape", default="4096x4096")
    ap.add_argument("--bits", type=int, default=3)
    ap.add_argument("--rows", type=int, default=8)
    ap.add_argument("--rounds", type=int, default=4)
    ap.add_argument("--iters", type=int, default=50)
    ap.add_argument("--to", type=int, default=512)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    sys.path.insert(0, ".")
    from owq_tpu.core.packing import (padded_infeatures, plane_offset,
                                      values_per_word)

    infeat, out = map(int, args.shape.split("x"))
    bits = args.bits
    v = values_per_word(bits)
    half = v // 2
    in_pad, nw = padded_infeatures(infeat, bits)
    R = args.rows
    TO = args.to if out % args.to == 0 else 256
    rng = np.random.default_rng(0)
    qw = jnp.asarray(rng.integers(-2**31, 2**31 - 1, size=(nw, out),
                                  dtype=np.int64).astype(np.int32))
    x = jnp.asarray(rng.standard_normal((R, in_pad)).astype(np.float32)
                    ).astype(jnp.bfloat16)
    # pre-interleaved activation layout for the pair schemes:
    # xp[r, k, 2i] = x[r, k*nw+i], xp[r, k, 2i+1] = x[r, (k+half)*nw+i]
    xr = x.reshape(R, v, nw)
    xp = jnp.stack([xr[:, :half, :], xr[:, half:, :]], axis=-1)
    xp = xp.reshape(R, half, 2 * nw)
    # maskcvt additionally folds the 2^(-bits*k) plane scale into x
    kscale = (2.0 ** (-bits * np.arange(half)))[None, :, None]
    xps = (xp.astype(jnp.float32) * kscale).astype(jnp.bfloat16)

    cost = pl.CostEstimate(flops=2 * R * in_pad * out,
                           bytes_accessed=qw.nbytes + x.nbytes + 4 * R * out,
                           transcendentals=0)

    def call(kern, xin, spec3):
        return pl.pallas_call(
            kern, grid=(out // TO,),
            in_specs=[spec3,
                      pl.BlockSpec((nw, TO), lambda j: (0, j),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((R, TO), lambda j: (0, j),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((R, out), jnp.float32),
            cost_estimate=cost)(xin, qw)

    def plane_kern(x_ref, q_ref, o_ref):
        mask32 = jnp.int32((1 << bits) - 1)
        q = q_ref[:]
        acc = None
        for p in range(v):
            off = plane_offset(bits, p)
            if off == 0:
                f = q & mask32
            elif off + bits >= 32:
                f = jax.lax.shift_right_logical(q, off)
            else:
                f = jax.lax.shift_right_logical(q, off) & mask32
            part = jnp.dot(x_ref[:, p * nw:(p + 1) * nw],
                           f.astype(jnp.bfloat16),
                           preferred_element_type=jnp.float32)
            acc = part if acc is None else acc + part
        o_ref[:] = acc

    def paired_kern(x_ref, q_ref, o_ref):
        pair_mask = jnp.uint32(((1 << bits) - 1) * 0x00010001)
        magic = jnp.uint32(0x43004300)
        q = q_ref[:].astype(jnp.uint32)
        acc = None
        for k in range(half):
            pair = ((q >> (bits * k)) & pair_mask) | magic
            wk = pltpu.bitcast(pair.astype(jnp.int32), jnp.bfloat16)
            part = jnp.dot(x_ref[:, k, :], wk,
                           preferred_element_type=jnp.float32)
            acc = part if acc is None else acc + part
        o_ref[:] = acc

    def maskcvt_kern(x_ref, q_ref, o_ref):
        q16 = pltpu.bitcast(q_ref[:], jnp.int16)           # [2nw, TO]
        acc = None
        for k in range(half):
            mk = jnp.int16(((1 << bits) - 1) << (bits * k))
            wk = (q16 & mk).astype(jnp.bfloat16)           # code * 8^k
            part = jnp.dot(x_ref[:, k, :], wk,
                           preferred_element_type=jnp.float32)
            acc = part if acc is None else acc + part
        o_ref[:] = acc

    def stream_kern(x_ref, q_ref, o_ref):
        wk = pltpu.bitcast(q_ref[:], jnp.bfloat16)         # garbage values
        o_ref[:] = jnp.dot(x_ref[:, 0, :], wk,
                           preferred_element_type=jnp.float32)

    flat_spec = pl.BlockSpec((R, in_pad), lambda j: (0, 0),
                             memory_space=pltpu.VMEM)
    pair_spec = pl.BlockSpec((R, half, 2 * nw), lambda j: (0, 0, 0),
                             memory_space=pltpu.VMEM)

    variants = {
        "plane": (plane_kern, x, flat_spec, "exact"),
        "paired": (paired_kern, xp, pair_spec, "off128"),
        "maskcvt": (maskcvt_kern, xps, pair_spec, "exact"),
        "stream": (stream_kern, xp, pair_spec, "none"),
    }

    fns, ref = {}, None
    for name, (kern, xin, spec, mode) in variants.items():
        f = jax.jit(lambda xin, kern=kern, spec=spec: call(kern, xin, spec))
        try:
            y = np.asarray(f(xin), np.float64)
        except Exception as e:
            print(f"{name:8s} FAILED: {str(e)[:150]}")
            continue
        if mode == "off128":
            y -= 128.0 * np.asarray(
                jnp.sum(x.astype(jnp.float32), axis=-1))[:, None]
        if mode != "none":
            if ref is None:
                ref = y
            err = np.abs(y - ref).max() / (np.abs(ref).max() + 1e-9)
            if err > 1e-3:
                print(f"{name:8s} MISMATCH rel={err:.2e}")
                continue
        fns[name] = (f, xin, kern, spec)

    # chained timing: ITERS applications inside one compiled loop,
    # serialised via a value-preserving data dependence
    def chained(kern, spec, iters):
        def body(i, carry):
            x_c, s = carry
            y = call(kern, x_c, spec)
            s2 = y[0, 0]
            # multiply by 1.0 (s2==s2 is always true) — creates a data
            # dependence the compiler cannot fold away, changes nothing
            x_c = x_c * jnp.where(s2 == s2, jnp.bfloat16(1), jnp.bfloat16(2))
            return (x_c, s + s2)

        def run(xin):
            return jax.lax.fori_loop(0, iters, body, (xin, jnp.float32(0)))[1]
        return jax.jit(run)

    best = {k: float("inf") for k in fns}
    timed = {k: chained(kern, spec, args.iters)
             for k, (f, xin, kern, spec) in fns.items()}
    for k, (f, xin, kern, spec) in fns.items():
        timed[k](xin).block_until_ready()   # compile
    for _ in range(args.rounds):
        for k, (f, xin, kern, spec) in fns.items():
            t0 = time.perf_counter()
            timed[k](xin).block_until_ready()
            best[k] = min(best[k], (time.perf_counter() - t0) / args.iters)
    floor = qw.nbytes / 819e9
    print(f"shape {infeat}x{out} bits={bits} rows={R} TO={TO} "
          f"qbytes={qw.nbytes/1e6:.1f}MB floor={floor*1e6:.1f}us")
    for k, t in sorted(best.items(), key=lambda kv: kv[1]):
        print(f"{k:8s} {t*1e6:8.1f} us  {qw.nbytes/t/1e9:5.0f} GB/s  "
              f"{floor/t*100:5.1f}% of HBM floor")


if __name__ == "__main__":
    main()
