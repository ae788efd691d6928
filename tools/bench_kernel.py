"""Kernel tuning harness: interleaved min-of-N comparison of gemv variants.

The shared-TPU relay is noisy run-to-run; only interleaved min-of-N with
chained dispatch + one terminal sync is trustworthy (see
owq_tpu/utils/profiling.py).

Usage: python tools/bench_kernel.py [--shape 4096x4096] [--bits 3]
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
    ap.add_argument("--rounds", type=int, default=6)
    ap.add_argument("--iters", type=int, default=100)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    sys.path.insert(0, ".")
    from owq_tpu.core.packing import padded_infeatures, plane_offset, values_per_word

    infeat, out = map(int, args.shape.split("x"))
    bits = args.bits
    v = values_per_word(bits)
    in_pad, nw = padded_infeatures(infeat, bits)
    R = args.rows
    rng = np.random.default_rng(0)
    qw = jnp.asarray(rng.integers(-2**31, 2**31 - 1, size=(nw, out),
                                  dtype=np.int64).astype(np.int32))
    x = jnp.asarray(rng.standard_normal((R, in_pad)).astype(np.float32)
                    ).astype(jnp.bfloat16)

    cost = pl.CostEstimate(flops=2 * R * in_pad * out,
                           bytes_accessed=qw.nbytes + x.nbytes + 4 * R * out,
                           transcendentals=0)

    def plane_body(x_ref, q_ref, o_ref, *, nw_c, x_off=None, k=None):
        q = q_ref[:]
        acc = None
        for p in range(v):
            plane = (jax.lax.shift_right_logical(q, plane_offset(bits, p))
                     & jnp.int32(7)).astype(jnp.bfloat16)
            if x_off is None:
                xs = x_ref[:, p * nw_c:(p + 1) * nw_c]
            else:
                xs = x_ref[:, x_off(p)]
            part = jnp.dot(xs, plane, preferred_element_type=jnp.float32)
            acc = part if acc is None else acc + part
        return acc

    def build_1d(TO, use_cost=True):
        def kern(x_ref, q_ref, o_ref):
            o_ref[:] = plane_body(x_ref, q_ref, o_ref, nw_c=nw)

        def f(x, qw):
            return pl.pallas_call(
                kern, grid=(out // TO,),
                in_specs=[pl.BlockSpec((R, in_pad), lambda j: (0, 0),
                                       memory_space=pltpu.VMEM),
                          pl.BlockSpec((nw, TO), lambda j: (0, j),
                                       memory_space=pltpu.VMEM)],
                out_specs=pl.BlockSpec((R, TO), lambda j: (0, j),
                                       memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct((R, out), jnp.float32),
                **(dict(cost_estimate=cost) if use_cost else {}))(x, qw)
        return jax.jit(f)

    def build_2d(TO, KC):
        """k-chunked accumulation: grid (out, k), output revisited over k.

        x is pre-reshaped [R, v, nw] so the per-k activation block is a
        static BlockSpec slice (Mosaic rejects traced in-kernel slices of
        the flat layout)."""
        nw_c = nw // KC
        if nw_c % 8:
            raise ValueError("k-chunk not sublane aligned")

        def kern(x_ref, q_ref, o_ref):
            k = pl.program_id(1)

            @pl.when(k == 0)
            def _():
                o_ref[:] = jnp.zeros_like(o_ref)

            q = q_ref[:]
            acc = o_ref[:]
            for p in range(v):
                plane = (jax.lax.shift_right_logical(q, plane_offset(bits, p))
                         & jnp.int32(7)).astype(jnp.bfloat16)
                acc = acc + jnp.dot(x_ref[:, p, :], plane,
                                    preferred_element_type=jnp.float32)
            o_ref[:] = acc

        xr3 = x.reshape(R, v, nw)

        def f(x_unused, qw):
            return pl.pallas_call(
                kern, grid=(out // TO, KC),
                in_specs=[pl.BlockSpec((R, v, nw_c), lambda j, k: (0, 0, k),
                                       memory_space=pltpu.VMEM),
                          pl.BlockSpec((nw_c, TO), lambda j, k: (k, j),
                                       memory_space=pltpu.VMEM)],
                out_specs=pl.BlockSpec((R, TO), lambda j, k: (0, j),
                                       memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct((R, out), jnp.float32),
                cost_estimate=cost)(xr3, qw)
        return jax.jit(f)

    variants = {
        "1d_TO512": build_1d(512),
        "1d_TO256": build_1d(256),
        "2d_TO512_K4": build_2d(512, 4),
        "2d_TO1024_K2": build_2d(1024, 2),
        "2d_TO1024_K4": build_2d(1024, 4),
    }

    def one_pass(f):
        y = f(x, qw)
        y.block_until_ready()
        t0 = time.perf_counter()
        for _ in range(args.iters):
            y = f(x, qw)
        y.block_until_ready()
        return (time.perf_counter() - t0) / args.iters

    # compile + correctness reference
    ref = None
    good = {}
    for k, f in list(variants.items()):
        try:
            r = np.asarray(f(x, qw))
            if ref is None:
                ref = r
            err = np.abs(r - ref).max() / (np.abs(ref).max() + 1e-9)
            assert err < 1e-3, f"{k} mismatch {err}"
            good[k] = f
        except Exception as e:
            print(f"{k}: FAILED {str(e)[:120]}")

    best = {k: float("inf") for k in good}
    for _ in range(args.rounds):
        for k, f in good.items():
            best[k] = min(best[k], one_pass(f))
    floor = qw.nbytes / 819e9
    for k, t in sorted(best.items(), key=lambda kv: kv[1]):
        print(f"{k:16s} {t*1e6:8.1f} us  {qw.nbytes/t/1e9:5.0f} GB/s  "
              f"{floor/t*100:5.1f}% of HBM floor")


if __name__ == "__main__":
    main()
