"""Trustworthy kernel A/B: end-to-end decode scan on a truncated model.

Standalone pallas_call microbenchmarks are unreliable on the relayed axon
backend (async acks make batched timing fake-fast; per-launch overhead
makes chained timing fake-slow).  The only trustworthy measurement is a
full decode scan — one dispatch, one scalar readback — which is how
bench.py measures.  This tool uses a 4-layer model at full llama-7b widths
so variant compiles stay ~1 minute.

Usage: python tools/bench_e2e.py [--kernel pallas|xla] [--layers 4]
       [--tokens 64] [--bits 3]
"""

import argparse
import dataclasses
import sys
import time


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--kernel", default="pallas", choices=["pallas", "xla"])
    ap.add_argument("--layers", type=int, default=4)
    ap.add_argument("--tokens", type=int, default=64)
    ap.add_argument("--bits", type=int, default=3)
    ap.add_argument("--repeats", type=int, default=4)
    ap.add_argument("--model", default="llama-7b")
    ap.add_argument("--fuse", action="store_true",
                    help="fuse q|k|v and gate|up projections")
    args = ap.parse_args()

    from functools import partial

    import jax
    import jax.numpy as jnp
    import numpy as np

    sys.path.insert(0, ".")
    from owq_tpu.models.synthetic import build_synthetic, synthetic_config
    from owq_tpu.runtime.generate import benchmark_decode

    cfg = synthetic_config(args.model, max_pos=max(args.tokens, 128))
    cfg = dataclasses.replace(cfg, num_layers=args.layers)
    params = jax.jit(partial(build_synthetic, cfg, bits=args.bits,
                             dtype=jnp.bfloat16))()
    if args.fuse:
        from owq_tpu.runtime.fuse import fuse_block_projections

        params, cfg = fuse_block_projections(params, cfg)
    wbytes = sum(getattr(l, "nbytes", 0)
                 for l in jax.tree_util.tree_leaves(params))
    blk_bytes = sum(
        getattr(l, "nbytes", 0)
        for l in jax.tree_util.tree_leaves(params["layers"]))

    rng = np.random.default_rng(0)
    ids = rng.integers(0, cfg.vocab_size, size=(1, args.tokens)).astype(np.int32)
    t0 = time.time()
    stats = benchmark_decode(params, cfg, ids, kernel=args.kernel,
                             max_len=args.tokens, repeats=args.repeats)
    per_tok = stats["median_s"]
    # per-block time excluding the (dense bf16) embed/lm_head share
    print(f"kernel={args.kernel} layers={args.layers}: "
          f"{per_tok*1e3:.3f} ms/token "
          f"(block weights {blk_bytes/1e9:.2f} GB -> "
          f"{blk_bytes/per_tok/1e9:.0f} GB/s effective incl. head; "
          f"total wall {time.time()-t0:.0f}s)")


if __name__ == "__main__":
    main()
