"""Profile the B=1 decode scan and print the per-op device-time budget.

Runs bench.py's exact single-stream protocol (runtime/generate._bench_scan)
on a truncated-depth model at full llama widths under jax.profiler, then
aggregates the xplane per-op device times (tools/xplane.py — tensorboard is
not installable here).  This is the tool behind PARITY.md's "residual
budget" numbers.

Usage: python tools/profile_decode.py [--layers 4] [--tokens 32]
       [--bits 3] [--model llama-7b] [--fuse] [--kernel pallas]
"""

import argparse
import dataclasses
import glob
import os
import shutil
import sys


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--kernel", default="pallas", choices=["pallas", "xla"])
    ap.add_argument("--layers", type=int, default=4)
    ap.add_argument("--tokens", type=int, default=32)
    ap.add_argument("--bits", type=int, default=3)
    ap.add_argument("--model", default="llama-7b")
    ap.add_argument("--fuse", action="store_true")
    ap.add_argument("--logdir", default="/tmp/owq_decode_trace")
    ap.add_argument("--filter", default="",
                    help="only print planes/lines matching this substring")
    args = ap.parse_args()

    from functools import partial

    import jax
    import jax.numpy as jnp
    import numpy as np

    try:  # uncached compiles through the axon tunnel take many minutes
        jax.config.update("jax_compilation_cache_dir",
                          "/root/.cache/jax_comp_cache")
    except Exception:
        pass

    sys.path.insert(0, ".")
    from owq_tpu.models.synthetic import build_synthetic, synthetic_config
    from owq_tpu.runtime.generate import _bench_scan, init_cache

    cfg = synthetic_config(args.model, max_pos=max(args.tokens, 128))
    if args.layers:
        cfg = dataclasses.replace(cfg, num_layers=args.layers)
    params = jax.jit(partial(build_synthetic, cfg, bits=args.bits,
                             dtype=jnp.bfloat16))()
    if args.fuse:
        # same serving transform as bench.py --fuse (projection fusion +
        # fused-decode-kernel aux)
        from owq_tpu.runtime.fuse import prepare_decode_fast

        params, cfg = prepare_decode_fast(params, cfg)

    rng = np.random.default_rng(0)
    ids = rng.integers(0, cfg.vocab_size,
                       size=(1, args.tokens)).astype(np.int32)
    toks = jax.device_put(jnp.asarray(ids))

    # compile + warmup outside the trace
    cache = init_cache(cfg, 1, args.tokens, dtype=jnp.bfloat16)
    nll = _bench_scan(params, cfg, toks, cache, args.kernel, jnp.bfloat16)
    _ = float(nll)

    shutil.rmtree(args.logdir, ignore_errors=True)
    jax.profiler.start_trace(args.logdir)
    cache = init_cache(cfg, 1, args.tokens, dtype=jnp.bfloat16)
    nll = _bench_scan(params, cfg, toks, cache, args.kernel, jnp.bfloat16)
    _ = float(nll)
    jax.profiler.stop_trace()

    pbs = sorted(glob.glob(os.path.join(args.logdir, "**", "*.xplane.pb"),
                           recursive=True), key=os.path.getmtime)
    if not pbs:
        print("no xplane.pb written", file=sys.stderr)
        sys.exit(1)
    from xplane import summarize  # tools/ on sys.path when run as a script

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    print(f"trace: {pbs[-1]}  (scan of {args.tokens} steps x "
          f"{cfg.num_layers} layers; divide by {args.tokens} for per-token)")
    summarize(pbs[-1], args.filter)


if __name__ == "__main__":
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    main()
