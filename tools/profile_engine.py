"""Profile one continuous-batching engine decode window and print the
per-op device-time budget.

Runs bench.py's engine protocol shape (Engine at b slots, short prompts,
one ``window``-step decode scan) on a truncated-depth model at full
llama widths under jax.profiler, then aggregates xplane per-op device
times (tools/xplane.py).  Companion to tools/profile_decode.py for the
BASELINE config #4 serving path.

Usage: python tools/profile_engine.py [--layers 4] [--batch 8]
       [--window 32] [--bits 3] [--model llama-7b] [--tokens 128]
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
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--window", type=int, default=32)
    ap.add_argument("--tokens", type=int, default=128,
                    help="max_new_tokens per request (pool S = tokens+32)")
    ap.add_argument("--bits", type=int, default=3)
    ap.add_argument("--model", default="llama-7b")
    ap.add_argument("--no-fuse", dest="fuse", action="store_false")
    ap.add_argument("--quant-kv", action="store_true")
    ap.add_argument("--logdir", default="/tmp/owq_engine_trace")
    ap.add_argument("--filter", default="")
    args = ap.parse_args()

    from functools import partial

    import jax
    import jax.numpy as jnp
    import numpy as np

    try:
        jax.config.update("jax_compilation_cache_dir",
                          "/root/.cache/jax_comp_cache")
    except Exception:
        pass

    sys.path.insert(0, ".")
    from owq_tpu.models.synthetic import build_synthetic, synthetic_config
    from owq_tpu.runtime.batching import Engine

    cfg = synthetic_config(args.model, max_pos=args.tokens + 32)
    if args.layers:
        cfg = dataclasses.replace(cfg, num_layers=args.layers)
    params = jax.jit(partial(build_synthetic, cfg, bits=args.bits,
                             dtype=jnp.bfloat16))()
    if args.fuse:
        from owq_tpu.runtime.fuse import prepare_decode_fast

        params, cfg = prepare_decode_fast(params, cfg)

    rng = np.random.default_rng(0)
    prompts = [rng.integers(0, cfg.vocab_size, size=(16,)).astype(np.int32)
               for _ in range(2 * args.batch)]
    eng = Engine(params, cfg, max_batch=args.batch,
                 max_len=args.tokens + 32, kernel=args.kernel,
                 prompt_buckets=(32,), quant_kv=args.quant_kv)
    # compile + warmup outside the trace (fills all slots, runs windows)
    eng.run(prompts[:args.batch], max_new_tokens=args.window + 1,
            window=args.window)

    # fill the slots again, then trace exactly one full-batch window
    for p in prompts[args.batch:2 * args.batch]:
        eng.add_request(p, max_new_tokens=args.tokens)
    eng._admit()
    shutil.rmtree(args.logdir, ignore_errors=True)
    jax.profiler.start_trace(args.logdir)
    eng.step(max_steps=args.window)
    jax.profiler.stop_trace()

    pbs = sorted(glob.glob(os.path.join(args.logdir, "**", "*.xplane.pb"),
                           recursive=True), key=os.path.getmtime)
    if not pbs:
        print("no xplane.pb written", file=sys.stderr)
        sys.exit(1)
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from xplane import summarize

    print(f"trace: {pbs[-1]}  (one {args.window}-step window x "
          f"{cfg.num_layers} layers at b{args.batch}; divide by "
          f"{args.window} for per-step, x{args.batch} tokens/step)")
    summarize(pbs[-1], args.filter)


if __name__ == "__main__":
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    main()
