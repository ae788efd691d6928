"""Measure the speculative verify-step cost vs a plain decode step on TPU.

Speculation turns decode throughput into
    tok/s = (accepted_per_forward + 1) / verify_step_time,
so the win is (accept+1) / (verify_cost / decode_cost).  This tool measures
that cost ratio at real model widths with interleaved best-of-N timing
(the shared chip has noisy neighbors; see PARITY.md).

Usage: python tools/bench_speculative.py [--model llama-7b] [--draft 7]
"""

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="llama-7b")
    ap.add_argument("--bits", type=int, default=3)
    ap.add_argument("--draft", type=int, default=7,
                    help="drafted tokens per verify (verify T = draft+1)")
    ap.add_argument("--kernel", default="auto")
    ap.add_argument("--repeats", type=int, default=12)
    ap.add_argument("--inner", type=int, default=16,
                    help="steps per timed sample (amortizes dispatch)")
    ap.add_argument("--small", action="store_true")
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

    from owq_tpu.models.synthetic import build_synthetic, synthetic_config
    from owq_tpu.models.transformer import forward, init_cache

    name = "llama-tiny" if args.small else args.model
    cfg = synthetic_config(name, max_pos=256)
    params = jax.jit(partial(build_synthetic, cfg, bits=args.bits,
                             target_bit=args.bits + 0.01,
                             dtype=jnp.bfloat16))()

    kernel = args.kernel
    if kernel == "auto":
        from owq_tpu.kernels import PALLAS_AVAILABLE

        kernel = "pallas" if PALLAS_AVAILABLE() else "xla"

    K = args.draft

    @partial(jax.jit, static_argnames=("T",))
    def run_steps(params, cache, toks, T):
        # `inner` forwards of width T chained through the cache; returns a
        # data-dependent scalar so the readback proves completion
        def step(carry, _):
            cache, acc = carry
            logits, cache = forward(params, cfg, toks, cache=cache,
                                    kernel=kernel, dtype=jnp.bfloat16)
            import dataclasses

            # rewind length so the cache never fills during timing
            cache = dataclasses.replace(
                cache, length=cache.length - (T - 1))
            return (cache, acc + logits[0, -1, 0]), None

        (cache, acc), _ = jax.lax.scan(step, (cache, jnp.zeros((),
                                                               jnp.float32)),
                                       None, length=args.inner)
        return acc

    rng = np.random.default_rng(0)
    tok1 = jnp.asarray(rng.integers(0, cfg.vocab_size, (1, 1)), jnp.int32)
    tokK = jnp.asarray(rng.integers(0, cfg.vocab_size, (1, K + 1)), jnp.int32)
    cache = init_cache(cfg, 1, 256, dtype=jnp.bfloat16)

    # warmup/compile both programs
    float(run_steps(params, cache, tok1, 1))
    float(run_steps(params, cache, tokK, K + 1))

    best1 = bestK = float("inf")
    for _ in range(args.repeats):  # interleaved: same contention for both
        t0 = time.perf_counter()
        float(run_steps(params, cache, tok1, 1))
        best1 = min(best1, time.perf_counter() - t0)
        t0 = time.perf_counter()
        float(run_steps(params, cache, tokK, K + 1))
        bestK = min(bestK, time.perf_counter() - t0)

    d = best1 / args.inner
    v = bestK / args.inner
    ratio = v / d
    print(f"model={name} {args.bits}.01-bit kernel={kernel} draft={K}")
    print(f"decode step (T=1):      {d * 1e3:8.3f} ms")
    print(f"verify step (T={K + 1}):     {v * 1e3:8.3f} ms   "
          f"({ratio:.3f}x decode)")
    print("effective speedup at acceptance a (tokens/forward = a+1):")
    for a in (1, 2, 4, K):
        print(f"  a={a}: {(a + 1) / ratio:5.2f}x single-stream decode")


if __name__ == "__main__":
    main()
