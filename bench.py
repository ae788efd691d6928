"""Headline benchmark: decode tokens/s/chip on a quantized llama.

Prints one JSON line PER PROTOCOL, flushed as each completes (the B=1
reference protocol runs FIRST so a driver timeout cannot erase it):

  {"metric": "<model>_<bits>.01bit_decode",     ...}   B=1 reference protocol
  {"metric": "<model>_<bits>.01bit_engine_b8",  ...}   serving throughput

The reference repo publishes no numeric tables (BASELINE.md); the driver's
north star is decode tokens/s/chip at 3.01-bit llama-7b vs. the
weight-bandwidth roofline on v5e.  ``vs_baseline`` reports the fraction of
that roofline achieved (1.0 == reading every packed weight byte once per
token at peak *spec* HBM bandwidth, 819 GB/s; the measured pure-DMA
ceiling on this chip is ~755 GB/s ≈ 92% of spec — see PARITY.md).

Protocols:
  * single-stream — B=1, 128 tokens, on-device scan, per-token latency
    (reference main.py:305-353).  Runs with runtime projection fusion
    (qkv and gate|up fused: 7 -> 4 quantized matmuls per block).
  * engine — continuous-batching throughput at 8 slots, steady-state on a
    warmed engine (a fresh engine would time jax re-tracing, not the
    chip).  Exceeding the B=1 roofline here is EXPECTED (each weight read
    is amortized over up to 8 slots), not a statement about the >=90%
    single-stream target.

Weights are synthesized on device (random packed codes) — throughput does
not depend on weight values, and this container has zero egress.

Usage: python bench.py [--model llama-7b|llama-2-13b] [--bits 3|4]
       [--tokens 128] [--small] [--engine-only|--single-only] [--no-fuse]
"""

import argparse
import json
import sys


V5E_HBM_GBPS = 819.0  # v5e peak HBM bandwidth (public spec)


def packed_model_bytes(params) -> int:
    """Bytes of weights that must be streamed per decode token."""
    import jax

    total = 0
    for leaf in jax.tree_util.tree_leaves(params):
        if hasattr(leaf, "nbytes"):
            total += leaf.nbytes
    return total


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="llama-7b")
    ap.add_argument("--tokens", type=int, default=128)
    ap.add_argument("--bits", type=int, default=3)
    ap.add_argument("--kernel", default="auto", choices=["auto", "xla", "pallas"])
    ap.add_argument("--small", action="store_true",
                    help="tiny shapes for smoke-testing the harness")
    ap.add_argument("--engine-only", action="store_true")
    ap.add_argument("--single-only", action="store_true")
    # legacy flag names (round-1 drivers): --engine / --single-stream
    ap.add_argument("--engine", dest="engine_only", action="store_true",
                    help=argparse.SUPPRESS)
    ap.add_argument("--single-stream", dest="single_only",
                    action="store_true", help=argparse.SUPPRESS)
    ap.add_argument("--no-fuse", dest="fuse", action="store_false",
                    help="disable qkv/gateup runtime fusion in single-stream")
    ap.add_argument("--batch", type=int, default=8,
                    help="engine slot count")
    ap.add_argument("--window", type=int, default=64,
                    help="engine decode steps per host sync (per-dispatch "
                         "overhead through the relayed backend is large; "
                         "a server would also batch steps)")
    ap.add_argument("--requests", type=int, default=16)
    ap.add_argument("--repeats", type=int, default=6,
                    help="best-of-N timing (the shared TPU pool has noisy "
                         "neighbors; only the best sample reflects the "
                         "hardware)")
    ap.add_argument("--pack-head", action="store_true",
                    help="RTN-pack the dense lm_head for the MAIN protocol "
                         "line (beyond-reference serving mode; metric "
                         "suffix 'ph').  Without this flag the ph line is "
                         "still emitted as an ADDITIONAL metric after the "
                         "reference-protocol line (VERDICT r4 item 1)")
    ap.add_argument("--no-pack-head-line", action="store_true",
                    help="skip the additional packed-head metric line")
    ap.add_argument("--a8", action="store_true",
                    help="W4A8 serving mode (4-bit only): repack weights "
                         "into the A8 byte layout and decode on the int8 "
                         "MXU with per-row int8 activations (weak columns "
                         "stay full-precision)")
    ap.add_argument("--quant-kv", action="store_true",
                    help="serve the engine from an int8 KV pool "
                         "(attention reads int8 codes directly — half the "
                         "cache traffic that bounds 16-32 slots; metric "
                         "suffix 'kv8')")
    ap.add_argument("--speculative", action="store_true",
                    help="add prompt-lookup speculative-decoding lines: "
                         "B=1 AND engine+spec (per-slot drafts verified "
                         "in the batched step) on a repetitive synthetic "
                         "stream so n-gram drafts accept; greedy-exact")
    ap.add_argument("--cpu", action="store_true",
                    help="pin the CPU backend (harness smoke test when the "
                         "TPU tunnel is unavailable; numbers are not "
                         "meaningful)")
    args = ap.parse_args()

    import os
    from functools import partial

    import jax

    if args.engine_only:
        # the whole-model one-program kernel is a B=1 path; its stacked
        # weight copies would only double HBM for an engine-only run
        # (13b-class models + b32 KV pools get tight on a 16 GB chip)
        os.environ.setdefault("OWQ_NO_MODEL_KERNEL", "1")

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    try:  # persistent compile cache (first 7b compile is slow over the tunnel)
        jax.config.update("jax_compilation_cache_dir",
                          "/root/.cache/jax_comp_cache")
    except Exception:
        pass
    import jax.numpy as jnp
    import numpy as np

    from owq_tpu.models.synthetic import build_synthetic, synthetic_config
    from owq_tpu.runtime.generate import benchmark_decode

    name = "llama-tiny" if args.small else args.model
    cfg = synthetic_config(name, max_pos=max(args.tokens, 128))
    # one jitted program builds all weights on-device (a python-loop build
    # would trigger hundreds of tiny eager compiles through the tunnel)
    params = jax.jit(partial(build_synthetic, cfg, bits=args.bits,
                             target_bit=args.bits + 0.01,
                             dtype=jnp.bfloat16))()

    kernel = args.kernel
    if kernel == "auto":
        try:
            from owq_tpu.kernels import PALLAS_AVAILABLE
            kernel = "pallas" if PALLAS_AVAILABLE() else "xla"
        except Exception:
            kernel = "xla"

    rng = np.random.default_rng(0)
    params0, cfg0, name0 = params, cfg, name  # pre-fuse, dense head
    wbytes = packed_model_bytes(params)
    roofline_tps = V5E_HBM_GBPS * 1e9 / wbytes
    if args.pack_head:
        # BEYOND-reference opt-in: RTN-pack the dense lm_head so the last
        # matmul streams packed words too (the reference serves an fp16
        # head, so the default protocol line keeps the dense head).
        from owq_tpu.runtime.fuse import pack_lm_head

        params = pack_lm_head(params, cfg, bits=args.bits, n_weak=8)
        name = name + "ph"  # metric: <model>ph_<bits>.01bit_decode
        wbytes = packed_model_bytes(params)
        roofline_tps = V5E_HBM_GBPS * 1e9 / wbytes
    if args.fuse:
        # serving prep: qkv/gateup fusion (7 -> 4 quantized matmuls per
        # block) + fused-decode-kernel aux (norms/corrections/weak
        # columns run inside the matmul kernels — kernels/gemv_fused.py).
        # Single-chip only (TP splits fused projections back apart).
        from owq_tpu.runtime.fuse import prepare_decode_fast

        params, cfg = prepare_decode_fast(params, cfg)
    if args.a8:
        assert args.bits == 4, "--a8 is a 4-bit mode"
        from owq_tpu.runtime.fuse import repack_model_a8

        params = repack_model_a8(params, cfg)
        name = name + "a8"  # metric: <model>a8_4.01bit_decode
    detail = {
        "kernel": kernel,
        "weight_bytes": wbytes,
        "roofline_tokens_per_s": round(roofline_tps, 2),
        "device": str(jax.devices()[0]),
    }
    results = []

    def emit(r):
        results.append(r)
        print(json.dumps(r), flush=True)

    if not args.engine_only:
        ids = rng.integers(0, cfg.vocab_size,
                           size=(1, args.tokens)).astype(np.int32)
        stats = benchmark_decode(params, cfg, ids, kernel=kernel,
                                 cache_dtype=jnp.bfloat16,
                                 max_len=args.tokens, repeats=args.repeats)
        detail["median_ms"] = round(stats["median_s"] * 1e3, 3)
        detail["min_ms"] = round(stats["min_s"] * 1e3, 3)
        detail["tokens_per_s_min"] = round(stats["tokens_per_s_min"], 2)
        detail["fused"] = bool(args.fuse)
        emit({
            "metric": f"{name}_{args.bits}.01bit_decode",
            "value": round(stats["tokens_per_s"], 2),
            "unit": "tokens/s/chip",
            "vs_baseline": round(stats["tokens_per_s"] / roofline_tps, 4),
        })

        if not (args.pack_head or args.a8 or args.no_pack_head_line):
            # ADDITIONAL packed-head line (beyond-reference serving mode,
            # recorded by default since r5): RTN-packed lm_head with OWQ
            # weak columns + the fused final-norm+head kernel.  Its
            # vs_baseline is against its OWN (smaller-weights => higher)
            # roofline; the reference-protocol line above keeps the
            # dense fp16-class head the reference serves.
            from owq_tpu.runtime.fuse import pack_lm_head

            dense_head_bytes = params0["lm_head"].w.nbytes
            ph = pack_lm_head(params0, cfg, bits=args.bits, n_weak=8)
            # serving WEIGHT bytes: the pristine set with the dense head
            # swapped for the packed one (params0 was mutated in place by
            # prepare_decode_fast — fast/o_attn/fast_model entries are
            # serving-prep COPIES of weights already counted, not extra
            # model bytes)
            packed_head_bytes = sum(
                leaf.nbytes
                for leaf in jax.tree_util.tree_leaves(ph["lm_head"]))
            ph_bytes = wbytes - dense_head_bytes + packed_head_bytes
            ph_roof = V5E_HBM_GBPS * 1e9 / ph_bytes
            if args.fuse:
                from owq_tpu.runtime.fuse import prepare_decode_fast

                ph, _ = prepare_decode_fast(ph, cfg)
            st = benchmark_decode(ph, cfg, ids, kernel=kernel,
                                  cache_dtype=jnp.bfloat16,
                                  max_len=args.tokens,
                                  repeats=args.repeats)
            detail["ph_median_ms"] = round(st["median_s"] * 1e3, 3)
            detail["ph_min_ms"] = round(st["min_s"] * 1e3, 3)
            detail["ph_weight_bytes"] = ph_bytes
            detail["ph_roofline_tokens_per_s"] = round(ph_roof, 2)
            emit({
                "metric": f"{name0}ph_{args.bits}.01bit_decode",
                "value": round(st["tokens_per_s"], 2),
                "unit": "tokens/s/chip",
                "vs_baseline": round(st["tokens_per_s"] / ph_roof, 4),
            })
            del ph

    if not args.single_only:
        from owq_tpu.runtime.batching import Engine

        prompts = [rng.integers(0, cfg.vocab_size, size=(16,)).astype(np.int32)
                   for _ in range(args.requests)]
        eng = Engine(params, cfg, max_batch=args.batch,
                     max_len=args.tokens + 32, kernel=kernel,
                     prompt_buckets=(32,), quant_kv=args.quant_kv)
        # warmup compiles every decode-window variant the measured run
        # uses; the measurement then reuses the SAME engine (steady-state
        # serving throughput)
        eng.run(prompts[:2], max_new_tokens=args.tokens, window=args.window)
        eng.reset_stats()
        eng.run(prompts, max_new_tokens=args.tokens, window=args.window)
        tps = eng.stats["throughput_tok_s"]
        kvs = "_kv8" if args.quant_kv else ""
        emit({
            "metric": f"{name}_{args.bits}.01bit_engine_b{args.batch}{kvs}",
            "value": round(tps, 2),
            "unit": "tokens/s/chip",
            "vs_baseline": round(tps / roofline_tps, 4),
        })

        if args.speculative:
            # engine + per-slot speculation (one [B, K+1] verify forward
            # per tick): repetitive per-request streams so prompt-lookup
            # drafts accept — the regime speculation targets
            pat_prompts = []
            for i in range(args.requests):
                pat = rng.integers(0, cfg.vocab_size,
                                   size=(8,)).astype(np.int32)
                pat_prompts.append(np.tile(pat, 4)[:31])
            eng_s = Engine(params, cfg, max_batch=args.batch,
                           max_len=args.tokens + 64, kernel=kernel,
                           prompt_buckets=(32,), quant_kv=args.quant_kv,
                           speculative=4)
            eng_s.run(pat_prompts[:2], max_new_tokens=args.tokens)
            eng_s.reset_stats()
            eng_s.run(pat_prompts, max_new_tokens=args.tokens)
            stps = eng_s.stats["throughput_tok_s"]
            detail["engine_spec_forwards"] = eng_s.stats["spec_forwards"]
            detail["engine_spec_tok_per_fwd"] = round(
                eng_s.stats["generated_tokens"]
                / max(eng_s.stats["spec_forwards"], 1), 2)
            emit({
                "metric": (f"{name}_{args.bits}.01bit_engine_"
                           f"b{args.batch}{kvs}_spec"),
                "value": round(stps, 2),
                "unit": "tokens/s/chip",
                "vs_baseline": round(stps / roofline_tps, 4),
            })

    if args.speculative and not args.engine_only:
        import time

        from owq_tpu.runtime.speculative import generate_speculative

        # a repetitive stream (cyclic 16-token pattern) — the regime
        # prompt-lookup speculation targets (templated/structured text);
        # outputs remain greedy-exact regardless of acceptance
        pat = rng.integers(0, cfg.vocab_size, size=(16,)).astype(np.int32)
        prompt = np.tile(pat, 4)[None, :]
        # warm ALL window-shape variants (each accepted-length is a
        # distinct jit signature; the timed pass must reuse them)
        generate_speculative(params, cfg, prompt, args.tokens, kernel=kernel)
        t0 = time.perf_counter()
        toks, sstats = generate_speculative(params, cfg, prompt,
                                            args.tokens, kernel=kernel,
                                            return_stats=True)
        wall = time.perf_counter() - t0
        n = int(np.asarray(toks).size)
        tpf = n / max(sstats["forwards"], 1)
        detail["spec_forwards"] = sstats["forwards"]
        detail["spec_tokens_per_forward"] = round(tpf, 2)
        emit({
            "metric": f"{name}_{args.bits}.01bit_spec_decode",
            "value": round(n / wall, 2),
            "unit": "tokens/s/chip",
            "vs_baseline": round(n / wall / roofline_tps, 4),
        })

    print(json.dumps(detail), file=sys.stderr)


if __name__ == "__main__":
    main()
