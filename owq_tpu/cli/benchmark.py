"""Decode latency benchmark CLI (reference main.py --benchmark analogue).

  python -m owq_tpu.cli.benchmark --load ckpt --tokens 128
  python -m owq_tpu.cli.benchmark --model synthetic:llama-7b:3 --tokens 128
"""

from __future__ import annotations

import argparse
import json


def main(argv=None) -> int:
    p = argparse.ArgumentParser(prog="owq-benchmark")
    p.add_argument("--model", default="", help="HF path / synthetic:<shape>[:bits]")
    p.add_argument("--load", default="", help="checkpoint directory")
    p.add_argument("--tokens", type=int, default=128)
    p.add_argument("--kernel", default="xla", choices=["xla", "pallas"])
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--cpu", action="store_true")
    args = p.parse_args(argv)
    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp
    import numpy as np

    from ..runtime.generate import benchmark_decode
    from .common import load_model

    params, cfg = load_model(args.model, dtype=jnp.bfloat16, load=args.load)
    rng = np.random.default_rng(args.seed)
    ids = rng.integers(0, cfg.vocab_size, size=(1, args.tokens)).astype(np.int32)
    stats = benchmark_decode(params, cfg, ids, kernel=args.kernel,
                             max_len=args.tokens)
    print(json.dumps(stats))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
