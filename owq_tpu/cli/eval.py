"""Perplexity evaluation CLI.

  python -m owq_tpu.cli.eval --load ckpt_dir --model <name> --datasets wikitext2
"""

from __future__ import annotations

import argparse


def main(argv=None) -> int:
    p = argparse.ArgumentParser(prog="owq-eval")
    p.add_argument("--model", default="", help="HF path / synthetic:<shape>")
    p.add_argument("--load", default="", help="checkpoint directory")
    p.add_argument("--datasets", nargs="+", default=["wikitext2"])
    p.add_argument("--seqlen", type=int, default=None)
    p.add_argument("--batch", type=int, default=4)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--dtype", default=None)
    p.add_argument("--kernel", default="xla", choices=["xla", "pallas"])
    p.add_argument("--offload", action="store_true",
                   help="layer-wise host-RAM streaming (>HBM models)")
    p.add_argument("--cpu", action="store_true")
    args = p.parse_args(argv)
    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp

    from ..eval.ppl import eval_ppl
    from ..utils.datautils import get_loaders
    from .common import interpret_dtype, load_model, model_seqlen

    dtype = jnp.float32 if args.dtype is None else interpret_dtype(args.dtype)
    params, cfg = load_model(args.model, dtype=dtype, load=args.load)
    seqlen = model_seqlen(cfg, args.seqlen)
    for dataset in args.datasets:
        stream = get_loaders(dataset, seed=args.seed, seqlen=seqlen,
                             model=args.model, train=False,
                             vocab_size=cfg.vocab_size)
        ppl = eval_ppl(params, cfg, stream, seqlen, batch=args.batch,
                       kernel=args.kernel, verbose=True,
                       offload=args.offload)
        print(f"{dataset}: {ppl:.4f}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
