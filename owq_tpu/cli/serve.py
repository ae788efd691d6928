"""Serving demo CLI (the reference demo/ analogue).

Single model:
  python -m owq_tpu.cli.serve --load ckpt --tokenizer <hf_path>

Two-model compare (FP16 vs OWQ side by side, demo_2model.py analogue):
  python -m owq_tpu.cli.serve --model <hf_path> --load-b ckpt --tokenizer <hf_path>
"""

from __future__ import annotations

import argparse


def main(argv=None) -> int:
    p = argparse.ArgumentParser(prog="owq-serve")
    p.add_argument("--model", default="", help="model A: HF path / synthetic:<shape>")
    p.add_argument("--load", default="", help="model A: checkpoint dir")
    p.add_argument("--model-b", default="", help="model B (compare mode)")
    p.add_argument("--load-b", default="", help="model B checkpoint dir")
    p.add_argument("--tokenizer", required=True)
    p.add_argument("--host", default="127.0.0.1")
    p.add_argument("--port", type=int, default=7860)
    p.add_argument("--kernel", default="xla", choices=["xla", "pallas"])
    p.add_argument("--max-len", type=int, default=2048)
    p.add_argument("--speculative", action="store_true",
                   help="prompt-lookup speculative decoding for greedy "
                        "(temperature=0) requests — identical tokens, "
                        "fewer weight-streaming passes")
    p.add_argument("--draft-len", type=int, default=8)
    p.add_argument("--draft-model", default="",
                   help="draft model for draft-MODEL speculation (HF path "
                        "/ synthetic:<shape>); shares the tokenizer")
    p.add_argument("--draft-load", default="",
                   help="draft model checkpoint dir")
    p.add_argument("--engine", action="store_true",
                   help="continuous-batching serving: concurrent requests "
                        "share one slot pool instead of serializing")
    p.add_argument("--max-batch", type=int, default=8,
                   help="engine slot count (with --engine)")
    p.add_argument("--tp", type=int, default=1,
                   help="tensor-parallel ways (implies --engine; shards "
                        "the model over a tp mesh axis)")
    p.add_argument("--cpu", action="store_true")
    args = p.parse_args(argv)
    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp
    from transformers import AutoTokenizer

    from ..serve.server import EngineWorker, ModelWorker, serve
    from .common import load_model

    try:
        tok = AutoTokenizer.from_pretrained(args.tokenizer, use_fast=False)
    except Exception:
        tok = AutoTokenizer.from_pretrained(args.tokenizer)

    def make_worker(model, load, name):
        params, cfg = load_model(model, dtype=jnp.bfloat16, load=load)
        if args.engine or args.tp > 1:
            mesh = None
            if args.tp > 1:
                from ..parallel import make_mesh

                mesh = make_mesh(dp=1, tp=args.tp)
            return EngineWorker(params, cfg, tok, kernel=args.kernel,
                                max_len=args.max_len, name=name,
                                max_batch=args.max_batch, mesh=mesh)
        draft = None
        if args.draft_model or args.draft_load:
            draft = load_model(args.draft_model, dtype=jnp.bfloat16,
                               load=args.draft_load)
        return ModelWorker(params, cfg, tok, kernel=args.kernel,
                           max_len=args.max_len, name=name,
                           speculative=args.speculative,
                           draft_len=args.draft_len, draft=draft)

    workers = [make_worker(args.model, args.load, "a")]
    if args.model_b or args.load_b:
        workers.append(make_worker(args.model_b, args.load_b, "b"))
    serve(workers, host=args.host, port=args.port)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
