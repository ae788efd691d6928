"""Quantization CLI — the analogue of the reference's main.py.

  python -m owq_tpu.cli.quantize <model> <dataset> --wbits 3 --target_bit 3.01 \\
      --save ckpt_dir --packing

Accepts local HF checkpoints, "synthetic:<shape>" specs (offline), and the
same algorithm flags as the reference (main.py:355-465).
"""

from __future__ import annotations

import argparse
import time


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog="owq-quantize", description=__doc__)
    p.add_argument("model", help="HF checkpoint path or synthetic:<shape>")
    p.add_argument("dataset",
                   help="wikitext2 | ptb | c4 | synthetic | path(.npy/.pt)")
    p.add_argument("--nsamples", type=int, default=128)
    p.add_argument("--wbits", type=int, default=16, choices=[2, 3, 4, 16])
    p.add_argument("--target_bit", type=float, default=None)
    p.add_argument("--target_rank", type=int, default=None)
    p.add_argument("--tuning", default="mse", choices=["mse", "minmax"])
    p.add_argument("--no_frob_norm", action="store_true")
    p.add_argument("--percdamp", type=float, default=0.01)
    p.add_argument("--dtype", default=None)
    p.add_argument("--layers", nargs="+", default=None,
                   help="layer aliases to apply OWQ to (e.g. q k v o)")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--sym", action="store_true")
    p.add_argument("--nearest", action="store_true",
                   help="round-to-nearest instead of GPTQ reconstruction")
    p.add_argument("--groupsize", type=int, default=-1)
    p.add_argument("--no-eval", action="store_true", dest="no_eval")
    p.add_argument("--save", default="", help="checkpoint directory")
    p.add_argument("--load", default="", help="load an existing checkpoint")
    p.add_argument("--logfile", default="")
    p.add_argument("--fake", action="store_true")
    p.add_argument("--packing", action="store_true")
    p.add_argument("--benchmark", type=int, default=0)
    p.add_argument("--faster", action="store_true",
                   help="use the fused Pallas kernels (the reference's "
                        "faster-kernel flag; default on TPU backends)")
    p.add_argument("--act-order", action="store_true", dest="act_order")
    p.add_argument("--true-sequential", action="store_true",
                   dest="true_sequential")
    p.add_argument("--trust_remote_code", action="store_true")
    p.add_argument("--seqlen", type=int, default=None)
    p.add_argument("--resume-dir", default=None,
                   help="per-layer reconstruction checkpoints for resume")
    p.add_argument("--offload", action="store_true",
                   help="host-RAM streaming for models larger than HBM")
    p.add_argument("--eval-datasets", nargs="+",
                   default=["wikitext2", "ptb", "c4"])
    p.add_argument("--eval-batch", type=int, default=4)
    p.add_argument("--cpu", action="store_true", help="force CPU backend")
    return p


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)
    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    from ..models.config import arch_for_model
    from ..eval.ppl import eval_ppl
    from ..recon.pipeline import quantize_model
    from ..recon.gptq import rtn_quantize
    from ..core.quantizer import QuantSpec
    from ..utils.datautils import get_loaders
    from .common import (interpret_dtype, load_model, model_seqlen,
                         owq_layer_mask, validate_owq_args)

    validate_owq_args(args)
    dtype = jnp.float32 if args.dtype is None else interpret_dtype(args.dtype)
    params, cfg = load_model(args.model, dtype=dtype, load=args.load,
                             trust_remote_code=args.trust_remote_code)
    arch = arch_for_model(args.model if not args.model.startswith("synthetic:")
                          else cfg.family)
    seqlen = model_seqlen(cfg, args.seqlen)

    quantizers = None
    if not args.load and args.wbits < 16 and not args.nearest:
        calib = get_loaders(args.dataset, nsamples=args.nsamples,
                            seed=args.seed, seqlen=seqlen, model=args.model,
                            train=True, vocab_size=cfg.vocab_size)
        tick = time.time()
        params, quantizers = quantize_model(
            params, cfg, arch, calib, wbits=args.wbits,
            target_bit=args.target_bit, target_rank=args.target_rank,
            sym=args.sym, tuning=args.tuning, percdamp=args.percdamp,
            groupsize=args.groupsize, actorder=args.act_order,
            true_sequential=args.true_sequential,
            no_frob_norm=args.no_frob_norm,
            owq_layers=owq_layer_mask(arch, args.layers), dtype=dtype,
            resume_dir=args.resume_dir, offload=args.offload)
        print(f"Running Time : {round(time.time() - tick, 1)}")
    elif args.nearest and args.wbits < 16:
        from ..models.transformer import quantizable_names
        from ..recon.pipeline import _get_linear, _set_linear
        from ..runtime.quant_linear import DenseLinear

        spec = QuantSpec(args.wbits, args.sym)
        for blk in params["layers"]:
            for name in quantizable_names(cfg):
                lin = _get_linear(blk, name)
                Q = rtn_quantize(lin.w.T, spec, mse=False)
                _set_linear(blk, name, DenseLinear(w=Q.T.astype(lin.w.dtype),
                                                   b=lin.b))

    if args.benchmark:
        from ..runtime.generate import benchmark_decode

        bench_ids = get_loaders(args.dataset, nsamples=1, seed=args.seed,
                                seqlen=seqlen, model=args.model, train=True,
                                vocab_size=cfg.vocab_size)[0][: args.benchmark]
        stats = benchmark_decode(params, cfg, bench_ids,
                                 kernel="pallas" if args.faster else "xla")
        print(f"Median(second): {stats['median_s']}")
        print(f"Min(second): {stats['min_s']}")
        print(f"PPL: {stats['ppl']}")
        return 0

    results = []
    if not args.no_eval:
        for dataset in args.eval_datasets:
            # An eval failure (missing tokenizer/dataset in an offline env)
            # must not lose the reconstruction: --save still runs below.
            try:
                stream = get_loaders(dataset, seed=args.seed, seqlen=seqlen,
                                     model=args.model, train=False,
                                     vocab_size=cfg.vocab_size)
                print(dataset)
                ppl = eval_ppl(params, cfg, stream, seqlen,
                               batch=args.eval_batch, verbose=True)
                print(ppl)
                results.append((dataset, ppl))
            except Exception as e:  # noqa: BLE001
                if not args.save:
                    raise
                print(f"eval on {dataset} failed ({type(e).__name__}: {e}); "
                      f"continuing to --save")

    if args.logfile and results:
        with open(args.logfile, "a") as f:
            f.write(f"{args.model} wbits={args.wbits} "
                    f"target_bit={args.target_bit}: {results}\n")

    if args.save:
        from ..runtime.checkpoint import pack_model, save_checkpoint

        if quantizers is None:
            # RTN / --load runs carry no reconstruction state: only a fake
            # (fake-quant weights) checkpoint is possible.  (The reference
            # crashes with a NameError here, SURVEY.md §8; we save what we
            # can and say so.)
            if args.packing:
                raise ValueError(
                    "--packing requires a GPTQ reconstruction run "
                    "(packed checkpoints need per-layer quantizer state); "
                    "use --fake, or drop --nearest/--load")
            save_checkpoint(args.save + "_fake", params, cfg, packed=False)
            print(f"fake quantized model saved to {args.save}_fake")
            return 0
        if args.fake:
            save_checkpoint(args.save + "_fake", params, cfg,
                            quantizers=quantizers, packed=False)
            print(f"fake quantized model saved to {args.save}_fake")
        if args.packing:
            packed = pack_model(params, quantizers, args.wbits,
                                weight_dtype=dtype)
            save_checkpoint(args.save, packed, cfg, quantizers=quantizers,
                            packed=True)
            print(f"{args.wbits}-bit packed model saved to {args.save}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
