"""Zero-shot accuracy CLI (the reference's zeroshot.py analogue).

  python -m owq_tpu.cli.zeroshot --model owq \\
      --model_args pretrained=<hf_path>,load=<ckpt_dir> \\
      --tasks hellaswag,piqa --num_fewshot 0
"""

from __future__ import annotations

import argparse
import json
import time


def main(argv=None) -> int:
    p = argparse.ArgumentParser(prog="owq-zeroshot")
    p.add_argument("--model", default="owq")
    p.add_argument("--model_args", default="")
    p.add_argument("--tasks", default=None,
                   help="comma-separated task list; omit to print registry")
    p.add_argument("--num_fewshot", type=int, default=0)
    p.add_argument("--limit", type=int, default=None)
    p.add_argument("--batch_size", type=int, default=None)
    p.add_argument("--no_cache", action="store_true", default=True)
    p.add_argument("--use_cache", dest="no_cache", action="store_false")
    p.add_argument("--cache_db", default="lm_cache.db")
    p.add_argument("--output_path", default="")
    p.add_argument("--logfile", default="")
    p.add_argument("--data_dir", default=None)
    p.add_argument("--cpu", action="store_true")
    p.add_argument("--check_integrity", action="store_true",
                   help="validate task classes (working equivalent of the "
                        "reference flag, which crashes — utils.py:249-286)")
    args = p.parse_args(argv)
    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    from ..eval.harness import list_tasks, make_table, simple_evaluate

    if args.check_integrity:
        from ..eval.harness.integrity import run_integrity_checks

        bad = run_integrity_checks(
            args.tasks.split(",") if args.tasks else None)
        if bad:
            return 1
        if not args.model_args:  # integrity-only invocation
            return 0

    if not args.tasks:
        print("Available tasks:\n  " + "\n  ".join(list_tasks()))
        return 0

    model_args = args.model_args
    if args.batch_size:
        model_args += f",batch_size={args.batch_size}" if model_args else \
            f"batch_size={args.batch_size}"

    t0 = time.time()
    results = simple_evaluate(
        model=args.model, model_args=model_args,
        tasks=args.tasks.split(","), num_fewshot=args.num_fewshot,
        limit=args.limit, no_cache=args.no_cache, cache_db=args.cache_db,
        data_dir=args.data_dir)
    dt = time.time() - t0

    table = make_table(results)
    print(table)
    print(f"eval time: {dt:.1f}s")
    if args.output_path:
        with open(args.output_path, "w") as f:
            json.dump(results, f, indent=1, default=str)
    if args.logfile:
        with open(args.logfile, "a") as f:
            f.write(f"\n{args.model} {model_args} fewshot={args.num_fewshot}\n")
            f.write(table + "\n")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
