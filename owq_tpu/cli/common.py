"""Shared CLI helpers: model loading, argument post-processing."""

from __future__ import annotations

import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from ..models.config import ARCH_REGISTRY, ModelConfig, arch_for_model


def interpret_dtype(name: Optional[str]):
    # TPU-native half precision is bf16; fp16 checkpoints load as bf16.
    # None/"auto" also default to bf16 (the serving dtype).
    if name in (None, "auto", "float16", "fp16", "bfloat16", "bf16"):
        return jnp.bfloat16
    if name in ("float", "float32", "fp32", "fp"):
        return jnp.float32
    raise ValueError(f"unknown dtype {name}")


def load_model(model: str, *, dtype=jnp.float32, load: str = "",
               trust_remote_code: bool = False):
    """Load (params, cfg): from a packed/fake checkpoint dir, a synthetic
    spec ("synthetic:llama-7b[:bits]"), or a local HF checkpoint."""
    if load:
        if load.endswith((".pth", ".pt")):
            # packed checkpoint produced by the CUDA reference
            from transformers import AutoConfig

            from ..runtime.convert import load_reference_checkpoint

            hf_cfg = AutoConfig.from_pretrained(
                model, trust_remote_code=trust_remote_code)
            return load_reference_checkpoint(load, hf_cfg)
        from ..runtime.checkpoint import load_checkpoint

        params, cfg, _ = load_checkpoint(load)
        return params, cfg
    if model.startswith("synthetic:"):
        from ..models.synthetic import build_synthetic, synthetic_config

        parts = model.split(":")
        name = parts[1]
        bits = int(parts[2]) if len(parts) > 2 else None
        cfg = synthetic_config(name)
        params = jax.jit(
            lambda: build_synthetic(cfg, bits=bits, dtype=dtype))()
        return params, cfg
    from ..models.hf_import import load_hf_pretrained

    return load_hf_pretrained(model, dtype=dtype,
                              trust_remote_code=trust_remote_code)


def model_seqlen(cfg: ModelConfig, override: Optional[int] = None) -> int:
    """Reference: seqlen = max_position_embeddings, fallback 2048
    (main.py:478-483)."""
    if override:
        return override
    return cfg.max_position_embeddings or 2048


def validate_owq_args(args) -> None:
    """Mirrors processing_arguments checks (owq/utils/misc.py:69-95)."""
    if args.target_bit is not None:
        assert args.wbits < 16, "FP16 does not need target_bit"
        assert args.wbits == math.floor(args.target_bit), \
            "target_bit should be (wbits <= target_bit < wbits+1)"
    elif args.target_rank is not None:
        assert args.target_rank > 0
    else:
        if args.wbits < 16 and not args.nearest and args.tuning == "mse":
            # plain GPTQ uses minmax rounding, like the reference
            print("GPTQ uses minmax rtn quantization; tuning set to minmax.")
            args.tuning = "minmax"
    if getattr(args, "save", ""):
        if not (args.fake or args.packing):
            raise ValueError("--save requires --fake and/or --packing")
        if args.packing and args.wbits not in (3, 4):
            raise ValueError("only 3/4-bit packing is supported")
    elif getattr(args, "fake", False) or getattr(args, "packing", False):
        raise ValueError("--fake/--packing require --save")


def owq_layer_mask(arch, layer_aliases):
    """CLI layer aliases -> {linear_name: bool} (misc.py:123-138)."""
    mask = {name: layer_aliases is None for name in arch.map_layer.values()}
    if layer_aliases is not None:
        for alias in layer_aliases:
            if alias not in arch.map_layer:
                raise ValueError(
                    f"no '{alias}' layer; available: {list(arch.map_layer)}")
            mask[arch.map_layer[alias]] = True
    return mask
