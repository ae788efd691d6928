"""PEFT/LoRA adapter loading over owq_tpu models.

The analogue of the reference eval adapter's ``peft=`` support
(lm_eval/models/huggingface_owq.py:288-295, which calls
PeftModel.from_pretrained onto the quantized torch model): low-rank deltas
ride on top of the (possibly packed 3/4-bit) base linears — the QLoRA-style
serving configuration.

Two application modes:
  * wrap (default): each adapted linear becomes a ``LoraLinear`` whose
    forward is ``base(x) + scaling * (x @ Aᵀ) @ Bᵀ`` — works on packed
    (quantized) weights, exact match to PEFT's unmerged forward;
  * merge: fold ``scaling * B @ A`` into dense weights (fp/fake models
    only), exact match to PEFT's merge_and_unload.
"""

from __future__ import annotations

import dataclasses
import json
import os
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .quant_linear import DenseLinear, PackedLinear

__all__ = ["LoraLinear", "load_peft_adapter", "apply_lora"]


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class LoraLinear:
    """base(x) + scaling · (x Aᵀ) Bᵀ — low-rank delta over any base linear.

    a: [r, in], b: [out, r] (PEFT orientation).  Only a/b carry gradients
    when fine-tuning (packed base codes are integers; dense bases can be
    frozen by the optimizer).
    """

    base: Any
    a: jnp.ndarray
    b: jnp.ndarray
    scaling: float = dataclasses.field(metadata=dict(static=True))

    @property
    def in_features(self) -> int:
        return self.base.in_features

    @property
    def out_features(self) -> int:
        return self.base.out_features

    def apply(self, x: jnp.ndarray, kernel: str = "xla") -> jnp.ndarray:
        if isinstance(self.base, PackedLinear):
            y = self.base.apply(x, kernel=kernel)
        else:
            y = self.base.apply(x)
        delta = jnp.dot(jnp.dot(x, self.a.T.astype(x.dtype)),
                        self.b.T.astype(x.dtype))
        return y + self.scaling * delta


def load_peft_adapter(path: str) -> Tuple[Dict[str, Any], Dict[str, Any]]:
    """Read a PEFT LoRA adapter directory -> (config, {module: (A, B)}).

    Module keys are the HF qualnames with the peft prefixes stripped
    (e.g. 'model.layers.0.self_attn.q_proj').
    """
    with open(os.path.join(path, "adapter_config.json")) as f:
        acfg = json.load(f)
    if acfg.get("peft_type", "LORA").upper() != "LORA":
        raise ValueError(f"unsupported peft_type {acfg.get('peft_type')}")

    st = os.path.join(path, "adapter_model.safetensors")
    if os.path.exists(st):
        from safetensors.numpy import load_file

        raw = load_file(st)
    else:
        import torch

        raw = {k: v.float().numpy() for k, v in
               torch.load(os.path.join(path, "adapter_model.bin"),
                          map_location="cpu").items()}

    pairs: Dict[str, Dict[str, np.ndarray]] = {}
    for key, arr in raw.items():
        # base_model.model.<qualname>.lora_{A,B}[.default].weight
        k = key
        for pre in ("base_model.model.", "base_model."):
            if k.startswith(pre):
                k = k[len(pre):]
                break
        for which in ("lora_A", "lora_B"):
            marker = f".{which}."
            if marker in k or k.endswith(f".{which}.weight"):
                qual = k.split(f".{which}")[0]
                pairs.setdefault(qual, {})[which] = np.asarray(arr,
                                                               np.float32)
                break
    adapters = {q: (ab["lora_A"], ab["lora_B"]) for q, ab in pairs.items()
                if "lora_A" in ab and "lora_B" in ab}
    return acfg, adapters


def apply_lora(params: Dict[str, Any], cfg, path: str, *,
               merge: bool = False, dtype=None) -> Dict[str, Any]:
    """Attach (or merge) a PEFT LoRA adapter onto a param tree in place."""
    from .convert import _reference_name_map

    acfg, adapters = load_peft_adapter(path)
    r = acfg["r"]
    scaling = acfg.get("lora_alpha", r) / r
    if acfg.get("use_rslora"):
        scaling = acfg["lora_alpha"] / (r ** 0.5)
    map_name = _reference_name_map(cfg)

    n_applied = 0
    for qual, (A, B) in adapters.items():
        li, part, leaf = map_name(qual)
        base = params["layers"][li][part][leaf]
        a = jnp.asarray(A, dtype or jnp.float32)
        b = jnp.asarray(B, dtype or jnp.float32)
        if merge:
            if not isinstance(base, DenseLinear):
                raise TypeError(
                    f"{qual}: cannot merge LoRA into packed weights — "
                    "use merge=False (wrapped forward)")
            delta = scaling * jnp.dot(b, a)  # [out, in]
            params["layers"][li][part][leaf] = DenseLinear(
                w=base.w + delta.T.astype(base.w.dtype), b=base.b)
        else:
            params["layers"][li][part][leaf] = LoraLinear(
                base=base, a=a, b=b, scaling=float(scaling))
        n_applied += 1
    if not n_applied:
        raise ValueError(f"no LoRA pairs found in {path}")
    return params
