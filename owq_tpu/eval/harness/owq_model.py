"""The "owq" model adapter: JaxLM over an owq_tpu checkpoint.

The analogue of the reference's ``hf-causal-owq`` adapter
(lm_eval/models/huggingface_owq.py): accepts ``pretrained=`` (HF path or
synthetic spec), ``load=`` (packed/fake owq checkpoint dir), batch size,
and kernel selection.
"""

from __future__ import annotations

import jax.numpy as jnp

from .base import JaxLM
from .registry import register_model


@register_model("owq")
class OwqLM(JaxLM):
    def __init__(self, pretrained: str = "", load: str = "",
                 tokenizer: str = "", batch_size="8", max_length=None,
                 dtype: str = "float32", kernel: str = "xla",
                 peft: str = "", **kwargs):
        from ...cli.common import interpret_dtype, load_model

        dt = jnp.float32 if dtype in ("float32", "fp32") else interpret_dtype(dtype)
        params, cfg = load_model(pretrained, dtype=dt, load=load)
        if peft:
            # QLoRA-style adapters over the (packed) base, like the
            # reference's peft= kwarg (huggingface_owq.py:288-295)
            from ...runtime.lora import apply_lora

            params = apply_lora(params, cfg, peft)

        from transformers import AutoTokenizer

        try:
            tok = AutoTokenizer.from_pretrained(tokenizer or pretrained,
                                                use_fast=False)
        except Exception:
            tok = AutoTokenizer.from_pretrained(tokenizer or pretrained)
        super().__init__(params, cfg, tok, batch_size=int(batch_size),
                         max_length=int(max_length) if max_length else None,
                         kernel=kernel)
