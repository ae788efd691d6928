"""The "hf-seq2seq" adapter: encoder-decoder transformers checkpoints.

Registry parity with the reference's hf-seq2seq (huggingface.py
AutoSeq2SeqLM): the context feeds the encoder, the continuation is scored
by the decoder (no rolling windows — an encoder-decoder has no single
autoregressive stream over context+continuation, same as the reference).
"""

from __future__ import annotations

from typing import List, Tuple

import numpy as np

from .base import LM, Reorderer
from .registry import register_model

__all__ = ["Seq2SeqLM"]


@register_model("hf-seq2seq")
class Seq2SeqLM(LM):
    def __init__(self, pretrained: str = "", tokenizer: str = "",
                 batch_size="8", max_length=None, device: str = "cpu",
                 trust_remote_code=False, model=None, tok=None,
                 max_gen_toks="256"):
        import torch

        trust = str(trust_remote_code).lower() in ("1", "true", "yes")
        if model is None:
            from transformers import AutoModelForSeq2SeqLM

            model = AutoModelForSeq2SeqLM.from_pretrained(
                pretrained, torch_dtype=torch.float32,
                trust_remote_code=trust)
        self.model = model.eval().to(device)
        if tok is None:
            from transformers import AutoTokenizer

            tok = AutoTokenizer.from_pretrained(tokenizer or pretrained,
                                                trust_remote_code=trust)
        self.tok = tok
        self.device = device
        self.batch_size = int(batch_size)
        self.max_gen_toks = int(max_gen_toks)
        cfg = self.model.config
        self.max_length = (int(max_length) if max_length else
                           getattr(cfg, "n_positions", None) or
                           getattr(cfg, "max_position_embeddings", None) or
                           2048)

    @property
    def eot_token_id(self) -> int:
        return int(getattr(self.tok, "eos_token_id", 0) or 0)

    def loglikelihood(self, requests) -> List[Tuple[float, bool]]:
        import torch
        import torch.nn.functional as F

        reorder = Reorderer(list(requests),
                            key=lambda r: -(len(r[0]) + len(r[1])))
        results = []
        with torch.no_grad():
            for start in range(0, len(reorder.items), self.batch_size):
                chunk = reorder.items[start:start + self.batch_size]
                enc = self.tok([c for c, _ in chunk], return_tensors="pt",
                               padding=True, truncation=True,
                               max_length=self.max_length)
                lab = self.tok([c for _, c in chunk], return_tensors="pt",
                               padding=True, truncation=True,
                               max_length=self.max_length,
                               add_special_tokens=False)
                labels = lab["input_ids"].to(self.device)
                out = self.model(
                    input_ids=enc["input_ids"].to(self.device),
                    attention_mask=enc["attention_mask"].to(self.device),
                    labels=labels)
                logp = F.log_softmax(out.logits.float(), dim=-1)
                token_lp = torch.gather(
                    logp, 2, labels.unsqueeze(-1)).squeeze(-1)
                greedy = logp.argmax(dim=-1)
                mask = lab["attention_mask"].to(self.device)
                for i in range(len(chunk)):
                    m = mask[i].bool()
                    ll = float(token_lp[i][m].sum())
                    is_greedy = bool((greedy[i][m] == labels[i][m]).all())
                    results.append((ll, is_greedy))
        return reorder.restore(results)

    def loglikelihood_rolling(self, requests):
        raise NotImplementedError(
            "rolling perplexity is undefined for encoder-decoder models "
            "(same as the reference's hf-seq2seq)")

    def greedy_until(self, requests) -> List[str]:
        import torch

        out = []
        with torch.no_grad():
            for context, until in requests:
                stops = until if isinstance(until, (list, tuple)) else [until]
                enc = self.tok([context], return_tensors="pt",
                               truncation=True, max_length=self.max_length)
                gen = self.model.generate(
                    input_ids=enc["input_ids"].to(self.device),
                    attention_mask=enc["attention_mask"].to(self.device),
                    max_new_tokens=self.max_gen_toks, do_sample=False)
                text = self.tok.decode(gen[0], skip_special_tokens=True)
                for s in stops:
                    idx = text.find(s)
                    if idx >= 0:
                        text = text[:idx]
                out.append(text)
        return out
