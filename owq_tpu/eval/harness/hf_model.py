"""The "hf" model adapter: stock HuggingFace torch models (CPU/any device).

The analogue of the reference's upstream ``hf-causal`` adapter
(lm_eval/models/gpt2.py HFLM / huggingface.py AutoCausalLM): evaluates an
unmodified transformers checkpoint through the same harness, which gives a
cross-implementation oracle for the JAX adapter — the same task scored via
"owq" (our runtime) and "hf" (torch) must agree.

Implements the three request types over torch with the same batching
strategy as JaxLM: length-sorted reordering, right-padded batches,
continuation logprob + greedy-match extraction.
"""

from __future__ import annotations

from typing import List, Optional, Sequence, Tuple

import numpy as np

from .base import LM, Reorderer, rolling_token_windows
from .registry import register_model

__all__ = ["HFLM"]


@register_model("hf")
@register_model("hf-causal")
class HFLM(LM):
    def __init__(self, pretrained: str = "", tokenizer: str = "",
                 batch_size="8", max_length=None, dtype: str = "float32",
                 device: str = "cpu", trust_remote_code=False, model=None,
                 tok=None):
        """``model``/``tok`` allow passing in-memory objects (tests)."""
        import torch

        trust = str(trust_remote_code).lower() in ("1", "true", "yes")
        if model is None:
            from transformers import AutoModelForCausalLM

            model = AutoModelForCausalLM.from_pretrained(
                pretrained,
                torch_dtype=torch.float32 if dtype in ("float32", "fp32")
                else getattr(torch, dtype),
                trust_remote_code=trust)
        self.model = model.eval().to(device)
        if tok is None:
            from transformers import AutoTokenizer

            try:
                tok = AutoTokenizer.from_pretrained(tokenizer or pretrained,
                                                    use_fast=False,
                                                    trust_remote_code=trust)
            except Exception:
                tok = AutoTokenizer.from_pretrained(tokenizer or pretrained,
                                                    trust_remote_code=trust)
        self.tok = tok
        self.device = device
        self.batch_size = int(batch_size)
        cfg = self.model.config
        self.max_length = (int(max_length) if max_length else
                           getattr(cfg, "max_position_embeddings", None) or
                           getattr(cfg, "n_positions", None) or 2048)

    # -- tokenization ---------------------------------------------------
    def tok_encode(self, s: str) -> List[int]:
        return self.tok.encode(s, add_special_tokens=False)

    @property
    def eot_token_id(self) -> int:
        return int(getattr(self.tok, "eos_token_id", 0) or 0)

    # -- scoring ----------------------------------------------------------
    def _score_token_requests(
            self, reqs: Sequence[Tuple[List[int], List[int]]]
    ) -> List[Tuple[float, bool]]:
        import torch
        import torch.nn.functional as F

        reorder = Reorderer(list(reqs), key=lambda r: -(len(r[0]) + len(r[1])))
        results = []
        bs = self.batch_size
        with torch.no_grad():
            for start in range(0, len(reorder.items), bs):
                chunk = reorder.items[start:start + bs]
                rows, spans = [], []
                maxlen = 0
                for ctx, cont in chunk:
                    ids = (ctx + cont)[-(self.max_length + 1):]
                    cont_len = min(len(cont), len(ids) - 1)
                    rows.append(ids)
                    spans.append((len(ids) - cont_len, cont_len))
                    maxlen = max(maxlen, len(ids))
                batch = np.zeros((len(rows), maxlen), np.int64)
                mask = np.zeros((len(rows), maxlen), np.int64)
                for i, ids in enumerate(rows):
                    batch[i, :len(ids)] = ids
                    mask[i, :len(ids)] = 1
                out = self.model(torch.from_numpy(batch).to(self.device),
                                 attention_mask=torch.from_numpy(mask).to(
                                     self.device))
                logp = F.log_softmax(out.logits[:, :-1].float(), dim=-1)
                tgt = torch.from_numpy(batch[:, 1:]).to(self.device)
                token_lp = torch.gather(logp, 2, tgt.unsqueeze(-1)).squeeze(-1)
                greedy = logp.argmax(dim=-1)
                token_lp = token_lp.cpu().numpy()
                greedy = greedy.cpu().numpy()
                for i in range(len(chunk)):
                    s, L = spans[i]
                    sl = slice(s - 1, s - 1 + L)
                    ll = float(token_lp[i, sl].sum())
                    ids = rows[i]
                    is_greedy = bool((greedy[i, sl] ==
                                      np.asarray(ids[s:s + L])).all())
                    results.append((ll, is_greedy))
        return reorder.restore(results)

    def loglikelihood(self, requests):
        token_reqs = []
        for context, continuation in requests:
            ctx = self.tok_encode(context) if context else [self.eot_token_id]
            cont = self.tok_encode(continuation) or [self.eot_token_id]
            token_reqs.append((ctx, cont))
        return self._score_token_requests(token_reqs)

    def loglikelihood_rolling(self, requests):
        out = []
        for (text,) in [(r,) if isinstance(r, str) else r for r in requests]:
            tokens = self.tok_encode(text)
            windows = rolling_token_windows(tokens, self.eot_token_id,
                                            self.max_length)
            scored = self._score_token_requests(windows)
            out.append(sum(ll for ll, _ in scored))
        return out

    def greedy_until(self, requests, max_new: int = 256):
        import torch

        out = []
        with torch.no_grad():
            for context, until in requests:
                if isinstance(until, dict):
                    until = until.get("until", [])
                until = list(until or [])
                ctx = self.tok_encode(context)[-(self.max_length // 2):]
                if not ctx:
                    ctx = [self.eot_token_id]
                ids = torch.tensor([ctx], dtype=torch.long,
                                   device=self.device)
                gen = self.model.generate(
                    ids, max_new_tokens=min(max_new,
                                            self.max_length - len(ctx)),
                    do_sample=False, num_beams=1,
                    pad_token_id=self.eot_token_id)
                text = self.tok.decode(gen[0, len(ctx):].tolist())
                for stop in until:
                    idx = text.find(stop)
                    if idx >= 0:
                        text = text[:idx]
                out.append(text)
        return out
