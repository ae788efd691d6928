"""Hosted-API model adapters: "gpt3", "anthropic", "textsynth".

Registry parity with the reference (lm_eval/models/__init__.py:9-20 →
gpt3.py, anthropic_llms.py, textsynth.py), re-implemented over plain
urllib (no vendor SDK dependency).  Same request semantics:

  * gpt3 — legacy OpenAI completions with ``echo=True, logprobs,
    max_tokens=0`` to score continuations (gpt3.py:117-166) and
    ``temperature=0`` completions for greedy_until (gpt3.py:168-220);
    token-level windowing uses a local HF tokenizer (the reference uses
    the model's BPE; pass ``tokenizer=`` for exactness).
  * anthropic — greedy_until only via the Messages API; loglikelihood is
    unsupported, like the reference (anthropic_llms.py raises).
  * textsynth — server-side ``/logprob`` scoring (returns logprob +
    is_greedy directly, textsynth.py:89-107) and ``top_k=1`` completions;
    loglikelihood_rolling unsupported (no tokenization API), matching
    textsynth.py:109-117.

The HTTP layer is a single injectable callable (``transport``) so the
adapters are unit-testable offline; this container has zero egress, so
live use requires a networked host + API keys via the standard env vars.
"""

from __future__ import annotations

import json
import os
import urllib.request
from typing import Callable, Dict, List, Optional, Sequence, Tuple

from .base import LM
from .registry import register_model

__all__ = ["GPT3LM", "AnthropicLM", "TextSynthLM"]


def _http_post(url: str, headers: Dict[str, str], payload: dict,
               timeout: float = 120.0) -> dict:
    req = urllib.request.Request(
        url, data=json.dumps(payload).encode("utf-8"),
        headers={"Content-Type": "application/json", **headers})
    with urllib.request.urlopen(req, timeout=timeout) as resp:
        return json.loads(resp.read().decode("utf-8"))


def _truncate_at(text: str, stops: Sequence[str]) -> str:
    for s in stops:
        idx = text.find(s)
        if idx >= 0:
            text = text[:idx]
    return text


@register_model("gpt3")
class GPT3LM(LM):
    REQ_CHUNK_SIZE = 20

    def __init__(self, engine: str = "davinci-002", tokenizer: str = "gpt2",
                 truncate=False, max_length="2048", max_gen_toks="256",
                 api_base: str = "https://api.openai.com/v1",
                 transport: Optional[Callable] = None, tok=None):
        self.engine = engine
        self.max_length = int(max_length)
        self.max_gen_toks = int(max_gen_toks)
        self.api_base = api_base
        self._post = transport or _http_post
        if tok is None:
            from transformers import AutoTokenizer

            tok = AutoTokenizer.from_pretrained(tokenizer)
        self.tok = tok

    def _headers(self) -> Dict[str, str]:
        key = os.environ.get("OPENAI_API_KEY", "")
        if not key:
            raise RuntimeError("OPENAI_API_KEY is not set")
        return {"Authorization": f"Bearer {key}"}

    @property
    def eot_token_id(self) -> int:
        return int(self.tok.eos_token_id or 0)

    def tok_encode(self, s: str) -> List[int]:
        return self.tok.encode(s, add_special_tokens=False)

    def loglikelihood(self, requests) -> List[Tuple[float, bool]]:
        results: List[Tuple[float, bool]] = []
        reqs = []
        for context, continuation in requests:
            ctx = self.tok_encode(context) if context else [self.eot_token_id]
            cont = self.tok_encode(continuation)
            reqs.append((ctx, cont))
        for start in range(0, len(reqs), self.REQ_CHUNK_SIZE):
            chunk = reqs[start:start + self.REQ_CHUNK_SIZE]
            prompts, ctxlens = [], []
            for ctx, cont in chunk:
                inp = (ctx + cont)[-(self.max_length + 1):]
                ctxlen = len(ctx) - max(
                    0, len(ctx) + len(cont) - (self.max_length + 1))
                prompts.append(inp)
                ctxlens.append(ctxlen)
            resp = self._post(
                f"{self.api_base}/completions", self._headers(),
                {"model": self.engine, "prompt": prompts, "echo": True,
                 "max_tokens": 0, "temperature": 0.0, "logprobs": 10})
            for choice, ctxlen in zip(resp["choices"], ctxlens):
                lp = choice["logprobs"]
                token_lp = lp["token_logprobs"][ctxlen:]
                ll = float(sum(x for x in token_lp if x is not None))
                is_greedy = True
                for i in range(ctxlen, len(lp["tokens"])):
                    tok = lp["tokens"][i]
                    top = lp["top_logprobs"][i]
                    if top and max(top, key=top.get) != tok:
                        is_greedy = False
                        break
                results.append((ll, is_greedy))
        return results

    def loglikelihood_rolling(self, requests) -> List[float]:
        from .base import rolling_token_windows

        out = []
        for req in requests:
            text = req if isinstance(req, str) else req[0]
            tokens = self.tok_encode(text)
            windows = rolling_token_windows(tokens, self.eot_token_id,
                                            self.max_length)
            total = 0.0
            for ctx, cont in windows:
                prompt = (ctx + cont)[-(self.max_length + 1):]
                resp = self._post(
                    f"{self.api_base}/completions", self._headers(),
                    {"model": self.engine, "prompt": [prompt], "echo": True,
                     "max_tokens": 0, "temperature": 0.0, "logprobs": 10})
                lp = resp["choices"][0]["logprobs"]["token_logprobs"]
                cl = min(len(cont), len(prompt) - 1)
                total += float(sum(x for x in lp[len(prompt) - cl:]
                                   if x is not None))
            out.append(total)
        return out

    def greedy_until(self, requests) -> List[str]:
        out = []
        for context, until in requests:
            stops = until if isinstance(until, (list, tuple)) else [until]
            resp = self._post(
                f"{self.api_base}/completions", self._headers(),
                {"model": self.engine, "prompt": [context],
                 "max_tokens": self.max_gen_toks, "temperature": 0.0,
                 "stop": list(stops)[:4]})
            out.append(_truncate_at(resp["choices"][0]["text"], stops))
        return out


@register_model("anthropic")
class AnthropicLM(LM):
    def __init__(self, model: str = "claude-3-5-haiku-latest",
                 max_gen_toks="256",
                 api_base: str = "https://api.anthropic.com/v1",
                 transport: Optional[Callable] = None):
        self.model = model
        self.max_gen_toks = int(max_gen_toks)
        self.api_base = api_base
        self._post = transport or _http_post

    def _headers(self) -> Dict[str, str]:
        key = os.environ.get("ANTHROPIC_API_KEY", "")
        if not key:
            raise RuntimeError("ANTHROPIC_API_KEY is not set")
        return {"x-api-key": key, "anthropic-version": "2023-06-01"}

    def loglikelihood(self, requests):
        raise NotImplementedError(
            "the Anthropic API exposes no token logprobs "
            "(same limitation as the reference adapter)")

    def loglikelihood_rolling(self, requests):
        raise NotImplementedError(
            "the Anthropic API exposes no token logprobs")

    def greedy_until(self, requests) -> List[str]:
        out = []
        for context, until in requests:
            stops = until if isinstance(until, (list, tuple)) else [until]
            resp = self._post(
                f"{self.api_base}/messages", self._headers(),
                {"model": self.model, "max_tokens": self.max_gen_toks,
                 "temperature": 0.0,
                 "stop_sequences": list(stops)[:8],
                 "messages": [{"role": "user", "content": context}]})
            text = "".join(b.get("text", "") for b in resp.get("content", []))
            out.append(_truncate_at(text, stops))
        return out


@register_model("textsynth")
class TextSynthLM(LM):
    def __init__(self, engine: str = "gptj_6B", truncate=False,
                 api_url: str = "https://api.textsynth.com",
                 max_gen_toks="256", transport: Optional[Callable] = None):
        self.engine = engine
        self.api_url = api_url
        self.max_gen_toks = int(max_gen_toks)
        self._post = transport or _http_post

    def _headers(self) -> Dict[str, str]:
        key = os.environ.get("TEXTSYNTH_API_SECRET_KEY", "")
        if not key:
            raise RuntimeError("TEXTSYNTH_API_SECRET_KEY is not set")
        return {"Authorization": f"Bearer {key}"}

    def loglikelihood(self, requests) -> List[Tuple[float, bool]]:
        out = []
        for context, continuation in requests:
            resp = self._post(
                f"{self.api_url}/v1/engines/{self.engine}/logprob",
                self._headers(),
                {"context": context, "continuation": continuation})
            out.append((float(resp["logprob"]), bool(resp["is_greedy"])))
        return out

    def loglikelihood_rolling(self, requests):
        raise NotImplementedError(
            "the TextSynth API has no tokenization endpoint, so rolling "
            "windows cannot be formed (same limitation as the reference)")

    def greedy_until(self, requests) -> List[str]:
        out = []
        for context, until in requests:
            stops = until if isinstance(until, (list, tuple)) else [until]
            resp = self._post(
                f"{self.api_url}/v1/engines/{self.engine}/completions",
                self._headers(),
                {"prompt": context, "max_tokens": self.max_gen_toks,
                 "top_k": 1, "stop": list(stops)})
            out.append(_truncate_at(resp["text"], stops))
        return out
