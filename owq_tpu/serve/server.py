"""HTTP serving demo — the analogue of the reference's Gradio apps
(demo/demo_2model.py, demo/demo_llama2_70b.py).

Endpoints:
  GET  /            chat UI (single page, no external assets)
  POST /generate    {"prompt": str, "max_new_tokens": int, "temperature": f,
                     "model": "a"|"b"} -> streaming text/plain chunks
  GET  /stats       memory + throughput counters (the analogue of the
                     reference demo's nvidia-smi memory readout)

Supports one or two models (the reference's FP16-vs-OWQ side-by-side
compare) backed by the continuous batching engine.  Prompting uses the
llama-2 [INST] <<SYS>> format when chat_template="llama2"
(demo_llama2_70b.py:120-131 behavior).
"""

from __future__ import annotations

import json
import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Dict, Optional

import numpy as np

__all__ = ["EngineWorker", "ModelWorker", "serve", "build_prompt_llama2"]

DEFAULT_SYSTEM = ("You are a helpful, respectful and honest assistant.")


def build_prompt_llama2(history, system: str = DEFAULT_SYSTEM) -> str:
    """llama-2 chat format: [INST] <<SYS>> ... <</SYS>> ... [/INST]"""
    parts = [f"[INST] <<SYS>>\n{system}\n<</SYS>>\n\n"]
    for i, (user, assistant) in enumerate(history):
        if i == 0:
            parts.append(f"{user} [/INST]")
        else:
            parts.append(f"[INST] {user} [/INST]")
        if assistant is not None:
            parts.append(f" {assistant} </s><s>")
    return "".join(parts)


class ModelWorker:
    """Serializes generation on one model; streams tokens via callback."""

    def __init__(self, params, cfg, tokenizer, *, kernel: str = "xla",
                 max_len: int = 2048, name: str = "model",
                 speculative: bool = False, draft_len: int = 8,
                 draft: Optional[tuple] = None):
        from ..models.config import ModelConfig  # noqa: F401

        self.params = params
        self.cfg = cfg
        self.tok = tokenizer
        self.kernel = kernel
        self.max_len = max_len
        self.name = name
        # speculation for greedy (temperature=0) requests: exact same
        # tokens, fewer weight-streaming passes.  ``draft=(params, cfg)``
        # uses a draft MODEL; plain ``speculative`` uses prompt-lookup
        self.speculative = speculative or draft is not None
        self.draft_len = draft_len
        self.draft = draft
        self.lock = threading.Lock()
        self.stats: Dict[str, float] = {"requests": 0, "generated_tokens": 0,
                                        "total_time_s": 0.0,
                                        "spec_forwards": 0,
                                        "spec_accepted": 0}

    def param_bytes(self) -> int:
        import jax

        return sum(getattr(l, "nbytes", 0)
                   for l in jax.tree_util.tree_leaves(self.params))

    def generate_stream(self, prompt: str, max_new_tokens: int = 128,
                        temperature: float = 0.0):
        """Yields decoded text increments."""
        from ..runtime.generate import decode_step, prefill, _sample
        from ..models.transformer import init_cache

        import jax
        import jax.numpy as jnp

        ids = self.tok.encode(prompt, add_special_tokens=False)
        ids = ids[-(self.max_len - max_new_tokens):]
        eos = getattr(self.tok, "eos_token_id", None)

        if self.speculative and temperature == 0.0:
            yield from self._generate_stream_speculative(
                ids, max_new_tokens, eos)
            return

        with self.lock:
            t0 = time.time()
            cache = init_cache(self.cfg, 1, len(ids) + max_new_tokens,
                               dtype=jnp.bfloat16)
            logits, cache = prefill(self.params, self.cfg,
                                    jnp.asarray([ids], jnp.int32), cache,
                                    self.kernel)
            key = jax.random.PRNGKey(int(t0) & 0xFFFF)
            out_tokens = []
            sent = 0
            for _ in range(max_new_tokens):
                key, sub = jax.random.split(key)
                tok = _sample(logits, sub, temperature, 1.0)
                t = int(tok[0])
                if eos is not None and t == eos:
                    break
                out_tokens.append(t)
                text = self.tok.decode(out_tokens)
                if len(text) > sent and not text.endswith("�"):
                    yield text[sent:]
                    sent = len(text)
                logits, cache = decode_step(self.params, self.cfg,
                                            tok[:, None].astype(jnp.int32),
                                            cache, self.kernel)
            self.stats["requests"] += 1
            self.stats["generated_tokens"] += len(out_tokens)
            self.stats["total_time_s"] += time.time() - t0

    def _generate_stream_speculative(self, ids, max_new_tokens, eos):
        from ..runtime.speculative import (stream_speculative,
                                           stream_speculative_draft)

        import numpy as np

        if self.draft is not None:
            def spec(**kw):
                return stream_speculative_draft(
                    self.params, self.cfg, self.draft[0], self.draft[1],
                    **kw)
        else:
            def spec(**kw):
                return stream_speculative(self.params, self.cfg, **kw)

        with self.lock:
            t0 = time.time()
            spec_stats: Dict[str, int] = {}
            out_tokens = []
            sent = 0
            for chunk in spec(
                    prompt_ids=np.asarray([ids], np.int32),
                    max_new_tokens=max_new_tokens,
                    draft_len=self.draft_len, kernel=self.kernel,
                    eos_id=eos, stats=spec_stats):
                out_tokens.extend(
                    t for t in chunk if eos is None or t != eos)
                text = self.tok.decode(out_tokens)
                if len(text) > sent and not text.endswith("�"):
                    yield text[sent:]
                    sent = len(text)
            self.stats["requests"] += 1
            self.stats["generated_tokens"] += len(out_tokens)
            self.stats["total_time_s"] += time.time() - t0
            self.stats["spec_forwards"] += spec_stats.get("forwards", 0)
            self.stats["spec_accepted"] += spec_stats.get("accepted", 0)


class EngineWorker:
    """Continuous-batching worker: concurrent /generate requests share one
    Engine slot pool (requests join and leave the running batch without
    stalling each other) instead of serializing on a lock like ModelWorker.
    With ``mesh`` the engine runs tensor-parallel over the mesh's 'tp'
    axis.  One background thread ticks the engine while any request is
    live; each streaming response polls its request's token list.

    ``temperature`` is fixed per engine (it is compiled into the decode
    scan); per-request temperatures fall outside this worker.
    """

    def __init__(self, params, cfg, tokenizer, *, kernel: str = "xla",
                 max_len: int = 2048, name: str = "model",
                 max_batch: int = 8, mesh=None, temperature: float = 0.0,
                 window: int = 4,
                 prompt_buckets=(32, 128, 512, 2048)):
        from ..runtime.batching import Engine

        self.tok = tokenizer
        self.name = name
        self.max_len = max_len
        self.window = window
        self.eos = getattr(tokenizer, "eos_token_id", None)
        self.eng = Engine(params, cfg, max_batch=max_batch, max_len=max_len,
                          kernel=kernel, eos_token_id=self.eos,
                          temperature=temperature, mesh=mesh,
                          prompt_buckets=tuple(b for b in prompt_buckets
                                               if b <= max_len))
        self.stats: Dict[str, float] = {"requests": 0, "generated_tokens": 0,
                                        "total_time_s": 0.0}
        self._lock = threading.Lock()
        self._wake = threading.Event()
        threading.Thread(target=self._loop, daemon=True).start()

    def param_bytes(self) -> int:
        import jax

        return sum(getattr(l, "nbytes", 0)
                   for l in jax.tree_util.tree_leaves(self.eng.params))

    def _loop(self):
        while True:
            self._wake.wait()
            with self._lock:
                busy = (bool(self.eng.queue)
                        or any(r is not None for r in self.eng.slot_req))
                if busy:
                    self.eng.step(self.window)
            if not busy:
                self._wake.clear()

    def generate_stream(self, prompt: str, max_new_tokens: int = 128,
                        temperature: float = 0.0):
        """Yields decoded text increments (engine-batched)."""
        del temperature  # fixed per engine; see class docstring
        t0 = time.time()
        ids = self.tok.encode(prompt, add_special_tokens=False)
        ids = ids[-(self.max_len - max_new_tokens):]
        with self._lock:
            rid = self.eng.add_request(np.asarray(ids, np.int32),
                                       max_new_tokens)
            req = self.eng.requests[rid]
        self._wake.set()
        n_sent = sent = 0
        out = []
        while True:
            done = req.done
            gen = list(req.generated)  # ticker thread appends; snapshot
            if len(gen) > n_sent:
                out.extend(t for t in gen[n_sent:] if t != self.eos)
                n_sent = len(gen)
                text = self.tok.decode(out)
                if len(text) > sent and not text.endswith("�"):
                    yield text[sent:]
                    sent = len(text)
            if done:
                break
            time.sleep(0.005)
        self.stats["requests"] += 1
        self.stats["generated_tokens"] += len(out)
        self.stats["total_time_s"] += time.time() - t0


_PAGE = """<!doctype html><html><head><title>owq-tpu demo</title><style>
body{font-family:sans-serif;max-width:56rem;margin:2rem auto;padding:0 1rem}
textarea{width:100%;height:6rem} pre{background:#f4f4f4;padding:1rem;
white-space:pre-wrap;min-height:8rem} .row{display:flex;gap:1rem}
.col{flex:1}</style></head><body>
<h2>owq-tpu — quantized LLM serving demo</h2>
<textarea id=p placeholder="prompt"></textarea><br>
<label>max tokens <input id=m type=number value=128></label>
<label>temperature <input id=t type=number step=0.1 value=0></label>
<button onclick="go()">generate</button>
<div class=row><div class=col><h4 id=ha></h4><pre id=oa></pre></div>
<div class=col id=colb style="display:none"><h4 id=hb></h4><pre id=ob></pre>
</div></div>
<script>
async function stream(model, out){
  out.textContent='';
  const r = await fetch('/generate', {method:'POST', body: JSON.stringify({
    prompt: document.getElementById('p').value,
    max_new_tokens: +document.getElementById('m').value,
    temperature: +document.getElementById('t').value, model})});
  const rd = r.body.getReader(); const dec = new TextDecoder();
  for(;;){const {done, value} = await rd.read(); if(done) break;
    out.textContent += dec.decode(value);}
}
async function go(){
  const s = await (await fetch('/stats')).json();
  document.getElementById('ha').textContent = s.models[0].name;
  const tasks=[stream(s.models[0].name, document.getElementById('oa'))];
  if(s.models.length>1){
    document.getElementById('colb').style.display='block';
    document.getElementById('hb').textContent = s.models[1].name;
    tasks.push(stream(s.models[1].name, document.getElementById('ob')));}
  await Promise.all(tasks);
}
</script></body></html>"""


def serve(workers, host: str = "127.0.0.1", port: int = 7860,
          block: bool = True):
    """Start the HTTP demo for one or two ModelWorkers."""
    by_name = {w.name: w for w in workers}

    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *a):
            pass

        def do_GET(self):
            if self.path == "/stats":
                body = json.dumps({
                    "models": [{
                        "name": w.name,
                        "param_bytes": w.param_bytes(),
                        **w.stats,
                    } for w in workers]}).encode()
                self.send_response(200)
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)
                return
            self.send_response(200)
            self.send_header("Content-Type", "text/html")
            self.end_headers()
            self.wfile.write(_PAGE.encode())

        def do_POST(self):
            if self.path != "/generate":
                self.send_response(404)
                self.end_headers()
                return
            n = int(self.headers.get("Content-Length", 0))
            req = json.loads(self.rfile.read(n) or b"{}")
            worker = by_name.get(req.get("model") or workers[0].name,
                                 workers[0])
            self.send_response(200)
            self.send_header("Content-Type", "text/plain; charset=utf-8")
            self.send_header("Transfer-Encoding", "chunked")
            self.end_headers()
            try:
                for chunk in worker.generate_stream(
                        req.get("prompt", ""),
                        int(req.get("max_new_tokens", 128)),
                        float(req.get("temperature", 0.0))):
                    data = chunk.encode("utf-8")
                    self.wfile.write(f"{len(data):x}\r\n".encode())
                    self.wfile.write(data + b"\r\n")
                self.wfile.write(b"0\r\n\r\n")
            except (BrokenPipeError, ConnectionResetError):
                pass

    httpd = ThreadingHTTPServer((host, port), Handler)
    if block:
        print(f"serving on http://{host}:{port}")
        httpd.serve_forever()
    else:
        th = threading.Thread(target=httpd.serve_forever, daemon=True)
        th.start()
    return httpd
