"""Serving demo: HTTP endpoints + streaming generation."""

import json
import urllib.request

import numpy as np
import pytest

from owq_tpu.models import import_hf_model
from owq_tpu.serve.server import ModelWorker, build_prompt_llama2, serve
import hf_tiny


class CharTok:
    eos_token_id = None

    def encode(self, s, add_special_tokens=False):
        return [2 + (ord(c) % 90) for c in s]

    def decode(self, ids):
        return "".join(chr(32 + (i % 90)) for i in ids)


@pytest.fixture(scope="module")
def server():
    model = hf_tiny.tiny_opt(hidden=32, ffn=64, layers=2, max_pos=256)
    params, cfg = import_hf_model(model)
    w = ModelWorker(params, cfg, CharTok(), name="a", max_len=256)
    httpd = serve([w], port=0, block=False)
    yield f"http://127.0.0.1:{httpd.server_address[1]}"
    httpd.shutdown()


def test_index_page(server):
    html = urllib.request.urlopen(server + "/").read().decode()
    assert "owq-tpu" in html


def test_generate_stream(server):
    req = urllib.request.Request(
        server + "/generate",
        data=json.dumps({"prompt": "hello there", "max_new_tokens": 8}).encode(),
        method="POST")
    text = urllib.request.urlopen(req).read().decode()
    assert len(text) == 8  # char tokenizer: 1 char per token


def test_stats(server):
    stats = json.loads(urllib.request.urlopen(server + "/stats").read())
    assert stats["models"][0]["name"] == "a"
    assert stats["models"][0]["param_bytes"] > 0
    assert stats["models"][0]["generated_tokens"] >= 8


def test_generate_stream_speculative():
    # speculative worker must stream the same greedy text as a plain worker
    model = hf_tiny.tiny_opt(hidden=32, ffn=64, layers=2, max_pos=256)
    params, cfg = import_hf_model(model)
    plain = ModelWorker(params, cfg, CharTok(), name="p", max_len=256)
    spec = ModelWorker(params, cfg, CharTok(), name="s", max_len=256,
                       speculative=True, draft_len=4)
    prompt = "abcabcabcabc"
    ref = "".join(plain.generate_stream(prompt, max_new_tokens=12))
    got = "".join(spec.generate_stream(prompt, max_new_tokens=12))
    assert got == ref
    assert spec.stats["spec_forwards"] > 0


def test_llama2_prompt_format():
    p = build_prompt_llama2([("hi", "hello!"), ("how are you", None)],
                            system="sys msg")
    assert p.startswith("[INST] <<SYS>>\nsys msg\n<</SYS>>")
    assert "hi [/INST] hello! </s><s>" in p
    assert p.endswith("[INST] how are you [/INST]")


@pytest.fixture(scope="module")
def engine_server():
    model = hf_tiny.tiny_opt(hidden=32, ffn=64, layers=2, max_pos=256)
    params, cfg = import_hf_model(model)
    from owq_tpu.serve.server import EngineWorker

    w = EngineWorker(params, cfg, CharTok(), name="e", max_len=64,
                     max_batch=2, prompt_buckets=(16,))
    httpd = serve([w], port=0, block=False)
    yield f"http://127.0.0.1:{httpd.server_address[1]}", params, cfg
    httpd.shutdown()


def test_engine_worker_concurrent_streams(engine_server):
    # three concurrent requests through a 2-slot engine pool: each stream
    # must carry its own request's greedy tokens, matching ModelWorker
    import concurrent.futures

    url, params, cfg = engine_server
    plain = ModelWorker(params, cfg, CharTok(), name="p", max_len=64)
    prompts = ["hello there", "general kenobi", "ok"]
    want = ["".join(plain.generate_stream(p, 8)) for p in prompts]

    def fetch(prompt):
        req = urllib.request.Request(
            url + "/generate",
            data=json.dumps({"prompt": prompt,
                             "max_new_tokens": 8}).encode(),
            method="POST")
        return urllib.request.urlopen(req).read().decode()

    with concurrent.futures.ThreadPoolExecutor(3) as ex:
        got = list(ex.map(fetch, prompts))
    assert got == want


def test_engine_worker_tp(rng):
    # EngineWorker over a tp=2 mesh streams the same greedy text
    from owq_tpu.parallel import make_mesh
    from owq_tpu.serve.server import EngineWorker

    model = hf_tiny.tiny_llama(hidden=32, inter=64, layers=2, heads=4,
                               kv_heads=2, vocab=97, max_pos=128)
    params, cfg = import_hf_model(model)
    plain = ModelWorker(params, cfg, CharTok(), name="p", max_len=64)
    want = "".join(plain.generate_stream("hello there", 8))
    tp = EngineWorker(params, cfg, CharTok(), name="t", max_len=64,
                      max_batch=2, prompt_buckets=(16,),
                      mesh=make_mesh(dp=1, tp=2))
    got = "".join(tp.generate_stream("hello there", 8))
    assert got == want


def test_generate_stream_draft_model():
    # draft-model speculative worker streams the same greedy text
    model = hf_tiny.tiny_opt(hidden=32, ffn=64, layers=2, max_pos=256)
    params, cfg = import_hf_model(model)
    draft = import_hf_model(
        hf_tiny.tiny_opt(hidden=16, ffn=32, layers=1, max_pos=256))
    plain = ModelWorker(params, cfg, CharTok(), name="p", max_len=256)
    spec = ModelWorker(params, cfg, CharTok(), name="d", max_len=256,
                       draft=draft, draft_len=4)
    want = "".join(plain.generate_stream("hello there", 12))
    got = "".join(spec.generate_stream("hello there", 12))
    assert got == want
