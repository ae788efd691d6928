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
