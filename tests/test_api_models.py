"""Hosted-API adapters (faked transport) + hf-seq2seq + registry aliases."""

import os

import numpy as np
import pytest

from owq_tpu.eval.harness.registry import get_model


@pytest.fixture(autouse=True)
def _keys(monkeypatch):
    monkeypatch.setenv("OPENAI_API_KEY", "k")
    monkeypatch.setenv("ANTHROPIC_API_KEY", "k")
    monkeypatch.setenv("TEXTSYNTH_API_SECRET_KEY", "k")


def test_registry_reference_parity():
    # every model name the reference registry exposes resolves here
    for name in ["hf", "hf-causal", "hf-causal-experimental", "hf-seq2seq",
                 "gpt2", "gpt3", "anthropic", "textsynth", "dummy",
                 "hf-causal-owq", "owq"]:
        assert get_model(name) is not None, name


def test_textsynth_adapter_faked():
    calls = []

    def fake_post(url, headers, payload, timeout=120.0):
        calls.append((url, payload))
        if url.endswith("/logprob"):
            return {"logprob": -3.25, "is_greedy": True}
        return {"text": "hello STOP world"}

    TS = get_model("textsynth")
    lm = TS(engine="gptj_6B", transport=fake_post)
    res = lm.loglikelihood([("The capital of France is", " Paris")])
    assert res == [(-3.25, True)]
    out = lm.greedy_until([("Say hello", ["STOP"])])
    assert out == ["hello "]
    with pytest.raises(NotImplementedError):
        lm.loglikelihood_rolling(["long text"])


def test_gpt3_adapter_faked():
    def fake_post(url, headers, payload, timeout=120.0):
        assert "completions" in url
        if payload.get("max_tokens") == 0:  # scoring call
            n = len(payload["prompt"][0])
            toks = [f"t{i}" for i in range(n)]
            return {"choices": [{
                "logprobs": {
                    "tokens": toks,
                    "token_logprobs": [None] + [-0.5] * (n - 1),
                    "top_logprobs": [None] + [{t: -0.5} for t in toks[1:]],
                }} for _ in payload["prompt"]]}
        return {"choices": [{"text": "yes\n\nno"}]}

    class Tok:  # offline container: no HF hub for the real gpt2 BPE
        eos_token_id = 50256

        def encode(self, s, add_special_tokens=False):
            return [(hash(w) % 1000) + 10 for w in s.split()]

    G = get_model("gpt3")
    lm = G(engine="davinci-002", transport=fake_post, tok=Tok())
    ctx = lm.tok_encode("The answer is")
    cont = lm.tok_encode(" yes")
    (ll, greedy), = lm.loglikelihood([("The answer is", " yes")])
    assert greedy and np.isclose(ll, -0.5 * len(cont))
    assert lm.greedy_until([("Q?", ["\n\n"])]) == ["yes"]


def test_anthropic_adapter_faked():
    def fake_post(url, headers, payload, timeout=120.0):
        assert url.endswith("/messages")
        assert payload["temperature"] == 0.0
        return {"content": [{"type": "text", "text": "forty-two###tail"}]}

    A = get_model("anthropic")
    lm = A(model="claude-3-5-haiku-latest", transport=fake_post)
    assert lm.greedy_until([("meaning of life?", ["###"])]) == ["forty-two"]
    with pytest.raises(NotImplementedError):
        lm.loglikelihood([("a", "b")])


def _tiny_t5():
    import torch
    from transformers import T5Config, T5ForConditionalGeneration, AutoTokenizer

    torch.manual_seed(0)
    cfg = T5Config(vocab_size=120, d_model=32, d_kv=8, d_ff=48, num_layers=2,
                   num_heads=4, decoder_start_token_id=0)
    return T5ForConditionalGeneration(cfg).eval()


class _FakeTok:
    """Minimal whitespace tokenizer with the HF call protocol."""

    eos_token_id = 1
    pad_token_id = 0

    def __call__(self, texts, return_tensors=None, padding=False,
                 truncation=False, max_length=None, add_special_tokens=True):
        import torch

        rows = [[(hash(w) % 100) + 2 for w in t.split()] or [2]
                for t in texts]
        L = max(len(r) for r in rows)
        ids = [r + [0] * (L - len(r)) for r in rows]
        mask = [[1] * len(r) + [0] * (L - len(r)) for r in rows]
        return {"input_ids": torch.tensor(ids),
                "attention_mask": torch.tensor(mask)}

    def decode(self, ids, skip_special_tokens=True):
        return " ".join(f"w{int(t)}" for t in ids if int(t) > 1)


def test_hf_seq2seq_adapter_scores_and_generates():
    S = get_model("hf-seq2seq")
    lm = S(model=_tiny_t5(), tok=_FakeTok(), batch_size="2", max_length="64")
    res = lm.loglikelihood([("translate: hello world", "bonjour monde"),
                            ("translate: bye", "au revoir")])
    assert len(res) == 2
    for ll, greedy in res:
        assert np.isfinite(ll) and ll < 0 and isinstance(greedy, bool)
    outs = lm.greedy_until([("translate: hello", ["\n"])])
    assert len(outs) == 1 and isinstance(outs[0], str)
    with pytest.raises(NotImplementedError):
        lm.loglikelihood_rolling(["doc"])
