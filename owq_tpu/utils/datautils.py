"""Calibration and evaluation data loaders.

Reference protocol (owq/utils/datautils.py): wikitext2 / ptb / c4 via HF
datasets; train mode samples ``nsamples`` random seqlen windows from the
tokenized concat (same ``random.seed(seed)`` + ``randint`` stream — matched
here so calibration sets are identical); test mode is the full tokenized
concatenation (c4 val capped to the first 1100 docs / 256*seqlen tokens —
ppl numbers depend on that exact truncation, SURVEY.md §8).

Extra loaders for this zero-egress environment: "synthetic" (seeded random
tokens) and local files (.npy / .pt token arrays).
"""

from __future__ import annotations

import random
from typing import List, Optional, Tuple

import numpy as np

__all__ = ["get_loaders", "sample_windows"]


def sample_windows(tokens: np.ndarray, nsamples: int, seqlen: int,
                   seed: int) -> np.ndarray:
    """Reference sampling: seeded randint windows over the token stream."""
    tokens = np.asarray(tokens).reshape(-1)
    rng = random.Random()
    rng.seed(seed)
    out = np.empty((nsamples, seqlen), np.int32)
    for s in range(nsamples):
        i = rng.randint(0, tokens.size - seqlen - 1)
        out[s] = tokens[i: i + seqlen]
    return out


def _tokenize_join(texts: List[str], sep: str, tokenizer) -> np.ndarray:
    enc = tokenizer(sep.join(texts), return_tensors="np")
    return np.asarray(enc["input_ids"]).reshape(-1).astype(np.int32)


def _load_hf_text(name: str, split: str):
    from datasets import load_dataset

    if name == "wikitext2":
        ds = load_dataset("wikitext", "wikitext-2-raw-v1", split=split)
        return list(ds["text"]), "\n\n"
    if name == "ptb":
        ds = load_dataset("ptb_text_only", "penn_treebank", split=split)
        return list(ds["sentence"]), " "
    raise KeyError(name)


def get_loaders(name: str, *, nsamples: int = 128, seed: int = 0,
                seqlen: int = 2048, model: str = "", train: bool = True,
                tokenizer=None, vocab_size: Optional[int] = None):
    """Returns calibration windows [nsamples, seqlen] (train) or a flat
    test token stream [N] (eval)."""
    if name == "synthetic":
        # offline-friendly: structured random stream (zipf-ish token dist)
        rng = np.random.default_rng(seed if train else seed + 1)
        v = vocab_size or 1024
        n = nsamples * seqlen * 2 if train else 256 * seqlen
        ranks = rng.zipf(1.3, size=n).astype(np.int64)
        tokens = (ranks % v).astype(np.int32)
        if train:
            return sample_windows(tokens, nsamples, seqlen, seed)
        return tokens

    if name.endswith(".npy"):
        tokens = np.load(name).reshape(-1).astype(np.int32)
        if train:
            return sample_windows(tokens, nsamples, seqlen, seed)
        return tokens

    if tokenizer is None:
        from transformers import AutoTokenizer

        tokenizer = AutoTokenizer.from_pretrained(model, use_fast=False)
        # PTB + LlamaTokenizer workaround, as in the reference
        # (datautils.py:92-93)
        if "ptb" in name and hasattr(tokenizer, "tokens_trie"):
            try:
                tokenizer.tokens_trie.data = {}
            except Exception:
                pass

    if name in ("wikitext2", "ptb"):
        texts, sep = _load_hf_text(name, "train" if train else "test")
        tokens = _tokenize_join(texts, sep, tokenizer)
        if train:
            return sample_windows(tokens, nsamples, seqlen, seed)
        return tokens

    if name == "c4":
        from datasets import load_dataset

        if train:
            ds = load_dataset(
                "allenai/c4",
                data_files={"train": "en/c4-train.00000-of-01024.json.gz"},
                split="train")
            rng = random.Random()
            rng.seed(seed)
            out = np.empty((nsamples, seqlen), np.int32)
            for s in range(nsamples):
                while True:
                    i = rng.randint(0, len(ds) - 1)
                    enc = tokenizer(ds[i]["text"], return_tensors="np")
                    ids = np.asarray(enc["input_ids"]).reshape(-1)
                    if ids.size > seqlen:
                        break
                j = rng.randint(0, ids.size - seqlen - 1)
                out[s] = ids[j: j + seqlen]
            return out
        ds = load_dataset(
            "allenai/c4",
            data_files={"validation": "en/c4-validation.00000-of-00008.json.gz"},
            split="validation")
        tokens = _tokenize_join(list(ds[:1100]["text"]), " ", tokenizer)
        return tokens[: 256 * seqlen]

    if name.endswith(".pt") or name.endswith(".pth"):
        import torch

        datas = torch.load(name)
        rng = random.Random()
        rng.seed(seed)
        idx = list(range(len(datas)))
        rng.shuffle(idx)
        rows = [np.asarray(datas[i]).reshape(-1)[:seqlen] for i in idx[:nsamples]]
        return np.stack(rows).astype(np.int32)

    raise ValueError(f"unknown dataset {name}")
