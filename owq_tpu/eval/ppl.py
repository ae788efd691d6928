"""Perplexity evaluation (reference protocol).

Matches ``eval_ppl`` (main.py:167-267): the token stream is cut into
non-overlapping ``seqlen`` windows; per window the shifted cross-entropy is
averaged over seqlen-1 targets and multiplied by seqlen; ppl =
exp(sum / (nwindows * seqlen)).  The reference streams blocks over one GPU;
on TPU we jit the whole model and batch windows.
"""

from __future__ import annotations

from functools import partial
from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np

from ..models.config import ModelConfig
from ..models.transformer import forward

__all__ = ["eval_ppl", "window_nll"]


@partial(jax.jit, static_argnames=("cfg", "kernel"))
def window_nll(params: Dict[str, Any], cfg: ModelConfig, ids: jnp.ndarray,
               kernel: str = "xla") -> jnp.ndarray:
    """Per-window NLL (mean shifted CE * seqlen), ids: [B, seqlen] -> [B]."""
    logits, _ = forward(params, cfg, ids, kernel=kernel)
    logp = jax.nn.log_softmax(logits[:, :-1].astype(jnp.float32), axis=-1)
    tgt = ids[:, 1:]
    nll = -jnp.take_along_axis(logp, tgt[..., None], axis=-1)[..., 0]
    return jnp.mean(nll, axis=-1) * ids.shape[1]


def eval_ppl(params: Dict[str, Any], cfg: ModelConfig, tokens: np.ndarray,
             seqlen: int, *, batch: int = 1, kernel: str = "xla",
             verbose: bool = False, offload: bool = False) -> float:
    """Perplexity over a flat token stream (reference window protocol).

    ``offload``: layer-wise streaming for models larger than one chip's HBM
    (the reference's eval_ppl block shuttle, main.py:167-267): weights and
    activations stay in host RAM; one block + one window chunk are on
    device at a time.
    """
    tokens = np.asarray(tokens).reshape(-1)
    nwin = tokens.size // seqlen
    if nwin == 0:
        raise ValueError(f"stream of {tokens.size} tokens < seqlen {seqlen}")
    windows = tokens[: nwin * seqlen].reshape(nwin, seqlen).astype(np.int32)

    if offload:
        return _eval_ppl_layerwise(params, cfg, windows, seqlen, batch=batch,
                                   kernel=kernel, verbose=verbose)

    total = 0.0
    for s in range(0, nwin, batch):
        chunk = windows[s: s + batch]
        pad = batch - chunk.shape[0]
        if pad:
            chunk = np.concatenate([chunk, np.zeros((pad, seqlen), np.int32)])
        nll = np.asarray(window_nll(params, cfg, jnp.asarray(chunk), kernel))
        if pad:
            nll = nll[:-pad]
        total += float(nll.sum())
        if verbose:
            done = min(s + batch, nwin)
            print(f"  ppl windows {done}/{nwin}", end="\r")
    if verbose:
        print()
    return float(np.exp(total / (nwin * seqlen)))


@partial(jax.jit, static_argnames=("cfg",))
def _final_nll(params, cfg: ModelConfig, x, ids):
    from ..models.transformer import unembed

    logits = unembed(params, cfg, x)
    logp = jax.nn.log_softmax(logits[:, :-1].astype(jnp.float32), axis=-1)
    nll = -jnp.take_along_axis(logp, ids[:, 1:, None], axis=-1)[..., 0]
    return jnp.mean(nll, axis=-1) * ids.shape[1]


def _eval_ppl_layerwise(params, cfg, windows: np.ndarray, seqlen: int, *,
                        batch: int = 1, kernel: str = "xla",
                        verbose: bool = False) -> float:
    from ..models.transformer import (layer_alpha_beta,
                                      layer_attn_temp, layer_rope)
    from ..recon.pipeline import _block_out, calibration_inputs

    nwin = windows.shape[0]
    x, aux = calibration_inputs(params, cfg, windows, dtype=jnp.float32)
    x = np.asarray(x)
    for li in range(len(params["layers"])):
        blk = jax.device_put(params["layers"][li])
        outs = []
        for s in range(0, nwin, batch):
            y = _block_out(blk, cfg, jnp.asarray(x[s:s + batch]),
                           aux["masks"][li],
                           layer_rope(cfg, aux["rope"], li), aux["alibi"],
                           layer_attn_temp(cfg, aux["temp"], li),
                           layer_alpha_beta(cfg, li))
            outs.append(np.asarray(y))
        x = np.concatenate(outs, axis=0)
        del blk
        if verbose:
            print(f"  layer {li + 1}/{len(params['layers'])}", end="\r")
    head = {k: v for k, v in params.items() if k != "layers"}
    head = jax.device_put(head)
    total = 0.0
    for s in range(0, nwin, batch):
        nll = _final_nll(head, cfg, jnp.asarray(x[s:s + batch]),
                         jnp.asarray(windows[s:s + batch]))
        total += float(np.asarray(nll).sum())
    if verbose:
        print()
    return float(np.exp(total / (nwin * seqlen)))
