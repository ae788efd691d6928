"""Griffin / Hawk RG-LRU recurrent block — RecurrentGemma.

Pure-jnp port of HF RecurrentGemmaRecurrentBlock
(transformers models/recurrent_gemma/modeling_recurrent_gemma.py:276-447):
two input branches y = gelu(linear_y(x)) and xb = conv1d(linear_x(x)),
a Real-Gated Linear Recurrent Unit over xb, then out = linear_out(lru * y).

The RG-LRU is a diagonal gated linear recurrence
    a_t   = exp(-c * softplus(Lambda) * sigmoid(W_a xb_t + b_a))   (c = 8)
    h_t   = a_t * h_{t-1} + sqrt(1 - a_t^2) * (sigmoid(W_i xb_t + b_i) * xb_t)
with the sqrt(1-a^2) input normalizer replaced by 1 at sequence position 0
(document reset).  Gate projections are block-diagonal per head
([H, bw, bw], bw = lru_width/H).  Like mamba-1 the scan is a first-order
linear recurrence, computed in log-depth with lax.associative_scan —
no per-token Python loop, and exact stateful continuation: the state is
(conv left-context [B, lru, K-1], h [B, lru]).

Quantizable linears: griffin.y / griffin.x / griffin.out.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from .ssm import _depthwise_causal_conv, _lin

__all__ = ["GriffinSpec", "griffin_full", "griffin_step"]


class GriffinSpec:
    def __init__(self, *, lru_width: int, num_heads: int, conv_width: int,
                 activation: str = "gelu_pytorch_tanh"):
        self.lru_width = lru_width
        self.num_heads = num_heads
        self.conv_width = conv_width
        self.activation = activation


def _gates(mp, xc32):
    """xc32 [B, T, H, bw] f32 -> (input_gate, log_a) each [B, T, H*bw]."""
    B, T, H, bw = xc32.shape
    ig = jax.nn.sigmoid(
        jnp.einsum("bthi,hio->btho", xc32,
                   mp["input_gate_w"].astype(jnp.float32))
        + mp["input_gate_b"].astype(jnp.float32))
    rg = jax.nn.sigmoid(
        jnp.einsum("bthi,hio->btho", xc32,
                   mp["recurrent_gate_w"].astype(jnp.float32))
        + mp["recurrent_gate_b"].astype(jnp.float32))
    lam = jax.nn.softplus(mp["recurrent_param"].astype(jnp.float32))
    log_a = -8.0 * rg.reshape(B, T, H * bw) * lam
    return ig.reshape(B, T, H * bw), log_a


def _scan(a, b, h0):
    """h_t = a_t h_{t-1} + b_t via log-depth associative scan; h0 [B, W]."""
    if h0 is not None:
        b = b.at[:, 0].add(a[:, 0] * h0.astype(jnp.float32))

    def comb(l, r):
        return (l[0] * r[0], r[0] * l[1] + r[1])

    _, hs = jax.lax.associative_scan(comb, (a, b), axis=1)
    return hs


def griffin_full(mp: Dict[str, Any], spec: GriffinSpec, x: jnp.ndarray, *,
                 eps: float, kernel: str = "xla", taps: Sequence[str] = (),
                 conv_state: Optional[jnp.ndarray] = None,
                 rec_state: Optional[jnp.ndarray] = None,
                 valid_len: Optional[jnp.ndarray] = None,
                 pos_start: Optional[jnp.ndarray] = None,
                 ) -> Tuple[jnp.ndarray,
                            Tuple[jnp.ndarray, jnp.ndarray],
                            Dict[str, jnp.ndarray]]:
    """Full-sequence forward.  With states, continues exactly (no position-0
    reset); with ``valid_len`` the recurrence freezes on right-pad steps
    (a=1, input=0) and the conv state slices the last K-1 REAL inputs."""
    from .layers import activation as _act

    B, T, _ = x.shape
    W, H, K = spec.lru_width, spec.num_heads, spec.conv_width
    tapped: Dict[str, jnp.ndarray] = {}
    for name in ("griffin.y", "griffin.x"):
        if name in taps:
            tapped[name] = x

    y = _act(_lin(mp["y"], x, kernel), spec.activation)
    xb = _lin(mp["x"], x, kernel)                         # [B, T, W]

    vl = tok_valid = None
    if valid_len is not None:
        vl = jnp.broadcast_to(jnp.atleast_1d(valid_len), (B,))
        tok_valid = (jnp.arange(T, dtype=jnp.int32)[None, :]
                     < vl[:, None])                       # [B, T]
        xb = xb * tok_valid[..., None].astype(xb.dtype)

    left = None if conv_state is None else jnp.swapaxes(
        conv_state, 1, 2)                                 # [B, K-1, W]
    xc = _depthwise_causal_conv(xb, mp["conv_w"], mp.get("conv_b"),
                                left_ctx=left)
    # new conv left-context: last K-1 raw (pre-conv) inputs
    xb_t = jnp.swapaxes(xb, 1, 2)                         # [B, W, T]
    if conv_state is None and valid_len is not None:
        padded = jnp.pad(xb_t, ((0, 0), (0, 0), (K - 1, 0)))
        idx = vl[:, None] + jnp.arange(K - 1, dtype=jnp.int32)[None, :]
        conv_new = jnp.take_along_axis(padded, idx[:, None, :], axis=-1)
    elif conv_state is None:
        conv_new = jnp.pad(xb_t, ((0, 0), (0, 0),
                                  (max(K - 1 - T, 0), 0)))[:, :, -(K - 1):]
    else:
        conv_new = jnp.concatenate(
            [conv_state.astype(xb_t.dtype), xb_t], axis=-1)[:, :, -(K - 1):]

    xc32 = xc.astype(jnp.float32).reshape(B, T, H, W // H)
    ig, log_a = _gates(mp, xc32)
    a = jnp.exp(log_a)
    mult = jnp.sqrt(jnp.maximum(1.0 - jnp.exp(2.0 * log_a), 0.0))
    # HF resets at ABSOLUTE position 0 (document start): input multiplier 1
    # instead of sqrt(1-a^2).  pos_start gives the absolute position of the
    # first token (cached prefill at the start of a slot); without it a
    # fresh (state-less) call is assumed to begin at position 0.
    if pos_start is not None:
        pos0 = ((jnp.atleast_1d(pos_start).reshape(-1, 1)
                 + jnp.arange(T)) == 0)[..., None]
        mult = jnp.where(pos0, 1.0, mult)
        a = jnp.where(pos0, 0.0, a)
    elif rec_state is None:
        pos0 = (jnp.arange(T) == 0)[None, :, None]
        mult = jnp.where(pos0, 1.0, mult)
        a = jnp.where(pos0, 0.0, a)
    gated = xc.astype(jnp.float32) * ig * mult
    if tok_valid is not None:  # freeze recurrence on pad steps
        a = jnp.where(tok_valid[..., None], a, 1.0)
        gated = gated * tok_valid[..., None]

    hs = _scan(a, gated, rec_state)                       # [B, T, W] f32
    h = hs.astype(x.dtype) * y
    if "griffin.out" in taps:
        tapped["griffin.out"] = h
    out = _lin(mp["out"], h, kernel)
    if vl is not None:
        rec_fin = jnp.take_along_axis(
            hs, jnp.maximum(vl - 1, 0)[:, None, None].astype(jnp.int32),
            axis=1)[:, 0]
    else:
        rec_fin = hs[:, -1]
    return out, (conv_new.astype(jnp.float32), rec_fin), tapped


def griffin_step(mp: Dict[str, Any], spec: GriffinSpec, x: jnp.ndarray,
                 conv_state: jnp.ndarray, rec_state: jnp.ndarray, *,
                 eps: float, kernel: str = "xla"
                 ) -> Tuple[jnp.ndarray, Tuple[jnp.ndarray, jnp.ndarray]]:
    """One-token recurrent update.  x [B, 1, hidden]."""
    from .layers import activation as _act

    B = x.shape[0]
    W, H = spec.lru_width, spec.num_heads
    y = _act(_lin(mp["y"], x, kernel), spec.activation)
    xb = _lin(mp["x"], x, kernel)[:, 0]                   # [B, W]

    window = jnp.concatenate([conv_state.astype(xb.dtype),
                              xb[:, :, None]], axis=-1)   # [B, W, K]
    w = jnp.swapaxes(mp["conv_w"].astype(jnp.float32), 0, 1)  # [W, K]
    xc = jnp.sum(window.astype(jnp.float32) * w[None], axis=-1)
    if mp.get("conv_b") is not None:
        xc = xc + mp["conv_b"].astype(jnp.float32)

    ig, log_a = _gates(mp, xc.reshape(B, 1, H, W // H))
    a = jnp.exp(log_a[:, 0])
    mult = jnp.sqrt(jnp.maximum(1.0 - jnp.exp(2.0 * log_a[:, 0]), 0.0))
    h = a * rec_state.astype(jnp.float32) + xc * ig[:, 0] * mult
    out = _lin(mp["out"], (h.astype(x.dtype) * y[:, 0])[:, None], kernel)
    return out, (window[:, :, 1:].astype(jnp.float32), h)
