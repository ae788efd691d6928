"""Decoder building blocks: norms, activations, rotary/alibi position math.

Pure jnp functions matching HuggingFace numerics (the reference evaluates
through HF modules; ppl parity within ±0.05 requires matching their
upcasting behavior — SURVEY.md §7.4.6).
"""

from __future__ import annotations

import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

__all__ = [
    "layernorm", "rmsnorm", "rmsnorm1p", "activation",
    "rope_cos_sin", "apply_rope", "alibi_slopes", "alibi_bias",
    "attention_core", "causal_mask_bias",
]


def layernorm(x: jnp.ndarray, w: jnp.ndarray, b: Optional[jnp.ndarray],
              eps: float) -> jnp.ndarray:
    dt = x.dtype
    x32 = x.astype(jnp.float32)
    mu = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.mean((x32 - mu) ** 2, axis=-1, keepdims=True)
    y = (x32 - mu) * jax.lax.rsqrt(var + eps)
    y = y * w.astype(jnp.float32)
    if b is not None:  # mpt: bias-less LayerNorm (no_bias=True)
        y = y + b.astype(jnp.float32)
    return y.astype(dt)


def rmsnorm(x: jnp.ndarray, w: jnp.ndarray, eps: float) -> jnp.ndarray:
    # HF LlamaRMSNorm: variance in f32, cast back, then weight multiply.
    dt = x.dtype
    x32 = x.astype(jnp.float32)
    var = jnp.mean(x32 * x32, axis=-1, keepdims=True)
    y = (x32 * jax.lax.rsqrt(var + eps)).astype(dt)
    return y * w.astype(dt)


def rmsnorm1p(x: jnp.ndarray, w: jnp.ndarray, eps: float) -> jnp.ndarray:
    # HF GemmaRMSNorm: all math in f32 (including the (1 + w) multiply),
    # cast to input dtype only at the end — a different cast order than
    # LlamaRMSNorm, which matters in bf16.
    dt = x.dtype
    x32 = x.astype(jnp.float32)
    var = jnp.mean(x32 * x32, axis=-1, keepdims=True)
    y = x32 * jax.lax.rsqrt(var + eps)
    return (y * (1.0 + w.astype(jnp.float32))).astype(dt)


def activation(x: jnp.ndarray, kind: str) -> jnp.ndarray:
    if kind == "relu":
        return jax.nn.relu(x)
    if kind == "silu":
        return jax.nn.silu(x)
    if kind == "gelu":
        return jax.nn.gelu(x, approximate=False)
    if kind in ("gelu_tanh", "gelu_new", "gelu_pytorch_tanh"):
        return jax.nn.gelu(x, approximate=True)
    if kind == "relu2":  # nemotron/persimmon ReLUSquaredActivation
        r = jax.nn.relu(x)
        return r * r
    raise ValueError(f"unknown activation {kind}")


# --- rotary ----------------------------------------------------------------

def rope_cos_sin(positions: jnp.ndarray, head_dim: int, theta: float,
                 dtype=jnp.float32, style: str = "half",
                 inv_freq: Optional[jnp.ndarray] = None,
                 attn_factor: float = 1.0,
                 ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """cos/sin tables for RoPE.

    positions: [..., T] int -> cos/sin [..., T, head_dim].
    style 'half' (llama/neox: table = [freqs | freqs]) or 'interleaved'
    (gptj: table = repeat_interleave(freqs, 2)).

    ``inv_freq`` overrides the default theta schedule (RoPE scaling:
    linear/NTK/yarn/llama3/longrope frequency remaps); ``attn_factor``
    scales cos/sin (yarn/longrope attention temperature).
    """
    if inv_freq is None:
        inv_freq = 1.0 / (theta ** (jnp.arange(0, head_dim, 2,
                                               dtype=jnp.float32) / head_dim))
    freqs = positions.astype(jnp.float32)[..., None] * inv_freq  # [..., T, hd/2]
    if style == "interleaved":
        emb = jnp.repeat(freqs, 2, axis=-1)
    else:
        emb = jnp.concatenate([freqs, freqs], axis=-1)
    return (jnp.cos(emb).astype(dtype) * attn_factor,
            jnp.sin(emb).astype(dtype) * attn_factor)


def _rotate_half(x: jnp.ndarray) -> jnp.ndarray:
    half = x.shape[-1] // 2
    return jnp.concatenate([-x[..., half:], x[..., :half]], axis=-1)


def _rotate_every_two(x: jnp.ndarray) -> jnp.ndarray:
    # gptj pairing: (x0,x1) -> (-x1, x0) for every adjacent pair
    x1 = x[..., ::2]
    x2 = x[..., 1::2]
    return jnp.stack([-x2, x1], axis=-1).reshape(x.shape)


def apply_rope(q: jnp.ndarray, k: jnp.ndarray, cos: jnp.ndarray,
               sin: jnp.ndarray, style: str = "half"
               ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """q/k: [B, T, H, hd]; cos/sin: [B, T, rot] (broadcast over heads).

    When rot < hd (partial rotary: GPT-NeoX rotary_pct, GPT-J rotary_dim),
    only the first ``rot`` lanes are rotated; the rest pass through.
    """
    rot = cos.shape[-1]
    cos = cos[:, :, None, :]
    sin = sin[:, :, None, :]
    rotate = _rotate_every_two if style == "interleaved" else _rotate_half

    def rope1(x):
        xr = x[..., :rot]
        y = xr * cos + rotate(xr) * sin
        if rot < x.shape[-1]:
            y = jnp.concatenate([y, x[..., rot:]], axis=-1)
        return y.astype(x.dtype)

    return rope1(q), rope1(k)


# --- alibi -----------------------------------------------------------------

def alibi_slopes(n_heads: int, scheme: str = "bloom",
                 bias_max: float = 8.0) -> jnp.ndarray:
    """ALiBi slope schedule (press et al.).

    'bloom': floor-power-of-2 base schedule with sqrt-stepped extension for
    non-power-of-2 head counts (HF BloomModel.build_alibi_tensor).
    'mpt': ceil-power-of-2 schedule 2^{-(i+1)*bias_max/n2} with odd/even
    interleave truncation (HF build_mpt_alibi_tensor); identical to 'bloom'
    for power-of-2 head counts at bias_max=8.
    """
    if scheme == "mpt":
        n2 = 2 ** math.ceil(math.log2(n_heads))
        slopes = [2.0 ** -((i + 1) * bias_max / n2) for i in range(n2)]
        if n2 != n_heads:
            slopes = (slopes[1::2] + slopes[0::2])[:n_heads]
        return jnp.asarray(slopes, jnp.float32)

    def pow2_slopes(n):
        start = 2.0 ** (-(2.0 ** -(math.log2(n) - 3)))
        return [start * (start ** i) for i in range(n)]

    if math.log2(n_heads).is_integer():
        slopes = pow2_slopes(n_heads)
    else:
        base = 2 ** math.floor(math.log2(n_heads))
        slopes = pow2_slopes(base)
        extra = pow2_slopes(2 * base)[0::2][: n_heads - base]
        slopes += extra
    return jnp.asarray(slopes, jnp.float32)


def alibi_bias(n_heads: int, kv_positions: jnp.ndarray,
               scheme: str = "bloom") -> jnp.ndarray:
    """[B, heads, 1, S] additive bias: slope_h * key_position.

    (MPT anchors distances at the last key instead of 0; the difference is a
    per-row constant, which softmax cancels, so one form serves both.)
    """
    slopes = alibi_slopes(n_heads, scheme)
    return (slopes[None, :, None, None]
            * kv_positions.astype(jnp.float32)[:, None, None, :])


# --- attention -------------------------------------------------------------

def causal_mask_bias(q_positions: jnp.ndarray, kv_valid: jnp.ndarray,
                     kv_positions: jnp.ndarray,
                     window: Optional[int] = None) -> jnp.ndarray:
    """Additive mask [B, 1, T, S]: 0 where attendable, -inf-ish elsewhere.

    q_positions: [B, T] absolute positions of the query tokens.
    kv_valid:    [B, S] 1/0 validity of cache slots.
    kv_positions:[B, S] absolute positions of cache slots.
    window: sliding-window size (Mistral semantics: a query at position p
    attends to keys in [p - window + 1, p]).
    """
    ok = (kv_positions[:, None, :] <= q_positions[:, :, None]) & (
        kv_valid[:, None, :] > 0)
    if window is not None:
        ok &= kv_positions[:, None, :] > q_positions[:, :, None] - window
    bias = jnp.where(ok, 0.0, -1e9).astype(jnp.float32)
    return bias[:, None, :, :]


def attention_core(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                   bias: Optional[jnp.ndarray], scale: float,
                   softcap: Optional[float] = None,
                   sinks: Optional[jnp.ndarray] = None,
                   kv_patch=None) -> jnp.ndarray:
    """Softmax attention with f32 logits (HF upcasting behavior).

    q: [B, T, H, hd]; k/v: [B, S, Hkv, hd]; bias: [B, 1|H, T, S] additive.
    Returns [B, T, H, hd] in q.dtype.  GQA handled by head repetition.
    ``softcap``: gemma-2 logit soft-capping cap*tanh(logits/cap), applied
    before the mask bias (HF eager ordering).
    ``sinks``: gpt-oss per-head attention-sink logits [H] — joins the
    softmax denominator as one extra virtual key, then its probability
    mass is dropped.
    ``kv_patch``: (k_new [B,1,Hkv,hd], v_new [B,1,Hkv,hd], pos [B] or
    scalar) — decode-step mode: k/v are the RAW cache slices whose row at
    ``pos`` is stale, and the new token's key/value are patched in at the
    score/value level.  This avoids materializing an updated copy of the
    whole cache slice just to attend once (xplane: ~33 MB/layer/step of
    slice+update staging on the b8 engine, ~1 ms/step at 32 layers).
    Rows where pos >= S (an overrunning inactive engine slot) patch
    nothing — matching the update path, whose out-of-range scatter rows
    are dropped.
    """
    B, T, H, hd = q.shape
    S, Hkv = k.shape[1], k.shape[2]
    if Hkv != H:
        rep = H // Hkv
        k = jnp.repeat(k, rep, axis=2)
        v = jnp.repeat(v, rep, axis=2)
        if kv_patch is not None:
            kn, vn, _pos = kv_patch
            kv_patch = (jnp.repeat(kn, rep, axis=2),
                        jnp.repeat(vn, rep, axis=2), _pos)
    scores = jnp.einsum("bthd,bshd->bhts", q, k,
                        preferred_element_type=jnp.float32) * scale
    is_new = None
    if kv_patch is not None:
        k_new, v_new, pos = kv_patch
        pos = jnp.asarray(pos, jnp.int32)
        pos_b = jnp.broadcast_to(pos.reshape(-1), (B,)) \
            if pos.ndim <= 1 else pos
        snew = jnp.einsum("bthd,bshd->bhts", q, k_new.astype(q.dtype),
                          preferred_element_type=jnp.float32) * scale
        is_new = (jnp.arange(S)[None, :] == pos_b[:, None]
                  )[:, None, None, :]                      # [B,1,1,S]
        scores = jnp.where(is_new, snew, scores)
    if softcap is not None:
        scores = softcap * jnp.tanh(scores / softcap)
    if bias is not None:
        scores = scores + bias.astype(jnp.float32)
    if sinks is not None:
        col = jnp.broadcast_to(
            sinks.astype(jnp.float32)[None, :, None, None], (B, H, T, 1))
        comb = jnp.concatenate([scores.astype(jnp.float32), col], axis=-1)
        comb = comb - jnp.max(comb, axis=-1, keepdims=True)
        probs = jax.nn.softmax(comb, axis=-1)[..., :-1].astype(q.dtype)
    else:
        probs = jax.nn.softmax(scores.astype(jnp.float32), axis=-1
                               ).astype(q.dtype)
    if is_new is not None:
        # the stale row contributes NOTHING (its probability column is
        # zeroed before the value product) and the new token's value
        # joins as a rank-1 term — no gather, no materialized cache
        # update, one extra where over the probability matrix.
        p_new = jnp.sum(jnp.where(is_new, probs.astype(jnp.float32), 0.0),
                        axis=-1)                           # [B, H, T]
        probs = jnp.where(is_new, jnp.zeros((), probs.dtype), probs)
        out = jnp.einsum("bhts,bshd->bthd", probs, v,
                         preferred_element_type=jnp.float32)
        out = out + (p_new.transpose(0, 2, 1)[..., None]   # [B, T, H, 1]
                     * v_new.astype(jnp.float32))
        return out.astype(q.dtype)
    out = jnp.einsum("bhts,bshd->bthd", probs, v,
                     preferred_element_type=jnp.float32)
    return out.astype(q.dtype)


def attention_core_q8(q: jnp.ndarray, kq: jnp.ndarray, vq: jnp.ndarray,
                      ks: jnp.ndarray, vs: jnp.ndarray,
                      bias: Optional[jnp.ndarray], scale: float,
                      kv_patch) -> jnp.ndarray:
    """Patched decode attention DIRECTLY on an int8-quantized KV cache.

    q: [B, T, H, hd]; kq/vq: int8 codes [B, S, Hkv, hd]; ks/vs: f32
    per-row scales [B, S, Hkv] (symmetric absmax over the head dim,
    ``_quantize_kv``); ``kv_patch``: (k_new, v_new, pos) with the NEW
    token's bf16 key/value [B, 1, Hkv, hd] and its cache position.

    The per-row scale factors OUT of the head-dim contraction:
    q.(codes*s/127) == (q.codes)*s/127 — so the score einsum reads the
    raw int8 codes (the convert fuses into XLA's decode-shape reduce
    fusion; only int8 bytes stream from HBM, HALF the bf16 cache
    traffic that bounds the batched engine) and the dequant collapses
    to one multiply on the [B,H,T,S] score plane.  Likewise the value
    scale folds into the probability plane before the AV product.  The
    new token attends its EXACT bf16 key/value (later steps read the
    quantized row — standard KV-quantization semantics, strictly more
    accurate than dequantizing the just-written row).  The stale cache
    row at ``pos`` contributes nothing: its score column is replaced
    and its probability column is zeroed before the value product,
    exactly like the bf16 ``kv_patch`` path above.
    """
    B, T, H, hd = q.shape
    S, Hkv = kq.shape[1], kq.shape[2]
    k_new, v_new, pos = kv_patch
    # GQA runs GROUPED: q reshapes to [B, T, Hkv, rep, hd] and contracts
    # against the UN-repeated int8 codes — a jnp.repeat of the code/scale
    # arrays would (if XLA declined to fuse it) materialize H-head copies
    # of the cache slice each step, eroding the only-int8-bytes-stream
    # claim for GQA models.  Head order matches jnp.repeat semantics:
    # query head h attends kv head h // rep.
    rep = H // Hkv
    qg = q.reshape(B, T, Hkv, rep, hd)
    pos = jnp.asarray(pos, jnp.int32)
    pos_b = jnp.broadcast_to(pos.reshape(-1), (B,)) if pos.ndim <= 1 else pos
    raw = jnp.einsum("btkrd,bskd->bkrts", qg, kq.astype(q.dtype),
                     preferred_element_type=jnp.float32)
    ks_g = ks.transpose(0, 2, 1)[:, :, None, None, :]      # [B, Hkv, 1, 1, S]
    scores = (raw * (ks_g * (scale / 127.0))).reshape(B, H, T, S)
    snew = jnp.einsum("btkrd,bskd->bkrts", qg, k_new.astype(q.dtype),
                      preferred_element_type=jnp.float32
                      ).reshape(B, H, T, 1) * scale
    is_new = (jnp.arange(S)[None, :] == pos_b[:, None])[:, None, None, :]
    scores = jnp.where(is_new, snew, scores)
    if bias is not None:
        scores = scores + bias.astype(jnp.float32)
    probs = jax.nn.softmax(scores.astype(jnp.float32), axis=-1)
    p_new = jnp.sum(jnp.where(is_new, probs, 0.0), axis=-1)  # [B, H, T]
    probs = jnp.where(is_new, 0.0, probs)
    vs_g = vs.transpose(0, 2, 1)[:, :, None, None, :]      # [B, Hkv, 1, 1, S]
    pv = (probs.reshape(B, Hkv, rep, T, S) * (vs_g / 127.0)).astype(q.dtype)
    out = jnp.einsum("bkrts,bskd->btkrd", pv, vq.astype(q.dtype),
                     preferred_element_type=jnp.float32)
    out = out.reshape(B, T, H, hd)
    vn = jnp.broadcast_to(v_new.astype(jnp.float32)[:, :, :, None],
                          (B, 1, Hkv, rep, hd)).reshape(B, 1, H, hd)
    out = out + p_new.transpose(0, 2, 1)[..., None] * vn
    return out.astype(q.dtype)
