"""Gated DeltaNet mixer (Qwen3-Next linear-attention layers).

Pure-jnp port of the HF slow path (models/qwen3_next
``torch_chunk_gated_delta_rule`` / ``torch_recurrent_gated_delta_rule``):

  * full-sequence: the chunked delta rule — the in-chunk causal
    "(I - A)^-1" correction is a unit-lower-triangular solve (the HF
    reference builds it with a python loop over rows), the cross-chunk
    recurrence is a lax.scan of matmuls over chunk boundaries,
  * single-step decode: O(1) recurrent delta update.

State: conv_state [B, 2*key_dim + value_dim, K] (last K raw projected
q|k|v inputs) and a recurrent matrix state [B, Hv, dk, dv].  Quantizable
linears: in_proj_qkvz, in_proj_ba, out_proj ("gdn.<name>").
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from .ssm import _depthwise_causal_conv, _lin

__all__ = ["GDNSpec", "gdn_full", "gdn_step"]


class GDNSpec:
    def __init__(self, *, num_k_heads: int, num_v_heads: int,
                 head_k_dim: int, head_v_dim: int, d_conv: int,
                 chunk_size: int, activation: str = "silu"):
        self.num_k_heads = num_k_heads
        self.num_v_heads = num_v_heads
        self.head_k_dim = head_k_dim
        self.head_v_dim = head_v_dim
        self.d_conv = d_conv
        self.chunk_size = chunk_size
        self.activation = activation
        self.key_dim = num_k_heads * head_k_dim
        self.value_dim = num_v_heads * head_v_dim
        self.conv_dim = 2 * self.key_dim + self.value_dim


def _l2norm(x, eps=1e-6):
    x32 = x.astype(jnp.float32)
    return x32 * jax.lax.rsqrt(jnp.sum(x32 * x32, axis=-1, keepdims=True)
                               + eps)


def _split_qkvz_ba(spec: GDNSpec, qkvz: jnp.ndarray, ba: jnp.ndarray):
    """HF fix_query_key_value_ordering: per-k-head interleaved layout."""
    B, T = qkvz.shape[:2]
    Hk, Hv = spec.num_k_heads, spec.num_v_heads
    dk, dv = spec.head_k_dim, spec.head_v_dim
    R = Hv // Hk
    qkvz = qkvz.reshape(B, T, Hk, 2 * dk + 2 * R * dv)
    q = qkvz[..., :dk]
    k = qkvz[..., dk:2 * dk]
    v = qkvz[..., 2 * dk:2 * dk + R * dv].reshape(B, T, Hv, dv)
    z = qkvz[..., 2 * dk + R * dv:].reshape(B, T, Hv, dv)
    ba = ba.reshape(B, T, Hk, 2 * R)
    b = ba[..., :R].reshape(B, T, Hv)
    a = ba[..., R:].reshape(B, T, Hv)
    return q, k, v, z, b, a


def _gate_beta(mp, a, b):
    beta = jax.nn.sigmoid(b.astype(jnp.float32))               # [B,T,Hv]
    g = (-jnp.exp(mp["A_log"].astype(jnp.float32))
         * jax.nn.softplus(a.astype(jnp.float32)
                           + mp["dt_bias"].astype(jnp.float32)))
    return g, beta


def _gated_out(mp, spec: GDNSpec, y, z, eps, x_dtype, kernel):
    """Per-head rms norm (weight only) then *silu(z), then out_proj."""
    B, T = y.shape[:2]
    y32 = y.astype(jnp.float32)
    var = jnp.mean(y32 * y32, axis=-1, keepdims=True)
    y32 = y32 * jax.lax.rsqrt(var + eps) * mp["norm_w"].astype(jnp.float32)
    y32 = y32 * jax.nn.silu(z.astype(jnp.float32))
    y = y32.reshape(B, T, spec.value_dim).astype(x_dtype)
    return _lin(mp["out_proj"], y, kernel), y


def gdn_full(mp: Dict[str, Any], spec: GDNSpec, x: jnp.ndarray, *,
             eps: float, kernel: str = "xla", taps: Sequence[str] = (),
             conv_state: Optional[jnp.ndarray] = None,
             rec_state: Optional[jnp.ndarray] = None,
             valid_len: Optional[jnp.ndarray] = None,
             ) -> Tuple[jnp.ndarray, Tuple[jnp.ndarray, jnp.ndarray],
                        Dict[str, jnp.ndarray]]:
    """Chunked gated delta rule over a full sequence.

    Continues exactly from (conv_state, rec_state) when given; with
    ``valid_len`` (right-padded prefill) pad steps freeze the state
    (g=0, beta=0) and the conv state takes the last K REAL inputs.
    """
    B, T, _ = x.shape
    Hv, dk, dv = spec.num_v_heads, spec.head_k_dim, spec.head_v_dim
    Q = spec.chunk_size
    tapped: Dict[str, jnp.ndarray] = {}

    for n in ("gdn.in_proj_qkvz", "gdn.in_proj_ba"):
        if n in taps:
            tapped[n] = x
    qkvz = _lin(mp["in_proj_qkvz"], x, kernel)
    ba = _lin(mp["in_proj_ba"], x, kernel)
    q, k, v, z, b, a = _split_qkvz_ba(spec, qkvz, ba)

    mixed = jnp.concatenate(
        [q.reshape(B, T, -1), k.reshape(B, T, -1), v.reshape(B, T, -1)],
        axis=-1)                                              # [B,T,conv]
    K = spec.d_conv
    tok_valid = None
    if valid_len is not None:
        vl = jnp.broadcast_to(jnp.atleast_1d(valid_len), (B,))
        tok_valid = (jnp.arange(T, dtype=jnp.int32)[None, :] < vl[:, None])
        mixed = mixed * tok_valid[..., None].astype(mixed.dtype)
    mixed_t = jnp.swapaxes(mixed, 1, 2)
    if conv_state is None:
        if valid_len is not None:
            padded = jnp.pad(mixed_t, ((0, 0), (0, 0), (K, 0)))
            idx = vl[:, None] + jnp.arange(K, dtype=jnp.int32)[None, :]
            conv_state_new = jnp.take_along_axis(padded, idx[:, None, :],
                                                 axis=-1)
        else:
            conv_state_new = jnp.pad(
                mixed_t, ((0, 0), (0, 0), (max(K - T, 0), 0)))[:, :, -K:]
        left_ctx = None
    else:
        conv_state_new = jnp.concatenate(
            [conv_state.astype(mixed_t.dtype), mixed_t], axis=-1)[:, :, -K:]
        left_ctx = jnp.swapaxes(conv_state[:, :, 1:], 1, 2)

    mixed = _act_silu(_depthwise_causal_conv(mixed, mp["conv_w"],
                                             mp.get("conv_b"),
                                             left_ctx=left_ctx))
    q = mixed[..., :spec.key_dim].reshape(B, T, spec.num_k_heads, dk)
    k = mixed[..., spec.key_dim:2 * spec.key_dim].reshape(
        B, T, spec.num_k_heads, dk)
    v = mixed[..., 2 * spec.key_dim:].reshape(B, T, Hv, dv)

    g, beta = _gate_beta(mp, a, b)
    if tok_valid is not None:  # frozen state on pad steps
        g = g * tok_valid[..., None]
        beta = beta * tok_valid[..., None]

    R = Hv // spec.num_k_heads
    if R > 1:
        q = jnp.repeat(q, R, axis=2)
        k = jnp.repeat(k, R, axis=2)

    # --- chunked delta rule (f32) -------------------------------------
    q = _l2norm(q) * (dk ** -0.5)
    k = _l2norm(k)
    v32 = v.astype(jnp.float32)

    pad = (Q - T % Q) % Q
    Cn = (T + pad) // Q

    def padT(t):
        return jnp.pad(t, ((0, 0), (0, pad)) + ((0, 0),) * (t.ndim - 2))

    # to [B,Hv,Cn,Q,*]
    def chunk(t):
        t = padT(t)
        t = jnp.moveaxis(t, 2, 1)  # [B,Hv,Tp,*]
        return t.reshape((B, Hv, Cn, Q) + t.shape[3:])

    qc, kc, vc = chunk(q), chunk(k), chunk(v32)
    gc = chunk(g[..., None])[..., 0]                    # [B,Hv,Cn,Q]
    bc = chunk(beta[..., None])[..., 0]

    v_beta = vc * bc[..., None]
    k_beta = kc * bc[..., None]

    gcs = jnp.cumsum(gc, axis=-1)                       # in-chunk cumsum
    tril = jnp.tril(jnp.ones((Q, Q), bool))
    tril_strict = jnp.tril(jnp.ones((Q, Q), bool), k=-1)
    decay = jnp.where(tril, jnp.exp(jnp.where(
        tril, gcs[..., :, None] - gcs[..., None, :], 0.0)), 0.0)

    A = -(k_beta @ jnp.swapaxes(kc, -1, -2)) * decay
    A = jnp.where(tril_strict, A, 0.0)
    # HF builds Tm = I + A + A@A + ... row by row; that series is exactly
    # the inverse of the unit-lower-triangular (I - A)
    eye = jnp.eye(Q, dtype=A.dtype)
    eye_b = jnp.broadcast_to(eye, A.shape)
    Tm = jax.scipy.linalg.solve_triangular(eye_b - A, eye_b, lower=True)
    v_prime_all = Tm @ v_beta                            # [B,Hv,Cn,Q,dv]
    k_cumdecay = Tm @ (k_beta * jnp.exp(gcs)[..., None])

    def body(S, inp):
        q_i, k_i, vp_i, kcd_i, g_i, dec_i = inp          # per-chunk slices
        attn = jnp.where(tril, (q_i @ jnp.swapaxes(k_i, -1, -2)) * dec_i,
                         0.0)
        v_new = vp_i - kcd_i @ S
        out_i = (q_i * jnp.exp(g_i)[..., None]) @ S + attn @ v_new
        g_last = g_i[..., -1]
        S = (S * jnp.exp(g_last)[..., None, None]
             + jnp.swapaxes(k_i * jnp.exp(g_last[..., None] - g_i)[..., None],
                            -1, -2) @ v_new)
        return S, out_i

    if rec_state is None:
        S0 = jnp.zeros((B, Hv, dk, dv), jnp.float32)
    else:
        S0 = rec_state.astype(jnp.float32)
    inps = (jnp.moveaxis(qc, 2, 0), jnp.moveaxis(kc, 2, 0),
            jnp.moveaxis(v_prime_all, 2, 0), jnp.moveaxis(k_cumdecay, 2, 0),
            jnp.moveaxis(gcs, 2, 0), jnp.moveaxis(decay, 2, 0))
    S_fin, outs = jax.lax.scan(body, S0, inps)
    y = jnp.moveaxis(outs, 0, 2)                        # [B,Hv,Cn,Q,dv]
    y = y.reshape(B, Hv, Cn * Q, dv)[:, :, :T]
    y = jnp.moveaxis(y, 1, 2)                           # [B,T,Hv,dv]

    out, scan_out = _gated_out(mp, spec, y, z, eps, x.dtype, kernel)
    if "gdn.out_proj" in taps:
        tapped["gdn.out_proj"] = scan_out
    return out, (conv_state_new.astype(jnp.float32),
                 S_fin.astype(jnp.float32)), tapped


def _act_silu(x):
    return jax.nn.silu(x.astype(jnp.float32)).astype(x.dtype)


def gdn_step(mp: Dict[str, Any], spec: GDNSpec, x: jnp.ndarray,
             conv_state: jnp.ndarray, rec_state: jnp.ndarray, *,
             eps: float, kernel: str = "xla"
             ) -> Tuple[jnp.ndarray, Tuple[jnp.ndarray, jnp.ndarray]]:
    """One-token recurrent delta update.  x: [B, 1, hidden]."""
    B = x.shape[0]
    Hv, dk, dv = spec.num_v_heads, spec.head_k_dim, spec.head_v_dim

    qkvz = _lin(mp["in_proj_qkvz"], x, kernel)
    ba = _lin(mp["in_proj_ba"], x, kernel)
    q, k, v, z, b, a = _split_qkvz_ba(spec, qkvz, ba)

    mixed = jnp.concatenate(
        [q.reshape(B, 1, -1), k.reshape(B, 1, -1), v.reshape(B, 1, -1)],
        axis=-1)[:, 0]                                   # [B, conv]
    conv_state = jnp.concatenate(
        [conv_state[:, :, 1:], mixed[:, :, None]], axis=-1)
    conv_out = jnp.sum(conv_state.astype(jnp.float32)
                       * mp["conv_w"].astype(jnp.float32).T[None], axis=-1)
    if mp.get("conv_b") is not None:
        conv_out = conv_out + mp["conv_b"].astype(jnp.float32)
    mixed = jax.nn.silu(conv_out)                        # [B, conv] f32

    q = mixed[:, :spec.key_dim].reshape(B, spec.num_k_heads, dk)
    k = mixed[:, spec.key_dim:2 * spec.key_dim].reshape(
        B, spec.num_k_heads, dk)
    v = mixed[:, 2 * spec.key_dim:].reshape(B, Hv, dv)

    g, beta = _gate_beta(mp, a, b)                       # [B,1,Hv]
    g, beta = g[:, 0], beta[:, 0]
    R = Hv // spec.num_k_heads
    if R > 1:
        q = jnp.repeat(q, R, axis=1)
        k = jnp.repeat(k, R, axis=1)
    q = _l2norm(q) * (dk ** -0.5)
    k = _l2norm(k)

    S = rec_state.astype(jnp.float32) * jnp.exp(g)[..., None, None]
    kv_mem = jnp.einsum("bhkv,bhk->bhv", S, k)
    delta = (v.astype(jnp.float32) - kv_mem) * beta[..., None]
    S = S + k[..., :, None] * delta[..., None, :]
    y = jnp.einsum("bhkv,bhk->bhv", S, q)[:, None]       # [B,1,Hv,dv]

    out, _ = _gated_out(mp, spec, y, z, eps, x.dtype, kernel)
    return out, (conv_state, S)
