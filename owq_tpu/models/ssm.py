"""Mamba-2 (SSD) mixer for hybrid attention/SSM families (Bamba,
Granite-4.0 hybrid, Falcon-H1 class).

Pure-jnp port of the HF slow path (models/bamba/modeling_bamba.py
``BambaMixer.torch_forward``), vectorized for the MXU:

  * full-sequence: the chunked "state-space dual" form — intra-chunk
    quadratic attention-like term plus inter-chunk state recurrence,
    computed as batched einsums over fixed-size chunks (static shapes,
    jit-friendly; no sequential scan over tokens),
  * single-step decode: O(1) recurrent update of the conv/ssm states.

State layout (per layer): conv_state [B, conv_dim, K] holds the last K
raw (pre-conv) projected inputs; ssm_state [B, H, head_dim, N] is the
discretized SSM state.  The quantizable linears are ``in_proj`` and
``out_proj`` (everything else is tiny per-head vectors), addressed as
"mamba.in_proj"/"mamba.out_proj" by the quantization pipeline.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

__all__ = ["mamba2_full", "mamba2_step", "MambaSpec",
           "mamba1_full", "mamba1_step", "Mamba1Spec"]


class MambaSpec:
    """Static mixer geometry (derived from config at import time)."""

    def __init__(self, *, num_heads: int, head_dim: int, d_state: int,
                 d_conv: int, n_groups: int, chunk_size: int,
                 intermediate: int, activation: str = "silu",
                 norm_mode: str = "gated_rms"):
        self.num_heads = num_heads
        self.head_dim = head_dim
        self.d_state = d_state
        self.d_conv = d_conv
        self.n_groups = n_groups
        self.chunk_size = chunk_size
        self.intermediate = intermediate  # num_heads * head_dim
        self.conv_dim = intermediate + 2 * n_groups * d_state
        self.activation = activation
        # output gating: 'gated_rms' (bamba: silu(gate)*y then rms),
        # 'silu_gate' (falcon-h1 default: y*silu(gate), no norm),
        # 'grouped_before'/'grouped_after' (falcon-h1 mamba_rms_norm:
        # per-group rms, gate applied after/before the norm)
        self.norm_mode = norm_mode

    def key(self):  # hashable for jit static args
        return (self.num_heads, self.head_dim, self.d_state, self.d_conv,
                self.n_groups, self.chunk_size, self.intermediate,
                self.activation, self.norm_mode)


def _act(x, kind):
    from .layers import activation

    return activation(x, kind)


def _segment_sum(a: jnp.ndarray) -> jnp.ndarray:
    """[..., Q] -> [..., Q, Q] cumulative segment sums; -inf above diag."""
    Q = a.shape[-1]
    x = jnp.repeat(a[..., None], Q, axis=-1)
    x = jnp.where(jnp.tril(jnp.ones((Q, Q), bool), k=-1), x, 0.0)
    seg = jnp.cumsum(x, axis=-2)
    return jnp.where(jnp.tril(jnp.ones((Q, Q), bool)), seg, -jnp.inf)


def _gate_norm(y, gate, mp, spec: "MambaSpec", eps):
    """Output gating per spec.norm_mode (see MambaSpec)."""
    y32 = y.astype(jnp.float32)
    g = jax.nn.silu(gate.astype(jnp.float32))
    mode = spec.norm_mode
    if mode == "silu_gate":
        return (y32 * g).astype(y.dtype)
    if mode == "gated_rms":
        y32 = y32 * g
        var = jnp.mean(y32 * y32, axis=-1, keepdims=True)
        return (mp["norm_w"].astype(jnp.float32) * y32
                * jax.lax.rsqrt(var + eps)).astype(y.dtype)
    # grouped rms (falcon-h1): normalize per n_groups slice of the inner dim
    if mode == "grouped_after":
        y32 = y32 * g
    G = spec.n_groups
    shp = y32.shape
    yg = y32.reshape(shp[:-1] + (G, shp[-1] // G))
    var = jnp.mean(yg * yg, axis=-1, keepdims=True)
    yg = yg * jax.lax.rsqrt(var + eps)
    y32 = yg.reshape(shp) * mp["norm_w"].astype(jnp.float32)
    if mode == "grouped_before":
        y32 = y32 * g
    return y32.astype(y.dtype)


def _lin(p, x, kernel="xla"):
    if hasattr(p, "apply"):
        try:
            return p.apply(x, kernel=kernel)
        except TypeError:
            return p.apply(x)
    raise TypeError(type(p))


def _depthwise_causal_conv(u: jnp.ndarray, w: jnp.ndarray,
                           b: Optional[jnp.ndarray],
                           left_ctx: Optional[jnp.ndarray] = None
                           ) -> jnp.ndarray:
    """u [B, T, C], w [K, C] -> causal depthwise conv [B, T, C].

    ``left_ctx`` [B, K-1, C]: preceding raw inputs (cached conv state) in
    place of zero padding — continues a sequence exactly.
    """
    K = w.shape[0]
    T = u.shape[1]
    if left_ctx is not None:
        up = jnp.concatenate([left_ctx.astype(u.dtype), u], axis=1)
    else:
        up = jnp.pad(u, ((0, 0), (K - 1, 0), (0, 0)))
    acc = jnp.zeros_like(u, dtype=jnp.float32)
    for k in range(K):  # K is tiny (4); unrolled taps fuse into one kernel
        acc = acc + w[k].astype(jnp.float32) * up[:, k:k + T].astype(
            jnp.float32)
    if b is not None:
        acc = acc + b.astype(jnp.float32)
    return acc.astype(u.dtype)


def mamba2_full(mp: Dict[str, Any], spec: MambaSpec, x: jnp.ndarray,
                *, eps: float, kernel: str = "xla",
                taps: Sequence[str] = (), tap_prefix: str = "mamba",
                conv_state: Optional[jnp.ndarray] = None,
                ssm_state: Optional[jnp.ndarray] = None,
                valid_len: Optional[jnp.ndarray] = None,
                ) -> Tuple[jnp.ndarray, Tuple[jnp.ndarray, jnp.ndarray],
                           Dict[str, jnp.ndarray]]:
    """Full-sequence SSD pass.

    With ``conv_state``/``ssm_state`` the pass continues EXACTLY from a
    prior recurrent state (multi-token chained decode / speculative
    verification) — the conv uses the cached last K-1 raw inputs as left
    context and the inter-chunk recurrence starts from ``ssm_state``
    (zero states reproduce the from-scratch prefill).

    ``valid_len`` (scalar or [B]): only the first n tokens are real
    (right-padded prefill buckets) — dt is zeroed beyond n so the state
    neither decays nor updates on pad steps, and the conv state is the
    last K REAL inputs (dynamic slice at n).  Returns
    (y [B,T,hidden], (new conv_state, new ssm_state), tapped).
    """
    B, T, _ = x.shape
    H, P, N = spec.num_heads, spec.head_dim, spec.d_state
    G, Q = spec.n_groups, spec.chunk_size
    inner, conv_dim = spec.intermediate, spec.conv_dim
    tapped: Dict[str, jnp.ndarray] = {}

    if f"{tap_prefix}.in_proj" in taps:
        tapped[f"{tap_prefix}.in_proj"] = x
    proj = _lin(mp["in_proj"], x, kernel)
    gate = proj[..., :inner]
    hBC = proj[..., inner:inner + conv_dim]
    dt = proj[..., inner + conv_dim:]

    # conv state: last K raw (pre-conv) inputs (older cached inputs fill
    # the left when fewer than K new tokens arrive)
    K = spec.d_conv
    hBC_t = jnp.swapaxes(hBC, 1, 2)  # [B, conv_dim, T]
    if valid_len is not None:
        # pad positions must not leak into the state: zero the raw inputs
        # (conv taps) and later the dt (freeze the recurrence)
        vl = jnp.broadcast_to(jnp.atleast_1d(valid_len), (B,))
        tpos = jnp.arange(T, dtype=jnp.int32)
        tok_valid = (tpos[None, :] < vl[:, None])          # [B, T]
        hBC = hBC * tok_valid[..., None].astype(hBC.dtype)
        hBC_t = jnp.swapaxes(hBC, 1, 2)
    if conv_state is None:
        if valid_len is not None:
            # last K REAL inputs: slice a zero-left-padded stream at n
            padded = jnp.pad(hBC_t, ((0, 0), (0, 0), (K, 0)))
            idx = vl[:, None] + jnp.arange(K, dtype=jnp.int32)[None, :]
            conv_state_new = jnp.take_along_axis(
                padded, idx[:, None, :], axis=-1)
        else:
            conv_state_new = jnp.pad(
                hBC_t, ((0, 0), (0, 0), (max(K - T, 0), 0)))[:, :, -K:]
        left_ctx = None
    else:
        conv_state_new = jnp.concatenate(
            [conv_state.astype(hBC_t.dtype), hBC_t], axis=-1)[:, :, -K:]
        left_ctx = jnp.swapaxes(conv_state[:, :, 1:], 1, 2)  # [B, K-1, conv]

    hBC = _act(_depthwise_causal_conv(hBC, mp["conv_w"], mp.get("conv_b"),
                                      left_ctx=left_ctx),
               spec.activation)
    h = hBC[..., :inner]
    B_ = hBC[..., inner:inner + G * N]
    C_ = hBC[..., inner + G * N:]

    dt = jax.nn.softplus(dt.astype(jnp.float32)
                         + mp["dt_bias"].astype(jnp.float32))  # [B,T,H]
    if valid_len is not None:
        dt = dt * tok_valid[..., None]  # frozen state on pad steps
    A = -jnp.exp(mp["A_log"].astype(jnp.float32))              # [H]

    h4 = h.reshape(B, T, H, P).astype(jnp.float32)
    rep = H // G
    B4 = jnp.repeat(B_.reshape(B, T, G, N).astype(jnp.float32), rep, axis=2)
    C4 = jnp.repeat(C_.reshape(B, T, G, N).astype(jnp.float32), rep, axis=2)

    pad = (Q - T % Q) % Q

    def padT(t):
        return jnp.pad(t, ((0, 0), (0, pad)) + ((0, 0),) * (t.ndim - 2))

    D_res = mp["D"].astype(jnp.float32)[:, None] * padT(h4)   # [B,Tp,H,P]
    xdt = padT(h4 * dt[..., None])
    Adt = padT(A[None, None, :] * dt)                          # [B,Tp,H]
    B4, C4 = padT(B4), padT(C4)
    Cn = (T + pad) // Q

    def chunk(t):
        return t.reshape((B, Cn, Q) + t.shape[2:])

    xdt, B4, C4 = chunk(xdt), chunk(B4), chunk(C4)            # [B,Cn,Q,H,*]
    Ac = chunk(Adt).transpose(0, 3, 1, 2)                      # [B,H,Cn,Q]
    A_cum = jnp.cumsum(Ac, axis=-1)

    # intra-chunk (diagonal blocks): attention-like masked quadratic term
    L = jnp.exp(_segment_sum(Ac))                              # [B,H,Cn,Q,Q]
    Gm = jnp.einsum("bclhn,bcshn->bclsh", C4, B4)
    M = Gm * L.transpose(0, 2, 3, 4, 1)
    Y_diag = jnp.einsum("bclsh,bcshp->bclhp", M, xdt)

    # intra-chunk final states (B terms)
    decay_states = jnp.exp(A_cum[:, :, :, -1:] - A_cum)        # [B,H,Cn,Q]
    B_decay = B4 * decay_states.transpose(0, 2, 3, 1)[..., None]
    states = jnp.einsum("bcshn,bcshp->bchpn", B_decay, xdt)

    # inter-chunk recurrence over chunk boundaries
    if ssm_state is None:
        prev = jnp.zeros_like(states[:, :1])
    else:
        prev = ssm_state.astype(states.dtype)[:, None]
    states = jnp.concatenate([prev, states], axis=1)           # [B,Cn+1,...]
    decay_chunk = jnp.exp(_segment_sum(
        jnp.pad(A_cum[:, :, :, -1], ((0, 0), (0, 0), (1, 0)))))
    decay_chunk = decay_chunk.transpose(0, 3, 2, 1)            # [B,Cn+1,Cn+1,H]
    new_states = jnp.einsum("bzch,bzhpn->bchpn", decay_chunk, states)
    states, ssm_state_new = new_states[:, :-1], new_states[:, -1]

    # state -> output (C terms)
    sdo = jnp.exp(A_cum).transpose(0, 2, 3, 1)                 # [B,Cn,Q,H]
    Y_off = jnp.einsum("bclhn,bchpn->bclhp", C4, states) * sdo[..., None]

    y = (Y_diag + Y_off).reshape(B, T + pad, H, P) + D_res
    y = y[:, :T].reshape(B, T, inner)

    y = _gate_norm(y, gate, mp, spec, eps)
    if f"{tap_prefix}.out_proj" in taps:
        tapped[f"{tap_prefix}.out_proj"] = y
    out = _lin(mp["out_proj"], y.astype(x.dtype), kernel)
    return out, (conv_state_new.astype(jnp.float32),
                 ssm_state_new.astype(jnp.float32)), tapped


def mamba2_step(mp: Dict[str, Any], spec: MambaSpec, x: jnp.ndarray,
                conv_state: jnp.ndarray, ssm_state: jnp.ndarray,
                *, eps: float, kernel: str = "xla",
                ) -> Tuple[jnp.ndarray, Tuple[jnp.ndarray, jnp.ndarray]]:
    """One-token recurrent update.  x: [B, 1, hidden]."""
    B = x.shape[0]
    H, P, N = spec.num_heads, spec.head_dim, spec.d_state
    G = spec.n_groups
    inner, conv_dim = spec.intermediate, spec.conv_dim

    proj = _lin(mp["in_proj"], x, kernel)[:, 0]  # [B, proj]
    gate = proj[..., :inner]
    hBC = proj[..., inner:inner + conv_dim]
    dt = proj[..., inner + conv_dim:]            # [B, H]

    conv_state = jnp.concatenate(
        [conv_state[:, :, 1:], hBC[:, :, None]], axis=-1)  # [B,conv,K]
    conv_out = jnp.sum(conv_state.astype(jnp.float32)
                       * mp["conv_w"].astype(jnp.float32).T[None], axis=-1)
    if mp.get("conv_b") is not None:
        conv_out = conv_out + mp["conv_b"].astype(jnp.float32)
    hBC = _act(conv_out, spec.activation)        # [B, conv_dim] f32

    h = hBC[..., :inner].reshape(B, H, P)
    B_ = hBC[..., inner:inner + G * N].reshape(B, G, N)
    C_ = hBC[..., inner + G * N:].reshape(B, G, N)
    rep = H // G
    B_ = jnp.repeat(B_, rep, axis=1)             # [B,H,N]
    C_ = jnp.repeat(C_, rep, axis=1)

    dt = jax.nn.softplus(dt.astype(jnp.float32)
                         + mp["dt_bias"].astype(jnp.float32))  # [B,H]
    A = -jnp.exp(mp["A_log"].astype(jnp.float32))              # [H]
    dA = jnp.exp(dt * A[None])[:, :, None, None]               # [B,H,1,1]
    dBx = (dt[:, :, None] * B_)[:, :, None, :] * h[..., None]  # [B,H,P,N]
    ssm_state = ssm_state * dA + dBx

    y = jnp.einsum("bhpn,bhn->bhp", ssm_state, C_)
    y = y + h * mp["D"].astype(jnp.float32)[None, :, None]
    y = y.reshape(B, 1, inner)

    y = _gate_norm(y, gate[:, None, :], mp, spec, eps)
    out = _lin(mp["out_proj"], y.astype(x.dtype), kernel)
    return out, (conv_state, ssm_state)


# ---------------------------------------------------------------------------
# Mamba-1 (selective scan) — Jamba / falcon-mamba class
# ---------------------------------------------------------------------------

class Mamba1Spec:
    """Static geometry of a mamba-1 selective-scan mixer."""

    def __init__(self, *, intermediate: int, d_state: int, d_conv: int,
                 dt_rank: int, activation: str = "silu",
                 bcdt_rms_eps: Optional[float] = None):
        self.intermediate = intermediate
        self.d_state = d_state
        self.d_conv = d_conv
        self.dt_rank = dt_rank
        self.activation = activation
        self.conv_dim = intermediate  # conv runs over the inner channels
        # falcon-mamba: WEIGHTLESS rms on dt/B/C with its own epsilon
        self.bcdt_rms_eps = bcdt_rms_eps

    def key(self):
        return (self.intermediate, self.d_state, self.d_conv, self.dt_rank,
                self.activation, self.bcdt_rms_eps)


def _maybe_rms(p, key, x, eps):
    w = p.get(key)
    if w is None:
        return x
    x32 = x.astype(jnp.float32)
    var = jnp.mean(x32 * x32, axis=-1, keepdims=True)
    return (x32 * jax.lax.rsqrt(var + eps) * w.astype(jnp.float32)).astype(
        x.dtype)


def _mamba1_ssm_params(mp, spec: Mamba1Spec, h, eps, kernel, taps, tap_prefix,
                       tapped):
    """h [B,T,inner] (post-conv, activated) -> (dt [B,T,inner],
    B_ [B,T,N], C_ [B,T,N]) with jamba's optional dt/b/c rms norms."""
    if f"{tap_prefix}.x_proj" in taps:
        tapped[f"{tap_prefix}.x_proj"] = h
    sp = _lin(mp["x_proj"], h, kernel)
    dt_r = sp[..., :spec.dt_rank]
    B_ = sp[..., spec.dt_rank:spec.dt_rank + spec.d_state]
    C_ = sp[..., spec.dt_rank + spec.d_state:]
    if spec.bcdt_rms_eps is not None:  # falcon-mamba weightless rms
        def wrms(t):
            t32 = t.astype(jnp.float32)
            var = jnp.mean(t32 * t32, axis=-1, keepdims=True)
            return (t32 * jax.lax.rsqrt(var + spec.bcdt_rms_eps)).astype(
                t.dtype)

        dt_r, B_, C_ = wrms(dt_r), wrms(B_), wrms(C_)
    else:
        dt_r = _maybe_rms(mp, "dt_norm", dt_r, eps)
        B_ = _maybe_rms(mp, "b_norm", B_, eps)
        C_ = _maybe_rms(mp, "c_norm", C_, eps)
    if f"{tap_prefix}.dt_proj" in taps:
        tapped[f"{tap_prefix}.dt_proj"] = dt_r
    dt = jax.nn.softplus(_lin(mp["dt_proj"], dt_r, kernel).astype(jnp.float32))
    return dt, B_.astype(jnp.float32), C_.astype(jnp.float32)


def mamba1_full(mp: Dict[str, Any], spec: Mamba1Spec, x: jnp.ndarray, *,
                eps: float, kernel: str = "xla", taps: Sequence[str] = (),
                tap_prefix: str = "mamba",
                conv_state: Optional[jnp.ndarray] = None,
                ssm_state: Optional[jnp.ndarray] = None,
                valid_len: Optional[jnp.ndarray] = None,
                ) -> Tuple[jnp.ndarray, Tuple[jnp.ndarray, jnp.ndarray],
                           Dict[str, jnp.ndarray]]:
    """Full-sequence selective scan via lax.associative_scan (log-depth —
    no sequential token loop).  Continues exactly from (conv_state,
    ssm_state); ``valid_len`` freezes the recurrence on right-pad steps."""
    B, T, _ = x.shape
    inner, N, K = spec.intermediate, spec.d_state, spec.d_conv
    tapped: Dict[str, jnp.ndarray] = {}

    if f"{tap_prefix}.in_proj" in taps:
        tapped[f"{tap_prefix}.in_proj"] = x
    proj = _lin(mp["in_proj"], x, kernel)
    h, gate = proj[..., :inner], proj[..., inner:]

    tok_valid = None
    if valid_len is not None:
        vl = jnp.broadcast_to(jnp.atleast_1d(valid_len), (B,))
        tok_valid = (jnp.arange(T, dtype=jnp.int32)[None, :] < vl[:, None])
        h = h * tok_valid[..., None].astype(h.dtype)
    h_t = jnp.swapaxes(h, 1, 2)
    if conv_state is None:
        if valid_len is not None:
            padded = jnp.pad(h_t, ((0, 0), (0, 0), (K, 0)))
            idx = vl[:, None] + jnp.arange(K, dtype=jnp.int32)[None, :]
            conv_state_new = jnp.take_along_axis(padded, idx[:, None, :],
                                                 axis=-1)
        else:
            conv_state_new = jnp.pad(
                h_t, ((0, 0), (0, 0), (max(K - T, 0), 0)))[:, :, -K:]
        left_ctx = None
    else:
        conv_state_new = jnp.concatenate(
            [conv_state.astype(h_t.dtype), h_t], axis=-1)[:, :, -K:]
        left_ctx = jnp.swapaxes(conv_state[:, :, 1:], 1, 2)

    h = _act(_depthwise_causal_conv(h, mp["conv_w"], mp.get("conv_b"),
                                    left_ctx=left_ctx), spec.activation)
    if tok_valid is not None:
        h = h * tok_valid[..., None].astype(h.dtype)

    dt, B_, C_ = _mamba1_ssm_params(mp, spec, h, eps, kernel, taps,
                                    tap_prefix, tapped)
    if tok_valid is not None:
        dt = dt * tok_valid[..., None]  # dA=1, dBu=0 on pad steps

    A = -jnp.exp(mp["A_log"].astype(jnp.float32))        # [inner, N]
    h32 = h.astype(jnp.float32)
    dA = jnp.exp(dt[..., None] * A[None, None])          # [B,T,inner,N]
    dBu = dt[..., None] * B_[:, :, None, :] * h32[..., None]

    def comb(l, r):
        return (l[0] * r[0], r[0] * l[1] + r[1])

    Acum, hs = jax.lax.associative_scan(comb, (dA, dBu), axis=1)
    if ssm_state is not None:
        hs = hs + Acum * ssm_state.astype(jnp.float32)[:, None]
    ssm_state_new = hs[:, -1]

    y = jnp.einsum("btin,btn->bti", hs, C_)
    y = y + h32 * mp["D"].astype(jnp.float32)[None, None]
    y = y * jax.nn.silu(gate.astype(jnp.float32))
    y = y.astype(x.dtype)
    if f"{tap_prefix}.out_proj" in taps:
        tapped[f"{tap_prefix}.out_proj"] = y
    out = _lin(mp["out_proj"], y, kernel)
    return out, (conv_state_new.astype(jnp.float32),
                 ssm_state_new.astype(jnp.float32)), tapped


def mamba1_step(mp: Dict[str, Any], spec: Mamba1Spec, x: jnp.ndarray,
                conv_state: jnp.ndarray, ssm_state: jnp.ndarray, *,
                eps: float, kernel: str = "xla"
                ) -> Tuple[jnp.ndarray, Tuple[jnp.ndarray, jnp.ndarray]]:
    """One-token recurrent selective-scan update.  x: [B, 1, hidden]."""
    B = x.shape[0]
    inner, N = spec.intermediate, spec.d_state

    proj = _lin(mp["in_proj"], x, kernel)[:, 0]
    h, gate = proj[..., :inner], proj[..., inner:]

    conv_state = jnp.concatenate(
        [conv_state[:, :, 1:], h[:, :, None]], axis=-1)
    conv_out = jnp.sum(conv_state.astype(jnp.float32)
                       * mp["conv_w"].astype(jnp.float32).T[None], axis=-1)
    if mp.get("conv_b") is not None:
        conv_out = conv_out + mp["conv_b"].astype(jnp.float32)
    h = _act(conv_out, spec.activation)                  # [B, inner] f32

    dt, B_, C_ = _mamba1_ssm_params(mp, spec, h[:, None], eps, kernel, (),
                                    "mamba", {})
    dt, B_, C_ = dt[:, 0], B_[:, 0], C_[:, 0]
    A = -jnp.exp(mp["A_log"].astype(jnp.float32))
    dA = jnp.exp(dt[..., None] * A[None])
    dBu = dt[..., None] * B_[:, None, :] * h[..., None]
    ssm_state = ssm_state.astype(jnp.float32) * dA + dBu
    y = jnp.einsum("bin,bn->bi", ssm_state, C_)
    y = y + h * mp["D"].astype(jnp.float32)[None]
    y = (y * jax.nn.silu(gate.astype(jnp.float32))).astype(x.dtype)[:, None]
    out = _lin(mp["out_proj"], y, kernel)
    return out, (conv_state, ssm_state)


# ---------------------------------------------------------------------------
# LFM2 gated short convolution (no state-space; just a depthwise conv)
# ---------------------------------------------------------------------------

def shortconv_full(mp: Dict[str, Any], L: int, x: jnp.ndarray, *,
                   kernel: str = "xla", taps: Sequence[str] = (),
                   conv_state: Optional[jnp.ndarray] = None,
                   valid_len: Optional[jnp.ndarray] = None,
                   ) -> Tuple[jnp.ndarray, jnp.ndarray,
                              Dict[str, jnp.ndarray]]:
    """y = out_proj(C * conv(B * x)) with B,C,x = chunk3(in_proj(h))."""
    Bsz, T, _ = x.shape
    tapped: Dict[str, jnp.ndarray] = {}
    if "conv.in_proj" in taps:
        tapped["conv.in_proj"] = x
    bcx = _lin(mp["in_proj"], x, kernel)
    hid = bcx.shape[-1] // 3
    B_, C_, x_ = bcx[..., :hid], bcx[..., hid:2 * hid], bcx[..., 2 * hid:]
    Bx = B_ * x_

    if valid_len is not None:
        vl = jnp.broadcast_to(jnp.atleast_1d(valid_len), (Bsz,))
        tok_valid = (jnp.arange(T, dtype=jnp.int32)[None, :] < vl[:, None])
        Bx = Bx * tok_valid[..., None].astype(Bx.dtype)
    Bx_t = jnp.swapaxes(Bx, 1, 2)
    if conv_state is None:
        if valid_len is not None:
            padded = jnp.pad(Bx_t, ((0, 0), (0, 0), (L, 0)))
            idx = vl[:, None] + jnp.arange(L, dtype=jnp.int32)[None, :]
            conv_state_new = jnp.take_along_axis(padded, idx[:, None, :],
                                                 axis=-1)
        else:
            conv_state_new = jnp.pad(
                Bx_t, ((0, 0), (0, 0), (max(L - T, 0), 0)))[:, :, -L:]
        left_ctx = None
    else:
        conv_state_new = jnp.concatenate(
            [conv_state.astype(Bx_t.dtype), Bx_t], axis=-1)[:, :, -L:]
        left_ctx = jnp.swapaxes(conv_state[:, :, 1:], 1, 2)

    conv_out = _depthwise_causal_conv(Bx, mp["conv_w"], mp.get("conv_b"),
                                      left_ctx=left_ctx)
    y = C_ * conv_out
    if "conv.out_proj" in taps:
        tapped["conv.out_proj"] = y
    out = _lin(mp["out_proj"], y, kernel)
    return out, conv_state_new.astype(jnp.float32), tapped


def shortconv_step(mp: Dict[str, Any], L: int, x: jnp.ndarray,
                   conv_state: jnp.ndarray, *, kernel: str = "xla"
                   ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    Bsz = x.shape[0]
    bcx = _lin(mp["in_proj"], x, kernel)[:, 0]
    hid = bcx.shape[-1] // 3
    B_, C_, x_ = bcx[..., :hid], bcx[..., hid:2 * hid], bcx[..., 2 * hid:]
    Bx = B_ * x_
    conv_state = jnp.concatenate(
        [conv_state[:, :, 1:], Bx[:, :, None].astype(conv_state.dtype)],
        axis=-1)
    conv_out = jnp.sum(conv_state.astype(jnp.float32)
                       * mp["conv_w"].astype(jnp.float32).T[None], axis=-1)
    if mp.get("conv_b") is not None:
        conv_out = conv_out + mp["conv_b"].astype(jnp.float32)
    y = (C_.astype(jnp.float32) * conv_out).astype(x.dtype)[:, None]
    out = _lin(mp["out_proj"], y, kernel)
    return out, conv_state
