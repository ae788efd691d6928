"""Lightning (decay-gated linear) attention — MiniMax-Text-01 / M1.

Pure-jnp port of HF MiniMaxLightningAttention: per-head exponential decay
linear attention computed blockwise — an intra-block quadratic term with a
causal decay mask plus an inter-block term against a running KV-matrix
state, scanned over blocks.  O(1) recurrent decode.

State per layer: S [B, H, dk, dk] (the decayed K^T V accumulator).  The
quantizable linears are qkv_proj, output_gate, out_proj
("lightning.<name>").
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from .ssm import _lin

__all__ = ["LightningSpec", "lightning_full", "lightning_step",
           "lightning_slopes"]


class LightningSpec:
    def __init__(self, *, num_heads: int, head_dim: int, block_size: int,
                 activation: str = "silu", norm_eps: float = 1e-6):
        self.num_heads = num_heads
        self.head_dim = head_dim
        self.block_size = block_size
        self.activation = activation
        # HF MiniMaxRMSNorm is constructed with its DEFAULT eps (1e-6), not
        # the model's rms_norm_eps — and lightning outputs are small enough
        # (decayed) that the difference is visible
        self.norm_eps = norm_eps


def lightning_slopes(num_heads: int, layer_idx: int, num_layers: int
                     ) -> jnp.ndarray:
    """Per-head decay rates (HF get_slope_rate): ALiBi-like schedule scaled
    down toward the last layer."""
    base = 1.0 / (2.0 ** (8.0 / num_heads))
    exponent = jnp.arange(1, num_heads + 1, dtype=jnp.float32)
    factor = 1.0 - layer_idx / (num_layers - 1 + 1e-5) + 1e-5
    return (base ** exponent) * factor                       # [H]


def _norm_gate_out(mp, y_flat, x, eps, kernel, taps, tapped):
    """rms norm over H*hd, sigmoid(output_gate(x)) gate, out_proj."""
    y32 = y_flat.astype(jnp.float32)
    var = jnp.mean(y32 * y32, axis=-1, keepdims=True)
    y32 = y32 * jax.lax.rsqrt(var + eps) * mp["norm_w"].astype(jnp.float32)
    if "lightning.output_gate" in taps:
        tapped["lightning.output_gate"] = x
    gate = _lin(mp["output_gate"], x, kernel)
    y = (y32 * jax.nn.sigmoid(gate.astype(jnp.float32))).astype(x.dtype)
    if "lightning.out_proj" in taps:
        tapped["lightning.out_proj"] = y
    return _lin(mp["out_proj"], y, kernel)


def lightning_full(mp: Dict[str, Any], spec: LightningSpec, x: jnp.ndarray,
                   *, eps: float, kernel: str = "xla",
                   taps: Sequence[str] = (),
                   state: Optional[jnp.ndarray] = None,
                   valid_len: Optional[jnp.ndarray] = None,
                   ) -> Tuple[jnp.ndarray, jnp.ndarray,
                              Dict[str, jnp.ndarray]]:
    """Blockwise decay linear attention over a full sequence.

    Continues from ``state`` when given.  With ``valid_len`` (right-padded
    prefill) the padded q/k/v are zeroed and the final state is rescaled by
    exp(slope * n_pad) — padding decays the state by a uniform per-head
    factor, so one rescale makes it exact.
    """
    B, T, _ = x.shape
    H, hd, Bs = spec.num_heads, spec.head_dim, spec.block_size
    slope = mp["slope"].astype(jnp.float32)                  # [H]
    tapped: Dict[str, jnp.ndarray] = {}

    if "lightning.qkv_proj" in taps:
        tapped["lightning.qkv_proj"] = x
    from .layers import activation as _act

    qkv = _act(_lin(mp["qkv_proj"], x, kernel), spec.activation)
    qkv = qkv.reshape(B, T, H, 3 * hd).astype(jnp.float32)
    q, k, v = qkv[..., :hd], qkv[..., hd:2 * hd], qkv[..., 2 * hd:]

    if valid_len is not None:
        vl = jnp.broadcast_to(jnp.atleast_1d(valid_len), (B,))
        tok_valid = (jnp.arange(T, dtype=jnp.int32)[None, :]
                     < vl[:, None]).astype(jnp.float32)
        q = q * tok_valid[..., None, None]
        k = k * tok_valid[..., None, None]
        v = v * tok_valid[..., None, None]

    pad = (Bs - T % Bs) % Bs
    Cn = (T + pad) // Bs

    def chunk(t):  # [B,T,H,hd] -> [B,H,Cn,Bs,hd]
        t = jnp.pad(t, ((0, 0), (0, pad), (0, 0), (0, 0)))
        return jnp.moveaxis(t, 2, 1).reshape(B, H, Cn, Bs, hd)

    qc, kc, vc = chunk(q), chunk(k), chunk(v)

    pos = jnp.arange(1, Bs + 1, dtype=jnp.float32)
    qdecay = jnp.exp(-slope[:, None] * pos[None, :])         # [H,Bs]
    kdecay = jnp.exp(-slope[:, None] * (Bs - pos)[None, :])
    dd = pos[:, None] - pos[None, :]
    diag = jnp.where(dd >= 0, jnp.exp(-slope[:, None, None] * dd[None]),
                     0.0)                                    # [H,Bs,Bs]
    block_decay = jnp.exp(-slope * Bs)                       # [H]

    def body(S, inp):
        q_i, k_i, v_i = inp                                  # [B,H,Bs,hd]
        intra = (q_i @ jnp.swapaxes(k_i, -1, -2) * diag[None]) @ v_i
        inter = (q_i * qdecay[None, :, :, None]) @ S
        S = (S * block_decay[None, :, None, None]
             + jnp.swapaxes(k_i * kdecay[None, :, :, None], -1, -2) @ v_i)
        return S, intra + inter

    S0 = (jnp.zeros((B, H, hd, hd), jnp.float32) if state is None
          else state.astype(jnp.float32))
    S_fin, outs = jax.lax.scan(
        body, S0, (jnp.moveaxis(qc, 2, 0), jnp.moveaxis(kc, 2, 0),
                   jnp.moveaxis(vc, 2, 0)))
    y = jnp.moveaxis(outs, 0, 2).reshape(B, H, Cn * Bs, hd)[:, :, :T]
    y = jnp.moveaxis(y, 1, 2).reshape(B, T, H * hd)

    # undo the extra decay the zero pad steps applied to the state
    n_pad = jnp.asarray(float(pad), jnp.float32)
    if valid_len is not None:
        n_pad = n_pad + (T - vl.astype(jnp.float32))         # [B]
        S_fin = S_fin * jnp.exp(slope[None, :] * n_pad[:, None]
                                )[..., None, None]
    elif pad:
        S_fin = S_fin * jnp.exp(slope * n_pad)[None, :, None, None]

    out = _norm_gate_out(mp, y, x, spec.norm_eps, kernel, taps, tapped)
    return out, S_fin, tapped


def lightning_step(mp: Dict[str, Any], spec: LightningSpec, x: jnp.ndarray,
                   state: jnp.ndarray, *, eps: float, kernel: str = "xla"
                   ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """One-token recurrent update: S = exp(-slope) S + k^T v; y = q S."""
    B = x.shape[0]
    H, hd = spec.num_heads, spec.head_dim
    slope = mp["slope"].astype(jnp.float32)
    from .layers import activation as _act

    qkv = _act(_lin(mp["qkv_proj"], x, kernel), spec.activation)
    qkv = qkv.reshape(B, H, 3 * hd).astype(jnp.float32)
    q, k, v = qkv[..., :hd], qkv[..., hd:2 * hd], qkv[..., 2 * hd:]

    S = (state.astype(jnp.float32) * jnp.exp(-slope)[None, :, None, None]
         + k[..., :, None] * v[..., None, :])
    y = jnp.einsum("bhk,bhkv->bhv", q, S).reshape(B, 1, H * hd)
    out = _norm_gate_out(mp, y, x, spec.norm_eps, kernel, (), {})
    return out, S
