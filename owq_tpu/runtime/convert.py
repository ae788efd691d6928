"""Reference-checkpoint interop: convert between the CUDA reference's packed
format and owq-tpu's.

The reference stores (owq/quant.py:272-353): ``qweight`` int32
[in/32*bits, out] with 3-bit values interleaved across word boundaries
(10+1+10+1+10 per 3 words) or 8 4-bit values per word, per-channel fp16
``scales [out, 1]``, nibble-packed ``zeros [out/2, 1] uint8``, fp16
``oweight [n_out, out]`` and ``outlieridx``.  This module re-derives that
bit layout (documented in SURVEY.md §7.4.2) to unpack reference checkpoints
into integer codes, then repacks them into the TPU plane-chunk layout — and
the reverse — so quantized models cross-validate between frameworks.
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import numpy as np

__all__ = [
    "unpack_reference_qweight", "pack_reference_qweight",
    "unpack_reference_zeros", "pack_reference_zeros",
    "reference_layer_to_packed", "packed_to_reference_layer",
]


def unpack_reference_qweight(qweight: np.ndarray, bits: int,
                             infeatures: int) -> np.ndarray:
    """Reference int32 words -> integer codes [in, out].

    3-bit groups of 3 words hold 32 values along the input axis:
      word0: values 0-9 at bits 3j, value 10's low 2 bits at 30-31
      word1: value 10's high bit at 0, values 11-20 at 1+3j,
             value 21's low bit at 31
      word2: value 21's high 2 bits at 0-1, values 22-31 at 2+3j
    4-bit: 8 values per word at bits 4j.
    """
    w = qweight.view(np.uint32) if qweight.dtype == np.int32 else \
        qweight.astype(np.uint32)
    out = w.shape[1]
    q = np.zeros((infeatures, out), np.uint32)
    if bits == 4:
        for j in range(8):
            rows = np.arange(w.shape[0])
            vals = (w >> np.uint32(4 * j)) & np.uint32(0xF)
            idx = rows * 8 + j
            keep = idx < infeatures
            q[idx[keep]] = vals[keep]
        return q.astype(np.int32)
    if bits != 3:
        raise ValueError("reference packing is 3 or 4 bit")
    ngroups = w.shape[0] // 3
    for g in range(ngroups):
        w0, w1, w2 = w[3 * g], w[3 * g + 1], w[3 * g + 2]
        base = g * 32
        for j in range(10):
            q[base + j] = (w0 >> np.uint32(3 * j)) & np.uint32(7)
        q[base + 10] = ((w0 >> np.uint32(30)) & np.uint32(3)) | \
                       ((w1 & np.uint32(1)) << np.uint32(2))
        for j in range(10):
            q[base + 11 + j] = (w1 >> np.uint32(1 + 3 * j)) & np.uint32(7)
        q[base + 21] = ((w1 >> np.uint32(31)) & np.uint32(1)) | \
                       ((w2 & np.uint32(3)) << np.uint32(1))
        for j in range(10):
            q[base + 22 + j] = (w2 >> np.uint32(2 + 3 * j)) & np.uint32(7)
    return q[:infeatures].astype(np.int32)


def pack_reference_qweight(q: np.ndarray, bits: int) -> np.ndarray:
    """Integer codes [in, out] -> reference int32 words (inverse of above)."""
    infeat, out = q.shape
    qv = q.astype(np.uint32) & np.uint32((1 << bits) - 1)
    if bits == 4:
        assert infeat % 8 == 0
        w = np.zeros((infeat // 8, out), np.uint32)
        for j in range(8):
            w |= qv[j::8] << np.uint32(4 * j)
        return w.view(np.int32)
    if bits != 3:
        raise ValueError("reference packing is 3 or 4 bit")
    assert infeat % 32 == 0
    w = np.zeros((infeat // 32 * 3, out), np.uint32)
    for g in range(infeat // 32):
        base = g * 32
        w0 = np.zeros(out, np.uint32)
        w1 = np.zeros(out, np.uint32)
        w2 = np.zeros(out, np.uint32)
        for j in range(10):
            w0 |= qv[base + j] << np.uint32(3 * j)
        w0 |= (qv[base + 10] & np.uint32(3)) << np.uint32(30)
        w1 |= qv[base + 10] >> np.uint32(2)
        for j in range(10):
            w1 |= qv[base + 11 + j] << np.uint32(1 + 3 * j)
        w1 |= (qv[base + 21] & np.uint32(1)) << np.uint32(31)
        w2 |= qv[base + 21] >> np.uint32(1)
        for j in range(10):
            w2 |= qv[base + 22 + j] << np.uint32(2 + 3 * j)
        w[3 * g], w[3 * g + 1], w[3 * g + 2] = w0, w1, w2
    return w.view(np.int32)


def unpack_reference_zeros(zeros: np.ndarray, out: int) -> np.ndarray:
    """Nibble-packed uint8 [out/2, 1] -> integer zero-points [out]."""
    z = zeros.reshape(-1).astype(np.uint8)
    full = np.zeros(out, np.int32)
    full[0::2] = z & 0xF
    full[1::2] = (z >> 4) & 0xF
    return full


def pack_reference_zeros(z: np.ndarray) -> np.ndarray:
    z = z.astype(np.uint8)
    return (z[0::2] | (z[1::2] << 4)).reshape(-1, 1)


def reference_layer_to_packed(ref: Dict[str, np.ndarray], bits: int,
                              infeatures: int, *, weight_dtype=None):
    """One reference QuantLinear state -> owq-tpu PackedLinear.

    ref keys: qweight, scales [out,1], zeros (nibble uint8), oweight
    [n_out, out], outlieridx, optional bias.
    """
    import jax.numpy as jnp

    from ..core.packing import pack_np
    from .quant_linear import PackedLinear

    weight_dtype = weight_dtype or jnp.bfloat16
    q = unpack_reference_qweight(np.asarray(ref["qweight"]), bits, infeatures)
    out = q.shape[1]
    scales = np.asarray(ref["scales"], np.float32).reshape(-1)
    zeros = unpack_reference_zeros(np.asarray(ref["zeros"]), out)
    out_ids = np.asarray(ref.get("outlieridx", np.zeros(0)), np.int32)
    oweight = np.asarray(ref.get("oweight", np.zeros((0, out))), np.float32)
    bias = ref.get("bias")
    qweight = pack_np(q, bits, zero=zeros)
    return PackedLinear(
        qweight=jnp.asarray(qweight),
        scales=jnp.asarray(scales),
        zeros=jnp.asarray(zeros.astype(np.float32)),
        oweight=jnp.asarray(oweight, dtype=weight_dtype),
        out_ids=jnp.asarray(np.sort(out_ids)),
        bias=None if bias is None else jnp.asarray(
            np.asarray(bias, np.float32), dtype=weight_dtype),
        bits=bits, in_features=infeatures)


def load_reference_checkpoint(ckpt_path: str, hf_config) -> Tuple[Dict, object]:
    """Load a packed checkpoint produced by the CUDA reference
    (modelutils.py:89-138 format: torch dict with model_state_dict,
    n_out_dict, packing, dtype, bits) into owq-tpu params.

    Non-quantized tensors import like a plain HF state dict; every layer in
    n_out_dict is reconstructed from its reference-packed arrays.
    """
    import torch

    import jax.numpy as jnp

    from ..models.config import config_from_hf
    from ..models.hf_import import params_from_state_dict

    ckpt = torch.load(ckpt_path, map_location="cpu", weights_only=False)
    if not ckpt.get("packing", False):
        raise ValueError("not a packed reference checkpoint (packing=False); "
                         "fake checkpoints load as plain state dicts")
    bits = int(ckpt["bits"])
    sd = ckpt["model_state_dict"]
    cfg = config_from_hf(hf_config)

    def np_(t):
        t = t.detach().cpu()
        if str(t.dtype) == "torch.bfloat16":
            t = t.float()
        return t.numpy()

    qnames = sorted({k.rsplit(".", 1)[0] for k in sd
                     if k.endswith(".qweight")})
    dense_sd = {k: v for k, v in sd.items()
                if not any(k.startswith(qn + ".") for qn in qnames)}
    # placeholder dense weights so the tree builds; replaced below
    for qn in qnames:
        out = np_(sd[qn + ".scales"]).reshape(-1).shape[0]
        infeat = np_(sd[qn + ".qweight"]).shape[0] * 32 // bits
        import numpy as _np

        dense_sd[qn + ".weight"] = _np.zeros((out, infeat), _np.float32)
        if qn + ".bias" in sd:
            dense_sd[qn + ".bias"] = np_(sd[qn + ".bias"])
    params = params_from_state_dict(dense_sd, cfg, dtype=jnp.bfloat16)

    # swap the placeholders for converted PackedLinears
    from ..models.transformer import QUANTIZABLE  # noqa: F401
    from .quant_linear import DenseLinear

    hf_to_ours = _reference_name_map(cfg)
    for qn in qnames:
        ref = {f: np_(sd[f"{qn}.{f}"]) for f in
               ("qweight", "scales", "zeros", "oweight", "outlieridx")
               if f"{qn}.{f}" in sd}
        if qn + ".bias" in sd:
            ref["bias"] = np_(sd[qn + ".bias"])
        infeat = ref["qweight"].shape[0] * 32 // bits
        li, part, leaf = hf_to_ours(qn)
        params["layers"][li][part][leaf] = reference_layer_to_packed(
            ref, bits, infeat)
    return params, cfg


def _reference_name_map(cfg):
    """HF module path -> (layer_idx, 'attn'|'mlp', leaf) for each family."""
    leaf_maps = {
        "opt": {"self_attn.q_proj": ("attn", "q"),
                "self_attn.k_proj": ("attn", "k"),
                "self_attn.v_proj": ("attn", "v"),
                "self_attn.out_proj": ("attn", "o"),
                "fc1": ("mlp", "fc1"), "fc2": ("mlp", "fc2")},
        "llama": {"self_attn.q_proj": ("attn", "q"),
                  "self_attn.k_proj": ("attn", "k"),
                  "self_attn.v_proj": ("attn", "v"),
                  "self_attn.o_proj": ("attn", "o"),
                  "mlp.gate_proj": ("mlp", "gate"),
                  "mlp.up_proj": ("mlp", "up"),
                  "mlp.down_proj": ("mlp", "down")},
        "bloom": {"self_attention.query_key_value": ("attn", "qkv"),
                  "self_attention.dense": ("attn", "o"),
                  "mlp.dense_h_to_4h": ("mlp", "fc1"),
                  "mlp.dense_4h_to_h": ("mlp", "fc2")},
        "falcon": {"self_attention.query_key_value": ("attn", "qkv"),
                   "self_attention.dense": ("attn", "o"),
                   "mlp.dense_h_to_4h": ("mlp", "fc1"),
                   "mlp.dense_4h_to_h": ("mlp", "fc2")},
        "neox": {"attention.query_key_value": ("attn", "qkv"),
                 "attention.dense": ("attn", "o"),
                 "mlp.dense_h_to_4h": ("mlp", "fc1"),
                 "mlp.dense_4h_to_h": ("mlp", "fc2")},
    }
    leaves = leaf_maps[cfg.family]

    def map_name(qualname: str):
        # e.g. model.decoder.layers.3.self_attn.q_proj / model.layers.3....
        parts = qualname.split(".")
        li = next(int(p) for p in parts if p.isdigit())
        tail = ".".join(parts[parts.index(str(li)) + 1:])
        part, leaf = leaves[tail]
        return li, part, leaf

    return map_name


def packed_to_reference_layer(p) -> Dict[str, np.ndarray]:
    """owq-tpu PackedLinear -> reference-layout arrays."""
    from ..core.packing import unpack_np

    q = unpack_np(np.asarray(p.qweight), p.bits, p.in_features)
    infeat = p.in_features
    # the reference requires in % 32 == 0 for its dense interleave
    if infeat % 32:
        raise ValueError("reference layout needs in_features % 32 == 0")
    out: Dict[str, np.ndarray] = {
        "qweight": pack_reference_qweight(q[:infeat], p.bits),
        "scales": np.asarray(p.scales, np.float32).reshape(-1, 1),
        "zeros": pack_reference_zeros(
            np.asarray(p.zeros).astype(np.int32)),
        "oweight": np.asarray(p.oweight, np.float32),
        "outlieridx": np.asarray(p.out_ids, np.int32),
    }
    if p.bias is not None:
        out["bias"] = np.asarray(p.bias, np.float32)
    return out
