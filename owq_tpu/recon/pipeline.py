"""Layer-wise model quantization driver.

The analogue of the reference's ``layerwise_quantize`` (main.py:16-165),
rebuilt for the functional JAX model:

  * the Catcher hook that steals block-0 inputs becomes a direct call to
    ``embed`` (we own the forward),
  * per-linear forward hooks become the ``taps`` return of
    ``block_forward`` — a jitted pass that yields the exact input
    activations of a sequential group,
  * the CPU<->GPU block shuttle becomes (optionally chunked) jitted calls —
    activations ping-pong between blocks exactly like the reference's
    inps/outs buffers (main.py:153-161),
  * GPTQ itself is the jitted scan in recon.gptq, compiled once per
    (shape, n_out) signature and reused across blocks.

Outlier budget (main.py:70-89): ``r = 12/(16-wbits) * (target_bit-wbits) /
n_owq_layers``; per-linear ``n_out = round(in_features * r * ratio)``
rounded up to even.
"""

from __future__ import annotations

import dataclasses
import time
from functools import partial
from typing import Any, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..core.quantizer import QuantSpec, find_params_mse, find_params_minmax, fake_quant
from ..models.config import ArchSpec, ModelConfig
from ..models.transformer import (QUANTIZABLE, attn_temperature,
                                  block_forward, embed,
                                  layer_alpha_beta,
                                  layer_attn_temp, layer_rope,
                                  quantizable_names)
from ..models.layers import causal_mask_bias, rope_cos_sin, alibi_bias
from ..runtime.quant_linear import DenseLinear
from .gptq import gptq_quantize

__all__ = ["QuantInfo", "outlier_budget", "quantize_model", "calibration_inputs"]


@dataclasses.dataclass
class QuantInfo:
    """Per-linear quantization state (the reference's saved Quantizer)."""

    scale: np.ndarray      # [out]
    zero: np.ndarray       # [out]
    out_ids: np.ndarray    # [n_out] sorted
    n_out: int
    bits: int
    sym: bool
    loss: float


def _walk(blk: Dict[str, Any], name: str):
    """Resolve a dotted path ('mlp.experts.3.down') to (container, key)."""
    parts = name.split(".")
    node = blk
    for p in parts[:-1]:
        node = node[int(p)] if isinstance(node, list) else node[p]
    leaf = parts[-1]
    return node, (int(leaf) if isinstance(node, list) else leaf)


def _get_linear(blk: Dict[str, Any], name: str) -> DenseLinear:
    node, leaf = _walk(blk, name)
    return node[leaf]


def _has_linear(blk: Dict[str, Any], name: str) -> bool:
    """True when the dotted name resolves in this block (heterogeneous-layer
    models: deepseek dense first-k blocks lack expert names and vice versa)."""
    try:
        node, leaf = _walk(blk, name)
    except (KeyError, IndexError, TypeError):
        return False
    if isinstance(node, list):
        return 0 <= leaf < len(node)
    return isinstance(node, dict) and leaf in node


def _set_linear(blk: Dict[str, Any], name: str, lin) -> None:
    node, leaf = _walk(blk, name)
    node[leaf] = lin


def _ratio_for(arch: ArchSpec, name: str) -> float:
    """Outlier ratio for a linear name; per-expert MoE names inherit the
    family's mlp ratio ('mlp.experts.3.gate' -> 'mlp.gate')."""
    if name in arch.ratios:
        return arch.ratios[name]
    parts = name.split(".")
    if len(parts) == 4 and parts[:2] == ["mlp", "experts"]:
        return arch.ratios.get(f"mlp.{parts[3]}", 0.0)
    if len(parts) == 4 and parts[:2] == ["moa", "experts"]:  # jetmoe
        return arch.ratios.get(f"moa.{parts[3]}", 0.0)
    if len(parts) == 3 and parts[:2] == ["mlp", "shared"]:
        return arch.ratios.get(f"mlp.{parts[2]}", 0.0)
    return 0.0


def _sequential_groups(arch: ArchSpec, cfg: ModelConfig):
    """True-sequential quantization groups (reference main.py:101-148 over
    model_config.json ``sequential``).

    The family ArchSpec's ``sequential`` is the dependency-ordered base.
    MoE models expand each ``mlp.X`` member across routed experts
    (``mlp.experts.{e}.X``) and the shared expert (``mlp.shared.X``) while
    keeping the plain name — dense first-k blocks (deepseek/dots1) carry
    plain ``mlp.gate/up/down``.  jetmoe's mixture-of-attention expands
    ``moa.X`` -> ``moa.experts.{e}.X`` the same way.  Members are later
    intersected with the linears present in each block, so over-expansion
    never mis-taps (an MoE block has no plain ``mlp.gate`` linear — its
    router lives at ``mlp.router`` which is not a quantization target).

    Any quantizable name the family spec does not cover (e.g. a mixer
    added to a family after its ArchSpec was written) is appended as a
    trailing group rather than silently skipped — every quantizable linear
    is always reconstructed.
    """
    E = cfg.num_experts
    if E:
        groups = []
        for group in arch.sequential:
            g = []
            for n in group:
                g.append(n)
                for prefix, expanded in (("mlp.", "mlp"), ("moa.", "moa")):
                    if n.startswith(prefix) and "." not in n[len(prefix):]:
                        leaf = n[len(prefix):]
                        if expanded == "mlp":
                            g.append(f"mlp.shared.{leaf}")
                        g.extend(f"{expanded}.experts.{e}.{leaf}"
                                 for e in range(E))
            groups.append(tuple(g))
        groups = tuple(groups)
    else:
        groups = arch.sequential
    covered = {n for g in groups for n in g}
    missing = tuple(n for n in quantizable_names(cfg) if n not in covered)
    if missing:
        groups = groups + (missing,)
    return groups


def outlier_budget(params: Dict[str, Any], cfg: ModelConfig, arch: ArchSpec,
                   wbits: int, *, target_bit: Optional[float] = None,
                   target_rank: Optional[int] = None,
                   owq_layers: Optional[Dict[str, bool]] = None
                   ) -> Dict[str, int]:
    """Weak-column count per linear name (main.py:70-89 semantics)."""
    names = quantizable_names(cfg)
    if owq_layers is None:
        owq_layers = {n: True for n in names}
    n_out_dict = {n: 0 for n in names}
    if target_bit is not None:
        n_owq = sum(bool(v) for v in owq_layers.values())
        r = (12.0 / (16 - wbits)) * (target_bit - wbits) / n_owq
        for n in names:
            if not owq_layers.get(n, False):
                continue
            blk0 = next((b for b in params["layers"] if _has_linear(b, n)),
                        None)
            if blk0 is None:
                continue
            infeat = _get_linear(blk0, n).in_features
            ratio = _ratio_for(arch, n)
            n_out = round(infeat * r * ratio)
            if n_out % 2 == 1:
                n_out += 1
            n_out_dict[n] = n_out
    elif target_rank is not None:
        for n in names:
            if owq_layers.get(n, False):
                n_out_dict[n] = target_rank
    return n_out_dict


def calibration_inputs(params: Dict[str, Any], cfg: ModelConfig,
                       input_ids: np.ndarray, dtype=jnp.float32):
    """Embed calibration samples and build per-block attention side inputs.

    input_ids: [nsamples, seqlen] -> (x [nsamples, seqlen, hidden], aux dict)
    """
    ids = jnp.asarray(input_ids)
    ns, T = ids.shape
    positions = jnp.broadcast_to(jnp.arange(T, dtype=jnp.int32)[None], (ns, T))

    x = jax.jit(embed, static_argnums=(1,))(params, cfg, ids, positions)
    x = x.astype(dtype)

    from ..models.transformer import layer_mask_biases

    masks = layer_mask_biases(cfg, positions[:1],
                              jnp.ones((1, T), jnp.int32), positions[:1])
    rope = None
    alibi = None
    if cfg.pos_embedding == "rope":
        from ..models.transformer import model_rope_tables

        rope = model_rope_tables(cfg, positions[:1])
    elif cfg.pos_embedding == "alibi":
        alibi = alibi_bias(cfg.num_heads, positions[:1], cfg.alibi_scheme)
    temp = (attn_temperature(cfg, positions[:1])
            if cfg.attn_temperature_tuning else None)
    return x, dict(masks=masks, rope=rope, alibi=alibi, temp=temp)


@partial(jax.jit, static_argnames=("cfg", "taps"))
def _tap_hessians(blk, cfg: ModelConfig, x, mask, rope, alibi, temp,
                  taps: tuple, alpha_beta=None, embed0=None):
    """One pass over a chunk: per-tap X^T X (f32) + block outputs."""
    B = x.shape[0]
    mask_b = jnp.broadcast_to(mask, (B,) + mask.shape[1:])
    rope_b = None
    if rope is not None:
        rope_b = tuple(jnp.broadcast_to(r, (B,) + r.shape[1:]) for r in rope)
    alibi_b = None
    if alibi is not None:
        alibi_b = jnp.broadcast_to(alibi, (B,) + alibi.shape[1:])
    temp_b = None
    if temp is not None:
        temp_b = jnp.broadcast_to(temp, (B,) + temp.shape[1:])
    y, _, tapped = block_forward(blk, cfg, x, mask_bias=mask_b, rope=rope_b,
                                 alibi=alibi_b, attn_temp=temp_b, taps=taps,
                                 alpha_beta=alpha_beta, embed0=embed0)
    outers = {}
    for name, act in tapped.items():
        a = act.reshape(-1, act.shape[-1]).astype(jnp.float32)
        outers[name] = jnp.dot(a.T, a, preferred_element_type=jnp.float32)
    return y, outers


@partial(jax.jit, static_argnames=("cfg",))
def _block_out(blk, cfg: ModelConfig, x, mask, rope, alibi, temp,
               alpha_beta=None, embed0=None):
    B = x.shape[0]
    mask_b = jnp.broadcast_to(mask, (B,) + mask.shape[1:])
    rope_b = None
    if rope is not None:
        rope_b = tuple(jnp.broadcast_to(r, (B,) + r.shape[1:]) for r in rope)
    alibi_b = None
    if alibi is not None:
        alibi_b = jnp.broadcast_to(alibi, (B,) + alibi.shape[1:])
    temp_b = None
    if temp is not None:
        temp_b = jnp.broadcast_to(temp, (B,) + temp.shape[1:])
    y, _, _ = block_forward(blk, cfg, x, mask_bias=mask_b, rope=rope_b,
                            alibi=alibi_b, attn_temp=temp_b,
                            alpha_beta=alpha_beta, embed0=embed0)
    return y


def quantize_model(params: Dict[str, Any], cfg: ModelConfig, arch: ArchSpec,
                   input_ids: np.ndarray, *, wbits: int,
                   target_bit: Optional[float] = None,
                   target_rank: Optional[int] = None,
                   sym: bool = False, tuning: str = "mse",
                   percdamp: float = 0.01, groupsize: int = -1,
                   actorder: bool = False, true_sequential: bool = False,
                   no_frob_norm: bool = False,
                   owq_layers: Optional[Dict[str, bool]] = None,
                   chunk: int = 16, dtype=jnp.float32,
                   verbose: bool = True, resume_dir: Optional[str] = None,
                   offload: bool = False,
                   ) -> Tuple[Dict[str, Any], Dict[str, QuantInfo]]:
    """Quantize all decoder blocks in place (fake-quant weights) and return
    (params, {"<layer_idx>.<name>": QuantInfo}).

    ``resume_dir``: directory for per-block reconstruction checkpoints —
    each finished block is saved there and skipped on restart (the
    reference restarts multi-hour runs from scratch; SURVEY.md §5 flags
    per-layer resume as the cheap win).

    ``offload``: host-RAM streaming for models larger than one chip's HBM —
    the TPU analogue of the reference's CPU<->GPU block shuttle
    (main.py:92-161): blocks and activations live on host; only the block
    under reconstruction, its Hessians and one activation chunk are on
    device at a time.
    """
    spec = QuantSpec(wbits, sym)
    mse = tuning == "mse"
    names = quantizable_names(cfg)
    n_out_dict = outlier_budget(params, cfg, arch, wbits,
                                target_bit=target_bit, target_rank=target_rank,
                                owq_layers=owq_layers)
    groups: Sequence[Sequence[str]]
    groups = (_sequential_groups(arch, cfg) if true_sequential
              else [list(names)])

    x, aux = calibration_inputs(params, cfg, input_ids, dtype=dtype)
    ns = x.shape[0]
    if offload:
        x = np.asarray(x)
    # zamba2: every hybrid block also reads the embedding output directly
    # (shared-transformer prefix input); keep the block-0 activations.
    # Captured AFTER the offload move so it lives in host RAM there — e0()
    # device_puts one chunk at a time, mirroring x's streaming.
    embed0 = x if cfg.zamba_block else None

    def e0(s):
        return None if embed0 is None else jnp.asarray(embed0[s:s + chunk])
    quantizers: Dict[str, QuantInfo] = {}
    if resume_dir:
        import os

        os.makedirs(resume_dir, exist_ok=True)

    def to_host(tree):
        return jax.tree_util.tree_map(
            lambda a: np.asarray(a) if hasattr(a, "dtype") else a, tree)

    for li in range(len(params["layers"])):
        if offload:
            blk = jax.device_put(params["layers"][li])
            params["layers"][li] = blk  # replaced with host copy at the end
        else:
            blk = params["layers"][li]
        if resume_dir and _load_block_resume(resume_dir, li, blk, quantizers,
                                             wbits, sym):
            if verbose:
                print(f"layer {li}: restored from {resume_dir}")
            outs = []
            for s in range(0, ns, chunk):
                y = _block_out(blk, cfg, jnp.asarray(x[s:s + chunk]),
                               aux["masks"][li],
                               layer_rope(cfg, aux["rope"], li), aux["alibi"],
                               layer_attn_temp(cfg, aux["temp"], li),
                               layer_alpha_beta(cfg, li), e0(s))
                outs.append(np.asarray(y) if offload else y)
            x = (np.concatenate if offload else jnp.concatenate)(outs, axis=0)
            if offload:
                params["layers"][li] = to_host(blk)
                del blk
            continue
        for group in groups:
            taps = tuple(n for n in group
                         if n in names and _has_linear(blk, n))
            # Hessian accumulation over calibration chunks
            hessians = {n: None for n in taps}
            for s in range(0, ns, chunk):
                xc = x[s:s + chunk]
                _, outers = _tap_hessians(blk, cfg, xc,
                                          aux["masks"][li],
                                          layer_rope(cfg, aux["rope"], li),
                                          aux["alibi"],
                                          layer_attn_temp(cfg, aux["temp"],
                                                          li), taps,
                                          layer_alpha_beta(cfg, li), e0(s))
                for n in taps:
                    hessians[n] = outers[n] if hessians[n] is None else hessians[n] + outers[n]

            for n in taps:
                H = (2.0 / ns) * hessians[n]
                hessians[n] = None  # free the accumulator (HBM pressure
                # matters at 70B-class widths: down-proj H is ~0.5GB f32)
                lin = _get_linear(blk, n)
                W = lin.w.T.astype(jnp.float32)  # [out, in]

                frob = None
                if not no_frob_norm:
                    fs, fz = (find_params_mse(W, spec, num=40) if mse
                              else find_params_minmax(W, spec))
                    Wq = fake_quant(W, fs[:, None], fz[:, None], spec)
                    frob = jnp.sum((W - Wq) ** 2, axis=0)
                    del fs, fz, Wq

                t0 = time.time()
                res = gptq_quantize(W, H, spec, n_out_dict[n],
                                    frob_norm=frob, percdamp=percdamp,
                                    actorder=actorder, mse=mse,
                                    groupsize=groupsize)
                del W, H, frob
                key = f"{li}.{n}"
                quantizers[key] = QuantInfo(
                    scale=np.asarray(res.scale), zero=np.asarray(res.zero),
                    out_ids=np.asarray(res.out_ids), n_out=n_out_dict[n],
                    bits=wbits, sym=sym, loss=float(res.loss))
                _set_linear(blk, n, DenseLinear(
                    w=res.Q.T.astype(lin.w.dtype), b=lin.b))
                if verbose:
                    print(f"quantized layer {key}  n_out={n_out_dict[n]} "
                          f"loss={float(res.loss):.4f}  ({time.time()-t0:.2f}s)")
                del res

        if resume_dir:
            _save_block_resume(resume_dir, li, blk, quantizers, names)

        # propagate activations through the (now quantized) block
        outs = []
        for s in range(0, ns, chunk):
            y = _block_out(blk, cfg, jnp.asarray(x[s:s + chunk]),
                           aux["masks"][li], layer_rope(cfg, aux["rope"], li),
                           aux["alibi"],
                           layer_attn_temp(cfg, aux["temp"], li),
                           layer_alpha_beta(cfg, li), e0(s))
            outs.append(np.asarray(y) if offload else y)
        x = (np.concatenate if offload else jnp.concatenate)(outs, axis=0)
        if offload:
            params["layers"][li] = to_host(blk)
            del blk

    return params, quantizers


def _save_block_resume(resume_dir: str, li: int, blk, quantizers, names):
    import os

    arrays = {}
    for n in names:
        key = f"{li}.{n}"
        if key not in quantizers:
            continue
        info = quantizers[key]
        lin = _get_linear(blk, n)
        tag = n.replace(".", "_")
        arrays[f"{tag}__Q"] = np.asarray(lin.w, np.float32)
        arrays[f"{tag}__scale"] = info.scale
        arrays[f"{tag}__zero"] = info.zero
        arrays[f"{tag}__out_ids"] = info.out_ids
        arrays[f"{tag}__loss"] = np.float32(info.loss)
    # np.savez appends .npz when missing — keep the suffix on the temp name
    tmp = os.path.join(resume_dir, f"layer_{li}.tmp.npz")
    np.savez(tmp, **arrays)
    os.replace(tmp, os.path.join(resume_dir, f"layer_{li}.npz"))


def _load_block_resume(resume_dir: str, li: int, blk, quantizers,
                       wbits: int, sym: bool) -> bool:
    import os

    path = os.path.join(resume_dir, f"layer_{li}.npz")
    if not os.path.exists(path):
        return False
    data = np.load(path)
    tags = sorted({k.split("__")[0] for k in data.files})
    for tag in tags:
        # leaf names never contain underscores, so the mapping is bijective
        # (handles multi-dot MoE names like mlp.experts.0.gate)
        n = tag.replace("_", ".")
        lin = _get_linear(blk, n)
        Q = data[f"{tag}__Q"]
        _set_linear(blk, n, DenseLinear(w=jnp.asarray(Q, lin.w.dtype),
                                        b=lin.b))
        out_ids = data[f"{tag}__out_ids"]
        quantizers[f"{li}.{n}"] = QuantInfo(
            scale=data[f"{tag}__scale"], zero=data[f"{tag}__zero"],
            out_ids=out_ids, n_out=int(out_ids.size), bits=wbits, sym=sym,
            loss=float(data[f"{tag}__loss"]))
    return True
