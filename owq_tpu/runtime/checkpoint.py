"""Packed / fake checkpoint save-load and model packing.

Reference formats (owq/utils/modelutils.py:89-138): single torch .pth dicts,
*fake* = full fp16 state_dict + out_ids per layer, *packed* = per-layer
qweight/scales/zeros/oweight/outlieridx + n_out_dict, with bits/dtype flags.

TPU-native rebuild: a checkpoint *directory* with a JSON manifest and one
.npy file per array (streaming-friendly for 70B-class models — arrays are
memory-mapped on load and can be device_put shard-by-shard).  bfloat16 is
stored as uint16 with a dtype tag (numpy has no native bf16).
"""

from __future__ import annotations

import dataclasses
import json
import os
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..models.config import ModelConfig
from ..recon.pipeline import QuantInfo
from .quant_linear import DenseLinear, PackedLinear, pack_linear

__all__ = ["pack_model", "save_checkpoint", "load_checkpoint", "FORMAT_VERSION"]

# Version 2: qweight row layout changed from contiguous-chunk to
# pair-interleaved (core/packing.py); version-1 packed checkpoints would
# dequantize with permuted rows, so loading them is refused outright.
FORMAT_VERSION = 2


def pack_model(params: Dict[str, Any], quantizers: Dict[str, QuantInfo],
               wbits: int, *, weight_dtype=jnp.bfloat16) -> Dict[str, Any]:
    """Swap fake-quantized DenseLinears for PackedLinears (lm_pack analogue,
    owq/quant.py:204-219)."""
    from ..recon.pipeline import _walk

    for key, info in quantizers.items():
        li_s, name = key.split(".", 1)
        blk = params["layers"][int(li_s)]
        node, leaf = _walk(blk, name)
        lin = node[leaf]
        if not isinstance(lin, DenseLinear):
            raise TypeError(f"{key} already packed")
        W = np.asarray(lin.w, np.float32).T  # [out, in]
        node[leaf] = pack_linear(
            W, info.scale, info.zero, info.out_ids, wbits, sym=info.sym,
            bias=None if lin.b is None else np.asarray(lin.b, np.float32),
            weight_dtype=weight_dtype)
    return params


# --------------------------------------------------------------------------
# serialization
# --------------------------------------------------------------------------

def _store(path: str, key: str, arr, manifest_arrays: Dict[str, Any]) -> None:
    a = np.asarray(arr)
    tag = None
    if a.dtype == jnp.bfloat16:
        a = a.view(np.uint16)
        tag = "bfloat16"
    fn = key.replace("/", "_") + ".npy"
    np.save(os.path.join(path, fn), a)
    manifest_arrays[key] = {"file": fn, "dtype": tag or str(a.dtype)}


def _load_arr(path: str, meta: Dict[str, Any], mmap: bool) -> jnp.ndarray:
    a = np.load(os.path.join(path, meta["file"]),
                mmap_mode="r" if mmap else None)
    if meta["dtype"] == "bfloat16":
        return jnp.asarray(np.asarray(a)).view(jnp.bfloat16)
    return jnp.asarray(a)


def _flatten_params(params: Dict[str, Any]) -> Dict[str, Any]:
    """Param tree -> flat {path: leaf} with linear-kind markers."""
    flat: Dict[str, Any] = {}

    def visit(prefix: str, node: Any) -> None:
        if node is None:
            return
        if isinstance(node, DenseLinear):
            flat[prefix + "/__kind__"] = "dense"
            flat[prefix + "/w"] = node.w
            if node.b is not None:
                flat[prefix + "/b"] = node.b
        elif isinstance(node, PackedLinear):
            flat[prefix + "/__kind__"] = {
                "kind": "packed", "bits": node.bits,
                "in_features": node.in_features,
                "layout": getattr(node, "layout", "paired")}
            for f in ("qweight", "scales", "zeros", "oweight", "out_ids"):
                flat[prefix + "/" + f] = getattr(node, f)
            if node.bias is not None:
                flat[prefix + "/bias"] = node.bias
        elif isinstance(node, dict):
            for k, v in node.items():
                visit(f"{prefix}/{k}" if prefix else k, v)
        elif isinstance(node, (list, tuple)):
            for i, v in enumerate(node):
                visit(f"{prefix}/{i}", v)
        else:  # array leaf
            flat[prefix] = node

    visit("", params)
    return flat


def save_checkpoint(path: str, params: Dict[str, Any], cfg: ModelConfig,
                    *, quantizers: Optional[Dict[str, QuantInfo]] = None,
                    packed: bool = False, extra: Optional[Dict] = None) -> None:
    os.makedirs(path, exist_ok=True)
    arrays: Dict[str, Any] = {}
    kinds: Dict[str, Any] = {}
    flat = _flatten_params(params)
    for key, leaf in flat.items():
        if key.endswith("/__kind__"):
            kinds[key[: -len("/__kind__")]] = leaf
        else:
            _store(path, key, leaf, arrays)

    qmeta = None
    if quantizers is not None:
        qmeta = {}
        for k, info in quantizers.items():
            qmeta[k] = {"n_out": info.n_out, "bits": info.bits,
                        "sym": info.sym, "loss": info.loss}
            if not packed:
                # fake checkpoints keep out_ids alongside, like the
                # reference's out_ids_dict (modelutils.py:112)
                _store(path, f"__quant__/{k}/out_ids", info.out_ids, arrays)
                _store(path, f"__quant__/{k}/scale", info.scale, arrays)
                _store(path, f"__quant__/{k}/zero", info.zero, arrays)

    manifest = {
        "format_version": FORMAT_VERSION,
        "packed": packed,
        "config": dataclasses.asdict(cfg),
        "linear_kinds": kinds,
        "arrays": arrays,
        "quantizers": qmeta,
        "extra": extra or {},
    }
    with open(os.path.join(path, "manifest.json"), "w") as f:
        json.dump(manifest, f, indent=1)


def load_checkpoint(path: str, *, mmap: bool = False
                    ) -> Tuple[Dict[str, Any], ModelConfig, Dict[str, Any]]:
    """Returns (params, cfg, manifest)."""
    with open(os.path.join(path, "manifest.json")) as f:
        manifest = json.load(f)
    version = manifest.get("format_version", 0)
    if version != FORMAT_VERSION:
        has_packed = any(isinstance(k, dict) and k.get("kind") == "packed"
                         for k in manifest.get("linear_kinds", {}).values())
        if has_packed or version > FORMAT_VERSION:
            raise ValueError(
                f"checkpoint {path} has format_version={version}, this "
                f"build reads version {FORMAT_VERSION}: the packed qweight "
                "row layout changed (contiguous-chunk -> pair-interleaved) "
                "and older packed checkpoints would dequantize with "
                "permuted rows. Re-pack from a fake checkpoint or the "
                "original weights.")
        # dense/fake checkpoints carry no packed words — layout-independent
    cdict = dict(manifest["config"])

    # JSON stores tuples as lists; ModelConfig must stay hashable (it is a
    # jit static argument): re-freeze every list-valued field recursively
    # (layer_types, rope_layers, rope_scaling and any future tuple field)
    def freeze(v):
        return tuple(freeze(x) for x in v) if isinstance(v, list) else v

    cdict = {k: freeze(v) for k, v in cdict.items()}
    cfg = ModelConfig(**cdict)
    arrays = manifest["arrays"]
    kinds = manifest["linear_kinds"]

    loaded = {k: _load_arr(path, m, mmap) for k, m in arrays.items()
              if not k.startswith("__quant__/")}

    # rebuild tree
    params: Dict[str, Any] = {"project_in": None, "project_out": None,
                              "embed_norm": None, "final_norm": None,
                              "lm_head": None}

    def assign(tree, parts, value):
        head = parts[0]
        if len(parts) == 1:
            tree[head] = value
            return
        if head not in tree or tree[head] is None:
            tree[head] = {}
        assign(tree[head], parts[1:], value)

    lin_arrays: Dict[str, Dict[str, Any]] = {}
    for key, leaf in loaded.items():
        owner = None
        for kpath in kinds:
            if key.startswith(kpath + "/"):
                owner = kpath
                break
        if owner is not None:
            lin_arrays.setdefault(owner, {})[key[len(owner) + 1:]] = leaf
        else:
            assign(params, key.split("/"), leaf)

    for kpath, kind in kinds.items():
        fields = lin_arrays.get(kpath, {})
        if kind == "dense":
            lin = DenseLinear(w=fields["w"], b=fields.get("b"))
        else:
            lin = PackedLinear(
                qweight=fields["qweight"], scales=fields["scales"],
                zeros=fields["zeros"], oweight=fields["oweight"],
                out_ids=fields["out_ids"], bias=fields.get("bias"),
                bits=kind["bits"], in_features=kind["in_features"],
                layout=kind.get("layout", "paired"))
        assign(params, kpath.split("/"), lin)

    # digit-keyed dicts were lists before flattening (layers, MoE experts)
    def listify(node):
        if isinstance(node, dict):
            node = {k: listify(v) for k, v in node.items()}
            if node and all(isinstance(k, str) and k.isdigit() for k in node):
                return [node[str(i)] for i in range(len(node))]
        return node

    for k in list(params):
        params[k] = listify(params[k])
    return params, cfg, manifest
