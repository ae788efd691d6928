"""Reference-format interop: bit-layout roundtrips + forward parity."""

import numpy as np
import pytest

import jax.numpy as jnp

from owq_tpu.runtime.convert import (
    pack_reference_qweight,
    pack_reference_zeros,
    packed_to_reference_layer,
    reference_layer_to_packed,
    unpack_reference_qweight,
    unpack_reference_zeros,
)


@pytest.mark.parametrize("bits,infeat", [(3, 96), (3, 256), (4, 64), (4, 256)])
def test_reference_qweight_roundtrip(rng, bits, infeat):
    out = 16
    q = rng.integers(0, 2 ** bits, size=(infeat, out),
                     dtype=np.int64).astype(np.int32)
    w = pack_reference_qweight(q, bits)
    assert w.shape == (infeat // 32 * bits, out)
    back = unpack_reference_qweight(w, bits, infeat)
    np.testing.assert_array_equal(back, q)


def test_reference_zeros_roundtrip(rng):
    z = rng.integers(0, 16, size=(32,), dtype=np.int64).astype(np.int32)
    packed = pack_reference_zeros(z)
    assert packed.dtype == np.uint8 and packed.shape == (16, 1)
    np.testing.assert_array_equal(unpack_reference_zeros(packed, 32), z)


def test_layer_conversion_roundtrip_and_forward(rng):
    """our packed -> reference layout -> our packed: identical forward."""
    from owq_tpu.core import QuantSpec, find_params
    from owq_tpu.runtime.quant_linear import pack_linear

    out, infeat, bits = 32, 128, 3
    W = rng.standard_normal((out, infeat)).astype(np.float32) * 0.3
    spec = QuantSpec(bits, False)
    s, z = find_params(W, spec, mse=False)
    s, z = np.asarray(s), np.asarray(z)
    q = np.clip(np.round(W / s[:, None]) + z[:, None], 0, 7)
    Wf = s[:, None] * (q - z[:, None])
    ids = np.array([5, 77], np.int32)
    Wf[:, ids] = W[:, ids]
    p = pack_linear(Wf, s, z, ids, bits, weight_dtype=jnp.float32)

    ref = packed_to_reference_layer(p)
    assert ref["qweight"].shape == (infeat // 32 * 3, out)
    p2 = reference_layer_to_packed(ref, bits, infeat,
                                   weight_dtype=jnp.float32)

    x = rng.standard_normal((2, infeat)).astype(np.float32)
    y1 = np.asarray(p.apply(jnp.asarray(x)))
    y2 = np.asarray(p2.apply(jnp.asarray(x)))
    np.testing.assert_allclose(y1, y2, atol=1e-5)
    # codes survive exactly (same grid)
    np.testing.assert_allclose(y1, x @ Wf.T, atol=1e-4)


def test_full_reference_checkpoint_load(rng, tmp_path):
    """Assemble a reference-format .pth and load it end to end."""
    import torch

    import hf_tiny
    from owq_tpu.models import arch_for_model, forward, import_hf_model
    from owq_tpu.recon.pipeline import quantize_model
    from owq_tpu.runtime.checkpoint import pack_model
    from owq_tpu.runtime.convert import load_reference_checkpoint

    model = hf_tiny.tiny_opt(hidden=32, ffn=64, layers=2, max_pos=64)
    params, cfg = import_hf_model(model)
    calib = rng.integers(0, 97, size=(4, 16)).astype(np.int32)
    params, quantizers = quantize_model(
        params, cfg, arch_for_model("opt"), calib, wbits=3, target_rank=2,
        tuning="minmax", verbose=False)
    packed = pack_model(params, quantizers, 3, weight_dtype=jnp.float32)
    ids = calib[:1, :10]
    ref_logits, _ = forward(packed, cfg, jnp.asarray(ids))

    # write a reference-format checkpoint (modelutils.py:123-137 shape)
    sd = {k: torch.from_numpy(np.asarray(v))
          for k, v in model.state_dict().items()}
    name_map = {("attn", "q"): "self_attn.q_proj", ("attn", "k"): "self_attn.k_proj",
                ("attn", "v"): "self_attn.v_proj", ("attn", "o"): "self_attn.out_proj",
                ("mlp", "fc1"): "fc1", ("mlp", "fc2"): "fc2"}
    for li, blk in enumerate(packed["layers"]):
        for part in ("attn", "mlp"):
            for leaf, lin in blk[part].items():
                hf = f"model.decoder.layers.{li}.{name_map[(part, leaf)]}"
                for k in [f"{hf}.weight"]:
                    sd.pop(k, None)
                arrs = packed_to_reference_layer(lin)
                for f, a in arrs.items():
                    sd[f"{hf}.{f}"] = torch.from_numpy(np.ascontiguousarray(a))
    ckpt = {"model_state_dict": sd, "n_out_dict": {}, "packing": True,
            "dtype": torch.float16, "bits": 3}
    path = str(tmp_path / "ref_ckpt.pth")
    torch.save(ckpt, path)

    params2, cfg2 = load_reference_checkpoint(path, model.config)
    got, _ = forward(params2, cfg2, jnp.asarray(ids), dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref_logits),
                               atol=5e-2, rtol=5e-2)


def test_checkpoint_roundtrip_refreezes_tuple_config_fields(tmp_path, rng):
    # JSON turns tuples into lists; a reloaded config must stay hashable
    # (it is a jit static argument) — regression: rope_layers came back as
    # a list and broke the engine's first prefill after load
    import jax.numpy as jnp

    import hf_tiny
    from owq_tpu.models import import_hf_model
    from owq_tpu.runtime.checkpoint import load_checkpoint, save_checkpoint

    model = hf_tiny.tiny_smollm3(rope_interval=2)
    params, cfg = import_hf_model(model)
    save_checkpoint(str(tmp_path / "ck"), params, cfg)
    _, cfg2, _ = load_checkpoint(str(tmp_path / "ck"))
    hash(cfg2)  # must not raise
    assert cfg2.rope_layers == cfg.rope_layers
    assert cfg2.layer_types == cfg.layer_types
