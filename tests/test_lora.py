"""PEFT/LoRA adapter loading, oracled against the real peft package."""

import numpy as np
import pytest

import jax.numpy as jnp

from owq_tpu.models import arch_for_model, forward, import_hf_model
from owq_tpu.recon.pipeline import quantize_model
from owq_tpu.runtime.checkpoint import pack_model
from owq_tpu.runtime.lora import LoraLinear, apply_lora, load_peft_adapter
import hf_tiny


@pytest.fixture(scope="module")
def lora_setup(tmp_path_factory):
    """Tiny llama + a saved (randomly initialized, nonzero-B) LoRA adapter."""
    import torch
    from peft import LoraConfig, get_peft_model

    model = hf_tiny.tiny_llama()
    base = hf_tiny.tiny_llama()  # identical clean copy (same seed)
    lcfg = LoraConfig(r=4, lora_alpha=8, lora_dropout=0.0,
                      target_modules=["q_proj", "v_proj", "down_proj"],
                      init_lora_weights=False)  # nonzero B: delta is real
    torch.manual_seed(42)
    pm = get_peft_model(model, lcfg)
    path = str(tmp_path_factory.mktemp("adapter"))
    pm.save_pretrained(path)
    return pm, base, path


def test_load_peft_adapter_shapes(lora_setup):
    pm, base, path = lora_setup
    acfg, adapters = load_peft_adapter(path)
    assert acfg["r"] == 4 and len(adapters) == 3 * 2  # 3 modules x 2 layers
    A, B = adapters["model.layers.0.self_attn.q_proj"]
    assert A.shape[0] == 4 and B.shape[1] == 4


def test_lora_wrapped_matches_peft_forward(lora_setup, rng):
    """Our wrapped LoraLinear forward == peft's (unmerged) torch forward."""
    import torch

    pm, base, path = lora_setup
    ids = rng.integers(0, 97, size=(2, 10))
    with torch.no_grad():
        ref = pm(torch.from_numpy(ids)).logits.float().numpy()

    params, cfg = import_hf_model(base)
    params = apply_lora(params, cfg, path)
    assert isinstance(params["layers"][0]["attn"]["q"], LoraLinear)
    got = np.asarray(forward(params, cfg, jnp.asarray(ids))[0])
    np.testing.assert_allclose(got, ref, atol=3e-4, rtol=1e-3)


def test_lora_merge_matches_peft_merge(lora_setup, rng):
    import copy

    import torch

    pm, base, path = lora_setup
    merged = copy.deepcopy(pm).merge_and_unload()
    ids = rng.integers(0, 97, size=(1, 8))
    with torch.no_grad():
        ref = merged(torch.from_numpy(ids)).logits.float().numpy()

    params, cfg = import_hf_model(base)
    params = apply_lora(params, cfg, path, merge=True)
    got = np.asarray(forward(params, cfg, jnp.asarray(ids))[0])
    np.testing.assert_allclose(got, ref, atol=3e-4, rtol=1e-3)


def test_lora_over_packed_weights(lora_setup, rng):
    """Adapters ride on quantized (packed) base weights — the QLoRA-style
    serving path the reference enables via peft= on OWQ checkpoints."""
    pm, base, path = lora_setup
    params, cfg = import_hf_model(base)
    calib = rng.integers(0, 97, size=(4, 16)).astype(np.int32)
    params_q, qz = quantize_model(params, cfg, arch_for_model("llama"),
                                  calib, wbits=3, target_rank=2,
                                  tuning="minmax", verbose=False)
    packed = pack_model(params_q, qz, 3, weight_dtype=jnp.float32)
    base_logits = np.asarray(forward(packed, cfg,
                                     jnp.asarray(calib[:1]))[0])
    packed = apply_lora(packed, cfg, path)
    got = np.asarray(forward(packed, cfg, jnp.asarray(calib[:1]))[0])
    assert np.isfinite(got).all()
    # the adapter delta must actually change the output
    assert np.abs(got - base_logits).max() > 1e-3
    # merging into packed weights is refused
    params2, cfg2 = import_hf_model(base)
    params_q2, qz2 = quantize_model(params2, cfg2, arch_for_model("llama"),
                                    calib, wbits=3, target_rank=2,
                                    tuning="minmax", verbose=False)
    packed2 = pack_model(params_q2, qz2, 3, weight_dtype=jnp.float32)
    with pytest.raises(TypeError):
        apply_lora(packed2, cfg2, path, merge=True)
