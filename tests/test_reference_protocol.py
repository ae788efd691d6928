"""Differential tests of the EVAL and PACK protocols against the
reference's own runnable code (VERDICT r3 item 5).

``tests/test_reference_diff.py`` covers the QUANTIZE path (find_params /
GPTQ / layerwise_quantize / budget) head-to-head against the reference's
torch code.  These tests cover the two remaining protocol surfaces:

* ``eval_ppl`` (/root/reference/main.py:167-267): window slicing, shifted
  cross-entropy, exp(sum / (nwin * seqlen)) — run on a SHARED tiny HF model
  and token stream through both frameworks.  This is the strongest offline
  evidence for the ±0.05 wikitext2 gate (BASELINE.md) available in a
  zero-egress container.
* the pack bit-layout via the reference's own ``QuantLinear.pack`` /
  ``lm_pack`` / ``save_model`` (/root/reference/owq/quant.py:290-353,
  owq/utils/modelutils.py:108-137): runtime/convert.py must load
  REFERENCE-produced bytes (test_convert.py only exercised bytes our own
  packer produced).
"""

import os
import sys
from types import SimpleNamespace

import numpy as np
import pytest

REF = "/root/reference"

pytestmark = pytest.mark.skipif(
    not os.path.isfile(os.path.join(REF, "owq", "recon.py")),
    reason="reference checkout not present")

torch = pytest.importorskip("torch")

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from test_reference_diff import _load_reference, _opt_meta  # noqa: E402


@pytest.fixture(scope="module")
def ref():
    quant, recon, main = _load_reference()
    if not torch.cuda.is_available():
        torch.cuda.synchronize = lambda *a, **k: None
    return SimpleNamespace(quant=quant, recon=recon, main=main)


# ---------------------------------------------------------------------------
# eval_ppl protocol (main.py:167-267)
# ---------------------------------------------------------------------------

def test_eval_ppl_matches_reference(ref):
    """Reference eval_ppl (torch CPU, Catcher + block shuttle + shifted CE)
    vs eval/ppl.py on the same fp32 tiny OPT and the same token stream.

    Both must produce the same perplexity to fp32 accumulation noise —
    protocol-level proof that the window slicing (truncate to
    nwin*seqlen), per-window mean-CE-over-(seqlen-1)-targets * seqlen
    weighting, and exp(sum/(nwin*seqlen)) aggregation match exactly.
    """
    import hf_tiny
    from owq_tpu.eval.ppl import eval_ppl
    from owq_tpu.models import import_hf_model

    model = hf_tiny.tiny_opt(hidden=32, ffn=64, layers=2, max_pos=64).float()
    rng = np.random.default_rng(7)
    seqlen = 24
    # a non-multiple stream length: the protocol truncates to nwin*seqlen
    stream = rng.integers(0, 97, size=(1, 5 * seqlen + 11)).astype(np.int64)

    args = SimpleNamespace(meta=_opt_meta(), seqlen=seqlen, nearest=False)
    ppl_ref = ref.main.eval_ppl(
        model, SimpleNamespace(input_ids=torch.from_numpy(stream)),
        "cpu", args)

    params, cfg = import_hf_model(model)
    ppl_ours = eval_ppl(params, cfg, stream.ravel(), seqlen, batch=2)

    assert abs(ppl_ours - ppl_ref) / ppl_ref < 1e-4, (ppl_ours, ppl_ref)
    # and well inside the BASELINE quality gate
    assert abs(ppl_ours - ppl_ref) < 0.05


def test_eval_ppl_nearest_rtn_matches_reference(ref):
    """--nearest on-the-fly RTN inside eval (main.py:227-233) vs ours."""
    import hf_tiny
    from owq_tpu.core import QuantSpec
    from owq_tpu.eval.ppl import eval_ppl
    from owq_tpu.models import import_hf_model
    from owq_tpu.models.transformer import quantizable_names
    from owq_tpu.recon.gptq import rtn_quantize
    from owq_tpu.recon.pipeline import _get_linear, _set_linear
    from owq_tpu.runtime.quant_linear import DenseLinear

    model = hf_tiny.tiny_opt(hidden=32, ffn=64, layers=2, max_pos=64).float()
    rng = np.random.default_rng(8)
    seqlen = 16
    stream = rng.integers(0, 97, size=(1, 4 * seqlen)).astype(np.int64)

    params, cfg = import_hf_model(model)  # import BEFORE torch RTN mutates

    args = SimpleNamespace(meta=_opt_meta(), seqlen=seqlen, nearest=True,
                           wbits=4, sym=False)
    ppl_ref = ref.main.eval_ppl(
        model, SimpleNamespace(input_ids=torch.from_numpy(stream)),
        "cpu", args)

    # the cli/quantize.py --nearest path, applied in place
    spec = QuantSpec(4, False)
    for blk in params["layers"]:
        for name in quantizable_names(cfg):
            lin = _get_linear(blk, name)
            Q = rtn_quantize(lin.w.T, spec, mse=False)
            _set_linear(blk, name, DenseLinear(w=Q.T.astype(lin.w.dtype),
                                               b=lin.b))
    ppl_ours = eval_ppl(params, cfg, stream.ravel(), seqlen)
    assert abs(ppl_ours - ppl_ref) / ppl_ref < 1e-4, (ppl_ours, ppl_ref)


# ---------------------------------------------------------------------------
# pack bit-layout: reference-produced bytes through runtime/convert.py
# ---------------------------------------------------------------------------

def _fake_quant_layer(ref, rng, out, infeat, bits, n_out):
    """Reference-side fake quantization (test_kernel.py:18-25 semantics):
    returns (W_fake fp32 [out, in] with outlier cols restored, scale, zero,
    outlieridx)."""
    W = (rng.standard_normal((out, infeat)) * 0.4).astype(np.float32)
    q = ref.quant.Quantizer(bits, perchannel=True, sym=False, mse=False)
    Wt = torch.from_numpy(W.copy())
    q.find_params(Wt, weight=True)
    Wf = q.quantize(Wt)
    ids = torch.from_numpy(
        np.sort(rng.choice(infeat, n_out, replace=False)).astype(np.int64)
    ).to(torch.int32)
    if n_out:
        Wf[:, ids] = Wt[:, ids]  # weak columns stay full precision
    return Wf, q.scale, q.zero, ids


@pytest.mark.parametrize("bits", [3, 4])
def test_reference_pack_bytes_load(ref, bits):
    """Bytes packed by the reference's own QuantLinear.pack (including the
    3-bit 10+1+10+1+10 word-straddle layout) load through
    reference_layer_to_packed and reproduce the fake-quant forward to
    kernel-gate accuracy (MSE < 1e-6, reference test_kernel.py:130)."""
    import jax.numpy as jnp

    from owq_tpu.runtime.convert import (packed_to_reference_layer,
                                         reference_layer_to_packed)

    rng = np.random.default_rng(100 + bits)
    out, infeat, n_out = 32, 96, 4
    Wf, scale, zero, ids = _fake_quant_layer(ref, rng, out, infeat, bits,
                                             n_out)

    lin = torch.nn.Linear(infeat, out, bias=False)
    lin.weight.data = Wf.clone()
    ql = ref.quant.QuantLinear(bits, infeat, out, n_out, bias=False,
                               dtype=torch.float32, name="t")
    ql.pack(lin, scale, zero, ids)

    ref_state = {
        "qweight": ql.qweight.numpy(),
        "scales": ql.scales.numpy(),
        "zeros": ql.zeros.numpy(),
        "oweight": ql.oweight.numpy(),
        "outlieridx": ql.outlieridx.numpy(),
    }
    p = reference_layer_to_packed(ref_state, bits, infeat,
                                  weight_dtype=jnp.float32)

    x = rng.standard_normal((3, infeat)).astype(np.float32)
    got = np.asarray(p.apply(jnp.asarray(x)))
    want = x @ Wf.numpy().T
    mse = float(np.mean((got - want) ** 2) / (np.mean(want ** 2) + 1e-12))
    assert mse < 1e-6, mse

    # reverse direction: our packer reproduces the reference bytes exactly
    back = packed_to_reference_layer(p)
    np.testing.assert_array_equal(back["qweight"], ref_state["qweight"])
    np.testing.assert_array_equal(back["zeros"], ref_state["zeros"])
    np.testing.assert_allclose(back["scales"], ref_state["scales"],
                               rtol=0, atol=0)
    np.testing.assert_allclose(back["oweight"], ref_state["oweight"],
                               rtol=0, atol=1e-7)


def test_reference_save_model_checkpoint_loads(ref, tmp_path):
    """Full protocol: reference layerwise_quantize -> save_model(packed)
    (lm_pack + torch.save) -> load_reference_checkpoint -> forward logits
    match the torch fake-quant model.  The .pth bytes are produced entirely
    by reference code (modelutils.py:108-137)."""
    import jax.numpy as jnp

    import hf_tiny
    from owq_tpu.models.transformer import forward
    from owq_tpu.runtime.convert import load_reference_checkpoint

    model = hf_tiny.tiny_opt(hidden=32, ffn=64, layers=2, max_pos=64).float()
    rng = np.random.default_rng(17)
    calib = rng.integers(0, 97, size=(6, 32)).astype(np.int64)
    dataloader = [(torch.from_numpy(c[None]), None) for c in calib]
    args = SimpleNamespace(
        meta=_opt_meta(), nsamples=len(calib), seqlen=32, wbits=3,
        target_bit=3.01, target_rank=None, sym=False, tuning="mse",
        no_frob_norm=False, act_order=False, true_sequential=False,
        percdamp=0.01, groupsize=-1)
    quantizers = ref.main.layerwise_quantize(model, dataloader, "cpu", args)

    ids = rng.integers(0, 97, size=(1, 16)).astype(np.int64)
    with torch.no_grad():
        logits_ref = model(torch.from_numpy(ids)).logits.numpy()

    path = str(tmp_path / "ref_packed.pt")
    ref_mu = sys.modules["refowq.utils.modelutils"]
    ref_mu.save_model(model, quantizers, path, packing=True, fake=False)

    params, cfg = load_reference_checkpoint(path, model.config)
    logits_ours, _ = forward(params, cfg, jnp.asarray(ids.astype(np.int32)),
                             dtype=jnp.float32)
    logits_ours = np.asarray(logits_ours)
    # dequantized weights are bf16 in our runtime (serving dtype); the
    # codes themselves are exact, so parity is bf16-rounding-limited
    rel = (np.abs(logits_ours - logits_ref).max()
           / (np.abs(logits_ref).max() + 1e-9))
    assert rel < 2e-2, rel
    # the ranking must survive: identical argmax on every position
    np.testing.assert_array_equal(logits_ours.argmax(-1),
                                  logits_ref.argmax(-1))
