"""W4A8 serving mode (kernels/gemv_a8.py): semantics + OWQ synergy.

The base product quantizes activations per row to int8; weak columns keep
full-precision activations.  On CPU the dispatch uses the jnp simulation
(identical math to the TPU int8-MXU kernel; the kernel itself is verified
on-chip, tools logs in PARITY.md).
"""

import numpy as np
import pytest

import jax.numpy as jnp

from owq_tpu.core.packing import pack_np
from owq_tpu.kernels.gemv import quant_matmul
from owq_tpu.kernels.gemv_a8 import (a8_base_reference, byte_interleave,
                                     quantize_rows_int8)
from owq_tpu.runtime.quant_linear import PackedLinear, _apply_xla


def make_packed(rng, infeat=256, out=128, n_out=4, bits=4):
    codes = rng.integers(0, 2 ** bits, size=(infeat, out)).astype(np.int32)
    scales = (0.01 + 0.05 * rng.random(out)).astype(np.float32)
    zeros = rng.integers(0, 2 ** bits, size=out).astype(np.float32)
    out_ids = np.sort(rng.choice(infeat, n_out, replace=False)).astype(np.int32)
    ow = rng.standard_normal((n_out, out)).astype(np.float32) * 0.3
    # weak columns dequantize to zero in the packed base (reference
    # semantics): set their codes to the zero-point
    codes[out_ids] = zeros[None, :].astype(np.int32)
    return PackedLinear(
        qweight=jnp.asarray(pack_np(codes, bits, zeros)),
        scales=jnp.asarray(scales), zeros=jnp.asarray(zeros),
        oweight=jnp.asarray(ow), out_ids=jnp.asarray(out_ids),
        bias=None, bits=bits, in_features=infeat), codes


def test_a8_base_close_to_exact(rng):
    p, codes = make_packed(rng)
    x = jnp.asarray(rng.standard_normal((4, 256)).astype(np.float32)
                    ).astype(jnp.bfloat16)
    y_exact = np.asarray(_apply_xla(p, x), np.float32)
    y_a8 = np.asarray(quant_matmul(p, x, a8=True), np.float32)
    # int8 activation rounding: small relative error on gaussian inputs
    rel = np.abs(y_a8 - y_exact).max() / (np.abs(y_exact).max() + 1e-9)
    assert rel < 0.02, rel


def test_a8_weak_columns_immune_to_activation_outliers(rng):
    """A huge activation on a WEAK column must not degrade the a8 result:
    that column bypasses the int8 path entirely (the OWQ synergy)."""
    p, codes = make_packed(rng)
    weak = int(np.asarray(p.out_ids)[0])
    strong = (weak + 1) % p.in_features
    assert strong not in np.asarray(p.out_ids)

    x = rng.standard_normal((2, 256)).astype(np.float32)
    x_weakout = x.copy()
    x_weakout[:, weak] = 300.0       # outlier on a weak column
    x_strongout = x.copy()
    x_strongout[:, strong] = 300.0   # outlier on a quantized column

    def rel_err(xv):
        xj = jnp.asarray(xv).astype(jnp.bfloat16)
        y_exact = np.asarray(_apply_xla(p, xj), np.float32)
        y_a8 = np.asarray(quant_matmul(p, xj, a8=True), np.float32)
        return np.abs(y_a8 - y_exact).max() / (np.abs(y_exact).max() + 1e-9)

    # weak-column outlier: absmax scale unaffected by the 300.0 (the weak
    # column's base codes are the zero-point => contributes via FP side
    # matmul only) -> error stays at the no-outlier level
    e_weak = rel_err(x_weakout)
    e_strong = rel_err(x_strongout)
    assert e_weak < 0.02, e_weak
    # a non-weak outlier blows up the absmax scale: every OTHER column's
    # activation loses precision; documented failure mode a8 relies on OWQ
    # to avoid (scales 300/127 >> typical |x|)
    assert e_strong > e_weak


def test_a8_3bit_falls_back_to_exact(rng):
    codes3 = rng.integers(0, 8, size=(100, 128)).astype(np.int32)
    scales = (0.01 + rng.random(128)).astype(np.float32)
    zeros = rng.integers(0, 8, size=128).astype(np.float32)
    p3 = PackedLinear(qweight=jnp.asarray(pack_np(codes3, 3, zeros)),
                      scales=jnp.asarray(scales), zeros=jnp.asarray(zeros),
                      oweight=jnp.zeros((0, 128), jnp.float32),
                      out_ids=jnp.zeros((0,), jnp.int32), bias=None,
                      bits=3, in_features=100)
    x = jnp.asarray(rng.standard_normal((2, 100)).astype(np.float32)
                    ).astype(jnp.bfloat16)
    np.testing.assert_allclose(np.asarray(quant_matmul(p3, x, a8=True)),
                               np.asarray(quant_matmul(p3, x)), rtol=0,
                               atol=0)


def test_byte_interleave_matches_bitcast_semantics(rng):
    """x_lo/x_hi row order must match the int8 view of the packed words:
    int8 row 4i+b of the lo-nibble matrix is plane 2b, word i."""
    from owq_tpu.core.packing import padded_infeatures, plane_offset

    infeat = 128
    in_pad, nw = padded_infeatures(infeat, 4)
    x = np.arange(in_pad, dtype=np.float32)[None]  # row r: x[j] = j
    x8 = jnp.asarray(x.astype(np.int8))  # values 0..127 fit
    xp = np.asarray(byte_interleave(x8, nw))
    # logical row for plane p, word i (pair-interleaved layout)
    for b in range(4):
        for i in (0, 1, nw - 1):
            p_lo, p_hi = 2 * b, 2 * b + 1
            def row(p):
                k, h = (p, 0) if p < 4 else (p - 4, 1)
                return k * 2 * nw + 2 * i + h
            assert xp[0, 0, 4 * i + b] == np.int8(row(p_lo))
            assert xp[0, 1, 4 * i + b] == np.int8(row(p_hi))


def test_quantize_rows_int8_roundtrip(rng):
    x = jnp.asarray(rng.standard_normal((3, 64)).astype(np.float32))
    x8, s = quantize_rows_int8(x)
    back = np.asarray(x8, np.float32) * np.asarray(s) / 127.0
    np.testing.assert_allclose(back, np.asarray(x), atol=np.asarray(s).max() / 127.0)


def test_a8_engine_generate_runs(rng):
    """kernel='pallas-a8' flows through generate on a packed 4-bit model."""
    from owq_tpu.models.synthetic import build_synthetic, synthetic_config
    from owq_tpu.runtime.generate import generate

    cfg = synthetic_config("llama-tiny", max_pos=64)
    params = build_synthetic(cfg, bits=4, dtype=jnp.bfloat16)
    out = generate(params, cfg, np.asarray([[1, 2, 3]], np.int32),
                   max_new_tokens=4, kernel="pallas-a8")
    assert np.asarray(out).shape == (1, 4)


def test_a8_repack_roundtrip(rng):
    """a8_repack/a8_unpack preserve the codes in natural row order."""
    from owq_tpu.kernels.gemv_a8 import a8_repack, a8_unpack
    from owq_tpu.core.packing import pack_np, unpack_np

    codes = rng.integers(0, 16, size=(256, 128)).astype(np.int32)
    qw = jnp.asarray(pack_np(codes, 4))
    qw8 = a8_repack(qw)
    back = np.asarray(a8_unpack(qw8))
    np.testing.assert_array_equal(back[:256], codes)


def test_a8_layout_model_matches_paired(rng):
    """repack_model_a8 + forward == the paired-layout a8 result (the
    layout changes data movement, not math)."""
    import copy

    from owq_tpu.models.synthetic import build_synthetic, synthetic_config
    from owq_tpu.models.transformer import forward
    from owq_tpu.runtime.fuse import repack_model_a8

    cfg = synthetic_config("llama-tiny", max_pos=64)
    params = build_synthetic(cfg, bits=4, dtype=jnp.bfloat16)
    ids = jnp.asarray(rng.integers(0, cfg.vocab_size, size=(1, 8))
                      .astype(np.int32))
    y_paired = np.asarray(forward(
        params, cfg, ids, kernel="pallas-a8", dtype=jnp.bfloat16)[0],
        np.float32)
    params8 = repack_model_a8(copy.deepcopy(params), cfg)
    assert params8["layers"][0]["attn"]["q"].layout == "a8"
    y_a8 = np.asarray(forward(
        params8, cfg, ids, kernel="pallas-a8", dtype=jnp.bfloat16)[0],
        np.float32)
    np.testing.assert_allclose(y_a8, y_paired, rtol=2e-2, atol=2e-2)
    # and plain "pallas" on an a8-layout model auto-routes to the a8 path
    y_auto = np.asarray(forward(
        params8, cfg, ids, kernel="pallas", dtype=jnp.bfloat16)[0],
        np.float32)
    np.testing.assert_allclose(y_auto, y_a8, rtol=1e-5, atol=1e-5)
