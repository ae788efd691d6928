import numpy as np
import pytest

from owq_tpu.core import (
    QuantSpec,
    fake_quant,
    find_params,
    quantize_to_int,
    dequantize_int,
)
import oracle


@pytest.mark.parametrize("bits", [2, 3, 4])
@pytest.mark.parametrize("sym", [False, True])
def test_minmax_matches_oracle(rng, bits, sym):
    x = rng.standard_normal((17, 33)).astype(np.float32)
    x[3] = 0.0  # all-zero channel edge case
    x[5] = np.abs(x[5])  # non-negative channel
    x[7] = -np.abs(x[7])  # non-positive channel
    spec = QuantSpec(bits, sym)
    s, z = find_params(x, spec, mse=False)
    so, zo = oracle.find_params_minmax_oracle(x, bits, sym)
    np.testing.assert_allclose(np.asarray(s), so, rtol=1e-6)
    # XLA division is not correctly rounded (reciprocal-multiply), so a
    # zero-point sitting exactly on a .5 tie may round differently; allow a
    # 1-level difference there (same fake-quant grid, shifted zero).
    np.testing.assert_allclose(np.asarray(z), zo, rtol=0, atol=1)


@pytest.mark.parametrize("bits", [3, 4])
@pytest.mark.parametrize("sym", [False, True])
def test_mse_matches_oracle(rng, bits, sym):
    x = rng.standard_normal((5, 64)).astype(np.float32) * 3.0
    x[0, 0] = 9.0  # outlier within a channel
    spec = QuantSpec(bits, sym)
    s, z = find_params(x, spec, mse=True, num=40)
    so, zo = oracle.find_params_mse_oracle(x, bits, sym, num=40)
    np.testing.assert_allclose(np.asarray(s), so, rtol=2e-5)
    np.testing.assert_allclose(np.asarray(z), zo, rtol=0, atol=0)


def test_mse_beats_or_ties_minmax(rng):
    """The MSE grid search must not do worse than min/max on its own loss."""
    x = rng.standard_normal((8, 128)).astype(np.float32)
    x[:, 0] *= 10  # heavy outliers make minmax suboptimal
    spec = QuantSpec(3, False)
    s_m, z_m = find_params(x, spec, mse=False)
    s_g, z_g = find_params(x, spec, mse=True)
    err_m = np.mean((np.asarray(fake_quant(x, np.asarray(s_m)[:, None], np.asarray(z_m)[:, None], spec)) - x) ** 2)
    err_g = np.mean((np.asarray(fake_quant(x, np.asarray(s_g)[:, None], np.asarray(z_g)[:, None], spec)) - x) ** 2)
    assert err_g <= err_m * 1.05


@pytest.mark.parametrize("bits,sym", [(3, False), (4, False), (4, True)])
def test_quant_roundtrip_int(rng, bits, sym):
    spec = QuantSpec(bits, sym)
    x = rng.standard_normal((6, 50)).astype(np.float32)
    s, z = find_params(x, spec, mse=False)
    q = quantize_to_int(x, np.asarray(s)[:, None], np.asarray(z)[:, None], spec)
    assert q.min() >= spec.minq and q.max() <= spec.maxq
    deq = dequantize_int(q, np.asarray(s)[:, None], np.asarray(z)[:, None])
    fq = fake_quant(x, np.asarray(s)[:, None], np.asarray(z)[:, None], spec)
    np.testing.assert_allclose(np.asarray(deq), np.asarray(fq), rtol=1e-6, atol=1e-7)


def test_grid_bounds():
    assert QuantSpec(3, False).minq == 0
    assert QuantSpec(3, False).maxq == 7
    assert QuantSpec(3, True).minq == -4
    assert QuantSpec(3, True).maxq == 3
    assert QuantSpec(4, False).maxq == 15
    assert QuantSpec(4, True).minq == -8
    assert QuantSpec(4, True).maxq == 7
