import numpy as np
import pytest

from owq_tpu.core import (
    padded_infeatures,
    pack_int_weights,
    unpack_int_weights,
    pack_np,
    unpack_np,
    values_per_word,
)


@pytest.mark.parametrize("bits", [3, 4])
@pytest.mark.parametrize("infeat", [64, 100, 4096, 415])
def test_np_roundtrip(rng, bits, infeat):
    out = 24
    q = rng.integers(0, 2 ** bits, size=(infeat, out), dtype=np.int64).astype(np.int32)
    words = pack_np(q, bits)
    assert words.dtype == np.int32
    in_pad, nw = padded_infeatures(infeat, bits)
    assert words.shape == (nw, out)
    assert nw % 8 == 0 and in_pad == nw * values_per_word(bits)
    back = unpack_np(words, bits, infeat)
    np.testing.assert_array_equal(back, q)


@pytest.mark.parametrize("bits", [3, 4])
def test_jnp_matches_np(rng, bits):
    infeat, out = 130, 16
    in_pad, nw = padded_infeatures(infeat, bits)
    q = rng.integers(0, 2 ** bits, size=(in_pad, out), dtype=np.int64).astype(np.int32)
    words_j = np.asarray(pack_int_weights(q, bits))
    words_n = pack_np(q, bits)
    np.testing.assert_array_equal(words_j, words_n)
    back = np.asarray(unpack_int_weights(words_j, bits))
    np.testing.assert_array_equal(back, q)


def test_padding_rows_dequantize_to_zero(rng):
    bits, infeat, out = 3, 17, 4
    q = rng.integers(0, 8, size=(infeat, out), dtype=np.int64).astype(np.int32)
    zero = rng.integers(0, 8, size=(out,), dtype=np.int64).astype(np.int32)
    words = pack_np(q, bits, zero=zero)
    in_pad, _ = padded_infeatures(infeat, bits)
    full = unpack_np(words, bits, in_pad)
    # padded rows hold the per-channel zero-point -> dequant == 0
    np.testing.assert_array_equal(full[infeat:], np.broadcast_to(zero, (in_pad - infeat, out)))


def test_storage_efficiency():
    # 3-bit plane-chunk layout must stay within ~9% of dense 3.0 bits/value
    in_pad, nw = padded_infeatures(4096, 3)
    bits_per_value = nw * 32 / 4096
    assert bits_per_value < 3.3
    in_pad4, nw4 = padded_infeatures(4096, 4)
    assert nw4 * 32 / 4096 == 4.0
