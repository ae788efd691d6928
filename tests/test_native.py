"""C++ fast paths: build, parity with numpy, janitor behavior."""

import numpy as np
import pytest

from owq_tpu.core import pack_np, unpack_np, padded_infeatures
from owq_tpu.native import fast_pack, fast_unpack, have_fastpack
from owq_tpu.eval.decontamination import Janitor, word_ngrams


@pytest.mark.parametrize("bits", [3, 4])
def test_fastpack_matches_numpy(rng, bits):
    if not have_fastpack():
        pytest.skip("no C++ toolchain")
    infeat, out = 200, 96
    in_pad, nw = padded_infeatures(infeat, bits)
    q = rng.integers(0, 2 ** bits, size=(in_pad, out),
                     dtype=np.int64).astype(np.int32)
    want = pack_np(q, bits)
    got = fast_pack(q, bits)
    np.testing.assert_array_equal(got, want)
    back = fast_unpack(got, bits)
    np.testing.assert_array_equal(back, q)


def test_fastpack_abi_version_enforced():
    # the loader must only hand out a lib whose packed-row layout matches
    # core/packing.py (ADVICE r2: a stale round-1 .so packed the old
    # contiguous-chunk layout and corrupted weights silently)
    from owq_tpu.native import PACK_ABI_VERSION, _pack_abi, _packlib

    lib = _packlib()
    if lib is None:
        pytest.skip("no C++ toolchain")
    assert _pack_abi(lib) == PACK_ABI_VERSION


def test_janitor_clean_splits():
    j = Janitor(ngram_n=3, window_to_remove=1)
    j.register_contaminant("the quick brown fox jumps")
    doc = ("alpha beta gamma delta epsilon zeta. "
           "someone saw the quick brown fox jumps over fences. "
           "eta theta iota kappa lambda mu nu xi omicron pi.")
    frags = j.clean(doc)
    joined = " ".join(frags)
    assert "quick brown fox" not in joined
    assert "alpha beta gamma" in joined
    assert "kappa lambda" in joined


def test_janitor_clean_document_untouched():
    j = Janitor(ngram_n=3)
    j.register_contaminant("completely unrelated training text here")
    doc = "this evaluation document shares no thirteen gram at all"
    assert j.clean(doc) == [doc]


def test_janitor_too_dirty_dropped():
    j = Janitor(ngram_n=2, window_to_remove=0, too_dirty_cutoff=3)
    j.register_contaminant("a b c d e f g h i j k l")
    doc = "a b c d e f g h i j k l"  # every 2-gram dirty
    assert j.clean(doc) == []


def test_word_ngrams_normalization():
    grams = list(word_ngrams("Hello, WORLD! foo", 2))
    assert grams == ["hello world", "world foo"]
