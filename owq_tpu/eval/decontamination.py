"""Training-set decontamination: 13-gram janitor.

The analogue of the reference's lm_eval/decontamination package: scan eval
documents for n-grams that appear in a training corpus and cut contaminated
windows out.  The C++ fast path (native/janitor.cpp — which, unlike the
reference's referenced-but-missing janitor_util.cpp, actually ships) hashes
and marks n-grams; this module provides the pure-python fallback and the
user-facing Janitor API.
"""

from __future__ import annotations

import re
from typing import Iterable, List, Set, Tuple

import numpy as np

__all__ = ["Janitor", "word_ngrams", "normalize_words"]

_WORD_RE = re.compile(r"\S+")


def normalize_words(text: str) -> List[Tuple[int, int, str]]:
    """(begin, end, normalized) per word: lowercase, punctuation stripped."""
    out = []
    for m in _WORD_RE.finditer(text):
        norm = "".join(c.lower() for c in m.group() if c.isalnum())
        if norm:
            out.append((m.start(), m.end(), norm))
    return out


def word_ngrams(text: str, n: int) -> Iterable[str]:
    words = [w for _, _, w in normalize_words(text)]
    for i in range(len(words) - n + 1):
        yield " ".join(words[i:i + n])


def _fnv1a(s: bytes, h: int = 1469598103934665603) -> int:
    for b in s:
        h ^= b
        h = (h * 1099511628211) & 0xFFFFFFFFFFFFFFFF
    return h


def ngram_hash(ngram: str) -> int:
    return _fnv1a(ngram.encode("utf-8"))


class Janitor:
    """Register contaminating documents, then clean eval documents.

    window_to_remove words on each side of a dirty n-gram are removed, and
    the document is split at the removed regions (reference janitor
    semantics).
    """

    def __init__(self, ngram_n: int = 13, window_to_remove: int = 200,
                 too_dirty_cutoff: int = 10):
        self.n = ngram_n
        self.window = window_to_remove
        self.too_dirty_cutoff = too_dirty_cutoff
        self.dirty_hashes: Set[int] = set()

    def register_contaminant(self, text: str) -> None:
        from ..native import janitor_lib

        # the C++ fast path normalizes byte-wise (ASCII alnum); route
        # non-ASCII text through the Unicode-aware Python path so hashes
        # stay consistent regardless of which side registered them
        lib = janitor_lib() if text.isascii() else None
        if lib is not None:
            import ctypes

            data = text.encode("utf-8")
            cap = max(len(data), 1)
            buf = np.empty(cap, np.uint64)
            cnt = lib.janitor_ngram_hashes(
                data, len(data), self.n,
                buf.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64)), cap)
            self.dirty_hashes.update(int(h) for h in buf[:cnt])
            return
        for ng in word_ngrams(text, self.n):
            self.dirty_hashes.add(ngram_hash(ng))

    def clean(self, text: str) -> List[str]:
        """Return the clean fragments of ``text`` (possibly empty)."""
        if not self.dirty_hashes:
            return [text]
        from ..native import janitor_lib

        lib = janitor_lib() if text.isascii() else None
        if lib is not None:
            parts = self._clean_native(lib, text)
        else:
            parts = self._clean_python(text)
        return parts

    # -- implementations ----------------------------------------------
    def _mark_python(self, text: str):
        words = normalize_words(text)
        norms = [w for _, _, w in words]
        mark = np.zeros(len(words), bool)
        found = 0
        for i in range(len(norms) - self.n + 1):
            h = ngram_hash(" ".join(norms[i:i + self.n]))
            if h in self.dirty_hashes:
                found += 1
                lo = max(0, i - self.window)
                hi = min(len(words), i + self.n + self.window)
                mark[lo:hi] = True
        return words, mark, found

    def _clean_python(self, text: str) -> List[str]:
        words, mark, found = self._mark_python(text)
        return self._split(text, words, mark, found)

    def _clean_native(self, lib, text: str) -> List[str]:
        import ctypes

        data = text.encode("utf-8")
        bad = np.array(sorted(self.dirty_hashes), np.uint64)
        cap = max(len(data), 1)
        mark = np.zeros(cap, np.uint8)
        wb = np.empty(cap, np.int64)
        we = np.empty(cap, np.int64)
        nwords = ctypes.c_int64(0)
        found = lib.janitor_mark(
            data, len(data), self.n,
            bad.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64)), len(bad),
            self.window,
            mark.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), cap,
            wb.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            we.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            ctypes.byref(nwords))
        n = nwords.value
        # byte offsets -> approximate char alignment is exact for ascii;
        # for safety operate on the utf-8 byte string and decode fragments
        words = [(int(wb[i]), int(we[i]), None) for i in range(n)]
        frags = self._split_bytes(data, words, mark[:n].astype(bool),
                                  int(found))
        return frags

    def _split(self, text: str, words, mark, found: int) -> List[str]:
        if found == 0:
            return [text]
        if found > self.too_dirty_cutoff:
            return []
        frags = []
        start = 0
        i = 0
        n = len(words)
        while i < n:
            if mark[i]:
                begin = words[i][0]
                if begin > start:
                    frag = text[start:begin].strip()
                    if frag:
                        frags.append(frag)
                while i < n and mark[i]:
                    i += 1
                start = words[i - 1][1]
            else:
                i += 1
        tail = text[start:].strip()
        if tail:
            frags.append(tail)
        return frags

    def _split_bytes(self, data: bytes, words, mark, found: int) -> List[str]:
        out = self._split(data, words, mark, found)
        return [f.decode("utf-8", errors="ignore") if isinstance(f, bytes)
                else f for f in out]
