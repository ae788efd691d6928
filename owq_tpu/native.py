"""ctypes loaders for the optional C++ fast paths (native/*.cpp).

Auto-builds with make on first use when a toolchain is present; every entry
point has a pure-python/numpy fallback, mirroring the reference's
janitor.py C++-else-python pattern (lm_eval/decontamination/janitor.py:8-20).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(__file__)),
                           "native")

# Packed-word row layout contract between fastpack.cpp and core/packing.py.
# fastpack.cpp bumps owq_pack_abi_version() whenever the bit layout changes;
# a stale .so from an older layout would pack silently-corrupt weights, so
# the loader verifies the version and rebuilds (or refuses) on mismatch.
PACK_ABI_VERSION = 3


def _load(libname: str, force: bool = False) -> Optional[ctypes.CDLL]:
    path = os.path.join(_NATIVE_DIR, libname)
    if force or not os.path.exists(path):
        try:
            cmd = ["make", "-C", _NATIVE_DIR]
            if force:
                cmd.append("-B")
            subprocess.run(cmd + [libname], check=True,
                           capture_output=True, timeout=120)
        except Exception:
            return None
    try:
        return ctypes.CDLL(path)
    except OSError:
        return None


_pack_lib = None
_pack_tried = False


def _pack_abi(lib: ctypes.CDLL) -> int:
    try:
        return int(lib.owq_pack_abi_version())
    except AttributeError:
        return 0  # pre-versioning build


def _packlib() -> Optional[ctypes.CDLL]:
    global _pack_lib, _pack_tried
    if not _pack_tried:
        _pack_tried = True
        lib = _load("libowqpack.so")
        if lib is not None and _pack_abi(lib) != PACK_ABI_VERSION:
            # stale .so from an older packed layout: rebuild from source,
            # and fall back to the (always-correct) python packer if the
            # rebuild still disagrees
            lib = _load("libowqpack.so", force=True)
            if lib is not None and _pack_abi(lib) != PACK_ABI_VERSION:
                lib = None
        if lib is not None:
            lib.owq_pack.argtypes = [
                ctypes.POINTER(ctypes.c_int32), ctypes.c_int64,
                ctypes.c_int64, ctypes.c_int,
                ctypes.POINTER(ctypes.c_int32), ctypes.c_int]
            lib.owq_unpack.argtypes = [
                ctypes.POINTER(ctypes.c_int32), ctypes.c_int64,
                ctypes.c_int64, ctypes.c_int,
                ctypes.POINTER(ctypes.c_int32), ctypes.c_int]
        _pack_lib = lib
    return _pack_lib


def have_fastpack() -> bool:
    return _packlib() is not None


def fast_pack(q_padded: np.ndarray, bits: int,
              nthreads: Optional[int] = None) -> Optional[np.ndarray]:
    """C++ pack of already-padded codes [in_pad, out]; None if unavailable."""
    lib = _packlib()
    if lib is None:
        return None
    q = np.ascontiguousarray(q_padded, np.int32)
    in_pad, out = q.shape
    v = 10 if bits == 3 else 8
    words = np.empty((in_pad // v, out), np.int32)
    nthreads = nthreads or min(os.cpu_count() or 1, 16)
    lib.owq_pack(q.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
                 in_pad, out, bits,
                 words.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
                 nthreads)
    return words


def fast_unpack(words: np.ndarray, bits: int,
                nthreads: Optional[int] = None) -> Optional[np.ndarray]:
    lib = _packlib()
    if lib is None:
        return None
    w = np.ascontiguousarray(words, np.int32)
    nw, out = w.shape
    v = 10 if bits == 3 else 8
    q = np.empty((nw * v, out), np.int32)
    nthreads = nthreads or min(os.cpu_count() or 1, 16)
    lib.owq_unpack(w.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
                   nw, out, bits,
                   q.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
                   nthreads)
    return q


_janitor_lib = None
_janitor_tried = False


def janitor_lib() -> Optional[ctypes.CDLL]:
    global _janitor_lib, _janitor_tried
    if not _janitor_tried:
        _janitor_tried = True
        lib = _load("libowqjanitor.so")
        if lib is not None:
            lib.janitor_ngram_hashes.restype = ctypes.c_int64
            lib.janitor_ngram_hashes.argtypes = [
                ctypes.c_char_p, ctypes.c_int64, ctypes.c_int,
                ctypes.POINTER(ctypes.c_uint64), ctypes.c_int64]
            lib.janitor_mark.restype = ctypes.c_int64
            lib.janitor_mark.argtypes = [
                ctypes.c_char_p, ctypes.c_int64, ctypes.c_int,
                ctypes.POINTER(ctypes.c_uint64), ctypes.c_int64,
                ctypes.c_int,
                ctypes.POINTER(ctypes.c_uint8), ctypes.c_int64,
                ctypes.POINTER(ctypes.c_int64),
                ctypes.POINTER(ctypes.c_int64),
                ctypes.POINTER(ctypes.c_int64)]
        _janitor_lib = lib
    return _janitor_lib
