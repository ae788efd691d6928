"""Zstd-compressed jsonl corpus archives for decontamination scans.

Capability parity with the reference's lm_eval/decontamination/archiver.py
(Archive writer, Reader, TextArchive/TextReader): training corpora are
stored as zstandard-compressed jsonl ({"text": ..., "meta": {...}} per
line) and streamed back document-by-document into the overlap scanner
(overlap.py) without decompressing to disk.

The module degrades gracefully when the ``zstandard`` package is absent:
``*.jsonl`` / ``*.txt`` files are read and written uncompressed.
"""

from __future__ import annotations

import datetime
import io
import json
import os
from typing import Any, Dict, Iterable, Iterator, Optional, Tuple

try:
    import zstandard as _zstd
except ImportError:  # pragma: no cover - baked into this image
    _zstd = None

__all__ = ["Archive", "Reader", "TextArchive", "TextReader",
           "read_corpus"]


def _is_zst(path: str) -> bool:
    return path.endswith(".zst")


def _open_write(path: str):
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    fh = open(path, "wb")
    if _is_zst(path):
        if _zstd is None:
            raise RuntimeError("zstandard not available for .zst output")
        return fh, _zstd.ZstdCompressor(level=3).stream_writer(fh)
    return fh, fh


def _open_read(path: str):
    fh = open(path, "rb")
    if _is_zst(path):
        if _zstd is None:
            raise RuntimeError("zstandard not available for .zst input")
        stream = _zstd.ZstdDecompressor().stream_reader(fh)
    else:
        stream = fh
    return fh, io.TextIOWrapper(io.BufferedReader(stream), encoding="utf-8")


class Archive:
    """Append documents to a zstd jsonl archive (reference Archive)."""

    def __init__(self, file_path: str):
        self.file_path = file_path
        self._fh, self._stream = _open_write(file_path)

    def add_data(self, data: str, meta: Optional[Dict[str, Any]] = None
                 ) -> None:
        line = json.dumps({"text": data, "meta": meta or {}},
                          ensure_ascii=False)
        self._stream.write((line + "\n").encode("utf-8"))

    def commit(self) -> None:
        if self._stream is not self._fh:
            self._stream.flush()
            self._stream.close()
        else:
            self._fh.close()


class Reader:
    """Stream documents out of a (possibly compressed) jsonl archive."""

    def read(self, file_path: str, *, get_meta: bool = False,
             autojoin_paragraphs: bool = True, para_joiner: str = "\n\n"
             ) -> Iterator:
        fh, text = _open_read(file_path)
        try:
            for line in text:
                line = line.strip()
                if not line:
                    continue
                ob = json.loads(line)
                doc = ob.get("text", ob.get("content", ""))
                if autojoin_paragraphs and isinstance(doc, list):
                    doc = para_joiner.join(doc)
                yield (doc, ob.get("meta", {})) if get_meta else doc
        finally:
            fh.close()


class TextArchive:
    """Plain-text line archive (one fragment per line)."""

    def __init__(self, file_path: str, mode: str = "ab"):
        self.file_path = file_path
        d = os.path.dirname(os.path.abspath(file_path))
        os.makedirs(d, exist_ok=True)
        self._fh = open(file_path, mode)

    def add_data(self, data: str) -> None:
        self._fh.write((data.rstrip("\n") + "\n").encode("utf-8"))

    def commit(self) -> None:
        self._fh.close()


class TextReader:
    def __init__(self, file_path: str):
        self.file_path = file_path

    def read(self) -> Iterator[str]:
        with open(self.file_path, "rb") as fh:
            for line in io.TextIOWrapper(fh, encoding="utf-8"):
                line = line.rstrip("\n")
                if line:
                    yield line


def read_corpus(paths: Iterable[str]) -> Iterator[str]:
    """Stream every document from a list of archives / jsonl / txt files —
    the input shape overlap.scan_tasks expects for train_texts."""
    reader = Reader()
    for path in paths:
        if path.endswith((".jsonl", ".jsonl.zst", ".json.zst", ".zst")):
            yield from reader.read(path)
        else:
            yield from TextReader(path).read()


def archive_stamp() -> str:
    """UTC timestamp for archive metadata."""
    return datetime.datetime.now(datetime.timezone.utc).isoformat()
