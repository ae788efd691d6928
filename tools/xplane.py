"""Minimal XSpace/XPlane protobuf reader (no tensorflow dependency).

Parses the .xplane.pb written by jax.profiler and prints per-op device time
(the relayed axon backend writes device planes tensorboard can't be
installed to read here).

Usage: python tools/xplane.py <path/to/*.xplane.pb> [line-name-filter]
"""

from __future__ import annotations

import collections
import re
import sys
from typing import Dict, Iterator, Tuple


def _varint(buf: bytes, i: int) -> Tuple[int, int]:
    shift = 0
    val = 0
    while True:
        b = buf[i]
        val |= (b & 0x7F) << shift
        i += 1
        if not b & 0x80:
            return val, i
        shift += 7


def fields(buf: bytes) -> Iterator[Tuple[int, int, bytes | int]]:
    """Yield (field_number, wire_type, value) for one message."""
    i = 0
    n = len(buf)
    while i < n:
        tag, i = _varint(buf, i)
        fnum, wt = tag >> 3, tag & 7
        if wt == 0:
            val, i = _varint(buf, i)
        elif wt == 2:
            ln, i = _varint(buf, i)
            val = buf[i:i + ln]
            i += ln
        elif wt == 5:
            val = int.from_bytes(buf[i:i + 4], "little")
            i += 4
        elif wt == 1:
            val = int.from_bytes(buf[i:i + 8], "little")
            i += 8
        else:
            raise ValueError(f"wire type {wt}")
        yield fnum, wt, val


def parse_plane(buf: bytes):
    name = ""
    lines = []
    meta: Dict[int, str] = {}
    for fnum, wt, val in fields(buf):
        if fnum == 2 and wt == 2:
            name = val.decode(errors="replace")
        elif fnum == 3 and wt == 2:
            lines.append(val)
        elif fnum == 4 and wt == 2:  # map entry: key=1, value=2 (XEventMetadata)
            k = None
            m = None
            for f2, w2, v2 in fields(val):
                if f2 == 1:
                    k = v2
                elif f2 == 2 and w2 == 2:
                    m = v2
            if k is not None and m is not None:
                mname = ""
                for f3, w3, v3 in fields(m):
                    if f3 == 2 and w3 == 2:
                        mname = v3.decode(errors="replace")
                meta[k] = mname
    return name, lines, meta


def parse_line(buf: bytes):
    name = ""
    events = []
    for fnum, wt, val in fields(buf):
        if fnum == 2 and wt == 2:
            name = val.decode(errors="replace")
        elif fnum == 11 and wt == 2:
            name = val.decode(errors="replace") or name
        elif fnum == 4 and wt == 2:
            events.append(val)
    return name, events


def parse_event(buf: bytes):
    mid = dur = 0
    for fnum, wt, val in fields(buf):
        if fnum == 1 and wt == 0:
            mid = val
        elif fnum == 3 and wt == 0:
            dur = val
    return mid, dur


def summarize(path: str, line_filter: str = ""):
    data = open(path, "rb").read()
    for fnum, wt, val in fields(data):
        if fnum != 1 or wt != 2:
            continue
        pname, lines, meta = parse_plane(val)
        for lbuf in lines:
            lname, events = parse_line(lbuf)
            if line_filter and line_filter.lower() not in (
                    pname + "/" + lname).lower():
                continue
            agg = collections.defaultdict(int)
            cnt = collections.defaultdict(int)
            for ebuf in events:
                mid, dur = parse_event(ebuf)
                agg[meta.get(mid, f"#{mid}")] += dur
                cnt[meta.get(mid, f"#{mid}")] += 1
            if not agg:
                continue
            total = sum(agg.values())
            print(f"\n== plane '{pname}' line '{lname}' "
                  f"({len(events)} events, {total/1e9:.3f} ms total)")
            for name, dur in sorted(agg.items(), key=lambda kv: -kv[1])[:20]:
                print(f"  {dur/1e9:9.3f} ms  x{cnt[name]:5d}  {name[:80]}")


def _canon(name: str) -> str:
    """Canonical op family: strip the %/instance suffixes so the same op
    repeated across layers/steps aggregates into one row.

    '%owq_fused_gemv_3b.1502 = bf16[8,22016]...' -> 'owq_fused_gemv_3b bf16[8,22016]'
    """
    head = name.lstrip("%")
    shape = ""
    if " = " in head:
        lhs, rhs = head.split(" = ", 1)
        head = lhs
        shape = rhs.split("{", 1)[0]
    head = re.sub(r"\.\d+$", "", head)
    head = re.sub(r"\d+$", "", head)
    return (head + " " + shape).strip()


def group(path: str, line_filter: str = "XLA Ops", top: int = 40):
    """Like summarize, but aggregated by canonical op family — the per-op
    device-time budget behind PARITY.md's residual table."""
    data = open(path, "rb").read()
    for fnum, wt, val in fields(data):
        if fnum != 1 or wt != 2:
            continue
        pname, lines, meta = parse_plane(val)
        for lbuf in lines:
            lname, events = parse_line(lbuf)
            if line_filter and line_filter.lower() not in (
                    pname + "/" + lname).lower():
                continue
            agg = collections.defaultdict(int)
            cnt = collections.defaultdict(int)
            for ebuf in events:
                mid, dur = parse_event(ebuf)
                name = _canon(meta.get(mid, f"#{mid}"))
                agg[name] += dur
                cnt[name] += 1
            if not agg:
                continue
            total = sum(agg.values())
            print(f"\n== plane '{pname}' line '{lname}' grouped "
                  f"({len(events)} events, {total/1e9:.3f} ms total)")
            for name, dur in sorted(agg.items(), key=lambda kv: -kv[1])[:top]:
                print(f"  {dur/1e9:9.3f} ms  x{cnt[name]:6d}  {name[:90]}")


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "--group":
        group(sys.argv[2], sys.argv[3] if len(sys.argv) > 3 else "XLA Ops")
    else:
        summarize(sys.argv[1], sys.argv[2] if len(sys.argv) > 2 else "")
