"""From-scratch PNG codec (8-bit grayscale), pure stdlib.

Replaces the round-1/2 multimodal *stub*: the Spark image probe
(`goose_spark.imageops.q_image_decode`) now runs a REAL decoder —
chunk parsing with CRC verification, zlib inflate, and full scanline
unfiltering (None / Sub / Up / Average / Paeth) — not a fake.  Scope is
deliberately the slice a sandbox with no image libraries can verify
end-to-end: 8-bit grayscale, non-interlaced (the encoder below emits
exactly that, cycling every filter type so decode unfiltering is
load-bearing).  Other color types / bit depths / interlacing raise
`UnsupportedImage` — a real deployment swaps this module for
PIL/libpng; the Spark-side plumbing (binary column, Arrow batches,
schema) is identical either way.

Totality contract for the pipeline: `read_png_safe` never raises —
garbage, truncated chunks, bad CRCs, and broken deflate streams all
return None (fuzz-tested in tests/test_png.py).
"""
from __future__ import annotations

import struct
import zlib

_SIG = b"\x89PNG\r\n\x1a\n"


class UnsupportedImage(ValueError):
    """Valid PNG, but outside this codec's scope (color type, depth, …)."""


def _chunk(tag: bytes, payload: bytes) -> bytes:
    return (struct.pack(">I", len(payload)) + tag + payload
            + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF))


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    if pb <= pc:
        return b
    return c


def _filter_row(ftype: int, row: bytes, prev: bytes) -> bytes:
    if ftype == 0:
        return row
    out = bytearray(len(row))
    for i, x in enumerate(row):
        a = row[i - 1] if i else 0
        b = prev[i]
        c = prev[i - 1] if i else 0
        if ftype == 1:
            out[i] = (x - a) & 0xFF
        elif ftype == 2:
            out[i] = (x - b) & 0xFF
        elif ftype == 3:
            out[i] = (x - (a + b) // 2) & 0xFF
        else:
            out[i] = (x - _paeth(a, b, c)) & 0xFF
    return bytes(out)


def _unfilter_row(ftype: int, row: bytearray, prev: bytes) -> bytearray:
    if ftype == 0:
        return row
    for i in range(len(row)):
        a = row[i - 1] if i else 0
        b = prev[i]
        c = prev[i - 1] if i else 0
        if ftype == 1:
            row[i] = (row[i] + a) & 0xFF
        elif ftype == 2:
            row[i] = (row[i] + b) & 0xFF
        elif ftype == 3:
            row[i] = (row[i] + (a + b) // 2) & 0xFF
        elif ftype == 4:
            row[i] = (row[i] + _paeth(a, b, c)) & 0xFF
        else:
            raise UnsupportedImage(f"unknown filter type {ftype}")
    return row


def write_png_gray(rows: list[bytes], filters: list[int] | None = None) -> bytes:
    """Encode 8-bit grayscale rows (all equal width) as a PNG.  `filters`
    gives the per-row filter type (0–4), default cycles 0,1,2,3,4 so
    every decode path is exercised."""
    h = len(rows)
    w = len(rows[0]) if h else 0
    if any(len(r) != w for r in rows):
        raise ValueError("ragged rows")
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 0, 0, 0, 0)  # gray, 8-bit
    raw = bytearray()
    prev = bytes(w)
    for i, row in enumerate(rows):
        f = filters[i % len(filters)] if filters else i % 5
        raw.append(f)
        raw += _filter_row(f, row, prev)
        prev = row
    return (_SIG + _chunk(b"IHDR", ihdr)
            + _chunk(b"IDAT", zlib.compress(bytes(raw)))
            + _chunk(b"IEND", b""))


def read_png(data: bytes) -> tuple[int, int, list[bytes]]:
    """Decode a PNG produced by any conformant encoder, within scope
    (8-bit grayscale, non-interlaced).  Raises ValueError on corruption
    (bad signature / CRC / deflate / geometry), UnsupportedImage on
    out-of-scope but valid files."""
    if not data or not data.startswith(_SIG):
        raise ValueError("not a PNG")
    pos = len(_SIG)
    w = h = -1
    idat = bytearray()
    seen_ihdr = False
    while pos + 8 <= len(data):
        length, tag = struct.unpack(">I4s", data[pos : pos + 8])
        payload = data[pos + 8 : pos + 8 + length]
        if len(payload) != length or pos + 12 + length > len(data):
            raise ValueError("truncated chunk")
        (crc,) = struct.unpack(">I", data[pos + 8 + length : pos + 12 + length])
        if crc != (zlib.crc32(tag + payload) & 0xFFFFFFFF):
            raise ValueError(f"CRC mismatch in {tag!r}")
        pos += 12 + length
        if tag == b"IHDR":
            w, h, depth, color, comp, filt, interlace = struct.unpack(
                ">IIBBBBB", payload)
            if depth != 8 or color != 0:
                raise UnsupportedImage(f"depth={depth} color={color}")
            if interlace:
                raise UnsupportedImage("interlaced")
            if comp or filt:
                raise ValueError("bad IHDR compression/filter method")
            seen_ihdr = True
        elif tag == b"IDAT":
            idat += payload
        elif tag == b"IEND":
            break
    if not seen_ihdr or w < 0:
        raise ValueError("missing IHDR")
    try:
        raw = zlib.decompress(bytes(idat))
    except zlib.error as e:
        raise ValueError(f"bad deflate stream: {e}") from None
    if len(raw) != (w + 1) * h:
        raise ValueError("scanline geometry mismatch")
    rows: list[bytes] = []
    prev = bytes(w)
    for r in range(h):
        off = r * (w + 1)
        cur = _unfilter_row(raw[off], bytearray(raw[off + 1 : off + w + 1]),
                            prev)
        prev = bytes(cur)
        rows.append(prev)
    return w, h, rows


def read_png_safe(data: bytes | None) -> tuple[int, int, list[bytes]] | None:
    """Totalized read_png for pipeline use: None on anything unreadable."""
    if not data:
        return None
    try:
        return read_png(bytes(data))
    except (ValueError, UnsupportedImage, struct.error):
        return None
