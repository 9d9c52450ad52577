"""From-scratch AVI (RIFF) video container: writer + frame-sampling
reader, pure stdlib.

The video counterpart of `gooselite.wav` (RIFF audio) and
`gooselite.png` (image codec): a multimodal table's video column needs
container-level plumbing — chunk framing, stream headers, frame
enumeration, every-k-th frame sampling — before any codec runs.  The
container here is real AVI: ``RIFF('AVI ' LIST('hdrl' avih
LIST('strl' strh strf)) LIST('movi' 00dc...) idx1)`` with word-aligned
chunks; the per-frame payload is a real PNG (``biCompression='MPNG'``),
decoded by the from-scratch `gooselite.png` codec — so frame-sampling
plus decode is real end-to-end, with no image/video library on the box.

`read_avi` walks nested LISTs generically and skips unknown chunks
(JUNK, idx1, odd-size pad bytes), so it accepts container variation,
not just this writer's output.  `read_avi_safe` is total over hostile
bytes (fuzz-verified in tests/test_avi.py).
"""
from __future__ import annotations

import struct
from typing import List, NamedTuple, Optional


class AviData(NamedTuple):
    width: int
    height: int
    fps: int
    frames: List[bytes]  # raw per-frame payloads ('00dc' chunk bodies)


def _chunk(fourcc: bytes, payload: bytes) -> bytes:
    out = fourcc + struct.pack("<I", len(payload)) + payload
    if len(payload) % 2:
        out += b"\x00"  # RIFF word alignment
    return out


def _list(list_type: bytes, payload: bytes) -> bytes:
    return _chunk(b"LIST", list_type + payload)


def write_avi(frames: List[bytes], width: int, height: int,
              fps: int = 25, extra_chunks: bool = False) -> bytes:
    """Serialize per-frame payloads as a single-video-stream AVI."""
    if fps <= 0 or width <= 0 or height <= 0:
        raise ValueError("bad geometry")
    usec_per_frame = 1_000_000 // fps
    max_bytes = max((len(f) for f in frames), default=0)
    avih = struct.pack("<14I", usec_per_frame, max_bytes * fps, 0, 0x10,
                       len(frames), 0, 1, max_bytes, width, height, 0, 0, 0, 0)
    strh = (b"vids" + b"MPNG" + struct.pack("<IHHIIIIIIIII", 0, 0, 0, 0,
                                            1, fps, 0, len(frames),
                                            max_bytes, 0, 0, 0)
            + struct.pack("<4H", 0, 0, width, height))
    # BITMAPINFOHEADER with a PNG-in-AVI codec tag
    strf = struct.pack("<IiiHH4sIiiII", 40, width, height, 1, 8, b"MPNG",
                       width * height, 0, 0, 0, 0)
    hdrl = _list(b"hdrl", _chunk(b"avih", avih)
                 + _list(b"strl", _chunk(b"strh", strh) + _chunk(b"strf", strf)))
    movi_body = b""
    offsets = []
    for f in frames:
        offsets.append(4 + len(movi_body))  # offset from 'movi' fourcc
        movi_body += _chunk(b"00dc", f)
    movi = _list(b"movi", movi_body)
    idx1 = _chunk(b"idx1", b"".join(
        b"00dc" + struct.pack("<III", 0x10, off, len(f))
        for off, f in zip(offsets, frames)))
    body = b"AVI " + hdrl
    if extra_chunks:
        body += _chunk(b"JUNK", b"\x00" * 13)  # odd size: pad-byte path
    body += movi + idx1
    return b"RIFF" + struct.pack("<I", len(body)) + body


def _walk(b: bytes, pos: int, end: int, out: dict) -> None:
    """Iteratively walk chunks in [pos, end), recursing into LISTs."""
    while pos + 8 <= end:
        fourcc = b[pos:pos + 4]
        size = struct.unpack_from("<I", b, pos + 4)[0]
        body_at = pos + 8
        if body_at + size > end:
            raise ValueError(f"truncated chunk {fourcc!r}")
        if fourcc == b"LIST":
            if size < 4:
                raise ValueError("LIST too small")
            _walk(b, body_at + 4, body_at + size, out)
        elif fourcc == b"avih":
            if size < 56:
                raise ValueError("avih too small")
            out["avih"] = struct.unpack_from("<14I", b, body_at)
        elif fourcc == b"00dc":
            out.setdefault("frames", []).append(b[body_at:body_at + size])
        pos = body_at + size + (size % 2)


def read_avi(b: bytes) -> AviData:
    """Parse an AVI byte string; raises ValueError on violations."""
    if len(b) < 12 or b[:4] != b"RIFF" or b[8:12] != b"AVI ":
        raise ValueError("not a RIFF/AVI stream")
    riff_size = struct.unpack_from("<I", b, 4)[0]
    end = min(len(b), 8 + riff_size)
    out: dict = {}
    _walk(b, 12, end, out)
    if "avih" not in out:
        raise ValueError("missing avih header")
    a = out["avih"]
    usec, n_frames, width, height = a[0], a[4], a[8], a[9]
    frames = out.get("frames", [])
    if n_frames != len(frames):
        raise ValueError(f"avih declares {n_frames} frames, found {len(frames)}")
    if usec <= 0:
        raise ValueError("bad frame rate")
    return AviData(width, height, 1_000_000 // usec, frames)


def sample_frames(avi: AviData, every: int) -> List[bytes]:
    """Every-k-th frame-sampling (the task brief's video operation):
    frames 0, k, 2k, ... of the decoded container."""
    if every <= 0:
        raise ValueError("every must be positive")
    return avi.frames[::every]


def read_avi_safe(b) -> Optional[AviData]:
    """Total parse: None on anything that is not a well-formed AVI."""
    try:
        if not isinstance(b, (bytes, bytearray)):
            return None
        return read_avi(bytes(b))
    except Exception:
        return None
