"""From-scratch PDF text extraction with positional layout reconstruction.

Counterpart to `gooselite.pdfgen` (see its docstring for why both sides
are built in-repo).  Scope: text-showing PDFs of the shape a web-scale
text pipeline actually mines — uncompressed or FlateDecode content
streams, Tj / ' / " / TJ show operators, Td/TD/T*/TL/Tm positioning,
literal strings (with all escape forms), hex strings, and the
UTF-16BE-BOM convention for non-latin-1 text.  Layout reconstruction is
positional: every show operation is recorded as a (page, y, x, text)
run; output sorts runs by page, then y descending, then x ascending,
groups same-y runs into one line, joins lines with \n and pages with
\n.  Stream emission order therefore does NOT matter — scrambled
content streams (multi-column layouts, optimizing writers) come back in
reading order.

Totality: `extract_pdf_text` never raises on hostile input — garbage
bytes, truncated files, broken streams, and malformed operators all
degrade to partial or empty output (fuzz-tested in tests/test_pdf.py).
No xref table is consulted: objects are discovered by scanning for
`N G obj ... endobj` spans, which also survives files whose trailers
are truncated mid-flight (common in crawl archives).
"""
from __future__ import annotations

import re
import zlib

_OBJ_RE = re.compile(rb"(\d+)\s+(\d+)\s+obj\b", re.S)
_STREAM_RE = re.compile(rb"stream\r?\n")
_CONTENTS_RE = re.compile(rb"/Contents\s+(?:(\d+)\s+\d+\s+R|\[((?:\s*\d+\s+\d+\s+R)+)\s*\])")
_REF_RE = re.compile(rb"(\d+)\s+\d+\s+R")
_WS = b"\x00\t\n\x0c\r "
_DELIM = b"()<>[]{}/%"

_ESCAPES = {
    ord("n"): b"\n", ord("r"): b"\r", ord("t"): b"\t",
    ord("b"): b"\x08", ord("f"): b"\x0c",
    ord("("): b"(", ord(")"): b")", ord("\\"): b"\\",
}


def _decode_string(raw: bytes) -> str:
    if raw.startswith(b"\xfe\xff"):
        try:
            return raw[2:].decode("utf-16-be", "replace")
        except Exception:
            return ""
    return raw.decode("latin-1")


def _parse_literal(data: bytes, i: int) -> tuple[bytes, int]:
    """Parse a literal string starting at data[i] == '('.  Returns
    (unescaped bytes, index past the closing paren)."""
    out = bytearray()
    depth = 1
    i += 1
    n = len(data)
    while i < n and depth:
        c = data[i]
        if c == 0x5C:  # backslash
            i += 1
            if i >= n:
                break
            e = data[i]
            if e in _ESCAPES:
                out += _ESCAPES[e]
                i += 1
            elif 0x30 <= e <= 0x37:  # octal, up to 3 digits
                oct_digits = bytearray([e])
                i += 1
                while i < n and len(oct_digits) < 3 and 0x30 <= data[i] <= 0x37:
                    oct_digits.append(data[i])
                    i += 1
                out.append(int(oct_digits, 8) & 0xFF)
            elif e in (0x0A, 0x0D):  # line continuation
                i += 1
                if e == 0x0D and i < n and data[i] == 0x0A:
                    i += 1
            else:  # unknown escape: the char stands for itself
                out.append(e)
                i += 1
        elif c == 0x28:
            depth += 1
            out.append(c)
            i += 1
        elif c == 0x29:
            depth -= 1
            if depth:
                out.append(c)
            i += 1
        else:
            out.append(c)
            i += 1
    return bytes(out), i


def _parse_hex(data: bytes, i: int) -> tuple[bytes, int]:
    j = data.find(b">", i + 1)
    if j < 0:
        j = len(data)
    hx = bytes(c for c in data[i + 1 : j] if c not in _WS)
    if len(hx) % 2:
        hx += b"0"
    try:
        return bytes.fromhex(hx.decode("ascii")), j + 1
    except ValueError:
        return b"", j + 1


def _tokens(data: bytes):
    """Yield ('str', bytes) | ('num', float) | ('op', bytes) | markers
    ('[', ']') from a content stream.  Tolerant: skips junk bytes."""
    i, n = 0, len(data)
    while i < n:
        c = data[i]
        if c in _WS:
            i += 1
        elif c == 0x25:  # % comment
            j = data.find(b"\n", i)
            i = n if j < 0 else j + 1
        elif c == 0x28:
            s, i = _parse_literal(data, i)
            yield ("str", s)
        elif c == 0x3C:
            if i + 1 < n and data[i + 1] == 0x3C:  # dict <<
                i += 2
            else:
                s, i = _parse_hex(data, i)
                yield ("str", s)
        elif c == 0x3E:  # stray > or >>
            i += 2 if i + 1 < n and data[i + 1] == 0x3E else 1
        elif c == 0x5B:
            yield ("[", None)
            i += 1
        elif c == 0x5D:
            yield ("]", None)
            i += 1
        elif c == 0x2F:  # name
            j = i + 1
            while j < n and data[j] not in _WS and data[j] not in _DELIM:
                j += 1
            yield ("name", data[i + 1 : j])
            i = j
        elif c in b"+-." or 0x30 <= c <= 0x39:
            j = i + 1
            while j < n and (0x30 <= data[j] <= 0x39 or data[j] in b"+-.eE"):
                j += 1
            try:
                yield ("num", float(data[i:j]))
            except ValueError:
                pass
            i = j
        elif c in b"{}":
            i += 1
        else:  # operator keyword
            j = i
            while j < n and data[j] not in _WS and data[j] not in _DELIM:
                j += 1
            yield ("op", data[i:j])
            i = j if j > i else i + 1


class _TextState:
    __slots__ = ("x", "y", "lx", "ly", "leading", "runs")

    def __init__(self, runs: list):
        self.x = self.y = 0.0    # current point
        self.lx = self.ly = 0.0  # line start
        self.leading = 0.0
        self.runs = runs

    def show(self, raw: bytes) -> None:
        t = _decode_string(raw)
        if t:
            self.runs.append((self.y, self.x, t))
            # advance x so several show-ops on one line keep their order;
            # width metrics are font business — rank-preserving is enough
            self.x += len(t)

    def newline(self) -> None:
        self.lx, self.ly = self.lx, self.ly - self.leading
        self.x, self.y = self.lx, self.ly


def _extract_runs(content: bytes, runs: list) -> None:
    st = _TextState(runs)
    stack: list = []   # operand stack
    in_array: list | None = None
    for kind, val in _tokens(content):
        if kind == "[":
            in_array = []
            continue
        if kind == "]":
            stack.append(in_array or [])
            in_array = None
            continue
        if in_array is not None:
            if kind in ("str", "num"):
                in_array.append((kind, val))
            continue
        if kind in ("str", "num", "name"):
            stack.append((kind, val))
            continue
        op = val
        try:
            if op == b"Tj" and stack and stack[-1][0] == "str":
                st.show(stack[-1][1])
            elif op == b"TJ" and stack and isinstance(stack[-1], list):
                for k, v in stack[-1]:
                    if k == "str":
                        st.show(v)
            elif op == b"'" and stack and stack[-1][0] == "str":
                st.newline()
                st.show(stack[-1][1])
            elif op == b'"' and stack and stack[-1][0] == "str":
                st.newline()
                st.show(stack[-1][1])
            elif op in (b"Td", b"TD") and len(stack) >= 2 \
                    and stack[-1][0] == "num" and stack[-2][0] == "num":
                tx, ty = stack[-2][1], stack[-1][1]
                if op == b"TD":
                    st.leading = -ty
                st.lx += tx
                st.ly += ty
                st.x, st.y = st.lx, st.ly
            elif op == b"Tm" and len(stack) >= 6 \
                    and all(s[0] == "num" for s in stack[-6:]):
                st.lx, st.ly = stack[-2][1], stack[-1][1]
                st.x, st.y = st.lx, st.ly
            elif op == b"TL" and stack and stack[-1][0] == "num":
                st.leading = stack[-1][1]
            elif op == b"T*":
                st.newline()
            elif op == b"BT":
                st.lx = st.ly = st.x = st.y = 0.0
        except Exception:
            pass
        stack.clear()


def _object_spans(data: bytes) -> dict[int, bytes]:
    """num -> object body (between `N G obj` and `endobj`), scan-based.

    A byte run inside an object's (compressed) stream can spell
    "N 0 obj"; such matches start before the enclosing object's span
    ends and are SKIPPED via the position cursor — regardless of whether
    the real definition of N sits earlier or later in the file. Genuine
    top-level redefinitions (incremental-update PDFs) start after the
    previous span and overwrite (last-wins). Salvage-grade by design: a
    stream whose bytes spell "endobj" truncates its own span early (no
    /Length-driven framing without a full xref parse)."""
    out: dict[int, bytes] = {}
    pos = 0
    for m in _OBJ_RE.finditer(data):
        if m.start() < pos:
            continue  # inside the previous object's span (e.g. stream)
        end = data.find(b"endobj", m.end())
        if end < 0:
            end = len(data)
        out[int(m.group(1))] = data[m.end():end]
        pos = end + len(b"endobj")
    return out


def _stream_bytes(body: bytes) -> bytes | None:
    m = _STREAM_RE.search(body)
    if not m:
        return None
    raw = body[m.end():]
    e = raw.rfind(b"endstream")
    if e >= 0:
        raw = raw[:e]
        if raw.endswith(b"\r\n"):
            raw = raw[:-2]
        elif raw.endswith((b"\n", b"\r")):
            raw = raw[:-1]
    if b"/FlateDecode" in body[: m.start()]:
        try:
            return zlib.decompress(raw)
        except zlib.error:
            try:  # truncated stream: salvage the decodable prefix
                return zlib.decompressobj().decompress(raw)
            except zlib.error:
                return None
    return raw


def extract_pdf_text(data: bytes | None, y_quantum: float = 2.0) -> str:
    """Extract reading-order text from `data`.  Total over arbitrary
    bytes; returns '' when nothing text-like is found.

    Runs are grouped into lines by quantized y (|dy| < y_quantum lands
    on one line), lines sorted top-to-bottom, runs left-to-right; pages
    follow /Pages /Kids order when discoverable, else stream order.
    """
    if not data:
        return ""
    try:
        objs = _object_spans(bytes(data))
    except Exception:
        return ""
    page_contents: list[bytes] = []
    page_objs = [(num, body) for num, body in sorted(objs.items())
                 if b"/Type" in body and b"/Page" in body
                 and b"/Pages" not in body]
    for _num, body in page_objs:
        m = _CONTENTS_RE.search(body)
        if not m:
            continue
        refs = [int(m.group(1))] if m.group(1) else \
            [int(r.group(1)) for r in _REF_RE.finditer(m.group(2))]
        merged = bytearray()
        for r in refs:
            if r in objs:
                s = _stream_bytes(objs[r])
                if s:
                    merged += s + b"\n"
        if merged:
            page_contents.append(bytes(merged))
    if not page_contents:  # fallback: any stream that looks like text ops
        for _num, body in sorted(objs.items()):
            s = _stream_bytes(body)
            if s and b"BT" in s:
                page_contents.append(s)
    pages_out: list[str] = []
    for content in page_contents:
        runs: list = []
        try:
            _extract_runs(content, runs)
        except Exception:
            pass
        if not runs:
            continue
        lines: dict[int, list] = {}
        for y, x, t in runs:
            key = round(y / y_quantum)
            lines.setdefault(key, []).append((x, t))
        ordered = []
        for key in sorted(lines, reverse=True):
            ordered.append("".join(t for _x, t in sorted(
                lines[key], key=lambda r: r[0])))
        pages_out.append("\n".join(ordered))
    return "\n".join(p for p in pages_out if p)
