"""Deterministic minimal PDF generator (pure stdlib).

Why this exists: the north rule's extraction tier includes "PDF/layout
parse" alongside HTML boilerplate strip.  No PDF library ships in this
sandbox, so both sides are built from scratch: this module RENDERS a
page of text as a small but structurally honest PDF (xref table with
correct byte offsets, FlateDecode-compressed content streams, Tj / TJ /
hex-string show operators, absolute Tm positioning), and
`gooselite.pdftext` parses it back.  The Spark probe (`q_pdf_extract`)
round-trips `documents.text` through both and checks the result against
a plain SQL oracle — so the DuckDB hash gate validates the parser
end-to-end without any external PDF corpus.

The generator deliberately VARIES its encoding choices per line
(literal string / TJ array with kerning / hex string, chosen by line
index) and optionally emits lines in a deterministically scrambled
stream order with correct absolute positions (`scramble=True`), so the
extractor's layout reconstruction (sort runs by page, then y desc, then
x) is load-bearing, not decorative.  Non-latin-1 lines are emitted as
UTF-16BE hex strings with a BOM — a documented convention of this
generator (real-world PDFs map glyphs through font encodings; parsing
arbitrary wild PDFs is out of scope, stated in SURVEY.md §2.8).
"""
from __future__ import annotations

import zlib

PAGE_W = 612
PAGE_H = 792
MARGIN_X = 72
TOP_Y = 720
LEADING = 14
FONT_SIZE = 12


def _wrap(text: str, width: int) -> list[str]:
    """Greedy word wrap; deterministic, never splits a word."""
    lines: list[str] = []
    for para in text.split("\n"):
        words = para.split()
        if not words:
            lines.append("")
            continue
        cur = words[0]
        for w in words[1:]:
            if len(cur) + 1 + len(w) <= width:
                cur += " " + w
            else:
                lines.append(cur)
                cur = w
        lines.append(cur)
    return lines


def _esc_literal(s: str) -> bytes:
    b = s.encode("latin-1")
    return (b.replace(b"\\", b"\\\\").replace(b"(", b"\\(")
             .replace(b")", b"\\)"))


def _show_op(line: str, idx: int) -> bytes:
    """One text-showing operator for `line`, style chosen by line index."""
    try:
        line.encode("latin-1")
        latin1_ok = True
    except UnicodeEncodeError:
        latin1_ok = False
    if not latin1_ok:
        # generator convention: UTF-16BE hex string with BOM
        payload = b"\xfe\xff" + line.encode("utf-16-be")
        return b"<" + payload.hex().encode("ascii") + b"> Tj"
    style = idx % 3
    if style == 0:
        return b"(" + _esc_literal(line) + b") Tj"
    if style == 1:
        # TJ array: split at a space kept INSIDE the left chunk, with a
        # kerning adjustment between chunks (concatenation-safe)
        cut = line.find(" ", 1)
        if cut < 0 or cut + 1 >= len(line):
            return b"(" + _esc_literal(line) + b") Tj"
        left, right = line[: cut + 1], line[cut + 1 :]
        return (b"[(" + _esc_literal(left) + b") -250 ("
                + _esc_literal(right) + b")] TJ")
    return b"<" + line.encode("latin-1").hex().encode("ascii") + b"> Tj"


def text_to_pdf(text: str, wrap: int = 72, lines_per_page: int = 40,
                scramble: bool = False, compress_all: bool = False) -> bytes:
    """Render `text` as a multi-page PDF.

    Every line is positioned ABSOLUTELY via Tm (no Td chains), so stream
    emission order is free: with scramble=True the lines of each page
    are emitted in a deterministic interleave (evens first, then odds,
    each reversed) and only the extractor's positional sort can restore
    reading order.  Content streams on even pages are FlateDecode-
    compressed, odd pages raw (both paths exercised; compress_all=True
    forces compression everywhere, the realistic large-scale shape).
    """
    lines = _wrap(text, wrap)
    pages = [lines[i : i + lines_per_page]
             for i in range(0, len(lines), lines_per_page)] or [[]]

    objects: list[bytes] = []  # 1-indexed body objects, in object-number order

    def _content(page_lines: list[str], page_no: int) -> bytes:
        order = list(range(len(page_lines)))
        if scramble:
            ev = [i for i in order if i % 2 == 0]
            od = [i for i in order if i % 2 == 1]
            order = list(reversed(ev)) + list(reversed(od))
        ops = [b"BT", b"/F1 %d Tf" % FONT_SIZE]
        for i in order:
            if not page_lines[i]:
                continue
            y = TOP_Y - i * LEADING
            ops.append(b"1 0 0 1 %d %d Tm" % (MARGIN_X, y))
            ops.append(_show_op(page_lines[i], i))
        ops.append(b"ET")
        raw = b"\n".join(ops)
        if compress_all or page_no % 2 == 0:
            data = zlib.compress(raw)
            head = b"<< /Length %d /Filter /FlateDecode >>" % len(data)
        else:
            data = raw
            head = b"<< /Length %d >>" % len(data)
        return head + b"\nstream\n" + data + b"\nendstream"

    # object numbering: 1 Catalog, 2 Pages, 3 Font, then per page i:
    # (4+2i) Page, (5+2i) its content stream
    n_pages = len(pages)
    kids = b" ".join(b"%d 0 R" % (4 + 2 * i) for i in range(n_pages))
    objects.append(b"<< /Type /Catalog /Pages 2 0 R >>")
    objects.append(b"<< /Type /Pages /Kids [" + kids + b"] /Count %d >>"
                   % n_pages)
    objects.append(b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica "
                   b"/Encoding /WinAnsiEncoding >>")
    for i, page_lines in enumerate(pages):
        objects.append(
            b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 %d %d] "
            b"/Resources << /Font << /F1 3 0 R >> >> /Contents %d 0 R >>"
            % (PAGE_W, PAGE_H, 5 + 2 * i))
        objects.append(_content(page_lines, i))

    out = bytearray(b"%PDF-1.4\n%\xe2\xe3\xcf\xd3\n")
    offsets = [0]  # object 0 is the free head
    for num, body in enumerate(objects, start=1):
        offsets.append(len(out))
        out += b"%d 0 obj\n" % num + body + b"\nendobj\n"
    xref_at = len(out)
    out += b"xref\n0 %d\n" % (len(objects) + 1)
    out += b"0000000000 65535 f \n"
    for off in offsets[1:]:
        out += b"%010d 00000 n \n" % off
    out += (b"trailer\n<< /Size %d /Root 1 0 R >>\nstartxref\n%d\n%%%%EOF\n"
            % (len(objects) + 1, xref_at))
    return bytes(out)
