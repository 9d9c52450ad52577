"""Charset detection + decode: bytes → str (SURVEY.md A2).

[canon: goose/utils/encoding.py] — BOM sniff, ``<meta charset>`` /
``http-equiv`` sniff over the head bytes, then a fallback chain
(declared → utf-8 → charset_normalizer (optional) → latin-1).
latin-1 never fails, so :class:`DecodeError` is effectively reserved for
empty input; the status plumbing still carries it (FIXTURES.md §2).
"""

from __future__ import annotations

import codecs
import re

try:  # optional — installed in this environment (SURVEY.md §0.4)
    from charset_normalizer import from_bytes as _cn_from_bytes
except Exception:  # pragma: no cover - absence path
    _cn_from_bytes = None

_SNIFF_LIMIT = 2048
_META_CHARSET_RE = re.compile(rb"""<meta[^>]+charset\s*=\s*["']?\s*([a-zA-Z0-9_\-]+)""", re.I)
_BOMS = (
    (codecs.BOM_UTF8, "utf-8-sig"),
    (codecs.BOM_UTF16_LE, "utf-16-le"),
    (codecs.BOM_UTF16_BE, "utf-16-be"),
)


class DecodeError(Exception):
    pass


def sniff_declared_charset(raw: bytes) -> str | None:
    m = _META_CHARSET_RE.search(raw[:_SNIFF_LIMIT])
    if m:
        return m.group(1).decode("ascii", "replace").lower()
    return None


def decode_html(raw: bytes) -> tuple[str, str]:
    """Decode html bytes; returns (text, encoding_used).

    Raises DecodeError only for empty / None input.
    """
    if not raw:
        raise DecodeError("empty html bytes")
    for bom, enc in _BOMS:
        if raw.startswith(bom):
            return raw.decode(enc, errors="replace"), enc
    declared = sniff_declared_charset(raw)
    if declared:
        try:
            return raw.decode(declared), declared
        except (LookupError, UnicodeDecodeError):
            pass
    try:
        return raw.decode("utf-8"), "utf-8"
    except UnicodeDecodeError:
        pass
    if _cn_from_bytes is not None:
        best = _cn_from_bytes(raw).best()
        if best is not None and best.encoding:
            try:
                return raw.decode(best.encoding, errors="replace"), best.encoding
            except LookupError:
                pass
    return raw.decode("latin-1", errors="replace"), "latin-1"
