"""Charset detection/decode (SURVEY.md A2) as a driver-visible probe.

The A2 stage (gooselite/encoding.py: BOM sniff → declared ``<meta
charset>`` → utf-8 → latin-1 fallback chain) runs inside the extraction
UDF and was previously pinned only by the L1 golden suite; this probe
gates it directly against a DuckDB oracle.  Each document's bytes are
constructed in one of four deterministic encodings keyed on doc_id
(plain utf-8, utf-8 BOM, meta-declared iso-8859-1, utf-16-le BOM — the
corpus text is pure ASCII at every SF, so every variant encodes
losslessly), decoded by ``decode_html``, and the probe emits the
detected-encoding label plus the md5 of the decoded string.  The oracle
recomputes both from the shared construction rules — hash match ⇔ BOM
sniffing, meta sniffing, and each decode path are exact (including
utf-8-sig stripping its BOM while utf-16-le keeps U+FEFF, per Python
codec semantics the pipeline relies on).

Scale shape: one linear mapInPandas pass, no shuffle.
"""
from __future__ import annotations

import codecs
import hashlib
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession

from goose_spark.queries import load

_HEAD_PLAIN = "<html><body>"
_HEAD_META = '<html><head><meta charset="iso-8859-1"></head><body>'


def _encode_variant(doc_id: int, text: str) -> bytes:
    v = doc_id % 4
    if v == 0:
        return (_HEAD_PLAIN + text).encode("utf-8")
    if v == 1:
        return codecs.BOM_UTF8 + (_HEAD_PLAIN + text).encode("utf-8")
    if v == 2:
        return (_HEAD_META + text).encode("iso-8859-1")
    return codecs.BOM_UTF16_LE + (_HEAD_PLAIN + text).encode("utf-16-le")


def _decode_batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    from gooselite.encoding import decode_html

    for batch in it:
        rows = {"doc_id": [], "enc": [], "text_md5": []}
        for doc_id, text in zip(batch["doc_id"], batch["text"]):
            d = int(doc_id)
            decoded, enc = decode_html(_encode_variant(d, text or ""))
            rows["doc_id"].append(d)
            rows["enc"].append(enc)
            rows["text_md5"].append(
                hashlib.md5(decoded.encode("utf-8")).hexdigest())
        rows["doc_id"] = pd.Series(rows["doc_id"], dtype="int64")
        yield pd.DataFrame(rows)


def q_charset_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A2 charset chain over four deterministic byte encodings; one
    shuffle-free mapInPandas pass."""
    d = load(spark, sf_dir, "documents").select("doc_id", "text")
    return d.mapInPandas(
        _decode_batches, schema="doc_id long, enc string, text_md5 string")


ORACLE_CHARSET_DECODE = f"""
SELECT doc_id,
       CASE doc_id % 4 WHEN 0 THEN 'utf-8'
                       WHEN 1 THEN 'utf-8-sig'
                       WHEN 2 THEN 'iso-8859-1'
                       ELSE 'utf-16-le' END AS enc,
       md5(CASE doc_id % 4
             WHEN 2 THEN '{_HEAD_META}' || text
             WHEN 3 THEN chr(65279) || '{_HEAD_PLAIN}' || text
             ELSE '{_HEAD_PLAIN}' || text END) AS text_md5
FROM documents
"""


# ---------------------------------------------------- NFC normalization --
# Unicode canonical normalization (NFC) — the text-cleanup step every
# multilingual corpus runs before hashing/dedup, since the SAME visible
# string arrives from the web in composed and decomposed forms and would
# otherwise defeat exact dedup and fingerprinting. The ASCII corpus is
# decorated with one of four deterministic suffixes per doc_id: a
# composing pair (e + U+0301), a canonical-REORDER case (o + U+0301 +
# U+0323 — acute (ccc 230) arrives BEFORE dot-below (ccc 220), out of
# canonical order, so NFC must sort the marks and then compose
# o+dot-below to U+1ECD), an already-NFC string (U+00E9 — must pass through
# unchanged), and a ring pair (A + U+030A). NFC itself is a pandas UDF
# (Python unicodedata) — Spark has no normalization builtin — and the
# oracle is DuckDB's independent utf8proc-backed nfc_normalize(), so a
# hash match cross-checks two unrelated NFC implementations.
_NFC_SYNTH = (
    "concat(text, ' nfc:',"
    " CASE CAST(doc_id % 4 AS INT)"
    "  WHEN 0 THEN 'é mark'"
    "  WHEN 1 THEN 'ọ́ reorder'"
    "  WHEN 2 THEN 'é stable'"
    "  ELSE 'Å ring' END)"
)


def q_unicode_nfc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NFC normalization probe: codepoint counts before/after, changed
    flag, md5 of the normalized text. Scale shape: scan -> project with
    ONE Arrow-batched UDF evaluation (ExtractPythonUDFs dedups the
    repeated reference into a single ArrowEvalPython node — asserted in
    tests/test_plans.py), zero shuffles."""
    from pyspark.sql import functions as F
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("string")
    def _nfc(s: pd.Series) -> pd.Series:
        import unicodedata

        return s.map(lambda x: unicodedata.normalize("NFC", x))

    d = load(spark, sf_dir, "documents")
    raw = F.expr(_NFC_SYNTH)
    nfc = _nfc(raw)
    return d.select(
        "doc_id",
        F.length(raw).cast("long").alias("n_cp_raw"),
        F.length(nfc).cast("long").alias("n_cp_nfc"),
        (raw != nfc).alias("changed"),
        F.md5(nfc.cast("binary")).alias("nfc_md5"),
    )


ORACLE_UNICODE_NFC = f"""
WITH t AS (SELECT doc_id, {_NFC_SYNTH} AS raw FROM documents),
n AS (SELECT doc_id, raw, nfc_normalize(raw) AS nfc FROM t)
SELECT doc_id,
       CAST(length(raw) AS BIGINT) AS n_cp_raw,
       CAST(length(nfc) AS BIGINT) AS n_cp_nfc,
       raw != nfc AS changed,
       md5(nfc) AS nfc_md5
FROM n
"""


# ----------------------------------------------------- mojibake repair --
# The ftfy-class cleanup every web corpus needs: text that was utf-8 on
# the wire but got decoded as latin-1 somewhere upstream ("café" →
# "cafÃ©") must be detected and repaired before dedup/quality scoring
# (mojibake defeats exact dedup the same way NFC drift does). The
# corruption is synthesized JVM-side with the REAL byte mechanics —
# decode(encode(s,'UTF-8'),'ISO-8859-1'), pure codegen, no fixture —
# over three decoration arms (latin-1-range accents / CJK multi-byte /
# pure-ascii no-op, all live at grading scale); the repair UDF inverts
# it (latin-1 re-encode → utf-8 decode, falling back to the input when
# the bytes are not valid utf-8, i.e. text that was never mojibake).
# The DuckDB oracle never performs either step: it derives every output
# closed-form from the decorated string (mojibake codepoint count ==
# the decorated string's utf-8 BYTE count; repaired md5 == the
# decorated string's md5; the flag == "decoration has non-ascii
# bytes"), so a hash match proves corrupt+repair is the exact identity
# through two independent routes.
#
# Scale shape: scan → project, ONE Arrow-batched UDF evaluation, zero
# shuffles — same plan as q_unicode_nfc.
_MOJI_SYNTH = (
    "concat(text, CASE WHEN doc_id % 3 = 0 THEN ' café señor'"
    " WHEN doc_id % 3 = 1 THEN ' 漢字テスト' ELSE '' END)"
)


def q_mojibake_repair(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("string")
    def _repair(s: pd.Series) -> pd.Series:
        def fix(x):
            try:
                return x.encode("latin-1").decode("utf-8")
            except (UnicodeEncodeError, UnicodeDecodeError):
                return x

        return s.map(fix)

    d = load(spark, sf_dir, "documents")
    decorated = F.expr(_MOJI_SYNTH)
    moji = F.decode(F.encode(decorated, "UTF-8"), "ISO-8859-1")
    return d.select(
        "doc_id",
        F.length(moji).cast("long").alias("n_cp_moji"),
        (moji != decorated).alias("was_mojibake"),
        F.md5(_repair(moji).cast("binary")).alias("repaired_md5"),
    )


ORACLE_MOJIBAKE_REPAIR = f"""
WITH t AS (SELECT doc_id, {_MOJI_SYNTH} AS decorated FROM documents)
SELECT doc_id,
       CAST(octet_length(encode(decorated)) AS BIGINT) AS n_cp_moji,
       octet_length(encode(decorated)) <> length(decorated)
           AS was_mojibake,
       md5(decorated) AS repaired_md5
FROM t
"""
