"""PDF generator + layout-parsing extractor (gooselite.pdfgen /
gooselite.pdftext) and the Spark round-trip probe (goose_spark.pdfops).

Levels mirror the repo's test strategy (SURVEY.md §5): byte-level unit
goldens on the pure-Python core, hostile-input totality (hypothesis
fuzz), then Spark plan shape.  Cross-engine value equality vs DuckDB is
covered by tests/test_relational_probes.py::q_pdf_extract."""

import zlib

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from gooselite.pdfgen import text_to_pdf
from gooselite.pdftext import extract_pdf_text


def norm(s: str) -> str:
    return " ".join(s.split())


def test_roundtrip_exact_lines():
    """Unscrambled single page: line structure survives exactly (not just
    whitespace-normalized) — wrap points become newlines."""
    text = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    out = extract_pdf_text(text_to_pdf(text, wrap=25))
    assert out == "alpha beta gamma delta\nepsilon zeta eta theta\niota kappa"


def test_roundtrip_multipage_and_both_compressions():
    text = " ".join(f"w{i}" for i in range(400))
    pdf = text_to_pdf(text, wrap=30, lines_per_page=10)
    # multi-page: >1 page object, and both raw + Flate streams present
    assert pdf.count(b"/Type /Page /Parent") > 1
    assert b"/FlateDecode" in pdf
    assert b"BT" in pdf  # at least one raw (odd) page readable in the clear
    assert norm(extract_pdf_text(pdf)) == norm(text)


def test_scrambled_stream_order_reconstructed():
    """Layout reconstruction is load-bearing: the scrambled PDF's content
    stream emits lines out of order; only the positional sort restores
    reading order."""
    text = " ".join(f"token{i:03d}" for i in range(120))
    plain = text_to_pdf(text, wrap=40, lines_per_page=8)
    scram = text_to_pdf(text, wrap=40, lines_per_page=8, scramble=True,
                        compress_all=True)
    assert plain != scram
    assert extract_pdf_text(scram) == extract_pdf_text(plain)
    assert norm(extract_pdf_text(scram)) == norm(text)


def test_escapes_hex_and_unicode():
    text = "par(en) close) back\\slash oct\tab élan naïve\n中文 テキスト mixed"
    out = extract_pdf_text(text_to_pdf(text))
    assert norm(out) == norm(text)


def test_literal_string_escape_forms_direct():
    """Hand-built content stream: octal escapes, line continuation,
    nested parens, unknown escapes."""
    content = (b"BT /F1 12 Tf 1 0 0 1 72 700 Tm "
               b"(A\\101 \\(x\\) (nested) B\\\n continued \\q) Tj ET")
    pdf = (b"%PDF-1.4\n"
           b"1 0 obj\n<< /Type /Page /Contents 2 0 R >>\nendobj\n"
           b"2 0 obj\n<< /Length " + str(len(content)).encode()
           + b" >>\nstream\n" + content + b"\nendstream\nendobj\n")
    assert extract_pdf_text(pdf) == "AA (x) (nested) B continued q"


def test_td_tstar_quote_positioning():
    """Relative positioning (Td/TD/T*/' ) yields correctly ordered lines."""
    content = (b"BT /F1 12 Tf 20 TL 1 0 0 1 72 700 Tm (first) Tj "
               b"0 -20 Td (second) Tj T* (third) Tj (fourth) ' ET")
    pdf = (b"%PDF-1.4\n1 0 obj\n<< /Type /Page /Contents 2 0 R >>\nendobj\n"
           b"2 0 obj\n<< /Length " + str(len(content)).encode()
           + b" >>\nstream\n" + content + b"\nendstream\nendobj\n")
    assert extract_pdf_text(pdf) == "first\nsecond\nthird\nfourth"


def test_truncated_flate_stream_salvage():
    """A FlateDecode stream cut mid-flight yields its decodable prefix,
    not an exception — crawl archives truncate."""
    text = " ".join(f"word{i}" for i in range(200))
    pdf = text_to_pdf(text, wrap=40, lines_per_page=1000, compress_all=True)
    cut = pdf[: len(pdf) * 2 // 3]
    out = extract_pdf_text(cut)  # must not raise; usually partial text
    assert isinstance(out, str)


def test_hostile_inputs_total():
    assert extract_pdf_text(b"") == ""
    assert extract_pdf_text(None) == ""
    assert extract_pdf_text(b"%PDF-1.4\ngarbage endobj stream endstream") == ""
    bad_flate = (b"1 0 obj\n<< /Filter /FlateDecode /Length 4 >>\n"
                 b"stream\n\xde\xad\xbe\xef\nendstream\nendobj")
    assert extract_pdf_text(bad_flate) == ""


@settings(max_examples=150, deadline=None)
@given(st.binary(max_size=2048))
def test_fuzz_total_over_arbitrary_bytes(data):
    assert isinstance(extract_pdf_text(data), str)


@settings(max_examples=60, deadline=None)
@given(st.binary(max_size=512))
def test_fuzz_total_over_pdf_shaped_bytes(data):
    """Arbitrary bytes wrapped in object/stream scaffolding — exercises the
    tokenizer and stream-salvage paths rather than the early bail-outs."""
    pdf = (b"%PDF-1.4\n1 0 obj\n<< /Type /Page /Contents 2 0 R >>\nendobj\n"
           b"2 0 obj\n<< /Length " + str(len(data) + 3).encode()
           + b" >>\nstream\nBT " + data + b"\nendstream\nendobj\n")
    assert isinstance(extract_pdf_text(pdf), str)


@settings(max_examples=60, deadline=None)
@given(st.text(
    alphabet=st.characters(codec="latin-1", exclude_characters="\x00"),
    max_size=300))
def test_fuzz_roundtrip_whitespace_normalized(text):
    """For any latin-1 text, render→parse is identity modulo whitespace
    collapse (the probe's exact contract vs the SQL oracle)."""
    out = extract_pdf_text(text_to_pdf(text, wrap=30, lines_per_page=7,
                                       scramble=True))
    assert norm(out) == norm(text)


def test_compressed_stream_really_compressed():
    text = "zz " * 500
    pdf = text_to_pdf(text, compress_all=True)
    # the content must not appear in the clear anywhere
    assert b"(zz" not in pdf and b"7a7a" not in pdf.lower()
    m = pdf.find(b"/FlateDecode")
    assert m >= 0
    s = pdf.find(b"stream\n", m)
    assert zlib.decompress(pdf[s + 7 : pdf.find(b"\nendstream", s)])


# ------------------------------------------------------------ Spark level --
SF = "/root/testdata/sf0.001"


def test_pdf_probe_plan_single_python_pass(spark):
    from goose_spark.pdfops import q_pdf_extract

    df = q_pdf_extract(spark, SF)
    plan = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted")
    tree = plan.split("\n\n")[0]
    assert tree.count("MapInPandas") == 1
    assert "BatchEvalPython" not in plan
    assert "Exchange" not in tree  # linear: no shuffle in the PDF pass


def test_pdf_probe_values_spark(spark):
    """Spark-side round trip equals the normalized source column (the
    DuckDB cross-engine twin lives in test_relational_probes)."""
    from pyspark.sql import functions as F

    from goose_spark.pdfops import q_pdf_extract
    from goose_spark.queries import load

    got = {r["doc_id"]: r["text_norm"]
           for r in q_pdf_extract(spark, SF).collect()}
    want = {r["doc_id"]: r["n"]
            for r in load(spark, SF, "documents").select(
                "doc_id",
                F.trim(F.regexp_replace("text", r"\s+", " ")).alias("n")
            ).collect()}
    assert got == want and len(got) > 0


def test_object_spans_last_definition_wins():
    """A byte run spelling 'N 0 obj' inside an earlier object's stream —
    or a superseded object in an incremental-update PDF — must not
    shadow the real later definition (ADVICE r3: last-wins)."""
    from gooselite.pdftext import _object_spans

    data = (b"1 0 obj\n<< /Length 20 >>\nstream\n"
            b"garbage 5 0 obj junk\nendstream\nendobj\n"
            b"5 0 obj\n<< /Real true >>\nendobj\n")
    spans = _object_spans(data)
    assert b"/Real true" in spans[5]
    assert b"junk" not in spans[5]


def test_incremental_update_supersedes():
    """Incremental-update PDFs append a new generation of an object at
    the end of the file; the appended (later) body is the live one."""
    from gooselite.pdftext import _object_spans

    data = (b"3 0 obj\n<< /Old true >>\nendobj\n"
            b"3 0 obj\n<< /New true >>\nendobj\n")
    spans = _object_spans(data)
    assert b"/New true" in spans[3]


def test_object_spans_garbage_in_later_stream_skipped():
    """The mirrored order of the last-wins case: a byte run spelling
    '5 0 obj' inside a LATER object's stream must not clobber the real
    earlier definition — the position cursor skips in-span matches."""
    from gooselite.pdftext import _object_spans

    data = (b"5 0 obj\n<< /Real true >>\nendobj\n"
            b"6 0 obj\n<< /Length 20 >>\nstream\n"
            b"garbage 5 0 obj junk\nendstream\nendobj\n")
    spans = _object_spans(data)
    assert b"/Real true" in spans[5]
    assert b"junk" not in spans[5]
    assert 6 in spans
