"""PDF / layout parse as a Spark operator (the north rule's second
extraction modality next to HTML).

No PDF library ships in this sandbox, so the round trip is built
entirely in-repo: `gooselite.pdfgen` renders each document's text as a
real multi-page PDF (FlateDecode streams, Tj/TJ/hex show ops, absolute
Tm positioning, scrambled stream order for half the docs) and
`gooselite.pdftext` parses it back with positional layout
reconstruction.  That makes the probe ORACLE-BACKED despite PDF being
non-SQL: the Spark side emits whitespace-normalized extracted text, and
the DuckDB oracle is the same normalization applied directly to the
source column — the value hash matches iff generator, parser, layout
sort, string unescaping, and page ordering are all correct.

Scale shape (100 TB): one linear mapInPandas pass — no shuffle, no
driver collect; render+parse is per-row CPU inside Arrow batches, so
throughput scales with executors exactly like the HTML extractor.  In a
real crawl the `pdf_bytes` column arrives from the source table and the
render half drops out; the parse half is unchanged.
"""
from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession

from goose_spark.queries import load


def _roundtrip_batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    from gooselite.pdfgen import text_to_pdf
    from gooselite.pdftext import extract_pdf_text

    for batch in it:
        pdfs = [
            text_to_pdf(t or "", wrap=48, lines_per_page=12,
                        scramble=bool(int(i) % 2 == 1), compress_all=False)
            for i, t in zip(batch["doc_id"], batch["text"])
        ]
        extracted = [extract_pdf_text(b) for b in pdfs]
        yield pd.DataFrame({
            "doc_id": batch["doc_id"],
            "pdf_bytes": pd.Series([len(b) for b in pdfs], dtype="int64"),
            "n_pages": pd.Series([b.count(b"/Type /Page ") for b in pdfs],
                                 dtype="int64"),
            "text_norm": [" ".join(t.split()) for t in extracted],
        })


def q_pdf_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents.text → deterministic PDF → layout-parsed text, one
    mapInPandas pass.  pdf_bytes/n_pages are informational (dropped from
    the oracle projection — not SQL-computable); text_norm is the gated
    column."""
    d = load(spark, sf_dir, "documents").select("doc_id", "text")
    out = d.mapInPandas(
        _roundtrip_batches,
        schema="doc_id long, pdf_bytes long, n_pages long, text_norm string")
    return out.select("doc_id", "text_norm")


ORACLE_PDF_EXTRACT = """
SELECT doc_id,
       trim(regexp_replace(text, '\\s+', ' ', 'g')) AS text_norm
FROM documents
"""
