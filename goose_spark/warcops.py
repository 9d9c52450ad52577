"""WARC ingestion as a Spark operator, oracle-backed by round trip.

The extraction job's A1 source is a scan over an Iceberg pages table,
but that table is itself loaded from Common Crawl's WARC archives —
this probe proves the repo owns that ingestion step.  Each Arrow batch
is serialized into ONE multi-record WARC blob (warcinfo + per-document
request and response records, each as its own gzip member — the Common
Crawl layout) by `gooselite.warc.write_warc`, then parsed back by
`read_warc`.  The probe emits, per response record, the target URI, the
HTTP status from the embedded HTTP message, and the md5 of the decoded
payload; the DuckDB oracle recomputes url and md5(text) straight from
the documents table, so the value hash matches iff gzip member
splitting, record framing, header parsing, Content-Length body framing
and HTTP header/payload separation are all correct — including
skipping the interleaved warcinfo/request records.

Scale shape (100 TB): one linear mapInPandas pass, no shuffle.  On a
real crawl the blob arrives per file split (spark.read.format
("binaryFile") or a list of (path, offset) splits since members are
independently decompressible) and the write half drops out; the parse
half is unchanged.
"""
from __future__ import annotations

import hashlib
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession

from goose_spark.queries import load


def _roundtrip_batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    from gooselite.warc import read_warc, write_warc

    for batch in it:
        if not len(batch):
            continue
        pages = [(f"https://example.com/doc/{int(i)}", (t or "").encode("utf-8"))
                 for i, t in zip(batch["doc_id"], batch["text"])]
        blob = write_warc(pages, gzip_records=True)
        recs = [r for r in read_warc(blob) if r.rec_type == "response"]
        yield pd.DataFrame({
            "doc_id": pd.Series([int(r.url.rsplit("/", 1)[1]) for r in recs],
                                dtype="int64"),
            "url": [r.url for r in recs],
            "http_status": pd.Series([r.http_status for r in recs],
                                     dtype="int64"),
            "payload_md5": [hashlib.md5(r.payload).hexdigest() for r in recs],
        })


def q_warc_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents → one gzipped multi-record WARC blob per Arrow batch →
    parsed back; one shuffle-free mapInPandas pass."""
    d = load(spark, sf_dir, "documents").select("doc_id", "text")
    return d.mapInPandas(
        _roundtrip_batches,
        schema="doc_id long, url string, http_status long, payload_md5 string")


ORACLE_WARC_ROUNDTRIP = """
SELECT doc_id,
       'https://example.com/doc/' || doc_id AS url,
       CAST(200 AS BIGINT) AS http_status,
       md5(text) AS payload_md5
FROM documents
"""
