"""The extraction operator: gooselite wrapped in one mapInPandas UDF.

SURVEY.md §2.5 / B17 — the entire Goose pipeline (A2–A16) is ONE scalar
operator from Spark's viewpoint: one Python invocation per Arrow batch
(BASELINE.json:6 "batch-parses html bytes ... inside a single pandas UDF,
no per-row Python dispatch"). Stopword tables and regexes are loaded at
module import — once per executor Python worker, not per batch.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd

from gooselite.pipeline import extract_one

# column order must match goose_spark.schema.EXTRACTED
_OUT_COLS = [
    "url", "warc_ts", "lang", "title", "cleaned_text", "meta_description",
    "meta_keywords", "meta_lang", "canonical_link", "domain", "tags",
    "status", "err", "bytes_in", "parse_ms", "partition_id", "bucket",
]


def extract_batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas body: (url, warc_ts, html, lang, bucket) → EXTRACTED.

    Input batches are Arrow record batches sized by
    ``spark.sql.execution.arrow.maxBytesPerBatch`` /
    ``maxRecordsPerBatch`` (size-bucketed batching, SURVEY.md B16) so one
    batch never mixes 1 KB and 100 MB documents into an oversized
    allocation. partition_id comes from TaskContext for the per-partition
    lineage metrics (BASELINE.json:6).
    """
    import gc

    from pyspark import TaskContext  # import inside worker

    ctx = TaskContext.get()
    pid = ctx.partitionId() if ctx is not None else -1
    # Cyclic-GC policy: extract_one dispose()s each DOM so refcounting
    # reclaims the bulk; threshold-triggered collections during the
    # million-allocation parse phase would re-walk every live container
    # (~30% slowdown, worse under 32 concurrent workers). Disable the
    # collector and run one collect per batch for detached-subtree scraps.
    gc.disable()
    for pdf in it:
        rows = []
        for url, warc_ts, html, lang, bucket in zip(
            pdf["url"], pdf["warc_ts"], pdf["html"], pdf["lang"], pdf["bucket"]
        ):
            r = extract_one(html, lang, url)
            r["warc_ts"] = warc_ts
            r["partition_id"] = pid
            r["bucket"] = int(bucket) if pd.notna(bucket) else 0
            rows.append(r)
        out = pd.DataFrame(rows, columns=_OUT_COLS)
        gc.collect()
        yield out
