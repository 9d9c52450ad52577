"""B19 (stretch): Structured Streaming ingest over the ``events`` table.

The north rule is batch (SURVEY.md §2.7), so streaming is a conformance
demo, not the pipeline: a file-source ``readStream`` with a watermark and
a tumbling event-time window, drained with ``trigger(availableNow=True)``
into a memory sink so the result is a plain DataFrame the driver can
compare against a SQL oracle (date_trunc twin).

Output-mode note: this demo uses ``complete`` mode so the drained result
covers EVERY window (matching the all-rows SQL oracle) — in complete
mode the watermark neither drops late rows nor evicts window state, so
this exact plan re-emits the full result each trigger and keeps all
state. A continuous cluster deployment would instead use ``append``
mode, where the watermark finalizes each window once event time passes
window.end + watermark and late rows older than that are dropped; the
last (not-yet-final) window is then withheld until the watermark passes
it, which is why append mode cannot be compared against the total-count
oracle in this finite-drain demo.
"""

from __future__ import annotations

import hashlib
import os
import shutil
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

WATERMARK = "1 day"
WINDOW = "1 day"


def _stream_dir(sf_dir: str) -> str:
    """The file stream source requires a *directory*; stage the single
    events.parquet into a cached tmp dir (testdata is read-only)."""
    tag = hashlib.md5(sf_dir.encode()).hexdigest()[:12]
    d = f"/tmp/goose_stream_src_{tag}"
    dst = os.path.join(d, "events.parquet")
    src = os.path.join(sf_dir, "events.parquet")
    if not os.path.exists(dst) or os.path.getmtime(dst) < os.path.getmtime(src):
        os.makedirs(d, exist_ok=True)
        shutil.copy2(src, dst)
    return d


def stream_window_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """readStream(events) → watermark → tumbling 1-day window × event_type
    → count/sum, drained completely via availableNow into a memory sink.

    The session timezone is pinned to UTC for the duration of the query
    (and restored after): watermarks need TIMESTAMP (LTZ), the testdata
    ships TIMESTAMP_NTZ, and only under UTC is the ntz→ltz cast + window
    + date cast equal to the oracle's timezone-free date_trunc."""
    tz_before = spark.conf.get("spark.sql.session.timeZone")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    try:
        return _stream_window_counts_utc(spark, sf_dir)
    finally:
        spark.conf.set("spark.sql.session.timeZone", tz_before)


def _stream_window_counts_utc(spark: SparkSession, sf_dir: str) -> DataFrame:
    batch_schema = spark.read.parquet(f"{sf_dir}/events.parquet").schema
    src = (
        spark.readStream.schema(batch_schema)
        .parquet(_stream_dir(sf_dir))
        # watermarks need TIMESTAMP (LTZ); testdata ships TIMESTAMP_NTZ.
        # Session TZ is UTC so the ntz→ltz cast is value-preserving.
        .withColumn("ts", F.col("ts").cast("timestamp"))
    )
    agg = (
        src.withWatermark("ts", WATERMARK)
        .groupBy(F.window("ts", WINDOW).alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 4).alias("sum_value"),
        )
        .select(
            F.col("w.start").cast("date").alias("day"),
            "event_type", "n_events", "sum_value",
        )
    )
    sink = f"stream_win_{uuid.uuid4().hex[:8]}"
    q = (
        agg.writeStream.format("memory").queryName(sink)
        .outputMode("complete").trigger(availableNow=True).start()
    )
    q.awaitTermination()
    out = spark.table(sink).localCheckpoint()  # detach from the memory sink
    spark.catalog.dropTempView(sink)
    return out


def q_stream_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    return stream_window_counts(spark, sf_dir)


# Tumbling windows on a fully-available source are exactly date_trunc.
ORACLE_STREAM_WINDOW = """
SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
       event_type,
       COUNT(*) AS n_events,
       ROUND(SUM(value), 4) AS sum_value
FROM events
GROUP BY 1, 2
"""
