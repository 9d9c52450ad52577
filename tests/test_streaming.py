"""Streaming operator semantics (B19 + session windows + custom state).

q_stream_window / q_stream_sessions are oracle-backed by the driver; the
tests here reconcile them against equivalent BATCH plans over the same
events (Structured Streaming's availableNow drain over a static source
must equal the batch computation), and assert the applyInPandasWithState
operator's per-user state against a plain groupBy.
"""

import pytest
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


def _events_utc(spark):
    return (
        spark.read.parquet(SF + "/events.parquet")
        .withColumn("ts", F.col("ts").cast("timestamp"))
    )


def test_stream_sessions_equal_batch_sessionization(spark):
    from goose_spark.streaming import _GAP_SECONDS, stream_session_counts

    got = stream_session_counts(spark, SF)

    tz = spark.conf.get("spark.sql.session.timeZone")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    try:
        ev = _events_utc(spark)
        from pyspark.sql import Window

        w = Window.partitionBy("user_id").orderBy("ts")
        marked = ev.withColumn(
            "is_start",
            (F.col("ts").cast("double")
             - F.lag(F.col("ts").cast("double")).over(w)
             >= _GAP_SECONDS).cast("int"),
        ).fillna({"is_start": 1})
        sess = marked.withColumn(
            "session_id", F.sum("is_start").over(
                w.rowsBetween(Window.unboundedPreceding, 0)))
        batch = (
            sess.groupBy("user_id", "session_id")
            .agg(
                F.date_format(F.min("ts"), "yyyy-MM-dd HH:mm:ss.SSSSSS")
                .alias("session_start"),
                F.date_format(
                    F.timestamp_add("SECOND", F.lit(_GAP_SECONDS), F.max("ts")),
                    "yyyy-MM-dd HH:mm:ss.SSSSSS").alias("session_end"),
                F.count(F.lit(1)).alias("n_events"),
                (F.round(F.sum("value"), 4) + F.lit(0.0)).alias("sum_value"),
            )
            .drop("session_id")
        )
        cols = ["user_id", "session_start", "session_end", "n_events", "sum_value"]
        assert got.select(cols).exceptAll(batch.select(cols)).count() == 0
        assert batch.select(cols).exceptAll(got.select(cols)).count() == 0
        assert got.count() > 0
    finally:
        spark.conf.set("spark.sql.session.timeZone", tz)


def test_stateful_running_max_matches_batch_groupby(spark):
    from goose_spark.streaming import q_stateful_running_max

    got = {r.user_id: (r.n_events, r.max_value)
           for r in q_stateful_running_max(spark, SF).collect()}
    exp = {r.user_id: (r.n, r.vmax)
           for r in _events_utc(spark).groupBy("user_id").agg(
               F.count(F.lit(1)).alias("n"),
               F.max("value").alias("vmax")).collect()}
    assert set(got) == set(exp)
    for u, (n, vmax) in exp.items():
        assert got[u][0] == n, u
        assert got[u][1] == pytest.approx(vmax), u


def test_stream_dedup_removes_doubled_delivery(spark):
    from goose_spark.streaming import q_stream_dedup

    got = {r.event_type: (r.n_events, r.sum_value)
           for r in q_stream_dedup(spark, SF).collect()}
    exp = {r.event_type: (r.n, round(r.s, 4) + 0.0)
           for r in _events_utc(spark).groupBy("event_type").agg(
               F.count(F.lit(1)).alias("n"), F.sum("value").alias("s")).collect()}
    assert got == exp  # every event delivered twice, counted once
