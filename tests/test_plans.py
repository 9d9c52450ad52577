"""Physical-plan shape tests (SURVEY.md §4.2): pushdown, pruning, and join
strategy must actually reach the scan — not just produce correct rows."""

import os
from contextlib import contextmanager

import pytest
from pyspark.sql import functions as F

from goose_spark import job as J
from goose_spark import queries as Q

SF = "/root/testdata/sf0.001"


def _plan(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # same as explain("formatted")
        df._jdf.queryExecution(), "formatted")


def test_filter_pushdown_and_column_pruning(spark):
    df = Q.q_scan_filter_project(spark, SF)
    plan = _plan(df)
    assert "PushedFilters" in plan
    assert "l_shipdate" in plan.split("PushedFilters")[1][:200]
    # ReadSchema must NOT include unprojected fat columns
    read_schema = plan.split("ReadSchema")[1][:400]
    assert "l_extendedprice" not in read_schema
    assert "l_comment" not in read_schema


def test_broadcast_join_strategy(spark):
    plan = _plan(Q.q_broadcast_join(spark, SF))
    assert "BroadcastHashJoin" in plan


def test_anti_join_is_broadcast_when_small(spark):
    plan = _plan(Q.q_anti_join(spark, SF))
    assert "LeftAnti" in plan


def test_extraction_scan_prunes_text_column(spark, sf0001_fixtures):
    """The fat CC-provided `text` column must never be read by the
    extraction plan (html is needed; text is not)."""
    pages_path, _ = sf0001_fixtures
    pages = J.read_pages(spark, pages_path)
    df = J.extract(J.prepare(pages), partitions=4)
    plan = _plan(df)
    scan = plan.split("ReadSchema")[1][:500]
    assert "html" in scan
    assert "text" not in scan.replace("cleaned_text", "")


def test_extraction_plan_has_single_python_stage(spark, sf0001_fixtures):
    """One mapInPandas evaluation — no accidental extra Python round-trips."""
    pages_path, _ = sf0001_fixtures
    pages = J.read_pages(spark, pages_path)
    df = J.extract(J.prepare(pages), partitions=4)
    plan = _plan(df)
    tree = plan.split("\n\n")[0]  # the tree section (details repeat names)
    assert tree.count("MapInPandas") == 1
    assert "BatchEvalPython" not in plan  # no row-at-a-time Python UDF


def test_hash_agg_partial_final(spark):
    """Aggregation must be partial+final (map-side combine before shuffle)."""
    plan = _plan(Q.q_hash_agg(spark, SF))
    assert plan.count("HashAggregate") >= 2


def test_whole_stage_codegen_in_scan_filter(spark):
    # formatted explain marks codegen'd nodes with '*'; Filter+Project must
    # both be inside a codegen stage
    plan = _plan(Q.q_scan_filter_project(spark, SF))
    tree = plan.split("\n\n")[0]
    assert "* Filter" in tree and "* Project" in tree


def test_simhash_pairs_single_udf_pass(spark):
    """The fingerprint UDF must run in ONE pass (a band self-join would
    re-evaluate it per side); pair generation is in-bucket, JVM-side."""
    from goose_spark import textops as T

    plan = _plan(T.q_simhash_pairs(spark, SF))
    tree = plan.split("\n\n")[0]
    assert tree.count("ArrowEvalPython") == 1
    assert "BatchEvalPython" not in plan


def test_ann_lsh_probe_is_pure_expressions(spark):
    """Bucket filter + cosine top-k: no Python at all, top-k as
    TakeOrderedAndProject (no global sort materialization)."""
    from goose_spark import ann as A

    plan = _plan(A.q_ann_lsh_probe(spark, SF))
    assert "EvalPython" not in plan
    assert "TakeOrderedAndProject" in plan


def test_ann_ivf_probe_broadcasts_centroids(spark):
    from goose_spark import ann as A

    plan = _plan(A.q_ann_ivf_probe(spark, SF))
    assert "EvalPython" not in plan
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan


def test_url_normalize_codegen(spark):
    from goose_spark import textops as T

    plan = _plan(T.q_url_normalize(spark, SF))
    tree = plan.split("\n\n")[0]
    assert "EvalPython" not in plan
    assert "* Project" in tree  # regex chain rides whole-stage codegen
    assert "Exchange" not in tree  # embarrassingly parallel: zero shuffles


def test_pii_redact_codegen_no_shuffle(spark):
    from goose_spark import filterops as FL

    plan = _plan(FL.q_pii_redact(spark, SF))
    tree = plan.split("\n\n")[0]
    assert "EvalPython" not in plan      # regex chain is all JVM
    assert "Exchange" not in tree        # scan → project, zero shuffles
    assert "* Project" in tree           # whole-stage codegen
    # only the columns the op needs reach the scan
    read_schema = plan.split("ReadSchema")[1][:300]
    assert "doc_id" in read_schema and "text" in read_schema
    assert "n_chars" not in read_schema


def test_repetition_filter_partial_aggs(spark):
    from goose_spark import filterops as FL

    plan = _plan(FL.q_repetition_filter(spark, SF))
    assert "EvalPython" not in plan
    # distributed-wordcount shape: map-side combine before every shuffle
    assert plan.count("partial_count") + plan.count("partial_sum") >= 2
    assert "HashAggregate" in plan


def test_domain_cap_single_shuffle(spark):
    from goose_spark import filterops as FL

    plan = _plan(FL.q_domain_cap(spark, SF))
    tree = plan.split("\n\n")[0]
    assert "EvalPython" not in plan
    # both windows share the ONE hashpartitioning(domain) exchange
    assert tree.count("Exchange") == 1
    assert "Window" in plan


def test_warc_extract_single_python_stage(spark):
    from goose_spark import warcops as W

    plan = _plan(W.q_warc_extract(spark, SF))
    tree = plan.split("\n\n")[0]
    assert tree.count("MapInPandas") == 1
    assert "BatchEvalPython" not in plan
    assert "Exchange" not in tree        # linear chain, zero shuffles


def test_bucketed_dedupe_has_no_exchange(spark, tmp_path):
    """The module-docstring scale fix made real: on the url-bucketed
    layout the dedupe window needs NO exchange — the fat html column
    never shuffles — while the same plan on plain parquet does."""
    from pyspark.sql import functions as F

    pages = spark.range(300).select(
        F.concat(F.lit("https://u/"), (F.col("id") % 100).cast("string"))
        .alias("url"),
        F.col("id").cast("timestamp").alias("warc_ts"),
        F.sha2(F.col("id").cast("string"), 256).cast("binary").alias("html"))

    plain_path = str(tmp_path / "plain")
    pages.write.parquet(plain_path)
    plain = _plan(J.dedupe_latest(spark.read.parquet(plain_path)))
    assert "Exchange" in plain.split("\n\n")[0]

    J.write_pages_bucketed(pages, "pages_bucketed_t", buckets=4)
    try:
        out = J.dedupe_latest_bucketed(spark, "pages_bucketed_t")
        tree = _plan(out).split("\n\n")[0]
        assert "Exchange" not in tree
        # identical semantics: same surviving (url, warc_ts) set
        a = sorted((r.url, r.warc_ts) for r in out.collect())
        b = sorted((r.url, r.warc_ts)
                   for r in J.dedupe_latest(spark.read.parquet(plain_path)).collect())
        assert a == b
    finally:
        spark.sql("DROP TABLE IF EXISTS pages_bucketed_t")


@contextmanager
def _no_broadcast(spark):
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        yield
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_bucketed_anti_join_has_no_exchange(spark):
    """resume_filter at history scale: both sides co-bucketed by url →
    zero-exchange SortMergeJoin LeftAnti (broadcast no longer possible
    when the checkpoint history is 10^12 urls)."""
    from pyspark.sql import functions as F

    pages = spark.range(200).select(
        F.concat(F.lit("u"), F.col("id").cast("string")).alias("url"),
        F.sha2(F.col("id").cast("string"), 256).alias("html"))
    ckpt = spark.range(120).select(
        F.concat(F.lit("u"), F.col("id").cast("string")).alias("url"))
    J.write_pages_bucketed(pages, "pages_aj_t", buckets=4)
    (ckpt.write.mode("overwrite")
     .bucketBy(4, "url").sortBy("url").saveAsTable("ckpt_aj_t"))
    try:
        with _no_broadcast(spark):
            out = J.resume_filter_bucketed(spark, "pages_aj_t", "ckpt_aj_t")
            tree = _plan(out).split("\n\n")[0]
            assert "Exchange" not in tree
            assert "SortMergeJoin LeftAnti" in tree
            assert out.count() == 80
    finally:
        spark.sql("DROP TABLE IF EXISTS pages_aj_t")
        spark.sql("DROP TABLE IF EXISTS ckpt_aj_t")


def test_bucketed_flagship_pre_udf_is_exchange_free(spark, tmp_path):
    """VERDICT r4 item 6: the FLAGSHIP path (dedupe → resume → extract),
    not just the side APIs, must run with zero non-broadcast Exchange
    before the UDF on a url-bucketed source — the bucketed scan satisfies
    both the dedupe window's partitioning AND the salt, so the fat html
    column never shuffles. The same pipeline on plain parquet keeps its
    deliberate exchanges (dedupe shuffle + salt)."""
    import datetime

    pages = spark.range(300).select(
        F.concat(F.lit("https://u/"), (F.col("id") % 100).cast("string"))
        .alias("url"),
        (F.col("id") % 7).cast("timestamp").alias("warc_ts"),
        F.concat(F.lit("<html><body><p>"),
                 F.sha2(F.col("id").cast("string"), 256),
                 F.lit(" the and of to in a for</p></body></html>"))
        .cast("binary").alias("html"),
        F.lit("en").alias("lang"))
    ckpt = spark.createDataFrame(
        [("r0", "https://u/1", datetime.datetime(2025, 1, 1))],
        "run_id string, url string, completed_ts timestamp")

    # a crashed earlier session can leave the managed-table dir behind
    # (LOCATION_ALREADY_EXISTS) even when the metastore entry is gone
    spark.sql("DROP TABLE IF EXISTS pages_flag_t")
    import shutil
    shutil.rmtree(os.path.join(str(spark.conf.get("spark.sql.warehouse.dir"))
                               .removeprefix("file:"), "pages_flag_t"),
                  ignore_errors=True)
    J.write_pages_bucketed(pages, "pages_flag_t", buckets=4)
    try:
        assert J._url_bucket_count(spark, "pages_flag_t") == 4
        todo = J.prepare(spark.table("pages_flag_t"), ckpt)
        out = J.extract(todo, presalted=True)
        tree = _plan(out).split("\n\n")[0]
        exchanges = [ln for ln in tree.splitlines()
                     if "Exchange" in ln and "BroadcastExchange" not in ln]
        assert exchanges == [], exchanges
        assert "ArrowEvalPython" in tree or "MapInPandas" in tree

        # identical semantics vs the salted path on plain parquet
        plain_path = str(tmp_path / "plain")
        pages.write.parquet(plain_path)
        plain_todo = J.prepare(spark.read.parquet(plain_path), ckpt)
        a = sorted((r.url, r.cleaned_text) for r in out.collect())
        b = sorted((r.url, r.cleaned_text)
                   for r in J.extract(plain_todo).collect())
        assert a == b and len(a) == 99

        # unbucketed sources fall through to the salted path
        assert J._url_bucket_count(spark, "missing_table_xyz") is None
    finally:
        spark.sql("DROP TABLE IF EXISTS pages_flag_t")


def test_decontaminate_broadcasts_eval_set(spark):
    """The exploded train-side n-grams must join the eval set as a
    broadcast — shuffling the exploded rows would be the 100 TB
    bottleneck."""
    from goose_spark import filterops as FL

    plan = _plan(FL.q_decontaminate(spark, SF))
    assert "EvalPython" not in plan
    assert "BroadcastHashJoin" in plan


def test_decontaminate_hashed_preserves_broadcast(spark):
    """The xxhash64-key variant must keep the same plan shape: the
    exploded (now 8-byte-keyed) train side broadcast-joins the eval
    set — no SortMergeJoin anywhere, no Python evaluation."""
    from goose_spark import filterops as FL

    plan = _plan(FL.q_decontaminate_hashed(spark, SF))
    assert "EvalPython" not in plan
    assert "BroadcastHashJoin" in plan
    assert "xxhash64" in plan


def test_domain_cap_precap_zero_shuffle_combiner(spark):
    """precap_domains is a map-side combiner: ONE MapInPandas, ZERO
    exchanges; q_domain_cap_kept adds exactly one domain-keyed exchange
    for the final window over the bounded survivor set."""
    from goose_spark import filterops as FL
    from goose_spark.queries import load

    d = load(spark, SF, "documents")
    dom = F.expr(FL._DOMAIN_SYNTH_T.format(S="STRING"))
    pre = FL.precap_domains(
        d.select("doc_id", "n_chars", dom.alias("domain")), FL.DOMAIN_CAP)
    tree = _plan(pre).split("\n\n")[0]
    assert tree.count("Exchange") == 0
    assert tree.count("MapInPandas") == 1

    full = _plan(FL.q_domain_cap_kept(spark, SF)).split("\n\n")[0]
    assert full.count("Exchange") == 1
    assert full.count("MapInPandas") == 1
    assert "Window" in full


def test_tfidf_all_codegen_no_text_after_tokenize(spark):
    """TF-IDF is pure built-ins (no Python eval), and the wide text
    column is projected away before any exchange — only (doc_id, term)
    rows shuffle."""
    from goose_spark import textops as T

    plan = _plan(T.q_tfidf_top_terms(spark, SF))
    assert "EvalPython" not in plan
    # every Exchange carries tokenized rows, never the text column
    for seg in plan.split("Exchange")[1:]:
        assert "text#" not in seg[:120]


def test_length_quantiles_window_reads_histogram(spark):
    """The quantile window must consume the (lang, n_chars) histogram
    aggregate, not raw rows — a raw per-lang window is skew-bound at
    10^12 docs. Plan order: partial+final HashAggregate BEFORE the
    Window node, and no Python eval anywhere."""
    from goose_spark import textops as T

    plan = _plan(T.q_length_quantiles(spark, SF))
    assert "EvalPython" not in plan
    tree = plan.split("\n\n")[0]
    lines = tree.splitlines()
    agg_idx = [i for i, l in enumerate(lines) if "HashAggregate" in l]
    win_idx = [i for i, l in enumerate(lines) if "Window" in l]
    assert agg_idx and win_idx
    # formatted tree lists leaves last: the histogram aggregate appears
    # BELOW (after) the window that consumes it
    assert max(agg_idx) > min(win_idx)


def test_substring_dedup_plan_shape(spark):
    from goose_spark import textops as T

    plan = _plan(T.q_substring_dedup(spark, SF))
    tree = plan.split("\n\n")[0]
    assert "EvalPython" not in plan          # window hashing is all JVM
    # ONE corpus-sized hash aggregate on the md5 key, partial+final
    assert tree.count("HashAggregate") >= 2  # map-side combine present
    # the dup-key join must be a shuffle join on gh (AQE can skew-split
    # a hot boilerplate key), never a nested-loop
    assert "SortMergeJoin" in tree or "ShuffledHashJoin" in tree \
        or "BroadcastHashJoin" in tree
    assert "CartesianProduct" not in tree
    # interval merge is a doc-keyed window over int pairs
    assert "Window" in tree
    # only the two needed columns reach the scan
    read_schema = plan.split("ReadSchema")[1][:300]
    assert "doc_id" in read_schema and "text" in read_schema
    assert "n_chars" not in read_schema


def test_corpus_funnel_single_pass(spark):
    """The funnel must stay ONE aggregate over flag joins — a per-stage
    union of count branches re-executes every upstream gate's DAG
    (review finding, late r4)."""
    from goose_spark import filterops as FL

    plan = _plan(FL.q_corpus_funnel(spark, SF))
    tree = plan.split("\n\n")[0]
    assert "Union" not in tree          # no per-stage count branches
    assert "Generate" in tree           # the stack() unpivot
    # each gate's scan appears once per gate, not once per stage:
    # documents is read by base + 5 gates = bounded, never 6 * stages
    assert tree.count("Scan parquet") <= 12


def test_host_stats_one_source_agg(spark):
    from goose_spark import corpusops as CO

    plan = _plan(CO.q_host_stats(spark, SF))
    tree = plan.split("\n\n")[0]
    assert "EvalPython" not in plan
    # countDistinct expands to a two-phase agg; beyond that the plan
    # must stay hash aggregates + the md5-count join, no nested loops
    assert "CartesianProduct" not in tree
    assert "HashAggregate" in tree


def test_training_loop_epoch_plans_stay_jvm(spark):
    """THE perceptron epoch aggregate (the probe's own builder, epoch-1
    weights) is one map-side-combined aggregate — no Python eval nodes,
    partial+final HashAggregate present."""
    from goose_spark.filterops import _pct_epoch_agg, _pct_features

    agg = _pct_epoch_agg(_pct_features(spark, SF), [0, 0, 0, 0])
    plan = _plan(agg)
    tree = plan.split("\n\n")[0]
    assert "EvalPython" not in plan
    assert tree.count("HashAggregate") >= 2  # partial + final


def test_ccnet_buckets_histogram_then_broadcast(spark):
    """Tercile thresholds must come from the (lang, score) histogram
    (HashAggregate before the Window) and rejoin the corpus by
    BROADCAST — a shuffle join on lang re-keys the whole corpus on the
    skewed language key; all codegen, no Python eval."""
    from goose_spark import filterops as FL

    plan = _plan(FL.q_ccnet_buckets(spark, SF))
    assert "EvalPython" not in plan
    assert "BroadcastHashJoin" in plan
    tree = plan.split("\n\n")[0]
    lines = tree.splitlines()
    agg_idx = [i for i, l in enumerate(lines) if "HashAggregate" in l]
    win_idx = [i for i, l in enumerate(lines) if "Window" in l]
    assert agg_idx and win_idx
    assert max(agg_idx) > min(win_idx)


def test_cdx_index_digest_keyed_join_no_payload_shuffle(spark):
    """Revisit detection shuffles the 16-byte digest key, never the
    payload: no plan column list may carry `text` past the first
    projection into an Exchange; all codegen."""
    from goose_spark import corpusops as CO

    plan = _plan(CO.q_cdx_index(spark, SF))
    assert "EvalPython" not in plan
    tree = plan.split("\n\n")[0]
    ex_lines = [l for l in tree.splitlines() if "Exchange" in l]
    assert ex_lines, "expected the digest aggregate exchange"
    # the details section lists each Exchange's partitioning key
    for seg in plan.split("Exchange")[1:]:
        head = seg[:200]
        assert "text#" not in head


def test_unigram_lm_vocab_topv_and_broadcast(spark):
    """The top-V vocab cut must be TakeOrderedAndProject (never a
    global-window sort over the vocabulary) and the score join must
    broadcast the V-row vocab; per-doc re-agg stays a HashAggregate."""
    from goose_spark import filterops as FL

    plan = _plan(FL.q_unigram_lm_score(spark, SF))
    assert "EvalPython" not in plan
    assert "TakeOrderedAndProject" in plan
    assert "BroadcastHashJoin" in plan
    assert "Window" not in plan.split("\n\n")[0]


def test_soft404_codegen_no_shuffle_and_live_arms(spark):
    from pyspark.sql import functions as F

    from goose_spark import filterops as FL

    df = FL.q_soft404(spark, SF)
    plan = _plan(df)
    tree = plan.split("\n\n")[0]
    assert "EvalPython" not in plan      # contains/split are all JVM
    assert "Exchange" not in tree        # scan → project, zero shuffles
    assert "* Project" in tree           # whole-stage codegen
    # every decoration arm is live at sf0.01 AND the classifier fires
    # on each phrase class (else the probe gates nothing)
    agg = df.agg(
        F.sum(F.when(F.col("has_soft404_phrase"), 1).otherwise(0)),
        F.sum(F.when(F.col("is_stub"), 1).otherwise(0)),
        F.sum(F.when(~F.col("soft404"), 1).otherwise(0)),
    ).collect()[0]
    assert agg[0] > 0 and agg[1] > 0 and agg[2] > 0
