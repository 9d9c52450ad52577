"""Similarity search over the ``embeddings`` table (array<float> column).

Baseline: brute-force cosine top-k as pure JVM expressions (zip_with +
aggregate fold — deterministic left-to-right double summation, which is
why the DuckDB oracle's list_dot_product matches bit-for-bit before
rounding). Scale path: hyperplane-LSH bucketing so the 100 TB variant
probes one bucket instead of scanning all vectors.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from goose_spark.queries import load

TOP_K = 10
QUERY_VEC_ID = 0
N_PLANES = 8  # LSH hyperplanes → 256 buckets


def _dot(a, b):
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y),
                       F.lit(0.0), lambda acc, v: acc + v)


def _norm(a):
    return F.sqrt(_dot(a, a))


def _query_vector(spark: SparkSession, sf_dir: str) -> list[float]:
    row = (
        load(spark, sf_dir, "embeddings")
        .filter(F.col("vec_id") == QUERY_VEC_ID)
        .select("embedding").first()
    )
    return [float(x) for x in row[0]]


def q_ann_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-k vs the embedding of vec_id=0.

    The query vector is a scalar job parameter (one collected row), NOT a
    driver-side data loop; the scan-side math is whole-stage codegen.
    """
    q = _query_vector(spark, sf_dir)
    e = load(spark, sf_dir, "embeddings").filter(F.col("vec_id") != QUERY_VEC_ID)
    emb = F.col("embedding").cast("array<double>")
    qcol = F.array(*[F.lit(x) for x in q])
    cos = _dot(emb, qcol) / (_norm(emb) * _norm(qcol))
    return (
        e.select("vec_id", F.round(cos, 4).alias("cosine"))
        .orderBy(F.col("cosine").desc(), F.col("vec_id"))
        .limit(TOP_K)
    )


def oracle_ann_cosine_topk(spark: SparkSession, sf_dir: str) -> str:
    """Oracle SQL is parameterized by the same collected query vector."""
    q = _query_vector(spark, sf_dir)
    lit = "[" + ", ".join(repr(x) for x in q) + "]::DOUBLE[]"
    return f"""
WITH q AS (SELECT {lit} AS qv)
SELECT vec_id,
       ROUND(list_dot_product(CAST(embedding AS DOUBLE[]), qv)
             / (sqrt(list_dot_product(CAST(embedding AS DOUBLE[]),
                                      CAST(embedding AS DOUBLE[])))
                * sqrt(list_dot_product(qv, qv))), 4) AS cosine
FROM embeddings, q
WHERE vec_id != {QUERY_VEC_ID}
ORDER BY cosine DESC, vec_id LIMIT {TOP_K}
"""


def q_embed_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-duplicate scores over within-label pairs.

    The blocking key (`label`; at 100 TB an LSH/IVF bucket) bounds the
    self-join — never a full cross join. All pair scores are returned so
    the oracle compares values, not a threshold's boundary behavior.
    """
    e = load(spark, sf_dir, "embeddings").select(
        "vec_id", "label", F.col("embedding").cast("array<double>").alias("v"))
    a = e.alias("a")
    b = e.select(F.col("vec_id").alias("vec_id_b"), F.col("label").alias("label_b"),
                 F.col("v").alias("v_b"))
    cos = _dot(F.col("v"), F.col("v_b")) / (_norm(F.col("v")) * _norm(F.col("v_b")))
    return (
        a.join(b, (F.col("a.label") == F.col("label_b"))
               & (F.col("a.vec_id") < F.col("vec_id_b")))
        .select(
            F.col("a.vec_id").alias("id_a"),
            F.col("vec_id_b").alias("id_b"),
            F.col("a.label").alias("label"),
            # + 0.0 folds IEEE -0.0 from round() to +0.0 (oracle parity)
            (F.round(cos, 4) + F.lit(0.0)).alias("cosine"),
        )
    )


ORACLE_EMBED_NEARDUP = """
WITH t AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v FROM embeddings)
SELECT a.vec_id AS id_a, b.vec_id AS id_b, a.label AS label,
       ROUND(list_dot_product(a.v, b.v)
             / (sqrt(list_dot_product(a.v, a.v))
                * sqrt(list_dot_product(b.v, b.v))), 4) + 0.0 AS cosine
FROM t a JOIN t b ON a.label = b.label AND a.vec_id < b.vec_id
"""


N_CENTROIDS = 8  # IVF: deterministic seed centroids = vec_id 0..7


def q_ann_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-style coarse quantization: assign every vector to its
    argmax-cosine centroid. Centroids are the embeddings of vec_id <
    N_CENTROIDS (deterministic seed choice — a real deployment k-means
    refines them; assignment/probing is the Spark-shaped part).

    Plan shape: tiny centroid side broadcasts into the scan; ranking is a
    row_number window partitioned by vec_id over 8 candidate rows. The
    scale path probes one inverted list per query instead of all vectors.
    """
    e = load(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v"))
    cent = (
        e.filter(F.col("vec_id") < N_CENTROIDS)
        .select(F.col("vec_id").alias("centroid_id"), F.col("v").alias("c"))
    )
    from pyspark.sql import Window

    cos = _dot(F.col("v"), F.col("c")) / (_norm(F.col("v")) * _norm(F.col("c")))
    scored = e.join(F.broadcast(cent)).select(
        "vec_id", "centroid_id", cos.alias("cosine"))
    w = Window.partitionBy("vec_id").orderBy(
        F.col("cosine").desc(), F.col("centroid_id"))
    return (
        scored.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select("vec_id", "centroid_id", F.round("cosine", 4).alias("cosine"))
    )


ORACLE_ANN_IVF = f"""
WITH t AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
     c AS (SELECT vec_id AS centroid_id, v AS cv FROM t WHERE vec_id < {N_CENTROIDS}),
     scored AS (
       SELECT t.vec_id, c.centroid_id,
              list_dot_product(t.v, c.cv)
                / (sqrt(list_dot_product(t.v, t.v))
                   * sqrt(list_dot_product(c.cv, c.cv))) AS cosine,
              ROW_NUMBER() OVER (PARTITION BY t.vec_id
                                 ORDER BY list_dot_product(t.v, c.cv)
                                   / (sqrt(list_dot_product(t.v, t.v))
                                      * sqrt(list_dot_product(c.cv, c.cv))) DESC,
                                 c.centroid_id) AS rn
       FROM t, c)
SELECT vec_id, centroid_id, ROUND(cosine, 4) AS cosine
FROM scored WHERE rn = 1
"""


def q_ann_lsh_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hyperplane-LSH bucket assignment (rows-only probe): sign pattern of
    N_PLANES deterministic pseudo-random hyperplanes → bucket id. The
    scale path for ANN: shuffle once on bucket, probe one bucket per query.

    Hyperplane p component j = hash-derived value in [-1, 1) — fully
    deterministic, no RNG state (sandbox determinism rule).
    """
    e = load(spark, sf_dir, "embeddings")
    dim = len(e.select("embedding").first()[0])
    emb = F.col("embedding").cast("array<double>")

    def plane(p: int):
        # deterministic pseudo-random component from a hash of (p, j)
        return F.array(*[
            F.lit((((p * 1_000_003 + j) * 2654435761 % 2**32) / 2**31) - 1.0)
            for j in range(dim)
        ])

    bucket = F.lit(0)
    for p in range(N_PLANES):
        bit = (_dot(emb, plane(p)) > 0).cast("int")
        bucket = bucket * 2 + bit
    return e.select("vec_id", "label", bucket.alias("bucket"))
