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
