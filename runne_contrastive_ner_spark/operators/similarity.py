"""Similarity search over the ``embeddings`` table.

* ``ann_bruteforce_topk`` — exact cosine top-k for a query subset: the
  correctness baseline (window rank over a bounded cross join; the query
  side is tiny and broadcast).
* ``lsh_bucket_assignments`` / ``ann_lsh_topk`` — the scale path: random
  hyperplane signs (deterministic md5-derived plane components, identical
  SQL in DuckDB) bucket vectors so candidate generation is an equi-join on
  the bucket key. At 100 TB this is the only viable shape: candidates per
  query ≈ N / 2^planes instead of N.

Double math matches the oracle term-for-term (sequential left-fold sums).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .relational import load

N_PLANES = 6
DIM = 64


def _emb(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load(spark, sf_dir, "embeddings").select(
        F.col("vec_id").cast("bigint").alias("vec_id"),
        F.col("embedding").cast("array<double>").alias("v"),
    )


def _cos(va: str, vb: str) -> str:
    dot = f"aggregate(zip_with({va}, {vb}, (x, y) -> x * y), 0D, (acc, v) -> acc + v)"
    na = f"sqrt(aggregate(zip_with({va}, {va}, (x, y) -> x * y), 0D, (acc, v) -> acc + v))"
    nb = f"sqrt(aggregate(zip_with({vb}, {vb}, (x, y) -> x * y), 0D, (acc, v) -> acc + v))"
    return f"({dot}) / (({na}) * ({nb}))"


def ann_bruteforce_topk(
    spark: SparkSession, sf_dir: str, n_queries: int = 10, k: int = 5
) -> DataFrame:
    emb = _emb(spark, sf_dir)
    queries = emb.filter(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("query_id"), F.col("v").alias("va")
    )
    cands = emb.select(F.col("vec_id").alias("neighbor_id"), F.col("v").alias("vb"))
    w = Window.partitionBy("query_id").orderBy(F.desc("cos_raw"), "neighbor_id")
    return (
        F.broadcast(queries)
        .join(cands, F.col("query_id") != F.col("neighbor_id"))
        .withColumn("cos_raw", F.expr(_cos("va", "vb")))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "query_id",
            F.col("rank").cast("bigint").alias("rank"),
            "neighbor_id",
            F.round("cos_raw", 6).alias("cos"),
        )
    )


def _plane_component_sql(p: str, d: str) -> str:
    """Deterministic pseudo-random hyperplane component in [-1, 1):
    md5-derived, identical in Spark SQL and DuckDB SQL."""
    return (
        f"((CAST(conv(substr(md5(concat('p', {p}, 'd', {d})), 1, 15), 16, 10) AS BIGINT)"
        f" % 2001) - 1000) / 1000.0"
    )


def lsh_bucket_assignments(spark: SparkSession, sf_dir: str, n_planes: int = N_PLANES) -> DataFrame:
    """(vec_id, bucket) where bucket packs the sign bits of the dot products
    with ``n_planes`` deterministic hyperplanes."""
    emb = _emb(spark, sf_dir)
    comp = _plane_component_sql("p", "d - 1")
    bucket = F.expr(
        f"""
        aggregate(sequence(0, {n_planes - 1}), 0L, (acc, p) ->
          acc + CAST(IF(
            aggregate(sequence(1, {DIM}), 0D, (s, d) -> s + v[d - 1] * ({comp})) >= 0,
            CAST(pow(2.0, p) AS BIGINT), 0L) AS BIGINT))
        """
    )
    return emb.select("vec_id", bucket.alias("bucket"))


def ann_lsh_topk(spark: SparkSession, sf_dir: str, n_queries: int = 10, k: int = 3) -> DataFrame:
    """Approximate top-k: rank only within the query's LSH bucket. Bucket
    assignment + equi-join on bucket — no quadratic stage."""
    emb = _emb(spark, sf_dir)
    buckets = lsh_bucket_assignments(spark, sf_dir)
    both = emb.join(buckets, "vec_id")
    queries = both.filter(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("query_id"), F.col("v").alias("va"), "bucket"
    )
    cands = both.select(F.col("vec_id").alias("neighbor_id"), F.col("v").alias("vb"), "bucket")
    w = Window.partitionBy("query_id").orderBy(F.desc("cos_raw"), "neighbor_id")
    return (
        F.broadcast(queries)
        .join(cands, "bucket")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn("cos_raw", F.expr(_cos("va", "vb")))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "query_id",
            F.col("rank").cast("bigint").alias("rank"),
            "neighbor_id",
            F.round("cos_raw", 6).alias("cos"),
        )
    )
