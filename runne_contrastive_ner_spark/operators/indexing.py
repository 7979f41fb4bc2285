"""Distributed dense indexing: a deterministic bijection dictionary → [0, n).

``row_number().over(Window.orderBy(col))`` assigns a dense index but runs as
ONE task sorting the whole table — fine for a driver-test dictionary,
serial death at a 10^7-entity corpus dictionary (VERDICT r4 item 3). This
module provides the two-level shape (the same discipline as
textstats.shard_packing):

  level 1 — each row lands in ``bucket = md5_int(key) % n_buckets``; the
  within-bucket rank is a ``row_number`` window partitioned BY bucket, so
  the sort runs ``n_buckets``-way parallel;

  level 2 — per-bucket row counts (``n_buckets`` rows, an aggregate AQE
  broadcasts) are prefix-summed in bucket order and joined back as the
  bucket's starting offset.

``idx = bucket_offset + local_rank - 1`` is exactly
``row_number() OVER (ORDER BY bucket, key) - 1``: a pure function of the
key set (content-derived bucket hash + within-bucket key order), identical
under any parallelism, and replayable verbatim in SQL by any engine that
can compute the shared md5 bucket (functions/hashing.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.hashing import spark_md5_int_sql

INDEX_BUCKETS = 32


def dense_index(
    df: DataFrame,
    key_col: str,
    n_buckets: int = INDEX_BUCKETS,
    idx_col: str = "idx",
) -> DataFrame:
    """→ ``df``'s distinct ``key_col`` values with a dense 0-based ``idx``
    (ordered by ``(md5-bucket, key)``), computed without a single-task
    global sort. Input rows are taken as-is (caller deduplicates if
    needed)."""
    keyed = df.withColumn(
        "_bucket",
        F.expr(spark_md5_int_sql(key_col)) % F.lit(n_buckets),
    )
    w_local = Window.partitionBy("_bucket").orderBy(key_col)
    counts = keyed.groupBy("_bucket").agg(F.count(F.lit(1)).alias("_bn"))
    w_off = (
        Window.orderBy("_bucket").rowsBetween(Window.unboundedPreceding, -1)
    )
    # the offset window IS a global sort — over n_buckets rows, not n rows
    offsets = counts.select(
        "_bucket",
        F.coalesce(F.sum("_bn").over(w_off), F.lit(0)).alias("_off"),
    )
    return (
        keyed.withColumn("_rk", F.row_number().over(w_local))
        .join(F.broadcast(offsets), "_bucket")
        .withColumn(idx_col, (F.col("_off") + F.col("_rk") - 1).cast("long"))
        .drop("_bucket", "_rk", "_off")
    )
