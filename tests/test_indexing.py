"""dense_index: a deterministic bijection without a single-task global sort
(VERDICT r4 item 3 — the tr_kg_negatives entity-dictionary index)."""

from pyspark.sql import functions as F

from runne_contrastive_ner_spark.functions.hashing import md5_int
from runne_contrastive_ner_spark.operators.indexing import (
    INDEX_BUCKETS,
    dense_index,
)


def _expected_order(keys):
    return sorted(keys, key=lambda k: (md5_int(k) % INDEX_BUCKETS, k))


def test_dense_index_is_bucket_key_rank(spark):
    keys = [f"ent-{i:04d}" for i in range(500)]
    df = spark.createDataFrame([(k,) for k in keys], "canonical_id string")
    out = {
        r.canonical_id: r.idx
        for r in dense_index(df, "canonical_id").collect()
    }
    expected = {k: i for i, k in enumerate(_expected_order(keys))}
    assert out == expected
    # bijection onto [0, n)
    assert sorted(out.values()) == list(range(len(keys)))


def test_dense_index_parallel_on_skewed_dictionary(spark):
    """A dictionary whose keys share a long hot prefix (the skew shape a
    lexicographic range-sort would serialize on) still spreads across all
    hash buckets, and the ranking window partitions by bucket — no
    single-task global sort in the plan."""
    n = 4000
    df = spark.range(n).select(
        F.concat(F.lit("acme-corp-entity-"), F.col("id").cast("string")).alias(
            "canonical_id"
        )
    )
    indexed = dense_index(df, "canonical_id")
    rows = indexed.collect()
    assert sorted(r.idx for r in rows) == list(range(n))
    # every bucket participates -> INDEX_BUCKETS-way parallel ranking
    buckets = {md5_int(r.canonical_id) % INDEX_BUCKETS for r in rows}
    assert buckets == set(range(INDEX_BUCKETS))
    # plan shape: the per-row Window partitions by _bucket (parallel); the
    # only global-ordered window is over the n_buckets-row offset aggregate
    plan = indexed._jdf.queryExecution().executedPlan().toString()
    assert "partitionBy" not in plan  # sanity: formatted differently below
    assert "Window" in plan
    windows = [ln for ln in plan.splitlines() if "Window [" in ln or "Window(" in ln]
    row_windows = [ln for ln in windows if "row_number" in ln]
    assert row_windows and all("_bucket" in ln for ln in row_windows)
