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


N_TABLES = 24
PLANES_PER_TABLE = 2


def _table_plane_vector(t: int, p: int, dim: int = DIM) -> list[float]:
    """Deterministic pseudo-random hyperplane component vector in [-1, 1):
    md5-derived per (table, plane, dim) — precomputed driver-side (the
    per-row SQL md5 of the single-table variant costs ~hash-per-dim; a plane
    is a CONSTANT, so it belongs in the plan as a literal)."""
    from ..functions.hashing import md5_int

    return [((md5_int(f"t{t}p{p}d{d}") % 2001) - 1000) / 1000.0 for d in range(dim)]


def multitable_lsh_buckets(
    emb: DataFrame,
    n_tables: int = N_TABLES,
    n_planes: int = PLANES_PER_TABLE,
    dim: int = DIM,
) -> DataFrame:
    """(vec_id, tbl, bucket): ``n_tables`` independent sign-LSH tables of
    ``n_planes`` hyperplanes each — the multi-probe recall knob for
    candidate generation. All buckets for a vector are computed in ONE pass
    over the embedding column (plane vectors are plan literals), then
    posexploded; the vector itself is NOT carried through the explode, so
    shuffle volume is O(n_tables) longs per vector, not O(n_tables × dim)."""
    planes_lit = (
        "array("
        + ",".join(
            "array(" + ",".join(repr(x) for x in _table_plane_vector(t, p, dim)) + ")"
            for t in range(n_tables)
            for p in range(n_planes)
        )
        + ")"
    )
    buckets = F.expr(
        f"""
        transform(sequence(0, {n_tables - 1}), t ->
          aggregate(sequence(0, {n_planes - 1}), 0L, (acc, p) ->
            acc + IF(
              aggregate(zip_with(v, element_at({planes_lit}, t * {n_planes} + p + 1),
                                 (x, y) -> x * y), 0D, (s, z) -> s + z) >= 0,
              shiftleft(1L, p), 0L)))
        """
    )
    return emb.select(
        "vec_id", F.posexplode(buckets).alias("tbl", "bucket")
    )


def lsh_candidate_pairs(
    emb: DataFrame,
    n_tables: int = N_TABLES,
    n_planes: int = PLANES_PER_TABLE,
    dim: int = DIM,
) -> DataFrame:
    """(vec_a, vec_b) distinct candidate pairs sharing a bucket in ANY table
    — pure equi-join on (tbl, bucket); no quadratic stage."""
    bk = multitable_lsh_buckets(emb, n_tables, n_planes, dim)
    x = bk.alias("x")
    y = bk.alias("y")
    return (
        x.join(
            y,
            (F.col("x.tbl") == F.col("y.tbl"))
            & (F.col("x.bucket") == F.col("y.bucket"))
            & (F.col("x.vec_id") < F.col("y.vec_id")),
        )
        .select(F.col("x.vec_id").alias("vec_a"), F.col("y.vec_id").alias("vec_b"))
        .distinct()
    )


N_CELLS = 8
CENTROID_STRIDE = 13


def _dist2(va: str, vb: str) -> str:
    return (
        f"aggregate(zip_with({va}, {vb}, (x, y) -> (x - y) * (x - y)),"
        f" 0D, (acc, z) -> acc + z)"
    )


def ivf_cell_assignments(
    spark: SparkSession, sf_dir: str, n_cells: int = N_CELLS
) -> DataFrame:
    """(vec_id, cell): IVF coarse quantization. Centroids are the vectors at
    vec_id = c * CENTROID_STRIDE (deterministic, portable to the DuckDB
    oracle — a real deployment trains them with k-means, which only changes
    the centroid table, not this plan). Assignment = argmin squared
    euclidean distance, ties to the smaller cell id (struct-min, so the
    choice is deterministic under any parallelism). The centroid table is K
    rows — broadcast; the assignment stage is a narrow map + one per-vector
    reduction, no shuffle of the embedding table."""
    emb = _emb(spark, sf_dir)
    cents = emb.filter(
        (F.col("vec_id") % CENTROID_STRIDE == 0)
        & (F.col("vec_id") < CENTROID_STRIDE * n_cells)
    ).select(
        (F.col("vec_id") / CENTROID_STRIDE).cast("int").alias("cell"),
        F.col("v").alias("cv"),
    )
    scored = emb.crossJoin(F.broadcast(cents)).withColumn(
        "dist2", F.expr(_dist2("v", "cv"))
    )
    best = scored.groupBy("vec_id").agg(
        F.min(F.struct("dist2", "cell")).alias("m")
    )
    return best.select("vec_id", F.col("m.cell").alias("cell"))


def ann_ivf_topk(
    spark: SparkSession,
    sf_dir: str,
    n_queries: int = 10,
    k: int = 3,
    n_cells: int = N_CELLS,
    n_probe: int = 2,
) -> DataFrame:
    """IVF ANN: each query probes its ``n_probe`` nearest cells and ranks
    only the vectors assigned there — candidates per query ≈ n_probe × N /
    n_cells instead of N. Equi-join on cell id; no quadratic stage. The
    exact-cosine re-rank uses the same fold arithmetic as the oracle."""
    emb = _emb(spark, sf_dir)
    cents = emb.filter(
        (F.col("vec_id") % CENTROID_STRIDE == 0)
        & (F.col("vec_id") < CENTROID_STRIDE * n_cells)
    ).select(
        (F.col("vec_id") / CENTROID_STRIDE).cast("int").alias("cell"),
        F.col("v").alias("cv"),
    )
    assign = ivf_cell_assignments(spark, sf_dir, n_cells)
    queries = emb.filter(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("query_id"), F.col("v").alias("va")
    )
    wq = Window.partitionBy("query_id").orderBy("qdist2", "cell")
    probes = (
        queries.crossJoin(F.broadcast(cents))
        .withColumn("qdist2", F.expr(_dist2("va", "cv")))
        .withColumn("prn", F.row_number().over(wq))
        .filter(F.col("prn") <= n_probe)
        .select("query_id", "va", "cell")
    )
    cands = emb.join(assign, "vec_id").select(
        F.col("vec_id").alias("neighbor_id"), F.col("v").alias("vb"), "cell"
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos_raw"), "neighbor_id")
    return (
        probes.join(cands, "cell")
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
