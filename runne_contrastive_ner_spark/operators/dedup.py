"""Deduplication family over the ``documents`` table — the operators a
large-scale training-data pipeline needs (exact, MinHash+LSH, SimHash,
n-gram Jaccard, embedding-cosine near-dup), each expressed with JVM-side
builtin functions (no Python in the hot path) and each DuckDB-oracle-checked.

Portability contract: every hash is the md5-derived integer from
functions/hashing.py, computed with the SAME SQL in Spark and DuckDB, so
signatures and pair sets match bit-for-bit.

Scale notes:
* shingling/minhashing is a narrow map + one groupBy(doc) — shuffle volume
  is O(docs × n_perms), independent of text length after the map;
* LSH banding turns the quadratic candidate problem into an equi-join on
  band keys (the scale path); the all-pairs Jaccard/cosine variants are
  correctness baselines, quadratic by construction, and bounded to small
  dimension tables (embeddings: one broadcast side).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.hashing import spark_md5_int_sql
from .relational import load, load_floor

N_PERMS = 16
BAND_SIZE = 4
SIMHASH_BITS = 32
MOD_FP = 1_000_000_007


def _tokens(col: str = "text"):
    return F.split(F.col(col), " ")


def _shingles(tokens_col: str = "toks", n: int = 3):
    """Distinct word n-grams as space-joined strings (builtin higher-order
    functions only)."""
    # guard: Spark's sequence(1, 0) produces a DESCENDING [1, 0], so short
    # documents must short-circuit to an empty array
    return F.array_distinct(
        F.expr(
            f"IF(size({tokens_col}) < {n}, array(),"
            f" transform(sequence(1, size({tokens_col}) - {n - 1}),"
            f" i -> concat_ws(' ', slice({tokens_col}, i, {n}))))"
        )
    )


def doc_shingles(spark: SparkSession, sf_dir: str) -> DataFrame:
    # load_floor: the tokenize + shingle transform + per-shingle md5 all
    # run in the scan stage — without the parallelism floor a one-split
    # parquet pins them to a single core (measured: the whole minhash
    # family was scan-task-bound at sf1.0)
    return (
        load_floor(spark, sf_dir, "documents", "doc_id")
        .select(F.col("doc_id").cast("bigint").alias("doc_id"), _tokens().alias("toks"))
        .select("doc_id", F.explode(_shingles()).alias("shingle"))
        .filter(F.col("shingle") != "")
    )


def exact_dup_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup via content hash (hash-groupBy)."""
    docs = load_floor(spark, sf_dir, "documents", "doc_id").select(
        F.md5("text").alias("h")
    )
    return docs.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.countDistinct("h").cast("bigint").alias("n_unique"),
        (F.count(F.lit(1)) - F.countDistinct("h")).cast("bigint").alias("n_dup_docs"),
    )


DF_CAP = 16


def ngram_jaccard_pairs(
    spark: SparkSession, sf_dir: str, threshold: float = 0.12, df_cap: int = DF_CAP
) -> DataFrame:
    """n-gram Jaccard via shingle inverted index: explode → equi-join on
    shingle → count common → |A|+|B|-common. Jaccard is a ratio of integers,
    so Spark and DuckDB produce bit-identical doubles.

    Skew bound: a shingle appearing in f documents emits f² join rows, so a
    stop-word shingle is a skew bomb at corpus scale. Standard practice
    (e.g. Google's near-dup pipeline) drops high-document-frequency shingles
    before the pair join — ``df_cap`` bounds per-shingle fan-out at
    df_cap² rows; Jaccard is computed over the capped shingle space (sizes
    are counted AFTER the cap so the ratio stays internally consistent).
    The DuckDB oracle applies the identical cap."""
    sh = doc_shingles(spark, sf_dir)
    # document-frequency cap: the df table is one row per distinct shingle
    # (unbounded at corpus scale — no broadcast hint; AQE decides)
    rare = (
        sh.groupBy("shingle")
        .agg(F.count(F.lit(1)).alias("df"))
        .filter(F.col("df") <= df_cap)
        .select("shingle")
    )
    sh = sh.join(rare, "shingle")
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_sh"))
    a = sh.alias("a")
    b = sh.alias("b")
    common = (
        a.join(b, (F.col("a.shingle") == F.col("b.shingle")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.count(F.lit(1)).alias("common"))
    )
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n_sh").alias("na"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n_sh").alias("nb"))
    # NOTE: no broadcast hint — `sizes` is one row per document, which at
    # corpus scale is NOT a broadcastable dimension; AQE picks the strategy
    return (
        common.join(sa, "doc_a")
        .join(sb, "doc_b")
        .withColumn("jaccard", F.col("common") / (F.col("na") + F.col("nb") - F.col("common")))
        .filter(F.col("jaccard") >= F.lit(threshold))
        .select(
            "doc_a",
            "doc_b",
            F.round("jaccard", 6).alias("jaccard"),
            F.col("common").cast("bigint").alias("common"),
        )
    )


MINHASH_P = 1_000_000_007


def _minhash_consts(n_perms: int) -> tuple[list[int], list[int]]:
    """Per-permutation universal-hash constants, md5-derived so they are
    identical in the DuckDB oracle. A is kept < 2^20 so A*h + B stays well
    inside int64 for 32-bit base hashes (max ~2^52)."""
    from ..functions.hashing import md5_int

    a = [md5_int(f"mh_a{s}") % ((1 << 20) - 1) + 1 for s in range(n_perms)]
    b = [md5_int(f"mh_b{s}") % MINHASH_P for s in range(n_perms)]
    return a, b


def _minhash_wide(spark: SparkSession, sf_dir: str, n_perms: int = N_PERMS) -> DataFrame:
    """ONE row per document with the whole signature as ``n_perms`` minhash
    columns ``mh0..mh{n-1}``: one md5 per shingle occurrence, then a single
    groupBy(doc_id) whose aggregate list is ``n_perms`` independent
    ``min((A_s * h + B_s) % p)`` columns (exact int64 arithmetic,
    bit-identical in DuckDB).

    Why wide instead of the r3-r8 explode(seed)+groupBy(doc, seed) form
    (guide §2.3 "aggregate before you shuffle"): the explode multiplied the
    exchange by n_perms — every shingle occurrence shipped 16 (doc, seed, h)
    rows into the shuffle before any reduction (7.8M rows at sf0.1, 78M at
    sf1.0). The wide aggregate is a plain hash aggregate with 16 long
    buffers, so the map side reduces each partition to one row per distinct
    doc_id BEFORE the exchange: shuffle volume drops from
    O(shingle_occurrences × n_perms) to O(docs × n_perms) packed in one row.
    Unlike the r3 negative result (nested SQL lambdas per document, which
    fell out of whole-stage codegen), the per-column min aggregates are flat
    codegen-friendly expressions and keep the scan's explode parallelism.
    """
    a_consts, b_consts = _minhash_consts(n_perms)
    sh = doc_shingles(spark, sf_dir).select(
        "doc_id", F.expr(spark_md5_int_sql("shingle", hex_digits=8)).alias("h")
    )
    mins = [
        F.min(
            (F.col("h") * F.lit(a_consts[k]) + F.lit(b_consts[k])) % F.lit(MINHASH_P)
        ).alias(f"mh{k}")
        for k in range(n_perms)
    ]
    return sh.groupBy("doc_id").agg(*mins)


def minhash_signatures(spark: SparkSession, sf_dir: str, n_perms: int = N_PERMS) -> DataFrame:
    """MinHash signature rows (doc_id, seed, minhash) — the declared-query
    long form, produced by unpivoting the wide per-document signature with
    ``stack`` (a pure projection: the n_perms-fold row expansion happens
    AFTER the aggregation instead of before the shuffle as in r3-r8)."""
    wide = _minhash_wide(spark, sf_dir, n_perms)
    stack_args = ", ".join(f"{k}L, mh{k}" for k in range(n_perms))
    return wide.selectExpr(
        "doc_id", f"stack({n_perms}, {stack_args}) AS (seed, minhash)"
    )


def minhash_lsh_candidates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH banding: 16 perms → 4 bands of 4; candidate pairs are docs
    sharing any band key (equi-join on the band hash — the 100 TB path:
    no quadratic comparison anywhere).

    Band keys are computed straight from the wide per-document signature
    (band b covers seeds 4b..4b+3, i.e. columns mh{4b}..mh{4b+3}), so the
    r3-r8 second groupBy(doc, band) pivot is gone: the only pre-join
    exchange is the wide signature's single groupBy(doc_id). The md5 band
    key itself is unchanged — md5(band ":" m0 ":" m1 ":" m2 ":" m3) — so
    the candidate-pair set is bit-identical to the DuckDB oracle."""
    wide = _minhash_wide(spark, sf_dir)
    n_bands = N_PERMS // BAND_SIZE
    keys = [
        F.md5(
            F.concat_ws(
                ":",
                F.lit(str(band)),
                *[
                    F.col(f"mh{band * BAND_SIZE + k}").cast("string")
                    for k in range(BAND_SIZE)
                ],
            )
        )
        for band in range(n_bands)
    ]
    banded = wide.select(
        "doc_id", F.explode(F.array(*keys)).alias("band_key")
    )
    # self-join: without a barrier BOTH sides replay the whole
    # scan → shingle → md5 → aggregate lineage (2x the expensive work).
    # The banded table is docs x n_bands rows of (bigint, 32-char string)
    # — dictionary-sized at any scale — so one lazy localCheckpoint
    # (guide §3.3) computes the signature once and feeds both sides.
    banded = banded.localCheckpoint(eager=False)
    a = banded.alias("a")
    b = banded.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band_key") == F.col("b.band_key"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )


def dedup_clusters(
    spark: SparkSession, sf_dir: str, threshold: float = 0.9
) -> DataFrame:
    """The materialized product of the dedup family: LSH candidate pairs →
    exact-Jaccard verification of ONLY those pairs → connected components →
    survivor election (keep the minimum doc_id per cluster). A 100 TB
    pipeline consumes exactly this artifact — verified near-dup clusters
    with a canonical keeper — not raw candidate pairs.

    Rows: one per member of a multi-document cluster:
    (doc_id, cluster_id, cluster_size, is_survivor).

    Scale shape: all quadratic work is bounded by the banded LSH join;
    exact verification builds shingle ARRAYS only for candidate documents
    (semi-join first), then computes Jaccard per candidate pair with
    array_intersect — O(pairs × doc_len), no shingle-level fan-out; CC is
    the O(log d) alternating large-star/small-star."""
    cands = minhash_lsh_candidates(spark, sf_dir)
    cand_docs = (
        cands.select(F.col("doc_a").alias("doc_id"))
        .unionByName(cands.select(F.col("doc_b").alias("doc_id")))
        .distinct()
    )
    arrays = (
        doc_shingles(spark, sf_dir)
        .join(cand_docs, "doc_id")
        .groupBy("doc_id")
        .agg(F.collect_set("shingle").alias("sh"))
    )
    verified = (
        cands.join(
            arrays.select(F.col("doc_id").alias("doc_a"), F.col("sh").alias("sh_a")),
            "doc_a",
        )
        .join(
            arrays.select(F.col("doc_id").alias("doc_b"), F.col("sh").alias("sh_b")),
            "doc_b",
        )
        .withColumn("common", F.size(F.array_intersect("sh_a", "sh_b")))
        .withColumn(
            "jaccard",
            F.col("common")
            / (F.size("sh_a") + F.size("sh_b") - F.col("common")),
        )
        .filter(F.col("jaccard") >= F.lit(threshold))
        # zero-padded string ids: lexicographic min == numeric min in CC
        .select(
            F.lpad(F.col("doc_a").cast("string"), 12, "0").alias("src"),
            F.lpad(F.col("doc_b").cast("string"), 12, "0").alias("dst"),
        )
    )
    from .components import connected_components

    comp = connected_components(verified)
    sizes = comp.groupBy("component").agg(
        F.count(F.lit(1)).cast("bigint").alias("cluster_size")
    )
    return (
        comp.join(sizes, "component")
        .select(
            F.col("node").cast("bigint").alias("doc_id"),
            F.col("component").cast("bigint").alias("cluster_id"),
            "cluster_size",
            (F.col("node") == F.col("component")).alias("is_survivor"),
        )
    )


def simhash_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    """32-bit SimHash per document: token-count-weighted bit votes over the
    portable token hash.

    Shape (r9, guide §2.3/§2.4): ONE wide groupBy(doc_id) whose aggregate
    list is the 32 per-bit vote sums ``sum(2*((h >> b) & 1) - 1)`` computed
    per token OCCURRENCE, followed by a pure projection that assembles the
    signature. Summing ±1 per occurrence is integer-identical to the
    oracle's per-distinct-token ``(2*bit - 1) * cnt`` weighting (the count
    is just the number of occurrence terms), and ``(h >> b) & 1`` equals
    the oracle's ``floor(h / 2^b) % 2`` because h is a non-negative 32-bit
    value. The r3-r8 form paid three exchanges with a 32× bit explode in
    the middle (distinct (doc, tok) rows × 32 bit rows ≈ 100M rows at
    sf1.0); this form's only exchange carries one 32-column row per
    distinct doc_id per map partition (map-side partial aggregation)."""
    toks = (
        load_floor(spark, sf_dir, "documents", "doc_id")
        .select(
            F.col("doc_id").cast("bigint").alias("doc_id"),
            F.explode(_tokens()).alias("tok"),
        )
        .filter(F.col("tok") != "")
        .select("doc_id", F.expr(spark_md5_int_sql("tok", hex_digits=8)).alias("h"))
    )
    votes = [
        F.sum(F.shiftright(F.col("h"), b) % 2 * 2 - 1).alias(f"v{b}")
        for b in range(SIMHASH_BITS)
    ]
    bit_terms = " + ".join(
        f"IF(v{b} >= 0, {1 << b}L, 0L)" for b in range(SIMHASH_BITS)
    )
    return (
        toks.groupBy("doc_id")
        .agg(*votes)
        .select("doc_id", F.expr(bit_terms).alias("simhash"))
    )


def simhash_near_pairs(spark: SparkSession, sf_dir: str, max_hamming: int = 6) -> DataFrame:
    """SimHash near-duplicate pairs: hamming distance (bit_count of xor)
    within ``max_hamming`` over the 32-bit signatures.

    Scale shape: pigeonhole banding. The signature is split into
    ``max_hamming + 1`` bit bands; any pair within hamming ≤ max_hamming
    differs in at most max_hamming bands, so it agrees EXACTLY on at least
    one band — candidate generation is therefore a lossless equi-join on
    (band_idx, band_value), followed by the exact hamming filter. Output is
    identical to the all-pairs formulation (the DuckDB oracle keeps that
    independent form), with no quadratic stage anywhere."""
    n_bands = max_hamming + 1
    base, extra = divmod(SIMHASH_BITS, n_bands)
    widths = [base + (1 if i < extra else 0) for i in range(n_bands)]
    offsets = [sum(widths[:i]) for i in range(n_bands)]
    off_arr = "array(" + ",".join(str(o) for o in offsets) + ")"
    wid_arr = "array(" + ",".join(str(w) for w in widths) + ")"
    sig = simhash_values(spark, sf_dir)
    banded = sig.select(
        "doc_id",
        "simhash",
        F.explode(F.expr(f"sequence(0, {n_bands - 1})")).alias("band"),
    ).withColumn(
        "band_val",
        F.expr(
            f"shiftright(simhash, element_at({off_arr}, band + 1))"
            f" % shiftleft(1L, element_at({wid_arr}, band + 1))"
        ),
    )
    # same self-join barrier as minhash_lsh_candidates: the banded table
    # (docs x n_bands narrow rows) is checkpointed once instead of replaying
    # the token-hash aggregation on both join sides
    banded = banded.localCheckpoint(eager=False)
    a = banded.alias("a")
    b = banded.alias("b")
    # hamming filter BEFORE the distinct (guide §2.3): the filter is a
    # deterministic row predicate, so filter-then-distinct equals
    # distinct-then-filter — but the distinct's exchange now carries only
    # the near pairs instead of every band-collision candidate (the
    # candidate multiset is the near-quadratic part at low band widths;
    # measured 120s → sub-second materialization at sf1.0)
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.band_val") == F.col("b.band_val"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.expr("bit_count(a.simhash ^ b.simhash)").cast("bigint").alias(
                "hamming"
            ),
        )
        .filter(F.col("hamming") <= max_hamming)
        .distinct()
        .select("doc_a", "doc_b", "hamming")
    )


def embedding_neardup_pairs(
    spark: SparkSession,
    sf_dir: str,
    threshold: float = 0.3,
    method: str = "lsh",
    n_tables: int = 24,
    n_planes: int = 2,
) -> DataFrame:
    """Embedding-cosine near-duplicates. Double math matches the DuckDB
    oracle term-for-term (sequential left-fold sums).

    ``method="lsh"`` (default): candidates from multi-table sign-LSH
    (similarity.lsh_candidate_pairs — an equi-join on (table, bucket), no
    quadratic stage) followed by the exact cosine re-rank. With the default
    (2 planes × 24 tables) the measured recall vs the all-pairs form is 1.0
    on the driver corpus at BOTH sf0.01 and sf0.1 (asserted by
    tests/test_dedup_scale.py), which is why the independent all-pairs
    DuckDB oracle stays green. Honesty note: at this low threshold (0.3 —
    barely-correlated vectors) recall-1.0 forces near-complete candidate
    coverage, so LSH wins no WORK at this threshold; what it buys is the
    PLAN SHAPE — no BroadcastNestedLoopJoin/cartesian stage, bounded bucket
    fan-out. At production near-dup thresholds (≥ 0.9) the same operator
    with more planes per table is genuinely sub-quadratic.

    ``method="exact"``: the all-pairs correctness baseline, kept for tests.
    """
    emb = load_floor(spark, sf_dir, "embeddings", "vec_id").select(
        F.col("vec_id").cast("bigint").alias("vec_id"),
        F.col("embedding").cast("array<double>").alias("v"),
    )
    a = emb.select(F.col("vec_id").alias("vec_a"), F.col("v").alias("va"))
    b = emb.select(F.col("vec_id").alias("vec_b"), F.col("v").alias("vb"))
    if method == "exact":
        pairs = a.join(b, F.col("vec_a") < F.col("vec_b"))
    elif method == "lsh":
        from .similarity import lsh_candidate_pairs

        cand = lsh_candidate_pairs(emb, n_tables=n_tables, n_planes=n_planes)
        pairs = cand.join(a, "vec_a").join(b, "vec_b")
    else:
        raise ValueError(f"unknown method {method!r}")
    dot = "aggregate(zip_with(va, vb, (x, y) -> x * y), 0D, (acc, v) -> acc + v)"
    na = "sqrt(aggregate(zip_with(va, va, (x, y) -> x * y), 0D, (acc, v) -> acc + v))"
    nb = "sqrt(aggregate(zip_with(vb, vb, (x, y) -> x * y), 0D, (acc, v) -> acc + v))"
    return (
        pairs.withColumn("cos", F.expr(f"({dot}) / (({na}) * ({nb}))"))
        .filter(F.col("cos") >= F.lit(threshold))
        .select("vec_a", "vec_b", F.round("cos", 6).alias("cos"))
    )
