"""Training-prep operators (reference pipeline §3.2: prepare_trainset.py).

``build_ner_trainset`` — the Spark re-expression of
``build_trainset_for_ner`` (trainset_building.py:62-150): per document,
sentenize with entity assignment (T9), tokenize (T3), per-type {0,1,2}
indicators (T8), 5-class targets (M12), and long-sequence re-chunking (M13).
One pandas UDF emits one row per (doc, sentence, chunk); labels are stored
as compact class-id arrays (one per entity type) rather than one-hot — the
one-hot expansion is a trivial view at training time, and class ids shrink
shuffle volume 5x.

``span_inventory`` — A4 (trainset_building.py:162-233): per-type span
statistics over the mentions table.

``siamese_pair_sample`` — J3 (trainset_building.py:243-279) re-expressed
deterministically: the reference's sequential random.choice pair sampler is
replaced by content-hash ranking (stratified per type, symmetric dedup by
construction) so the sample is reproducible under any parallelism.

``max_seq_len`` — A3 (trainset_building.py:72-86): corpus-wide max
subtoken-sequence length.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.hashing import md5_int, spark_md5_int_sql
from ..functions.sentenize import sentenize_text
from ..functions.tokenizer import tokenize_text
from ..functions.trainset_kernel import (
    assign_entities_to_sentences,
    chunk_sequence,
    classes_from_indicator,
    indicator_for_type,
)
from ..functions.vocab import ENTITY_TYPES

TRAINSET_SCHEMA = (
    "id long, sent_idx int, chunk_idx int, pieces array<string>,"
    " token_ids array<int>, labels array<array<int>>"
)
VOCAB_SIZE = 30522  # BERT-base-sized id space for the hash stand-in


def build_ner_trainset(
    docs: DataFrame,
    entity_types: list[str] | None = None,
    max_seq_len: int = 128,
    bert_dir: str | None = None,
) -> DataFrame:
    """docs(id, text, ners: array<struct<type,start,end>>) → trainset rows.
    ``bert_dir`` switches subtokenization to real WordPiece (vocab loaded
    once per Python worker via the path-memoized load_wordpiece)."""
    entity_types = ENTITY_TYPES if entity_types is None else entity_types

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        wp = None
        if bert_dir is not None:
            from runne_contrastive_ner_spark.functions.wordpiece import (
                load_wordpiece,
            )

            wp = load_wordpiece(bert_dir)
        for pdf in batches:
            rows = {k: [] for k in ("id", "sent_idx", "chunk_idx", "pieces", "token_ids", "labels")}
            for doc_id, text, ners in zip(pdf["id"], pdf["text"], pdf["ners"]):
                # ners arrives as a numpy array of dicts from Arrow — no
                # truthiness on arrays
                span_list = [] if ners is None else list(ners)
                spans = [(n["type"], int(n["start"]), int(n["end"])) for n in span_list]
                bounds = sentenize_text(text or "")
                per_sent = assign_entities_to_sentences(text or "", spans, bounds)
                for s_idx, ((s0, s1), ents) in enumerate(zip(bounds, per_sent)):
                    words, subtokens = tokenize_text(text[s0:s1], wp=wp)
                    if not subtokens:
                        continue
                    pieces = [p for p, _, _ in subtokens]
                    # md5-derived ids: Python's hash() is salted per process
                    # and would make the trainset nondeterministic across
                    # workers
                    ids = [md5_int(p, 8) % VOCAB_SIZE for p in pieces]
                    per_type_classes = []
                    for etype in entity_types:
                        t_spans = [(a, b) for t, a, b in ents if t == etype]
                        ind = indicator_for_type(subtokens, t_spans)
                        per_type_classes.append(classes_from_indicator(ind))
                    piece_chunks = chunk_sequence(pieces, max_seq_len)
                    id_chunks = chunk_sequence(ids, max_seq_len)
                    label_chunks = [chunk_sequence(c, max_seq_len) for c in per_type_classes]
                    for c_idx in range(len(piece_chunks)):
                        rows["id"].append(int(doc_id))
                        rows["sent_idx"].append(s_idx)
                        rows["chunk_idx"].append(c_idx)
                        rows["pieces"].append(piece_chunks[c_idx])
                        rows["token_ids"].append(id_chunks[c_idx])
                        rows["labels"].append([lc[c_idx] for lc in label_chunks])
            yield pd.DataFrame(rows)

    return docs.select("id", "text", "ners").mapInPandas(run, schema=TRAINSET_SCHEMA)


def span_inventory(mentions: DataFrame) -> DataFrame:
    """A4: per-type span statistics (count, distinct surfaces, length range)."""
    return (
        mentions.groupBy("type")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_spans"),
            F.countDistinct("surface_norm").cast("bigint").alias("n_surfaces"),
            F.min(F.col("end") - F.col("start")).cast("bigint").alias("min_len"),
            F.max(F.col("end") - F.col("start")).cast("bigint").alias("max_len"),
        )
        .orderBy("type")
    )


def siamese_pair_sample(
    mentions: DataFrame, per_type: int = 20, neg_keep_mod: int = 10, neg_keep: int = 3
) -> DataFrame:
    """J3, deterministic: take the ``per_type`` hash-ranked mentions per
    type; all same-type pairs are positives (label 1); cross-type pairs are
    kept when (key_a + key_b) % neg_keep_mod < neg_keep (≈30%, matching the
    reference's P(same-type)=0.3 stratification intent). Symmetric dedup is
    by construction (key_a < key_b or type_a < type_b)."""
    keyed = mentions.withColumn(
        "key",
        F.expr(
            spark_md5_int_sql(
                "concat(conv_id, ':', cast(turn_idx as string), ':', type, ':',"
                " cast(start as string))"
            )
        ),
    )
    w = Window.partitionBy("type").orderBy("key")
    sel = (
        keyed.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= per_type)
        .select("type", "key")
    )
    a = sel.select(F.col("type").alias("type_a"), F.col("key").alias("key_a"))
    b = sel.select(F.col("type").alias("type_b"), F.col("key").alias("key_b"))
    pos = a.join(
        b, (F.col("type_a") == F.col("type_b")) & (F.col("key_a") < F.col("key_b"))
    ).withColumn("label", F.lit(1))
    neg = (
        a.join(b, F.col("type_a") < F.col("type_b"))
        .filter((F.col("key_a") + F.col("key_b")) % neg_keep_mod < neg_keep)
        .withColumn("label", F.lit(0))
    )
    cols = ["type_a", "key_a", "type_b", "key_b", "label"]
    return pos.select(*cols).unionByName(neg.select(*cols))


SPAN_ROWS_SCHEMA = (
    "id long, sent_idx int, chunk_idx int, type string,"
    " sub_start int, sub_end int, token_ids array<int>"
)


def trainset_span_rows(trainset: DataFrame, entity_types: list[str] | None = None) -> DataFrame:
    """Span inventory in subtoken space (A4, trainset_building.py:162-233):
    one row per contiguous non-O label run, carrying the chunk's token ids —
    the raw material for Siamese pair tensors."""
    entity_types = ENTITY_TYPES if entity_types is None else entity_types

    def run(batches):
        for pdf in batches:
            rows = {k: [] for k in ("id", "sent_idx", "chunk_idx", "type", "sub_start", "sub_end", "token_ids")}
            for rid, s_idx, c_idx, ids, labels in zip(
                pdf["id"], pdf["sent_idx"], pdf["chunk_idx"], pdf["token_ids"], pdf["labels"]
            ):
                for t_idx, plane in enumerate(labels):
                    start = -1
                    plane = list(plane)
                    for pos, cls in enumerate(plane + [0]):
                        if cls != 0 and start < 0:
                            start = pos
                        elif cls == 0 and start >= 0:
                            rows["id"].append(int(rid))
                            rows["sent_idx"].append(int(s_idx))
                            rows["chunk_idx"].append(int(c_idx))
                            rows["type"].append(entity_types[t_idx])
                            rows["sub_start"].append(start)
                            rows["sub_end"].append(pos)
                            rows["token_ids"].append(list(ids))
                            start = -1
            yield pd.DataFrame(rows)

    return trainset.mapInPandas(run, schema=SPAN_ROWS_SCHEMA)


def build_siamese_trainset(
    docs: DataFrame,
    per_type: int = 20,
    neg_keep_mod: int = 10,
    neg_keep: int = 3,
    max_seq_len: int = 128,
) -> DataFrame:
    """The full Siamese pair-tensor assembly (trainset_building.py:236-291
    semantics): span inventory → deterministic stratified pair sample →
    (left_ids, left_mask, right_ids, right_mask, label 1=same type).
    Masks are {0,1} per token over the span's subtoken range (the masked
    mean-pool input of siamese_nn.py:86-99)."""
    spans = trainset_span_rows(build_ner_trainset(docs, max_seq_len=max_seq_len))
    mask = F.expr(
        "transform(sequence(1, size(token_ids)), i ->"
        " IF(i - 1 >= sub_start AND i - 1 < sub_end, 1, 0))"
    )
    keyed = spans.withColumn("mask", mask).withColumn(
        "key",
        F.expr(
            spark_md5_int_sql(
                "concat(cast(id as string), ':', cast(sent_idx as string), ':',"
                " cast(chunk_idx as string), ':', type, ':', cast(sub_start as string))"
            )
        ),
    )
    w = Window.partitionBy("type").orderBy("key")
    sel = (
        keyed.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= per_type)
        .select("type", "key", "token_ids", "mask")
    )
    a = sel.select(
        F.col("type").alias("type_a"), F.col("key").alias("key_a"),
        F.col("token_ids").alias("left_ids"), F.col("mask").alias("left_mask"),
    )
    b = sel.select(
        F.col("type").alias("type_b"), F.col("key").alias("key_b"),
        F.col("token_ids").alias("right_ids"), F.col("mask").alias("right_mask"),
    )
    pos = a.join(
        b, (F.col("type_a") == F.col("type_b")) & (F.col("key_a") < F.col("key_b"))
    ).withColumn("label", F.lit(1))
    neg = (
        a.join(b, F.col("type_a") < F.col("type_b"))
        .filter((F.col("key_a") + F.col("key_b")) % neg_keep_mod < neg_keep)
        .withColumn("label", F.lit(0))
    )
    cols = ["left_ids", "left_mask", "right_ids", "right_mask", "label"]
    return pos.select(*cols).unionByName(neg.select(*cols))


def max_seq_len_agg(transcripts: DataFrame) -> DataFrame:
    """A3 over transcripts: max subtoken count per turn, where the
    deterministic subtokenizer emits ceil(len(token)/4) pieces per token and
    tokens follow the engine tokenizer's regex (word runs OR single
    punctuation chars) — expressed as builtin SQL so the DuckDB oracle can
    verify the tokenizer's accounting, punctuation included. (Residual
    caveat: SQL \\w is ASCII in both engines while the Python tokenizer is
    Unicode-aware; identical on ASCII corpora.)"""
    n_sub = F.expr(
        r"""
        aggregate(regexp_extract_all(text, '[^\\W_]+|[^\\s\\w]|_', 0), 0L,
                  (acc, t) -> acc + CAST(ceil(length(t) / 4.0) AS BIGINT))
        """
    )
    return (
        transcripts.select(n_sub.alias("n_subtokens"))
        .agg(
            F.max("n_subtokens").cast("bigint").alias("max_seq_len"),
            F.round(F.avg("n_subtokens"), 4).alias("avg_seq_len"),
        )
    )
