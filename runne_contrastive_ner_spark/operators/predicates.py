"""Stage 2 — co-occurrence predicate induction within conversation windows.

The north rule asks for dependency/co-occurrence-based predicate induction
with stable turn ordering (Window over conv_id/turn_idx). Two predicates:

* ``co_occurs_with`` — two canonical entities mentioned in the SAME turn
  (subject < object lexicographically so each unordered pair appears once);
* ``follows`` — subject entity mentioned in turn t, object entity mentioned
  in one of the k preceding turns of the same conversation.

Shuffle design: ONE shuffle on conv_id. Per-turn entity sets are aggregated
first (map-side combine shrinks data before the shuffle), the look-back is a
``Window.partitionBy(conv_id).orderBy(turn_idx).rangeBetween(-k, -1)`` over
those compact per-turn sets — no self-join, no second shuffle. Long
conversations are bounded by k, so window state stays O(k · entities/turn).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

PRED_CO_OCCURS = "co_occurs_with"
PRED_FOLLOWS = "follows"


def conversation_summaries(mentions: DataFrame, entity_col: str = "canonical_id") -> DataFrame:
    """Grouped ``applyInPandas`` over conversations (SURVEY.md §2.8 UDF
    surface): per-conversation rollup computed with per-group pandas logic —
    the shape for conversation-level state that window functions can't
    express (here the logic is simple enough to be oracle-checkable, which
    is the point: the grouped-UDF plumbing is verified value-for-value).

    Output: conv_id, n_mentions, n_turns, n_entities, top_entity (the most
    frequent entity, ties broken by lexicographic min).

    Scale bound: applyInPandas materializes ONE GROUP in executor memory —
    fine for conversations (bounded turn counts), and the summary itself is
    also expressible relationally (the DuckDB oracle's formulation) if a
    corpus ever carries degenerate multi-million-row groups."""
    import pandas as pd

    def summarize(pdf: pd.DataFrame) -> pd.DataFrame:
        counts = pdf[entity_col].value_counts()
        top = sorted(
            counts.index[counts == counts.max()].tolist()
        )[0] if len(counts) else None
        return pd.DataFrame(
            {
                "conv_id": [pdf["conv_id"].iloc[0]],
                "n_mentions": [len(pdf)],
                "n_turns": [pdf["turn_idx"].nunique()],
                "n_entities": [pdf[entity_col].nunique()],
                "top_entity": [top],
            }
        )

    return (
        mentions.select("conv_id", "turn_idx", entity_col)
        .groupBy("conv_id")
        .applyInPandas(
            summarize,
            schema="conv_id string, n_mentions long, n_turns long,"
            " n_entities long, top_entity string",
        )
    )


def turn_entity_sets(mentions: DataFrame, entity_col: str = "canonical_id") -> DataFrame:
    """(conv_id, turn_idx, ents sorted-distinct array) — one row per turn."""
    return (
        mentions.groupBy("conv_id", "turn_idx")
        .agg(F.array_sort(F.collect_set(entity_col)).alias("ents"))
    )


def induce_predicates(
    mentions: DataFrame,
    k: int = 2,
    entity_col: str = "canonical_id",
    persist_registry: list[DataFrame] | None = None,
) -> DataFrame:
    """mentions (with a canonical entity column) → triples
    (conv_id, subj, pred, obj, src_turn_idx), distinct.

    ``persist_registry``: the internally persisted per-turn table is appended
    so callers can unpersist it when the triple lineage is released."""
    turns = turn_entity_sets(mentions, entity_col)

    # rangeBetween (not rowsBetween): "k preceding turns" is defined on
    # turn_idx VALUES, so gaps from entity-free turns are honored
    w = (
        Window.partitionBy("conv_id")
        .orderBy("turn_idx")
        .rangeBetween(-k, -1)
    )
    # persist: both predicate branches (same-turn pairs and look-back pairs)
    # read this compact per-turn table; without it each branch re-runs the
    # groupBy + window (and everything upstream of the mentions table)
    turns = turns.withColumn(
        "prev_ents",
        F.array_distinct(F.flatten(F.coalesce(F.collect_list("ents").over(w), F.array()))),
    ).persist()
    if persist_registry is not None:
        persist_registry.append(turns)

    same_turn = (
        turns.select(
            "conv_id",
            F.col("turn_idx").alias("src_turn_idx"),
            F.explode("ents").alias("subj"),
            F.col("ents"),
        )
        .select(
            "conv_id",
            "src_turn_idx",
            "subj",
            F.explode("ents").alias("obj"),
        )
        .filter(F.col("subj") < F.col("obj"))
        .withColumn("pred", F.lit(PRED_CO_OCCURS))
    )

    follows = (
        turns.select(
            "conv_id",
            F.col("turn_idx").alias("src_turn_idx"),
            F.explode("ents").alias("subj"),
            F.col("prev_ents"),
        )
        .select(
            "conv_id",
            "src_turn_idx",
            "subj",
            F.explode("prev_ents").alias("obj"),
        )
        .withColumn("pred", F.lit(PRED_FOLLOWS))
    )

    cols = ["conv_id", "subj", "pred", "obj", "src_turn_idx"]
    # no distinct needed: both branches explode per-turn SETS and carry the
    # evidence turn in the row key, so every output row is unique by
    # construction — a distinct here would shuffle the full triple set for
    # nothing (removing it made the stage shuffle-free after the window)
    return same_turn.select(*cols).unionByName(follows.select(*cols))


PRED_ELICITS = "elicits"


def induce_role_predicates(linked: DataFrame, transcripts: DataFrame) -> DataFrame:
    """Role-aware predicate induction over conversation structure: subj is
    an entity mentioned in a USER turn, obj an entity mentioned in the
    ASSISTANT turn that immediately follows — the question→answer entity
    flow (`elicits`). Same scale shape as induce_predicates: one shuffle to
    per-(turn, role) entity sets, then an equi-join on (conv_id, turn_idx)
    with a +1 offset; rows are unique by construction (set explodes keyed by
    the evidence turn)."""
    roled = linked.join(
        transcripts.select("conv_id", "turn_idx", "role"),
        ["conv_id", "turn_idx"],
    )
    turns = (
        roled.groupBy("conv_id", "turn_idx", "role")
        .agg(F.array_sort(F.collect_set("canonical_id")).alias("ents"))
    )
    user = turns.filter(F.col("role") == "user").select(
        "conv_id",
        F.col("turn_idx").alias("src_turn_idx"),
        F.explode("ents").alias("subj"),
    )
    asst = turns.filter(F.col("role") == "assistant").select(
        "conv_id",
        (F.col("turn_idx") - 1).alias("src_turn_idx"),
        F.explode("ents").alias("obj"),
    )
    return (
        user.join(asst, ["conv_id", "src_turn_idx"])
        .filter(F.col("subj") != F.col("obj"))
        .select(
            "conv_id",
            "subj",
            F.lit(PRED_ELICITS).alias("pred"),
            "obj",
            "src_turn_idx",
        )
    )
