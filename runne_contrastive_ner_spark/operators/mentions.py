"""Stage 1 — nested-entity mention detection over transcript turns.

Re-expression of the reference inference path (recognize.py:44-101) as one
``mapInPandas`` iterator UDF:

    per turn text:  sentenize (T7) → tokenize (T3) → window-sliced scoring
    (M1/M2, batched — undoing the reference's batch_size=1) → softmax (M3)
    → probability validation (M4) → per-type constrained greedy decode
    (M5/M6) → subtoken→char spans (M7), rebased by sentence offset.

Output schema (the ``mentions`` table; field order matches the reference
REST contract start/end-exclusive/type, server.py:175-179):

    conv_id string, turn_idx int, type string, start int, end int,
    surface string, surface_norm string

Scale design:
* the scorer is constructed ONCE per Python worker partition (lazy init in
  the iterator; the reference reloads nothing per doc, we amortize per task);
* per-sentence work is embarrassingly parallel — the stage needs NO shuffle;
  an optional salted repartition spreads long conversations (skew) across
  tasks since rows, not conversations, are the unit of work;
* a provable all-O fast path skips the decoder for entity types with no
  evidence in a sentence (exact, not approximate: from state O the O-column
  transition weight is ≥ 1/3, so if max non-O probability < p(O)/3 at every
  position the greedy pass can never leave O).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.decode import (
    O,
    decode_entity_spans,
    softmax,
    spans_from_states,  # noqa: F401  (re-exported for tests)
    subtoken_spans_to_char_spans,
)
from ..functions.scorer import GazetteerScorer, Scorer, score_windows_active
from ..functions.sentenize import sentenize_text
from ..functions.textnorm import normalize_surface
from ..functions.tokenizer import tokenize_text
from ..functions.vocab import ENTITY_TYPES, TEST_GAZETTEER

MENTIONS_SCHEMA = (
    "conv_id string, turn_idx int, type string, start int, end int,"
    " surface string, surface_norm string"
)


def detect_mentions_in_text(
    text: str, scorer: Scorer, wp=None
) -> list[tuple[str, int, int]]:
    """(type, char_start, char_end_exclusive) for one turn text — the same
    per-document kernel the reference runs at recognize.py:47-101. ``wp``
    (a WordPieceTokenizer) selects real subword segmentation; None selects
    the fixed-width fallback."""
    out: list[tuple[str, int, int]] = []
    if not text or not text.strip():
        return out
    for s_start, s_end in sentenize_text(text):
        sentence = text[s_start:s_end]
        words, subtokens = tokenize_text(sentence, wp=wp)
        if not words:
            continue
        pieces = [p for p, _, _ in subtokens]
        bounds = [(b0, b1) for _, b0, b1 in subtokens]
        # sparse scoring: only type planes with evidence are materialized;
        # absent planes are the all-O default, which provably decodes to
        # all-O (see Scorer.score_pieces_active) — the exact fast path
        active = score_windows_active(scorer, pieces, words=words)
        emits_proba = getattr(scorer, "emits_proba", False)
        transitions = None  # shared across type planes (shape-only)
        for t_idx, plane in active.items():
            proba = plane if emits_proba else softmax(plane, axis=-1)
            if np.all(proba[:, O] / 3.0 > proba[:, 1:].max(axis=1)):
                continue
            if transitions is None:
                from runne_contrastive_ner_spark.functions.decode import (
                    word_transition_stack,
                )

                transitions = word_transition_stack(words)
            spans = decode_entity_spans(proba, words, transitions=transitions)
            etype = scorer.entity_types[t_idx]
            for c0, c1 in subtoken_spans_to_char_spans(spans, bounds):
                out.append((etype, s_start + c0, s_start + c1))
    return out


def extract_mentions(
    transcripts: DataFrame,
    gazetteer: dict[str, str] | None = None,
    entity_types: list[str] | None = None,
    scorer_factory=None,
    salt_partitions: int | None = None,
    bert_dir: str | None = None,
) -> DataFrame:
    """transcripts(conv_id, turn_idx, role, text, tool, ts) → mentions.

    ``bert_dir`` (path to vocab.txt + tokenizer_config.json) switches the
    tokenizer to real WordPiece; the vocab is loaded lazily ONCE per Python
    worker (load_wordpiece is lru_cached on the path — only the path string
    is captured in the closure, not the 120k-entry set)."""
    gazetteer = TEST_GAZETTEER if gazetteer is None else gazetteer
    entity_types = ENTITY_TYPES if entity_types is None else entity_types

    def default_factory() -> Scorer:
        return GazetteerScorer(gazetteer, entity_types)

    factory = scorer_factory or default_factory

    src = transcripts.select("conv_id", "turn_idx", "text")
    if salt_partitions:
        # skew guard: hash on (conv_id, turn_idx) so one long conversation
        # never pins a single task (SURVEY.md §7.2)
        src = src.repartition(salt_partitions, F.col("conv_id"), F.col("turn_idx"))
    else:
        # parallelism floor: a small parquet input arrives as ONE split, which
        # would pin the whole pandas-UDF scan to a single core. At production
        # scale the input has >= defaultParallelism splits and this is a
        # no-op (no exchange added); below it, one cheap round-robin shuffle
        # of the raw text buys full-cluster fan-out of the expensive stage.
        spark = transcripts.sparkSession
        target = spark.sparkContext.defaultParallelism
        if src.rdd.getNumPartitions() < target:
            src = src.repartition(target, F.col("conv_id"), F.col("turn_idx"))

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        scorer = factory()  # once per task
        wp = None
        if bert_dir is not None:
            from runne_contrastive_ner_spark.functions.wordpiece import (
                load_wordpiece,
            )

            wp = load_wordpiece(bert_dir)
        for pdf in batches:
            rows: dict[str, list] = {
                "conv_id": [], "turn_idx": [], "type": [],
                "start": [], "end": [], "surface": [], "surface_norm": [],
            }
            for conv_id, turn_idx, text in zip(
                pdf["conv_id"], pdf["turn_idx"], pdf["text"]
            ):
                text = text or ""
                for etype, c0, c1 in detect_mentions_in_text(text, scorer, wp=wp):
                    surface = text[c0:c1]
                    rows["conv_id"].append(conv_id)
                    rows["turn_idx"].append(int(turn_idx))
                    rows["type"].append(etype)
                    rows["start"].append(c0)
                    rows["end"].append(c1)
                    rows["surface"].append(surface)
                    rows["surface_norm"].append(normalize_surface(surface))
            yield pd.DataFrame(rows)

    return src.mapInPandas(run, schema=MENTIONS_SCHEMA)
