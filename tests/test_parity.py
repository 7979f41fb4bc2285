"""E2E parity: the distributed engine vs the sequential reference emulator
(SURVEY.md §5.2.3) on the punctuation/accent/quote-rich synthetic corpus,
with the triple P/R ≥ 0.95 target (BASELINE.json metric) asserted explicitly
— and per-turn text equality under stable turn ordering (the input_hint
invariant) checked on the way in."""

from pyspark.sql import functions as F

from runne_contrastive_ner_spark.operators.linking import canonicalize
from runne_contrastive_ner_spark.operators.mentions import extract_mentions
from runne_contrastive_ner_spark.operators.predicates import induce_predicates
from runne_contrastive_ner_spark.sources.transcripts import from_documents, synthesize

from .reference_emulator import (
    emulate_mentions,
    emulate_triples,
    precision_recall,
)

SF_DIR = "/root/testdata/sf0.001"


def _engine_triples(spark, transcripts):
    mentions = extract_mentions(transcripts)
    _, _, linked = canonicalize(spark, mentions)
    return {
        (r.conv_id, r.subj, r.pred, r.obj, r.src_turn_idx)
        for r in induce_predicates(linked, k=2).collect()
    }


class TestParity:
    def test_per_turn_text_equality(self, spark):
        """Stable turn ordering + per-turn text equality between the engine's
        transcript source and a direct sequential read of the same input."""
        t = from_documents(spark, SF_DIR)
        engine_rows = [
            (r.conv_id, r.turn_idx, r.text)
            for r in t.orderBy("conv_id", "turn_idx").collect()
        ]
        docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").collect()
        expected = sorted(
            (f"conv-{d.doc_id % 40:04d}", d.doc_id // 40, d.text) for d in docs
        )
        assert engine_rows == expected

    def test_mention_parity_synthetic(self, spark):
        """Span-set equality on the synthetic corpus (nested entities,
        adjacent same-type, accents, quotes, empty turns, long skew conv)."""
        t = synthesize(spark, n_convs=8, turns_per_conv=8, long_conv_turns=60).cache()
        turns = [(r.conv_id, r.turn_idx, r.text) for r in t.collect()]
        expected = {
            (c, i, ty, a, b) for c, i, ty, a, b, _ in emulate_mentions(turns)
        }
        got = {
            (r.conv_id, r.turn_idx, r.type, r.start, r.end)
            for r in extract_mentions(t).collect()
        }
        assert got == expected

    def test_triple_pr_target_synthetic(self, spark):
        t = synthesize(spark, n_convs=8, turns_per_conv=8, long_conv_turns=60).cache()
        turns = [(r.conv_id, r.turn_idx, r.text) for r in t.collect()]
        expected = emulate_triples(emulate_mentions(turns), k=2)
        got = _engine_triples(spark, t)
        p, r = precision_recall(got, expected)
        assert p >= 0.95 and r >= 0.95, (p, r, len(got), len(expected))
        # in fact the engine must match the sequential semantics exactly
        assert got == expected

    def test_triple_pr_target_testdata(self, spark):
        t = from_documents(spark, SF_DIR).cache()
        turns = [(r.conv_id, r.turn_idx, r.text) for r in t.collect()]
        expected = emulate_triples(emulate_mentions(turns), k=2)
        got = _engine_triples(spark, t)
        p, r = precision_recall(got, expected)
        assert p == 1.0 and r == 1.0, (p, r)
