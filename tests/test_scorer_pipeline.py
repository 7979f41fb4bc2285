"""End-to-end TransformerScorer through the Spark extraction pipeline
(VERDICT r3 item 6): the pure-numpy BERT bundle + real WordPiece vocab run
inside ``extract_mentions``'s Arrow-batched ``mapInPandas`` with per-worker
lazy init, and the distributed spans are identical to the same bundle run
through ``detect_mentions_in_text`` driver-side.

Also pins the batched active-scoring path (ADVICE r3): multi-window
documents through ``score_windows_active`` take ONE model forward per
document via ``score_pieces_batch`` and must agree with the dense
``score_windows`` result plane-for-plane.
"""

from __future__ import annotations

import json

import numpy as np
import pytest

CONFIG = {
    "named_entities": ["PERSON", "ORGANIZATION", "LOCATION"],
    "max_sent_len": 128,
    "bert": "bert",
    "base_name": "runne_ner1",
}


@pytest.fixture(scope="module")
def model_dir(tmp_path_factory):
    from runne_contrastive_ner_spark.functions.bert_numpy import (
        synthetic_bundle,
    )

    d = tmp_path_factory.mktemp("scorer_model")
    (d / "ner.json").write_text(json.dumps(CONFIG))
    (d / "ner.h5").write_bytes(b"\x89HDF\r\n")
    bert = d / "bert"
    bert.mkdir()
    (bert / "config.json").write_text(
        json.dumps(
            {
                "model_type": "bert",
                "max_position_embeddings": 512,
                "hidden_size": 768,
                "pad_token_id": 0,
            }
        )
    )
    vocab = (
        ["[PAD]", "[UNK]", "[CLS]", "[SEP]"]
        + list("abcdefgh")
        + ["##" + c for c in "abcdefgh"]
        + ["hello", "world"]
    )
    (bert / "vocab.txt").write_text("\n".join(vocab))
    w = synthetic_bundle(
        CONFIG["named_entities"], vocab_size=len(vocab), max_pos=128
    )
    np.savez(str(d / "ner.npz"), **w)
    return str(d)


def test_extract_mentions_with_transformer_scorer(spark, model_dir):
    """Spark mapInPandas extraction ≡ driver-side kernel, span for span."""
    from runne_contrastive_ner_spark.functions.scorer import TransformerScorer
    from runne_contrastive_ner_spark.functions.wordpiece import load_wordpiece
    from runne_contrastive_ner_spark.operators.mentions import (
        detect_mentions_in_text,
        extract_mentions,
    )

    texts = [
        "hello world abc.",
        "abcd efgh hello. world cab dab!",
        "",
        "hello hello hello world",
        "gg hh aa bb",
    ]
    rows = [("c%d" % (i % 2), i, t) for i, t in enumerate(texts)]
    transcripts = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, text string"
    )
    bert_dir = f"{model_dir}/bert"

    def factory():
        return TransformerScorer(model_dir)

    got = sorted(
        tuple(r)
        for r in extract_mentions(
            transcripts, scorer_factory=factory, bert_dir=bert_dir
        )
        .select("conv_id", "turn_idx", "type", "start", "end", "surface")
        .collect()
    )

    sc = TransformerScorer(model_dir)
    wp = load_wordpiece(bert_dir)
    want = sorted(
        (cid, idx, etype, c0, c1, t[c0:c1])
        for cid, idx, t in rows
        for etype, c0, c1 in detect_mentions_in_text(t, sc, wp=wp)
    )
    assert got == want


def test_active_multiwindow_uses_one_batched_forward(model_dir):
    """score_windows_active on a 3-window document routes through
    score_pieces_batch (one forward), and its stitched planes equal the
    dense score_windows result."""
    from runne_contrastive_ner_spark.functions import scorer as scorer_mod
    from runne_contrastive_ner_spark.functions.scorer import (
        TransformerScorer,
        score_windows,
        score_windows_active,
    )

    sc = TransformerScorer(model_dir)
    pieces = (["hello", "world", "a", "##b"] * 120)[: 3 * 128 - 7]

    calls = {"batch": 0, "single": 0}
    orig_batch = sc.score_pieces_batch
    orig_single = sc.score_pieces

    def counting_batch(windows):
        calls["batch"] += 1
        return orig_batch(windows)

    def counting_single(p):
        calls["single"] += 1
        return orig_single(p)

    sc.score_pieces_batch = counting_batch
    sc.score_pieces = counting_single
    active = score_windows_active(sc, pieces)
    assert calls == {"batch": 1, "single": 0}

    dense = score_windows(sc, pieces)
    assert set(active) == set(range(len(CONFIG["named_entities"])))
    for t_idx, plane in active.items():
        assert plane.shape == (len(pieces), scorer_mod.N_CLASSES)
        assert np.abs(plane - dense[t_idx]).max() < 1e-9
