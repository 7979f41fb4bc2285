"""TransformerScorer artifact layer (VERDICT r1 item 7): the full
reference load_ner config-schema contract (ner.py:362-447) validated against
a synthetic artifact directory; the only thing that may fail is the (mocked)
forward pass."""

import json

import numpy as np
import pytest

from runne_contrastive_ner_spark.functions.decode import N_CLASSES
from runne_contrastive_ner_spark.functions.scorer import (
    ArtifactError,
    TransformerScorer,
    load_ner_artifact,
    score_windows,
)

GOOD_CONFIG = {
    "named_entities": ["PERSON", "ORGANIZATION", "LOCATION"],
    "max_sent_len": 128,
    "bert": "bert",
    "base_name": "runne_ner1",
}


@pytest.fixture()
def artifact_dir(tmp_path):
    d = tmp_path / "model"
    d.mkdir()
    (d / "ner.json").write_text(json.dumps(GOOD_CONFIG))
    (d / "ner.h5").write_bytes(b"\x89HDF\r\n")  # placeholder weights blob
    bert = d / "bert"
    bert.mkdir()
    (bert / "config.json").write_text(
        json.dumps({"model_type": "bert", "max_position_embeddings": 512,
                    "hidden_size": 768, "pad_token_id": 0})
    )
    return d


def test_artifact_loads_and_wires(artifact_dir):
    art = load_ner_artifact(str(artifact_dir))
    assert art["named_entities"] == ["PERSON", "ORGANIZATION", "LOCATION"]
    assert art["max_sent_len"] == 128
    # relative bert resolved inside the artifact dir (ner.py:432-434)
    assert art["bert_path"] == str(artifact_dir / "bert")
    assert art["weights_path"].endswith("ner.h5")


@pytest.mark.parametrize(
    "mutate,needle",
    [
        (lambda c: c.pop("named_entities"), "named_entities"),
        (lambda c: c.pop("max_sent_len"), "max_sent_len"),
        (lambda c: c.pop("bert"), "bert"),
        (lambda c: c.pop("base_name"), "base_name"),
        (lambda c: c.update(max_sent_len=3), "too small"),
        (lambda c: c.update(max_sent_len="128"), "int"),
        (lambda c: c.update(max_sent_len=1024), "max_position_embeddings"),
        (lambda c: c.update(named_entities="PERSON"), "list"),
        (lambda c: c.update(named_entities=["bad-name"]), "bad"),
        (lambda c: c.update(base_name="1bad name"), "valid TF"),
    ],
)
def test_artifact_schema_violations_raise(artifact_dir, mutate, needle):
    cfg = dict(GOOD_CONFIG)
    mutate(cfg)
    (artifact_dir / "ner.json").write_text(json.dumps(cfg))
    with pytest.raises((ArtifactError, ValueError)) as exc:
        load_ner_artifact(str(artifact_dir))
    assert needle.split()[0].lower() in str(exc.value).lower()


def test_missing_files_raise(tmp_path, artifact_dir):
    with pytest.raises(ArtifactError, match="does not exist"):
        load_ner_artifact(str(tmp_path / "nope"))
    (artifact_dir / "ner.h5").unlink()
    with pytest.raises(ArtifactError, match="ner.h5"):
        load_ner_artifact(str(artifact_dir))


def test_non_bert_encoder_rejected(artifact_dir):
    (artifact_dir / "bert" / "config.json").write_text(
        json.dumps({"model_type": "roberta", "max_position_embeddings": 512})
    )
    with pytest.raises(ArtifactError, match="not BERT"):
        load_ner_artifact(str(artifact_dir))


def test_scorer_wires_and_fails_only_at_forward(artifact_dir):
    scorer = TransformerScorer(str(artifact_dir))
    assert scorer.entity_types == ["PERSON", "ORGANIZATION", "LOCATION"]
    assert scorer.window == 128
    with pytest.raises(NotImplementedError):
        scorer.score_pieces(["hello", "##wor", "##ld"])


def test_scorer_with_injected_forward(artifact_dir):
    """The window-slicing glue works end-to-end once a forward exists."""

    def fake_loader():
        def forward(pieces):
            n = len(pieces)
            out = np.full((len(GOOD_CONFIG["named_entities"]), n, N_CLASSES), -2.0)
            out[:, :, 0] = 2.0  # all-O logits
            return out

        return forward

    scorer = TransformerScorer(str(artifact_dir), model_loader=fake_loader)
    logits = score_windows(scorer, ["tok"] * 300)  # forces 3 windows of 128
    assert logits.shape == (3, 300, N_CLASSES)
    assert np.all(logits[:, :, 0] == 2.0)


# --- numpy forward (ner.npz bundle) ------------------------------------------


@pytest.fixture()
def npz_artifact_dir(artifact_dir):
    """artifact_dir + an engine-native weight bundle and a tiny vocab."""
    from runne_contrastive_ner_spark.functions.bert_numpy import (
        synthetic_bundle,
    )

    vocab = ["[PAD]", "[UNK]", "[CLS]", "[SEP]"] + list("abcdefgh") + [
        "##" + c for c in "abcdefgh"
    ] + ["hello", "world"]
    (artifact_dir / "bert" / "vocab.txt").write_text("\n".join(vocab))
    w = synthetic_bundle(
        GOOD_CONFIG["named_entities"], vocab_size=len(vocab), max_pos=128
    )
    np.savez(str(artifact_dir / "ner.npz"), **w)
    return artifact_dir


def test_numpy_forward_matches_naive(npz_artifact_dir):
    """The vectorized encoder must agree with an independent per-position
    loop re-implementation — the in-sandbox stand-in for diffing vs TF."""
    from runne_contrastive_ner_spark.functions.bert_numpy import (
        load_bundle,
        naive_forward,
    )

    m = load_bundle(
        str(npz_artifact_dir / "ner.npz"), GOOD_CONFIG["named_entities"]
    )
    ids = [2, 4, 5, 6, 19, 3, 0, 0]  # [CLS] a b c hello [SEP] pad pad
    fast = m(ids)
    slow = naive_forward(m, ids)
    assert fast.shape == (3, 8, 5)
    assert np.abs(fast - slow).max() < 1e-9


def test_numpy_forward_pad_positions_are_bias_only(npz_artifact_dir):
    from runne_contrastive_ner_spark.functions.bert_numpy import load_bundle

    m = load_bundle(
        str(npz_artifact_dir / "ner.npz"), GOOD_CONFIG["named_entities"]
    )
    out = m([2, 4, 3, 0, 0])
    for t_idx, t in enumerate(GOOD_CONFIG["named_entities"]):
        bias = m.w[f"head.{t}.b"]
        assert np.abs(out[t_idx, 3:] - bias).max() == 0.0  # masked -> bias


def test_transformer_scorer_runs_numpy_bundle(npz_artifact_dir):
    """TransformerScorer end-to-end on the npz path: logits -> valid
    probabilities through the standard window slicing, deterministic."""
    from runne_contrastive_ner_spark.functions.decode import (
        softmax,
        validate_probabilities,
    )

    sc = TransformerScorer(str(npz_artifact_dir))
    pieces = ["[CLS]", "a", "##b", "hello", "world", "[SEP]"]
    logits = score_windows(sc, pieces)
    assert logits.shape == (3, len(pieces), N_CLASSES)
    for t in range(3):
        validate_probabilities(softmax(logits[t], axis=-1))
    again = score_windows(sc, pieces)
    assert np.array_equal(logits, again)


def test_detect_mentions_with_numpy_scorer(npz_artifact_dir):
    from runne_contrastive_ner_spark.operators.mentions import (
        detect_mentions_in_text,
    )

    sc = TransformerScorer(str(npz_artifact_dir))
    out = detect_mentions_in_text("hello world abc.", sc)
    assert isinstance(out, list)
    for etype, a, b in out:
        assert etype in GOOD_CONFIG["named_entities"] and 0 <= a < b


def test_batched_windows_match_per_window(npz_artifact_dir):
    """Multi-window documents run ONE batched encoder forward; results must
    agree with the per-window path to BLAS reduction tolerance."""
    from runne_contrastive_ner_spark.functions.bert_numpy import load_bundle

    m = load_bundle(
        str(npz_artifact_dir / "ner.npz"), GOOD_CONFIG["named_entities"]
    )
    wins = [[2, 4, 5, 3, 0, 0], [2, 19, 20, 6, 7, 3], [2, 3, 0, 0, 0, 0]]
    batched = m.batch(wins)
    for win, got in zip(wins, batched):
        assert np.abs(got - m(win)).max() < 1e-9

    sc = TransformerScorer(str(npz_artifact_dir))
    # a 3-window document through score_windows exercises the batch path;
    # the production scorer runs the bundle at float32 (TF's width), so the
    # batched-vs-per-window agreement bound is float32 BLAS reduction noise
    pieces = (["hello", "world"] * 200)[: 3 * 128 - 5]
    full = score_windows(sc, pieces)
    per_window = np.concatenate(
        [
            sc.score_pieces((pieces + ["[PAD]"] * 400)[i : i + 128])
            for i in range(0, 3 * 128, 128)
        ],
        axis=1,
    )[:, : len(pieces), :]
    assert full.dtype == np.float32
    assert np.abs(full - per_window).max() < 5e-5


def test_float32_forward_matches_float64(npz_artifact_dir):
    """The float32 inference mode (what the reference's TF runtime computes
    in; the production TransformerScorer path) must agree with the float64
    forward to single-precision accumulation tolerance, for both the
    single-sequence and the batched encoder, and must actually run in
    float32 end-to-end (no silent float64 promotion re-doubling the
    matmul cost)."""
    from runne_contrastive_ner_spark.functions.bert_numpy import load_bundle
    from runne_contrastive_ner_spark.functions.decode import softmax

    path = str(npz_artifact_dir / "ner.npz")
    m64 = load_bundle(path, GOOD_CONFIG["named_entities"])
    m32 = load_bundle(path, GOOD_CONFIG["named_entities"], dtype="float32")
    ids = [2, 4, 5, 6, 19, 3, 0, 0]
    out64, out32 = m64(ids), m32(ids)
    assert out32.dtype == np.float32
    assert np.abs(out64 - out32).max() < 1e-4
    # downstream decode consumes probabilities: bound THOSE too
    assert np.abs(softmax(out64, axis=-1) - softmax(out32, axis=-1)).max() < 1e-4
    wins = [[2, 4, 5, 3, 0, 0], [2, 19, 20, 6, 7, 3]]
    for b64, b32 in zip(m64.batch(wins), m32.batch(wins)):
        assert b32.dtype == np.float32
        assert np.abs(b64 - b32).max() < 1e-4
    with pytest.raises(ValueError, match="float32 or float64"):
        load_bundle(path, GOOD_CONFIG["named_entities"], dtype="float16")


def test_vector_erf_matches_math_erf():
    """The vectorized Cody-rational erf (bert_numpy._erf, replacing the
    per-element np.vectorize(math.erf) that dominated the encoder forward)
    must agree with libm to 1 ulp across all three approximation regions
    and their boundaries."""
    import math

    from runne_contrastive_ner_spark.functions.bert_numpy import _erf

    grid = np.concatenate(
        [
            np.linspace(-8.0, 8.0, 40_001),
            np.array([0.0, 1e-300, -1e-300, 0.46875, -0.46875, 4.0, -4.0,
                      6.0, -6.0, 27.0, -27.0]),
        ]
    )
    got = _erf(grid)
    want = np.array([math.erf(v) for v in grid])
    assert np.abs(got - want).max() <= 2.3e-16
    # odd symmetry and saturation
    assert _erf(np.array([0.0]))[0] == 0.0
    assert _erf(np.array([27.0]))[0] == 1.0
    assert _erf(np.array([-27.0]))[0] == -1.0
