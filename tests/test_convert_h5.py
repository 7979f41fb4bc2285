"""ner.h5 → ner.npz converter (tools/convert_ner_h5.py) — name-mapping
logic tested against a synthetic HF-style weight tree (no h5py in-sandbox;
read_h5_weights is the only h5py-touching function and is import-gated).

The mocked tree uses the exact variable paths TFBertModel + the reference's
head naming produce (ner.py:249-250, 449-505): conversion must be a pure
renaming — array for array — into the bert_numpy key layout, fail loudly on
unknown or missing weights, and yield a bundle whose forward matches the
original synthetic bundle bit-for-bit.
"""

from __future__ import annotations

import numpy as np
import pytest

from tools.convert_ner_h5 import (
    convert_weights,
    head_layer_name,
    map_weight_name,
)

ENTS = ["PERSON", "WORK_OF_ART", "ORGANIZATION"]
BASE = "runne_ner1"


def hf_tree_from_bundle(bundle: dict) -> dict:
    """Reverse mapping: npz bundle → the HF/Keras weight paths a real
    ner.h5 contains (prefixes included, since matching is suffix-based)."""
    pre = f"BertNLU_{BASE}/tf_bert_model/bert"
    tree = {
        f"{pre}/embeddings/word_embeddings/weight:0": bundle["emb.word"],
        f"{pre}/embeddings/position_embeddings/embeddings:0": bundle["emb.pos"],
        f"{pre}/embeddings/token_type_embeddings/embeddings:0": bundle["emb.type"],
        f"{pre}/embeddings/LayerNorm/gamma:0": bundle["emb.ln.g"],
        f"{pre}/embeddings/LayerNorm/beta:0": bundle["emb.ln.b"],
        # weights the forward ignores, present in every real checkpoint
        f"{pre}/pooler/dense/kernel:0": np.zeros((4, 4)),
        f"{pre}/pooler/dense/bias:0": np.zeros(4),
    }
    n_layers = int(bundle["meta"][0])
    for i in range(n_layers):
        lp = f"{pre}/encoder/layer_._{i}"
        tree.update(
            {
                f"{lp}/attention/self/query/kernel:0": bundle[f"layer{i}.q.w"],
                f"{lp}/attention/self/query/bias:0": bundle[f"layer{i}.q.b"],
                f"{lp}/attention/self/key/kernel:0": bundle[f"layer{i}.k.w"],
                f"{lp}/attention/self/key/bias:0": bundle[f"layer{i}.k.b"],
                f"{lp}/attention/self/value/kernel:0": bundle[f"layer{i}.v.w"],
                f"{lp}/attention/self/value/bias:0": bundle[f"layer{i}.v.b"],
                f"{lp}/attention/output/dense/kernel:0": bundle[f"layer{i}.o.w"],
                f"{lp}/attention/output/dense/bias:0": bundle[f"layer{i}.o.b"],
                f"{lp}/attention/output/LayerNorm/gamma:0": bundle[f"layer{i}.ln1.g"],
                f"{lp}/attention/output/LayerNorm/beta:0": bundle[f"layer{i}.ln1.b"],
                f"{lp}/intermediate/dense/kernel:0": bundle[f"layer{i}.ffn1.w"],
                f"{lp}/intermediate/dense/bias:0": bundle[f"layer{i}.ffn1.b"],
                f"{lp}/output/dense/kernel:0": bundle[f"layer{i}.ffn2.w"],
                f"{lp}/output/dense/bias:0": bundle[f"layer{i}.ffn2.b"],
                f"{lp}/output/LayerNorm/gamma:0": bundle[f"layer{i}.ln2.g"],
                f"{lp}/output/LayerNorm/beta:0": bundle[f"layer{i}.ln2.b"],
            }
        )
    for ent in ENTS:
        head = head_layer_name(ent)
        hp = f"{head}_{BASE}/{head}_{BASE}_"
        tree[f"{hp}/kernel:0"] = bundle[f"head.{ent}.w"]
        tree[f"{hp}/bias:0"] = bundle[f"head.{ent}.b"]
    return tree


@pytest.fixture(scope="module")
def bundle():
    from runne_contrastive_ner_spark.functions.bert_numpy import (
        synthetic_bundle,
    )

    return synthetic_bundle(ENTS, vocab_size=24, max_pos=32)


def test_head_layer_name_mirrors_reference():
    # get_nn_output_name: title() then strip '-' and ':'
    assert head_layer_name("PERSON") == "Person"
    assert head_layer_name("WORK_OF_ART") == "Work_Of_Art"
    assert head_layer_name("LAW-DECREE") == "LawDecree"
    assert head_layer_name("T:IME") == "TIme"


def test_roundtrip_preserves_every_array(bundle):
    tree = hf_tree_from_bundle(bundle)
    got = convert_weights(
        tree, entity_types=ENTS, base_name=BASE, n_heads=2, pad_token_id=0
    )
    want_keys = set(bundle) - {"meta"}
    assert set(got) - {"meta"} == want_keys
    for k in want_keys:
        np.testing.assert_array_equal(got[k], bundle[k])
    assert got["meta"].tolist() == [int(bundle["meta"][0]), 2, 0]


def test_converted_bundle_forward_matches_original(bundle, tmp_path):
    from runne_contrastive_ner_spark.functions.bert_numpy import load_bundle

    tree = hf_tree_from_bundle(bundle)
    got = convert_weights(
        tree,
        entity_types=ENTS,
        base_name=BASE,
        n_heads=int(bundle["meta"][1]),
        pad_token_id=int(bundle["meta"][2]),
    )
    np.savez(str(tmp_path / "ner.npz"), **got)
    m_conv = load_bundle(str(tmp_path / "ner.npz"), ENTS)
    np.savez(str(tmp_path / "orig.npz"), **bundle)
    m_orig = load_bundle(str(tmp_path / "orig.npz"), ENTS)
    ids = [2, 5, 7, 9, 3, 0, 0]
    np.testing.assert_array_equal(m_conv(ids), m_orig(ids))


def test_unknown_weight_raises(bundle):
    tree = hf_tree_from_bundle(bundle)
    tree["BertNLU_x/bert/mystery/novel_layer/kernel:0"] = np.zeros(3)
    with pytest.raises(ValueError, match="unrecognized weight"):
        convert_weights(tree, ENTS, BASE, n_heads=2, pad_token_id=0)


def test_missing_weight_raises(bundle):
    tree = hf_tree_from_bundle(bundle)
    del tree[
        f"BertNLU_{BASE}/tf_bert_model/bert/encoder/layer_._1"
        "/intermediate/dense/bias:0"
    ]
    with pytest.raises(ValueError, match="missing weights.*layer1.ffn1.b"):
        convert_weights(tree, ENTS, BASE, n_heads=2, pad_token_id=0)


def test_attention_output_not_mistaken_for_ffn_output():
    """attention/output/dense and (plain) output/dense are distinct targets;
    regression against suffix-pattern ordering mistakes."""
    p = "x/encoder/layer_._0/attention/output/dense/kernel:0"
    assert map_weight_name(p, ENTS, BASE) == "layer0.o.w"
    p2 = "x/encoder/layer_._0/output/dense/kernel:0"
    assert map_weight_name(p2, ENTS, BASE) == "layer0.ffn2.w"


def test_pooler_and_mask_layers_ignored():
    assert map_weight_name("x/bert/pooler/dense/kernel:0", ENTS, BASE) is None
    assert (
        map_weight_name(
            f"MaskCalculator_{BASE}/anything/weight:0", ENTS, BASE
        )
        is None
    )
