"""Offline converter: reference TF ``ner.h5`` → engine-native ``ner.npz``.

The reference persists its trained model with Keras ``save_weights``
(neural_network/ner.py:362-447 is the load path; :449-505 builds the
architecture those weights populate: TFBertModel encoder → pad-mask
multiply → one TimeDistributed Dense(5) logit head per entity type). The
engine's executors run that architecture with a pure-numpy forward
(runne_contrastive_ner_spark/functions/bert_numpy.py) over a flat ``.npz``
bundle, so a user with a trained reference model runs THIS script once,
wherever h5py exists, and ships the bundle:

    python tools/convert_ner_h5.py /path/to/model_dir

reads ``model_dir/ner.json`` (entity names, base_name, bert dir) +
``model_dir/ner.h5`` and writes ``model_dir/ner.npz`` in the documented
key layout (bert_numpy.py:18-28).

The name-mapping core (``map_weight_name`` / ``convert_weights``) is pure
and unit-tested against a synthetic weight tree (tests/test_convert_h5.py)
— only ``read_h5_weights`` touches h5py, and it is import-gated because
this sandbox ships neither h5py nor TF.
"""

from __future__ import annotations

import argparse
import json
import os
import re
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def head_layer_name(entity: str) -> str:
    """Mirror of the reference's get_nn_output_name (ner.py:249-250): the
    Keras layer name of an entity's Dense(5) head, before the base_name
    suffix."""
    return entity.title().replace("-", "").replace(":", "")


# HF TFBertModel variable-path suffixes → npz keys. Paths look like
#   BertNLU_{base}/bert/encoder/layer_._{i}/attention/self/query/kernel:0
# with TF-version-dependent prefixes, so matching is by SUFFIX regex.
_ENCODER_PATTERNS: list[tuple[re.Pattern, str]] = [
    (re.compile(r"embeddings/word_embeddings/weight(:\d+)?$"), "emb.word"),
    (re.compile(r"embeddings/position_embeddings/embeddings(:\d+)?$"), "emb.pos"),
    (re.compile(r"embeddings/token_type_embeddings/embeddings(:\d+)?$"), "emb.type"),
    (re.compile(r"embeddings/LayerNorm/gamma(:\d+)?$"), "emb.ln.g"),
    (re.compile(r"embeddings/LayerNorm/beta(:\d+)?$"), "emb.ln.b"),
    (re.compile(r"layer_\._(\d+)/attention/self/query/kernel(:\d+)?$"), "layer{i}.q.w"),
    (re.compile(r"layer_\._(\d+)/attention/self/query/bias(:\d+)?$"), "layer{i}.q.b"),
    (re.compile(r"layer_\._(\d+)/attention/self/key/kernel(:\d+)?$"), "layer{i}.k.w"),
    (re.compile(r"layer_\._(\d+)/attention/self/key/bias(:\d+)?$"), "layer{i}.k.b"),
    (re.compile(r"layer_\._(\d+)/attention/self/value/kernel(:\d+)?$"), "layer{i}.v.w"),
    (re.compile(r"layer_\._(\d+)/attention/self/value/bias(:\d+)?$"), "layer{i}.v.b"),
    (re.compile(r"layer_\._(\d+)/attention/output/dense/kernel(:\d+)?$"), "layer{i}.o.w"),
    (re.compile(r"layer_\._(\d+)/attention/output/dense/bias(:\d+)?$"), "layer{i}.o.b"),
    (re.compile(r"layer_\._(\d+)/attention/output/LayerNorm/gamma(:\d+)?$"), "layer{i}.ln1.g"),
    (re.compile(r"layer_\._(\d+)/attention/output/LayerNorm/beta(:\d+)?$"), "layer{i}.ln1.b"),
    (re.compile(r"layer_\._(\d+)/intermediate/dense/kernel(:\d+)?$"), "layer{i}.ffn1.w"),
    (re.compile(r"layer_\._(\d+)/intermediate/dense/bias(:\d+)?$"), "layer{i}.ffn1.b"),
    # plain output/dense — must NOT match attention/output/dense (checked
    # above first; map_weight_name returns on first match)
    (re.compile(r"layer_\._(\d+)/output/dense/kernel(:\d+)?$"), "layer{i}.ffn2.w"),
    (re.compile(r"layer_\._(\d+)/output/dense/bias(:\d+)?$"), "layer{i}.ffn2.b"),
    (re.compile(r"layer_\._(\d+)/output/LayerNorm/gamma(:\d+)?$"), "layer{i}.ln2.g"),
    (re.compile(r"layer_\._(\d+)/output/LayerNorm/beta(:\d+)?$"), "layer{i}.ln2.b"),
]

# weights the numpy forward does not need: pooler (sequence output only),
# cached position-id buffers, the non-trainable mask layers
_IGNORED = re.compile(
    r"(pooler/|position_ids|attention_mask|MaskCalculator|Mask|dropout)",
    re.IGNORECASE,
)


def map_weight_name(
    path: str, entity_types: list[str], base_name: str
) -> str | None:
    """One h5 weight path → its npz key, or None when the weight is not part
    of the inference forward. Raises on paths that look load-bearing but
    match nothing (conversion must fail loudly, not drop weights)."""
    for pat, key in _ENCODER_PATTERNS:
        m = pat.search(path)
        if m:
            if "{i}" in key:
                return key.replace("{i}", m.group(1))
            return key
    for ent in entity_types:
        head = head_layer_name(ent)
        for suffix, kind in (("kernel", "w"), ("bias", "b")):
            if re.search(
                rf"{re.escape(head)}_+{re.escape(base_name)}.*/{suffix}(:\d+)?$",
                path,
            ):
                return f"head.{ent}.{kind}"
    if _IGNORED.search(path):
        return None
    raise ValueError(
        f"unrecognized weight {path!r}: not an encoder weight, not a head of"
        f" {entity_types}, and not a known-ignorable layer — refusing to"
        " silently drop it"
    )


def convert_weights(
    weights: dict[str, np.ndarray],
    entity_types: list[str],
    base_name: str,
    n_heads: int,
    pad_token_id: int,
) -> dict[str, np.ndarray]:
    """Flat h5-name→array mapping → the npz bundle dict (pure; no I/O).

    TF Dense kernels are [in, out] and the numpy forward computes ``x @ w``,
    so every array passes through unchanged — the conversion is a renaming
    plus the ``meta`` triple and a completeness check.
    """
    out: dict[str, np.ndarray] = {}
    for path, arr in weights.items():
        key = map_weight_name(path, entity_types, base_name)
        if key is None:
            continue
        if key in out:
            raise ValueError(f"two h5 weights map to {key!r} (one is {path!r})")
        out[key] = np.asarray(arr)

    layer_ids = sorted(
        {int(m.group(1)) for k in out for m in [re.match(r"layer(\d+)\.", k)] if m}
    )
    n_layers = len(layer_ids)
    if layer_ids != list(range(n_layers)):
        raise ValueError(f"non-contiguous encoder layers: {layer_ids}")
    out["meta"] = np.array([n_layers, n_heads, pad_token_id])

    required = ["emb.word", "emb.pos", "emb.type", "emb.ln.g", "emb.ln.b"]
    for i in range(n_layers):
        for part in ("q", "k", "v", "o"):
            required += [f"layer{i}.{part}.w", f"layer{i}.{part}.b"]
        required += [
            f"layer{i}.ln1.g", f"layer{i}.ln1.b",
            f"layer{i}.ffn1.w", f"layer{i}.ffn1.b",
            f"layer{i}.ffn2.w", f"layer{i}.ffn2.b",
            f"layer{i}.ln2.g", f"layer{i}.ln2.b",
        ]
    for ent in entity_types:
        required += [f"head.{ent}.w", f"head.{ent}.b"]
    missing = [k for k in required if k not in out]
    if missing:
        raise ValueError(f"h5 file is missing weights for: {missing}")

    d = out["emb.word"].shape[1]
    if d % n_heads:
        raise ValueError(f"hidden {d} not divisible by num_attention_heads {n_heads}")
    for ent in entity_types:
        if out[f"head.{ent}.w"].shape != (d, 5):
            raise ValueError(
                f"head.{ent}.w has shape {out[f'head.{ent}.w'].shape},"
                f" expected ({d}, 5)"
            )
    return out


def read_h5_weights(h5_path: str) -> dict[str, np.ndarray]:
    """Flatten a Keras ``save_weights`` HDF5 file to {weight_path: array}.
    Requires h5py (present wherever the reference model was trained; not in
    this engine's runtime — executors only ever read the npz)."""
    try:
        import h5py
    except ImportError as exc:  # pragma: no cover - env without h5py
        raise NotImplementedError(
            "h5py is required to READ ner.h5; run this converter in the"
            " training environment (anywhere `pip install h5py` works) —"
            " the engine itself only needs the resulting ner.npz"
        ) from exc

    flat: dict[str, np.ndarray] = {}
    with h5py.File(h5_path, "r") as f:
        root = f["model_weights"] if "model_weights" in f else f

        def visit(name, obj):
            if isinstance(obj, h5py.Dataset):
                flat[name] = np.array(obj)

        root.visititems(visit)
    return flat


def convert_model_dir(model_dir: str) -> str:
    """ner.h5 + ner.json + bert/config.json → ner.npz; returns the path."""
    with open(os.path.join(model_dir, "ner.json"), encoding="utf-8") as f:
        cfg = json.load(f)
    bert_dir = cfg["bert"]
    if not os.path.isabs(bert_dir):
        bert_dir = os.path.join(model_dir, bert_dir)
    with open(os.path.join(bert_dir, "config.json"), encoding="utf-8") as f:
        bcfg = json.load(f)
    weights = read_h5_weights(os.path.join(model_dir, "ner.h5"))
    bundle = convert_weights(
        weights,
        entity_types=cfg["named_entities"],
        base_name=cfg["base_name"],
        n_heads=int(bcfg["num_attention_heads"]),
        pad_token_id=int(bcfg.get("pad_token_id", 0)),
    )
    npz_path = os.path.join(model_dir, "ner.npz")
    np.savez(npz_path, **bundle)

    # smoke: the bundle must load and run one forward
    from runne_contrastive_ner_spark.functions.bert_numpy import load_bundle

    model = load_bundle(npz_path, cfg["named_entities"])
    logits = model([2, 3])  # [CLS] [SEP] in the standard BERT id space
    assert logits.shape == (len(cfg["named_entities"]), 2, 5)
    return npz_path


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument("model_dir", help="directory containing ner.json + ner.h5")
    args = ap.parse_args()
    path = convert_model_dir(args.model_dir)
    print(f"wrote {path}")


if __name__ == "__main__":
    main()
