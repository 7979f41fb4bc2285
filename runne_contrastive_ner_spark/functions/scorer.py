"""Pluggable token-scoring seam (reference semantics M1–M2).

The reference's model is, to the pipeline, an opaque function
``token_windows -> per-type 5-class logits`` (neural_network/ner.py:253-359);
inference pads each sentence's subtoken sequence to a multiple of the model
window and scores raw window slices (recognize.py:56-73 — windows are NOT
re-wrapped with [CLS]/[SEP]). We keep that contract but batch many windows
per call (the reference's ``batch_size=1``, recognize.py:73, is the
throughput bug this engine exists to fix).

Two implementations:

* ``GazetteerScorer`` — deterministic mock used by all tests/benchmarks:
  reconstructs words from the window's subtoken pieces, matches a
  (surface-form → entity-type) gazetteer at word boundaries, and emits the
  intended START/MIDDLE/END/START-END distribution per subtoken with
  probability mass CONF on the intended class. Decoding its output through
  the constrained greedy decoder reproduces exactly the word-boundary
  gazetteer matches (with reference-faithful merging of adjacent same-type
  spans) — which is what lets the DuckDB oracle verify the whole pipeline.
* ``TransformerScorer`` — optional adapter for a real HF encoder; gated
  behind an import-try since transformers/TF are absent in-sandbox.

Scorers are constructed once per Python worker inside ``mapInPandas``
(the reference reloads nothing per doc; we amortize per-partition).
"""

from __future__ import annotations

import numpy as np

from .decode import MIDDLE, N_CLASSES, O, START, START_END, END
from .textnorm import normalize_surface, normalize_word_cached

CONF = 0.92
DEFAULT_WINDOW = 256


class Scorer:
    """Contract: score one sentence's subtoken pieces for every entity type.

    ``score_pieces`` returns logits [n_types, n_subtokens, N_CLASSES];
    softmax over the last axis must yield valid probability rows (validated
    downstream, M4).

    ``score_pieces_active`` is the optional sparse form: a dict mapping
    type index → logits [n_subtokens, N_CLASSES] for types with any non-O
    evidence; absent types mean the all-O default plane, whose greedy decode
    is provably all-O (p(O)=CONF with transition weight ≥ 1/3 dominates
    every alternative), so downstream skips them without approximation.
    """

    entity_types: list[str]

    def score_pieces(self, pieces: list[str]) -> np.ndarray:
        raise NotImplementedError

    def score_pieces_active(
        self, pieces: list[str], words: list[tuple[str, int, int]] | None = None
    ) -> dict[int, np.ndarray]:
        """Default: dense scoring, all planes reported active. ``words`` is
        accepted (and ignored) so the single-window fast path in
        ``score_windows_active`` can forward pre-computed word structure to
        ANY probability-emitting scorer without a TypeError (ADVICE r2);
        scorers that can exploit it (GazetteerScorer) override."""
        dense = self.score_pieces(pieces)
        return {i: dense[i] for i in range(dense.shape[0])}


def words_from_pieces(pieces: list[str]) -> list[tuple[str, int, int]]:
    """Rebuild (word_text, first_subtoken, last_subtoken_excl) from
    ``##``-continuation pieces (window-local view, mirroring how the decoder
    receives word structure, postprocessing.py:112-138)."""
    words: list[tuple[str, int, int]] = []
    cur: list[str] = []
    start = 0
    for idx, piece in enumerate(pieces):
        if piece.startswith("##") and cur:
            cur.append(piece[2:])
        else:
            if cur:
                words.append(("".join(cur), start, idx))
            cur = [piece]
            start = idx
    if cur:
        words.append(("".join(cur), start, len(pieces)))
    return words


class GazetteerScorer(Scorer):
    # planes are PROBABILITIES, not logits: downstream skips the softmax
    # (mathematically softmax(log p) just renormalizes p; emitting p directly
    # removes a log+exp round-trip from the kernel hot path)
    emits_proba = True

    def __init__(self, gazetteer: dict[str, str], entity_types: list[str], window: int = DEFAULT_WINDOW):
        """gazetteer: normalized surface form (possibly multi-word) -> type."""
        self.entity_types = list(entity_types)
        self.window = window
        self._type_idx = {t: i for i, t in enumerate(self.entity_types)}
        # term as tuple of normalized words, grouped by type
        self._terms: list[tuple[tuple[str, ...], int]] = []
        # first-word index: matching scans the sentence once and only probes
        # terms whose first word matches the current position
        self._by_first: dict[str, list[tuple[tuple[str, ...], int]]] = {}
        for surface, etype in sorted(gazetteer.items()):
            if etype not in self._type_idx:
                raise ValueError(f"gazetteer type {etype!r} not in entity vocabulary")
            term = (tuple(normalize_surface(surface).split()), self._type_idx[etype])
            self._terms.append(term)
            self._by_first.setdefault(term[0][0], []).append(term)

    def _default_plane(self, n: int) -> np.ndarray:
        proba = np.full((n, N_CLASSES), (1.0 - CONF) / (N_CLASSES - 1))
        proba[:, O] = CONF
        return proba

    def score_pieces(self, pieces: list[str]) -> np.ndarray:
        n = len(pieces)
        active = self.score_pieces_active(pieces)
        dense = np.tile(self._default_plane(n), (len(self.entity_types), 1, 1))
        for t_idx, plane in active.items():
            dense[t_idx] = plane
        return dense

    def score_pieces_active(
        self, pieces: list[str], words: list[tuple[str, int, int]] | None = None
    ) -> dict[int, np.ndarray]:
        """Sparse scoring: build only the probability planes that matched —
        the hot-path form; for a 29-type vocabulary with a handful of
        matching types this avoids ~90% of the allocation work. ``words``
        (the tokenizer's (text, first_sub, last_sub_excl) list) can be passed
        to skip re-deriving word structure from the pieces."""
        if words is None:
            words = words_from_pieces(pieces)
        norm_words = [normalize_word_cached(w) for w, _, _ in words]
        n = len(pieces)
        n_words = len(norm_words)
        planes: dict[int, np.ndarray] = {}
        by_first = self._by_first
        for w_i, word in enumerate(norm_words):
            candidates = by_first.get(word)
            if not candidates:
                continue
            for term_words, t_idx in candidates:
                k = len(term_words)
                if w_i + k > n_words:
                    continue
                if k > 1 and tuple(norm_words[w_i : w_i + k]) != term_words:
                    continue
                if t_idx not in planes:
                    planes[t_idx] = self._default_plane(n)
                first_sub = words[w_i][1]
                last_sub = words[w_i + k - 1][2]  # exclusive
                self._mark(planes[t_idx], first_sub, last_sub)
        return planes

    @staticmethod
    def _mark(plane: np.ndarray, first: int, last: int) -> None:
        lo = (1.0 - CONF) / (N_CLASSES - 1)
        for pos in range(first, last):
            plane[pos, :] = lo
            if last - first == 1:
                plane[pos, START_END] = CONF
            elif pos == first:
                plane[pos, START] = CONF
            elif pos == last - 1:
                plane[pos, END] = CONF
            else:
                plane[pos, MIDDLE] = CONF


class ArtifactError(ValueError):
    """Raised when a model artifact directory violates the ner.json contract
    (reference load_ner, neural_network/ner.py:362-505)."""


_BASE_NAME_RE = None  # compiled lazily


def load_ner_artifact(path: str) -> dict:
    """Validate and parse a trained-NER artifact directory up to (but not
    including) the model forward pass — the full re-expression of the
    reference's load_ner config-schema contract (ner.py:362-447):

    * directory exists; ``ner.json`` and ``ner.h5`` exist;
    * config is a JSON object with keys named_entities / max_sent_len /
      bert / base_name;
    * max_sent_len is an int > 3; named_entities is a list (validated
      against the vocab grammar, train_test_split.py:9); bert and base_name
      are strings; base_name matches the TF layer-name grammar
      ``^[a-zA-Z]+[_a-zA-Z]*[a-zA-Z]+\\d*$`` (ner.py:425-428);
    * a relative ``bert`` resolves inside the artifact dir when that
      subdirectory exists (ner.py:432-434); when the resolved BERT dir
      carries a readable ``config.json``, model_type must be 'bert' and
      max_sent_len must not exceed max_position_embeddings
      (ner.py:436-446 — checked WITHOUT importing transformers).

    Returns {'named_entities', 'max_sent_len', 'bert_path', 'base_name',
    'weights_path'}. Everything here runs in-sandbox; only the actual
    forward pass needs the transformers/TF runtime.
    """
    import json
    import os
    import re

    from .vocab import validate_entity_types

    global _BASE_NAME_RE
    if _BASE_NAME_RE is None:
        _BASE_NAME_RE = re.compile(r"^[a-zA-Z]+[_a-zA-Z]*[a-zA-Z]+\d*$")

    if not os.path.isdir(path):
        raise ArtifactError(f"artifact directory {path!r} does not exist")
    config_name = os.path.join(path, "ner.json")
    if not os.path.isfile(config_name):
        raise ArtifactError(f"config file {config_name!r} does not exist")
    weights_name = os.path.join(path, "ner.h5")
    if not os.path.isfile(weights_name):
        raise ArtifactError(f"weights file {weights_name!r} does not exist")
    with open(config_name, encoding="utf-8") as fp:
        config = json.load(fp)
    if not isinstance(config, dict):
        raise ArtifactError(f"config must be a JSON object, got {type(config)}")
    for key in ("named_entities", "max_sent_len", "bert", "base_name"):
        if key not in config:
            raise ArtifactError(f"config key {key!r} is missing")
    if not isinstance(config["max_sent_len"], int) or isinstance(
        config["max_sent_len"], bool
    ):
        raise ArtifactError("max_sent_len must be an int")
    if config["max_sent_len"] < 4:
        raise ArtifactError(
            f"max_sent_len = {config['max_sent_len']} is too small (need > 3)"
        )
    if not isinstance(config["named_entities"], list):
        raise ArtifactError("named_entities must be a list")
    validate_entity_types(config["named_entities"])
    if not isinstance(config["bert"], str):
        raise ArtifactError("bert must be a string")
    if not isinstance(config["base_name"], str):
        raise ArtifactError("base_name must be a string")
    if _BASE_NAME_RE.search(config["base_name"]) is None:
        raise ArtifactError(
            f"{config['base_name']!r} is not a valid TF model/layer name"
        )
    bert_path = config["bert"]
    local_bert = os.path.join(path, os.path.normpath(bert_path))
    if os.path.isdir(local_bert):
        bert_path = local_bert
    bert_config_file = os.path.join(bert_path, "config.json")
    if os.path.isfile(bert_config_file):
        with open(bert_config_file, encoding="utf-8") as fp:
            bert_config = json.load(fp)
        if bert_config.get("model_type") != "bert":
            raise ArtifactError(f"transformer at {bert_path!r} is not BERT")
        max_pos = bert_config.get("max_position_embeddings")
        if isinstance(max_pos, int) and config["max_sent_len"] > max_pos:
            raise ArtifactError(
                f"max_sent_len = {config['max_sent_len']} exceeds the"
                f" encoder's max_position_embeddings = {max_pos}"
            )
    return {
        "named_entities": list(config["named_entities"]),
        "max_sent_len": config["max_sent_len"],
        "bert_path": bert_path,
        "base_name": config["base_name"],
        "weights_path": weights_name,
    }


class TransformerScorer(Scorer):
    """Adapter for a real trained encoder artifact. The artifact contract
    (directory layout, ner.json schema, vocab/window wiring — ner.py:362-447)
    is fully implemented and tested in-sandbox via ``load_ner_artifact``;
    per-type 5-class heads over the masked sequence output (ner.py:449-500)
    exist only behind the forward boundary, so only ``_load_model`` needs the
    transformers/TF runtime. ``score_pieces`` windows are sliced upstream by
    ``score_windows`` exactly as for GazetteerScorer (recognize.py:56-86
    semantics, batched)."""

    def __init__(self, model_dir: str, model_loader=None):
        art = load_ner_artifact(model_dir)
        self.entity_types = art["named_entities"]
        self.window = art["max_sent_len"]
        self.artifact = art
        self._model_loader = model_loader or self._load_model
        self._model = None

    def _load_model(self):
        """Resolve the forward pass. Preference order:

        1. an engine-native ``ner.npz`` weight bundle next to ``ner.h5`` —
           loaded into the pure-numpy BERT forward (functions/bert_numpy.py,
           the exact ner.py:449-505 architecture: encoder → pad-mask
           multiply → per-type Dense(5) logits), so executors need NO
           deep-learning framework. A trained TF checkpoint converts to the
           bundle offline with one small script wherever TF exists.
        2. the transformers/TF runtime for ``ner.h5`` directly — not present
           in this environment, so that path raises with instructions.
        """
        import os

        npz_path = os.path.splitext(self.artifact["weights_path"])[0] + ".npz"
        if os.path.exists(npz_path):
            from runne_contrastive_ner_spark.functions.bert_numpy import (
                load_bundle,
            )
            from runne_contrastive_ner_spark.functions.wordpiece import (
                load_vocab_ids,
            )

            # float32: the width the reference's TF runtime computes in
            # (so float32 near-tie decode behavior is the FAITHFUL one)
            # and ~2x the matmul throughput of the float64 default
            bundle = load_bundle(npz_path, self.entity_types, dtype="float32")
            vocab_ids = load_vocab_ids(
                os.path.join(self.artifact["bert_path"], "vocab.txt")
            )
            unk = vocab_ids.get("[UNK]", 0)
            self._bundle = bundle
            self._ids = lambda pieces: [vocab_ids.get(p, unk) for p in pieces]

            def forward(pieces: list[str]) -> np.ndarray:
                return bundle(self._ids(pieces))

            return forward
        try:  # pragma: no cover - needs transformers/TF
            import transformers  # noqa: F401
        except ImportError as exc:
            raise NotImplementedError(
                "no ner.npz bundle found and the transformers/TF runtime is"
                " not present in this environment; the artifact at"
                f" {self.artifact['bert_path']!r} is validated and wired —"
                " convert ner.h5 to ner.npz offline (bert_numpy.py key"
                " layout) or inject model_loader"
            ) from exc
        raise NotImplementedError(  # pragma: no cover
            "build TFBertModel + per-type TimeDistributed(Dense(5)) heads and"
            " load ner.h5 here (ner.py:449-505)"
        )

    def score_pieces(self, pieces: list[str]) -> np.ndarray:
        if self._model is None:
            self._model = self._model_loader()
        return self._model(pieces)

    def score_pieces_batch(self, windows: list[list[str]]) -> list[np.ndarray]:
        """All of a document's windows in one model forward when the numpy
        bundle backs the scorer (batch dimension through the encoder);
        injected model_loaders fall back to per-window calls."""
        if self._model is None:
            self._model = self._model_loader()
        bundle = getattr(self, "_bundle", None)
        if bundle is None:
            return [self._model(win) for win in windows]
        return bundle.batch([self._ids(win) for win in windows])


def score_windows(scorer: Scorer, pieces: list[str], window: int | None = None) -> np.ndarray:
    """M1 window slicing: pad the subtoken sequence to a multiple of the
    window, score raw slices, re-stack, trim (recognize.py:56-86). Returns
    probability-shaped logits [n_types, len(pieces), N_CLASSES]."""
    if not pieces:
        return np.zeros((len(scorer.entity_types), 0, N_CLASSES))
    w = window or getattr(scorer, "window", DEFAULT_WINDOW)
    padded = list(pieces) + ["[PAD]"] * ((-len(pieces)) % w)
    windows = [padded[i : i + w] for i in range(0, len(padded), w)]
    batch = getattr(scorer, "score_pieces_batch", None)
    if batch is not None and len(windows) > 1:
        # one batched forward over ALL windows (the reference scores
        # batch_size=1, recognize.py:73 — this undoes that at the model
        # level, not just the Arrow level); scorers without the batch form
        # fall through to per-window calls
        chunks = batch(windows)
    else:
        chunks = [scorer.score_pieces(win) for win in windows]
    stacked = np.concatenate(chunks, axis=1)
    return stacked[:, : len(pieces), :]


def score_windows_active(
    scorer: Scorer,
    pieces: list[str],
    window: int | None = None,
    words: list[tuple[str, int, int]] | None = None,
) -> dict[int, np.ndarray]:
    """Sparse form of ``score_windows``: same window slicing and re-stack,
    but only type planes with evidence in at least one window are
    materialized (stitched against the default all-O plane elsewhere).
    Planes are in the scorer's native space (probabilities when the scorer
    sets ``emits_proba``, logits otherwise). ``words`` is forwarded to the
    scorer only in the single-window case (a window slice has its own
    window-local word structure)."""
    if not pieces:
        return {}
    w = window or getattr(scorer, "window", DEFAULT_WINDOW)
    n = len(pieces)
    if n <= w and words is not None and getattr(scorer, "emits_proba", False):
        window_actives = [scorer.score_pieces_active(pieces, words=words)]
    else:
        padded = list(pieces) + ["[PAD]"] * ((-n) % w)
        windows = [padded[i : i + w] for i in range(0, len(padded), w)]
        batch = getattr(scorer, "score_pieces_batch", None)
        if batch is not None and len(windows) > 1:
            # model-level batching on the extraction hot path (ADVICE r3):
            # one forward over ALL of the document's windows instead of one
            # per window; dense scorers report every plane active (same
            # result the per-window base path produced, minus the forwards)
            denses = batch(windows)
            window_actives = [
                {i: d[i] for i in range(d.shape[0])} for d in denses
            ]
        else:
            window_actives = [
                scorer.score_pieces_active(win) for win in windows
            ]
    active_types = set()
    for wa in window_actives:
        active_types.update(wa)
    if not active_types:
        return {}
    default_chunk = None
    out: dict[int, np.ndarray] = {}
    for t_idx in active_types:
        chunks = []
        for wa in window_actives:
            if t_idx in wa:
                chunks.append(wa[t_idx])
            else:
                if default_chunk is None:
                    maker = getattr(scorer, "_default_plane", _uniform_default)
                    default_chunk = maker(w)
                    if not getattr(scorer, "emits_proba", False):
                        default_chunk = np.log(default_chunk)
                chunks.append(default_chunk)
        out[t_idx] = np.concatenate(chunks, axis=0)[:n]
    return out


def _uniform_default(n: int) -> np.ndarray:
    proba = np.full((n, N_CLASSES), (1.0 - CONF) / (N_CLASSES - 1))
    proba[:, O] = CONF
    return proba
