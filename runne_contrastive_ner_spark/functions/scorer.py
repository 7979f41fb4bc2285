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

    def score_pieces_active(self, pieces: list[str]) -> dict[int, np.ndarray]:
        """Default: dense scoring, all planes reported active."""
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
        default = np.log(self._default_plane(n))
        dense = np.tile(default, (len(self.entity_types), 1, 1))
        for t_idx, plane in active.items():
            dense[t_idx] = plane
        return dense

    def score_pieces_active(self, pieces: list[str]) -> dict[int, np.ndarray]:
        """Sparse scoring: build (and log) only the planes that matched —
        the hot-path form; for a 29-type vocabulary with a handful of
        matching types this avoids ~90% of the allocation and exp/log work
        while producing byte-identical planes for the active types."""
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
        return {t: np.log(p) for t, p in planes.items()}

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


class TransformerScorer(Scorer):  # pragma: no cover - optional heavy path
    """Adapter for a real HF token-classification encoder; the per-type heads
    mirror ner.py:302-346. Unavailable in-sandbox (no transformers/TF)."""

    def __init__(self, model_dir: str):
        try:
            import transformers  # noqa: F401
        except ImportError as exc:
            raise NotImplementedError(
                "TransformerScorer requires the 'transformers' package; "
                "use GazetteerScorer in this environment"
            ) from exc
        raise NotImplementedError("wire a trained artifact here (ner.py:362-505 schema)")


def score_windows(scorer: Scorer, pieces: list[str], window: int | None = None) -> np.ndarray:
    """M1 window slicing: pad the subtoken sequence to a multiple of the
    window, score raw slices, re-stack, trim (recognize.py:56-86). Returns
    probability-shaped logits [n_types, len(pieces), N_CLASSES]."""
    if not pieces:
        return np.zeros((len(scorer.entity_types), 0, N_CLASSES))
    w = window or getattr(scorer, "window", DEFAULT_WINDOW)
    padded = list(pieces) + ["[PAD]"] * ((-len(pieces)) % w)
    chunks = [scorer.score_pieces(padded[i : i + w]) for i in range(0, len(padded), w)]
    stacked = np.concatenate(chunks, axis=1)
    return stacked[:, : len(pieces), :]


def score_windows_active(
    scorer: Scorer, pieces: list[str], window: int | None = None
) -> dict[int, np.ndarray]:
    """Sparse form of ``score_windows``: same window slicing and re-stack,
    but only type planes with evidence in at least one window are
    materialized (stitched against the default all-O plane elsewhere)."""
    if not pieces:
        return {}
    w = window or getattr(scorer, "window", DEFAULT_WINDOW)
    n = len(pieces)
    padded = list(pieces) + ["[PAD]"] * ((-n) % w)
    window_actives = [
        scorer.score_pieces_active(padded[i : i + w]) for i in range(0, len(padded), w)
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
                    default_chunk = np.log(maker(w))
                chunks.append(default_chunk)
        out[t_idx] = np.concatenate(chunks, axis=0)[:n]
    return out


def _uniform_default(n: int) -> np.ndarray:
    proba = np.full((n, N_CLASSES), (1.0 - CONF) / (N_CLASSES - 1))
    proba[:, O] = CONF
    return proba
