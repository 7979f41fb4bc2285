"""Constrained greedy span decoding (reference semantics M3–M7, SURVEY.md §2.6).

The reference decodes each entity type's 5-class per-subtoken probability
matrix with a *sequential greedy* pass it calls Viterbi
(data_processing/postprocessing.py:59-163): at step t the state is
``argmax_s P(t,s) * A_t[state_{t-1}, s]`` where the per-position transition
matrix ``A_t`` depends on word shape — multi-subtoken words use INIT/MIDDLE/FIN
matrices, single-subtoken words the WORD matrix (postprocessing.py:128-138).
Ties break to the LOWEST class index (strict ``>`` comparison,
postprocessing.py:71,83); the initial state is O; positions outside the word
range decode to O (postprocessing.py:145-150). Maximal runs of non-O states
become spans (postprocessing.py:151-163) — which is what makes adjacent
same-type entities merge (a documented reference limitation, README.md:285,
that we reproduce for parity).

Differences from the reference by design:
* iterative instead of recursive (the reference recurses once per subtoken,
  postprocessing.py:59-86, overflowing the stack near ~1k tokens);
* float64 throughout, identical comparison order, so tie behavior matches.

Classes: 0=O, 1=START, 2=END, 3=MIDDLE, 4=START-END (postprocessing.py:6-12).
"""

from __future__ import annotations

import numpy as np

CLASSES = ("O", "START", "END", "MIDDLE", "START-END")
N_CLASSES = 5
O, START, END, MIDDLE, START_END = range(5)


def _transition(legal: dict[int, tuple[int, ...]]) -> np.ndarray:
    m = np.zeros((N_CLASSES, N_CLASSES), dtype=np.float64)
    for src, dsts in legal.items():
        for dst in dsts:
            m[src, dst] = 1.0 / len(dsts)
    return m


# word-shape transition matrices (semantics of postprocessing.py:14-56)
TRANS_INIT_SUBWORD = _transition(
    {O: (O, START), START: (MIDDLE,), END: (O, START), MIDDLE: (MIDDLE,), START_END: (O, START)}
)
TRANS_FIN_SUBWORD = _transition({O: (O,), START: (END, MIDDLE), MIDDLE: (END, MIDDLE)})
TRANS_MID_SUBWORD = _transition({O: (O,), START: (MIDDLE,), MIDDLE: (MIDDLE,)})
TRANS_WHOLE_WORD = _transition(
    {
        O: (O, START, START_END),
        START: (END, MIDDLE),
        END: (O, START, START_END),
        MIDDLE: (END, MIDDLE),
        START_END: (O, START, START_END),
    }
)


def softmax(logits: np.ndarray, axis: int = -1) -> np.ndarray:
    """Numerically-stable softmax (reference applies tf softmax,
    recognize.py:90)."""
    shifted = logits - np.max(logits, axis=axis, keepdims=True)
    e = np.exp(shifted)
    return e / np.sum(e, axis=axis, keepdims=True)


def validate_probabilities(proba: np.ndarray) -> None:
    """Every row must be a proper distribution: components in (0,1) open
    interval, sum within 1e-2 of 1 (postprocessing.py:99-111)."""
    if proba.ndim != 2 or proba.shape[1] != N_CLASSES:
        raise ValueError(f"expected (n, {N_CLASSES}) probability matrix, got {proba.shape}")
    if proba.size and (
        np.min(proba) <= 0.0
        or np.max(proba) >= 1.0
        or np.max(np.abs(proba.sum(axis=1) - 1.0)) > 1e-2
    ):
        raise ValueError("probability matrix rows are not distributions")


# tuple-of-tuples mirrors for the sequential decoder hot loop: per-step
# vectors have 5 elements, where plain Python floats beat numpy dispatch by
# ~5x; semantics identical (same float64 values)
_AS_ROWS = lambda m: tuple(tuple(row) for row in m)  # noqa: E731
_T_INIT = _AS_ROWS(TRANS_INIT_SUBWORD)
_T_FIN = _AS_ROWS(TRANS_FIN_SUBWORD)
_T_MID = _AS_ROWS(TRANS_MID_SUBWORD)
_T_WORD = _AS_ROWS(TRANS_WHOLE_WORD)


_WIDTH_PATTERNS: dict[int, tuple] = {1: (_T_WORD,)}
_WIDTH_PATTERN_ARRS: dict[int, np.ndarray] = {}


def _width_pattern(width: int) -> tuple:
    pat = _WIDTH_PATTERNS.get(width)
    if pat is None:
        pat = (_T_INIT, *([_T_MID] * (width - 2)), _T_FIN)
        _WIDTH_PATTERNS[width] = pat
    return pat


def _width_pattern_arr(width: int) -> np.ndarray:
    arr = _WIDTH_PATTERN_ARRS.get(width)
    if arr is None:
        arr = np.array(_width_pattern(width))
        _WIDTH_PATTERN_ARRS[width] = arr
    return arr


class TransitionStack(list):
    """The per-subtoken transition stack, as the plain row-tuple list the
    scalar decode loop wants PLUS a lazily-built (T, 5, 5) ndarray view for
    the vectorized decode (assembled by concatenating memoized per-width
    pattern arrays — a fresh np.array(list) per sentence would cost more
    than the decode it feeds)."""

    __slots__ = ("_widths", "_arr")

    def __init__(self, rows, widths):
        super().__init__(rows)
        self._widths = widths
        self._arr = None

    @property
    def arr(self) -> np.ndarray:
        if self._arr is None:
            self._arr = (
                np.concatenate([_width_pattern_arr(w) for w in self._widths])
                if self._widths
                else np.empty((0, N_CLASSES, N_CLASSES))
            )
        return self._arr


def word_transition_stack(
    words: list[tuple[str, int, int]],
) -> TransitionStack:
    """Per-subtoken transition matrix chosen by word shape
    (postprocessing.py:128-138). ``words[i] = (text, first_sub, last_sub_excl)``.
    Width patterns are memoized (word widths repeat heavily)."""
    stack: list[tuple[tuple[float, ...], ...]] = []
    widths: list[int] = []
    extend = stack.extend
    for _text, first, last in words:
        width = last - first
        if width <= 0:
            raise ValueError(f"word has empty subtoken range [{first},{last})")
        widths.append(width)
        extend(_width_pattern(width))
    return TransitionStack(stack, widths)


# greedy_decode below hand-unrolls the argmax over exactly 5 classes; if the
# class vocabulary ever changes this must fail loudly, not silently ignore
# the extra classes (ADVICE r2)
assert N_CLASSES == 5, "greedy_decode unrolled for 5 classes"


def greedy_decode(proba: np.ndarray, transitions: list) -> list[int]:
    """Iterative constrained greedy pass. Ties -> lowest class index
    (strict > like postprocessing.py:71,83); initial state O. Returns a
    plain int list (the kernel hot loop; identical comparisons to the
    previous ndarray form, unrolled over the 5 classes)."""
    rows = proba.tolist()
    states: list[int] = []
    append = states.append
    prev = O
    for t, p in enumerate(rows):
        trans = transitions[t][prev]
        # unrolled strict-> argmax over the 5 classes: first maximum wins
        best = 0
        best_score = p[0] * trans[0]
        s1 = p[1] * trans[1]
        if s1 > best_score:
            best_score = s1
            best = 1
        s2 = p[2] * trans[2]
        if s2 > best_score:
            best_score = s2
            best = 2
        s3 = p[3] * trans[3]
        if s3 > best_score:
            best_score = s3
            best = 3
        s4 = p[4] * trans[4]
        if s4 > best_score:
            best = 4
        prev = best
        append(best)
    return states


# below this length the scalar loop wins (vectorized argmax has fixed numpy
# dispatch cost; measured crossover ~20-30 subtokens on this host)
VEC_DECODE_MIN = 24


def greedy_decode_vec(proba: np.ndarray, trans_arr: np.ndarray) -> list[int]:
    """Vectorized form of ``greedy_decode``: precompute, for every position
    t and previous state s, the winning next state
    ``nxt[t, s] = argmax_j proba[t, j] * A_t[s, j]`` in ONE numpy op (first
    maximum wins — np.argmax's tie rule is exactly the scalar loop's strict
    ``>`` scanning from class 0), then walk the chain with plain list
    indexing. Value-identical to ``greedy_decode`` by construction and by
    the hypothesis property test."""
    nxt = np.argmax(proba[:, None, :] * trans_arr, axis=2).tolist()
    states: list[int] = []
    append = states.append
    prev = O
    for row in nxt:
        prev = row[prev]
        append(prev)
    return states


def spans_from_states(states) -> list[tuple[int, int]]:
    """Maximal runs of non-O states as half-open subtoken spans
    (postprocessing.py:151-163). Accepts any int sequence."""
    spans: list[tuple[int, int]] = []
    run_start = -1
    for idx, s in enumerate(states):
        if s != O:
            if run_start < 0:
                run_start = idx
        elif run_start >= 0:
            spans.append((run_start, idx))
            run_start = -1
    if run_start >= 0:
        spans.append((run_start, len(states)))
    return spans


def decode_entity_spans(
    proba: np.ndarray,
    words: list[tuple[str, int, int]],
    transitions: list | None = None,
) -> list[tuple[int, int]]:
    """Full M4→M6 path: validate, decode within the word range (outside
    positions are O, postprocessing.py:145-150), extract spans. Runs are
    extracted from the inner decode directly and offset by the word-range
    start (positions outside the range are O by construction, so no full-
    length state vector is materialized).

    ``transitions``: the ``word_transition_stack(words)`` result — it
    depends only on the word shapes, so callers decoding several type
    planes for ONE sentence pass it in to build it once (the extraction
    kernel decodes ~5 planes per sentence; measured ~15% of kernel time
    was redundant stack rebuilds)."""
    validate_probabilities(proba)
    if not words:
        return []
    first = words[0][1]
    last = words[-1][2]
    if transitions is None:
        transitions = word_transition_stack(words)
    if last - first >= VEC_DECODE_MIN and isinstance(transitions, TransitionStack):
        inner = greedy_decode_vec(proba[first:last], transitions.arr)
    else:
        inner = greedy_decode(proba[first:last], transitions)
    return [(a + first, b + first) for a, b in spans_from_states(inner)]


def subtoken_spans_to_char_spans(
    spans: list[tuple[int, int]], subtoken_bounds: list[tuple[int, int]]
) -> list[tuple[int, int]]:
    """Subtoken span (i, j) → char span using the first subtoken's start and
    the last subtoken's end (recognize.py:93-101)."""
    return [(subtoken_bounds[i][0], subtoken_bounds[j - 1][1]) for i, j in spans]
