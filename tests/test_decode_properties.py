"""Property tests: the engine's iterative constrained greedy decoder is
equivalent to a direct recursive formulation of the reference's algorithm
(postprocessing.py:59-86 recursion shape — written independently here as a
test oracle), on randomized valid probability matrices and word shapes."""

import sys

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from runne_contrastive_ner_spark.functions import decode as D


def recursive_reference_decode(proba: np.ndarray, transitions: list) -> list[int]:
    """Time-recursive greedy pass, structured like the reference's
    do_viterbi_algorithm: state_t depends on the recursion for t-1; ties
    break to the lowest class via strict > comparison."""

    def step(t: int) -> list[int]:
        if t == 0:
            prev_states = []
            prev = 0  # initial state O
        else:
            prev_states = step(t - 1)
            prev = prev_states[-1]
        best, best_score = 0, proba[t][0] * transitions[t][prev][0]
        for s in range(1, D.N_CLASSES):
            score = proba[t][s] * transitions[t][prev][s]
            if score > best_score:
                best, best_score = s, score
        return prev_states + [best]

    return step(proba.shape[0] - 1)


@st.composite
def word_shapes(draw):
    """Random word widths (1..4 subtokens), total length 1..40."""
    widths = draw(st.lists(st.integers(1, 4), min_size=1, max_size=15))
    words = []
    pos = 0
    for i, w in enumerate(widths):
        words.append((f"w{i}", pos, pos + w))
        pos += w
    return words, pos


@st.composite
def proba_matrices(draw):
    words, n = draw(word_shapes())
    # random positive rows normalized to distributions, strictly inside (0,1)
    raw = draw(
        st.lists(
            st.lists(st.floats(0.01, 1.0), min_size=5, max_size=5),
            min_size=n,
            max_size=n,
        )
    )
    m = np.array(raw, dtype=np.float64)
    m = m / m.sum(axis=1, keepdims=True)
    return m, words


@settings(max_examples=200, deadline=None)
@given(proba_matrices())
def test_iterative_equals_recursive(case):
    proba, words = case
    transitions = D.word_transition_stack(words)
    iterative = list(D.greedy_decode(proba, transitions))
    sys.setrecursionlimit(10000)
    recursive = recursive_reference_decode(proba, transitions)
    assert iterative == recursive


@settings(max_examples=100, deadline=None)
@given(proba_matrices())
def test_spans_are_legal_runs(case):
    """Decoded spans are maximal non-O runs within word bounds and never
    overlap."""
    proba, words = case
    spans = D.decode_entity_spans(proba, words)
    last_end = -1
    for a, b in spans:
        assert 0 <= a < b <= proba.shape[0]
        assert a > last_end
        last_end = b


def test_recursive_overflows_where_iterative_survives():
    """The reference recursion fails near Python's recursion limit; the
    iterative rewrite is the scalability fix (SURVEY.md §7.2)."""
    n = 100_000
    p = np.full((n, 5), 0.2)
    words = [(f"w{i}", i, i + 1) for i in range(n)]
    transitions = D.word_transition_stack(words)
    out = D.greedy_decode(p, transitions)
    assert len(out) == n


@settings(max_examples=200, deadline=None)
@given(proba_matrices())
def test_vectorized_decode_equals_scalar(case):
    """greedy_decode_vec (np.argmax precompute + chain walk) must be
    value-identical to the scalar strict-> loop on every input, including
    exact float ties (np.argmax's first-max rule == the scalar scan)."""
    proba, words = case
    stack = D.word_transition_stack(words)
    assert D.greedy_decode_vec(proba, stack.arr) == D.greedy_decode(
        proba, stack
    )


def test_transition_stack_arr_matches_rows():
    words = [("a", 0, 2), ("b", 2, 3), ("c", 3, 7)]
    stack = D.word_transition_stack(words)
    assert np.array_equal(stack.arr, np.array([list(r) for r in stack]))
    # exact-tie case: uniform proba row forces score ties across classes;
    # both paths must pick the identical (lowest legal) class
    proba = np.full((7, 5), 0.2)
    assert D.greedy_decode_vec(proba, stack.arr) == D.greedy_decode(proba, stack)
