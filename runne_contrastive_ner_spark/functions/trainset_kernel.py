"""Trainset-building kernels (reference semantics T8/T9, M12, M13).

Pure Python/numpy, used inside the trainset pandas UDF:

* ``assign_entities_to_sentences`` — T9 (tokenization.py:422-464): each
  entity must fall entirely inside one sentence (crossing a boundary is an
  error); offsets are rebased to the sentence; the duplicate check and the
  all-entities-consumed check are preserved.
* ``indicator_for_type`` — T8 (tokenization.py:368-418): per entity type, a
  per-subtoken {0,1,2} vector: 0 outside, 2 on the FIRST subtoken of an
  occurrence, 1 inside — the ``2`` marker is what keeps adjacent same-type
  entities distinguishable in the training target.
* ``classes_from_indicator`` — M12 (trainset_building.py:13-58): {0,1,2} →
  5-class ids (O/START/END/MIDDLE/START-END); a ``2`` closes the previous
  entity and starts a new one, so [2,2] becomes two START-ENDs.
* ``chunk_sequence`` — M13 (trainset_building.py:105-150): sequences longer
  than ``max_seq_len`` split into consecutive chunks until all fit.
"""

from __future__ import annotations

from .decode import END, MIDDLE, O, START, START_END
from .tokenizer import Subtoken


def assign_entities_to_sentences(
    text: str,
    ners: list[tuple[str, int, int]],
    sentence_bounds: list[tuple[int, int]],
) -> list[list[tuple[str, int, int]]]:
    """Per-sentence entity lists with sentence-rebased offsets. Raises on a
    boundary-crossing entity or an entity outside every sentence."""
    seen = set()
    for span in ners:
        if span in seen:
            raise ValueError(f"duplicate entity {span}")
        seen.add(span)
    per_sentence: list[list[tuple[str, int, int]]] = [[] for _ in sentence_bounds]
    consumed = 0
    for etype, e_start, e_end in ners:
        placed = False
        for idx, (s_start, s_end) in enumerate(sentence_bounds):
            if e_start >= s_start and e_end <= s_end:
                per_sentence[idx].append((etype, e_start - s_start, e_end - s_start))
                placed = True
                consumed += 1
                break
            if e_start < s_end and e_end > s_end and e_start >= s_start:
                raise ValueError(
                    f"entity {(etype, e_start, e_end)} crosses a sentence boundary"
                )
        if not placed:
            raise ValueError(f"entity {(etype, e_start, e_end)} is outside all sentences")
    if consumed != len(ners):
        raise ValueError("not all entities were assigned to sentences")
    return per_sentence


def indicator_for_type(
    subtokens: list[Subtoken],
    spans: list[tuple[int, int]],
) -> list[int]:
    """{0,1,2} per subtoken for one type's char spans (half-open)."""
    ind = [0] * len(subtokens)
    for c_start, c_end in spans:
        first = True
        for i, (_piece, b0, b1) in enumerate(subtokens):
            if b0 >= c_start and b1 <= c_end:
                ind[i] = 2 if first else 1
                first = False
        if first:
            raise ValueError(f"entity span ({c_start},{c_end}) matches no subtokens")
    return ind


def classes_from_indicator(ind: list[int]) -> list[int]:
    """{0,1,2} indicator → 5-class ids; ``2`` starts a new entity."""
    n = len(ind)
    out = [O] * n
    i = 0
    while i < n:
        if ind[i] != 2:
            i += 1
            continue
        j = i + 1
        while j < n and ind[j] == 1:
            j += 1
        if j - i == 1:
            out[i] = START_END
        else:
            out[i] = START
            out[j - 1] = END
            for k in range(i + 1, j - 1):
                out[k] = MIDDLE
        i = j
    return out


def chunk_sequence(seq: list, max_seq_len: int) -> list[list]:
    """Consecutive chunks of length ≤ max_seq_len (≥1 chunk even if empty)."""
    if len(seq) <= max_seq_len:
        return [seq]
    return [seq[i : i + max_seq_len] for i in range(0, len(seq), max_seq_len)]


def find_entity_words(
    words: list[tuple[str, int, int]], entity_start: int, entity_end: int
) -> tuple[int, int]:
    """Char-span → word-index range for the Siamese feature path, tolerant of
    misaligned span edges (reference find_entity_words,
    data_processing/feature_extraction.py:66-86; goldens
    tests/test_feature_extraction.py:13-146): the range covers every word the
    half-open char span OVERLAPS; (-1, -1) when the span touches no word.
    Here ``words[i] = (text, char_start, char_end)`` in CHAR space (unlike
    the subtoken-space word tuples elsewhere)."""
    start_word_idx = -1
    end_word_idx = -1
    for word_idx, (_text, word_start, word_end) in enumerate(words):
        if entity_start < word_end and start_word_idx < 0:
            start_word_idx = word_idx
        if entity_end > word_start:
            end_word_idx = word_idx
        if word_start >= entity_end:
            break
    if start_word_idx < 0 or end_word_idx < 0:
        return (-1, -1)
    if entity_end <= words[start_word_idx][1]:
        return (-1, -1)
    if entity_start >= words[end_word_idx][2]:
        return (-1, -1)
    return (start_word_idx, end_word_idx + 1)
