"""Offset-exact word + subword tokenization.

Re-expresses the reference tokenizer's observable contract
(data_processing/tokenization.py:123-217) without razdel/HF dependencies:

* ``tokenize_words(text)`` → list of ``(word_text, start, end)`` with
  half-open char bounds into the original text; zero-width space U+200B is
  whitespace (tokenization.py:136); words are split on punctuation, each
  punctuation char its own token (tokenization.py:140-141).
* ``subtokenize(word)`` → subword pieces with exact char bounds. Two
  interchangeable segmenters:

  - **WordPiece** (``subtokenize_wordpiece``): real greedy longest-match
    segmentation against a trained vocab (functions/wordpiece.py), with the
    reference's accent-tolerant char alignment — ``remove_accents`` +
    ``find_substring`` over the normalized word (tokenization.py:167-217).
    Byte-exact vs the reference's subtoken goldens
    (tests/test_tokenization.py:49-411) under the reference's own public
    vocab fixtures (tests/data/bert{,-uncased}).
  - **fixed-width fallback** (no vocab given): ≤4-char chunks, continuations
    prefixed ``##`` — preserving the structural properties the decoder
    depends on: every word maps to ≥1 subtoken, subtokens carry exact char
    bounds, and multi-subtoken words exercise the INIT/MIDDLE/FIN transition
    matrices (postprocessing.py:128-138). This is the default for the
    registered queries so their DuckDB oracles stay expressible in SQL.
* ``tokenize_text(text)`` → ``(words, subtokens)`` where
  ``words[i] = (text, first_subtoken_idx, last_subtoken_idx_exclusive)`` in
  subtoken index space (the shape decode_entity consumes,
  postprocessing.py:112-138) and
  ``subtokens[j] = (piece, char_start, char_end)``.

Pure Python/regex; runs inside pandas UDFs only.
"""

from __future__ import annotations

import re

ZWSP = "​"
SUBTOKEN_WIDTH = 4

# a "word" is a run of letters/digits (any script, underscores excluded),
# with combining marks (U+0300-036F diacritics, U+0483-0489 Cyrillic)
# attached to the word they follow — razdel keeps 'Диа́с' one token
# (reference golden test_tokenize_text_5); any other non-space char —
# including '_', which neither class covers — is a single-char token
_COMBINING = "\u0300-\u036f\u0483-\u0489"
_WORD_RE = re.compile(
    rf"[^\W_](?:[^\W_]|[{_COMBINING}])*|[^\s\w]|_", re.UNICODE
)

Word = tuple[str, int, int]
Subtoken = tuple[str, int, int]


def tokenize_words(text: str) -> list[Word]:
    cleaned = text.replace(ZWSP, " ")
    return [(m.group(0), m.start(), m.end()) for m in _WORD_RE.finditer(cleaned)]


def subtokenize(word: str, start: int) -> list[Subtoken]:
    """Deterministic fixed-width subword pieces with exact char bounds."""
    pieces: list[Subtoken] = []
    for i in range(0, len(word), SUBTOKEN_WIDTH):
        chunk = word[i : i + SUBTOKEN_WIDTH]
        piece = chunk if i == 0 else "##" + chunk
        pieces.append((piece, start + i, start + i + len(chunk)))
    return pieces


def subtokenize_wordpiece(word: str, start: int, wp) -> list[Subtoken]:
    """WordPiece pieces with exact char bounds into the original text.

    Reproduces the reference's subtoken-alignment contract
    (tokenization.py:158-217): a word whose segmentation contains the
    unknown token collapses to ONE ``[UNK]`` subtoken spanning the word;
    a single-piece word takes the word's bounds verbatim; a multi-piece
    word is aligned piece-by-piece against the accent-folded lowercased
    word via the placeholder-tolerant ``find_substring``, and the last
    piece's bound is stretched to ``start + len(prep_word)``, the same
    expression the reference uses (tokenization.py:204-208). Note
    ``remove_accents`` is length-preserving in both implementations (a
    standalone NFD combining mark folds to the placeholder, it is not
    dropped), so this equals the word end on every input — including
    decomposed input, where interior marks become alignment gaps the
    placeholder-tolerant search skips (asserted in
    tests/test_wordpiece.py::test_subtokenize_nfd_final_bound_matches_reference).
    """
    from runne_contrastive_ner_spark.functions.textnorm import (
        PLACEHOLDER,
        find_substring,
        remove_accents,
    )

    pieces = wp.tokenize(word)
    if not pieces:
        raise ValueError(f"the word {word!r} cannot be tokenized")
    end = start + len(word)
    if wp.unk_token in pieces:
        return [(wp.unk_token, start, end)]
    if len(pieces) == 1:
        return [(pieces[0], start, end)]
    folded = remove_accents(word.lower())
    out: list[Subtoken] = []
    pos = 0
    for src in pieces:
        core = src[2:] if src.startswith("##") else src
        core = remove_accents(core.lower()).replace(PLACEHOLDER, "")
        f0, f1 = find_substring(folded[pos:], core)
        if f0 < 0 or f1 < 0:
            raise ValueError(
                f"the word {word!r} cannot be aligned: {core!r} not found "
                f"in {folded!r} from {pos} (pieces: {pieces})"
            )
        pos += f0
        piece_end = pos + (f1 - f0)
        out.append((src, start + pos, start + piece_end))
        pos = piece_end
    # reference expression: stretch to start + len(prep_word); since folding
    # is 1 char per char, this is exactly the word end
    folded_end = start + len(folded)
    if out[-1][2] < folded_end:
        out[-1] = (out[-1][0], out[-1][1], folded_end)
    return out


def tokenize_text(
    text: str, wp=None
) -> tuple[list[tuple[str, int, int]], list[Subtoken]]:
    """Words in subtoken-index space + flat subtoken list with char bounds.
    ``wp`` (a ``wordpiece.WordPieceTokenizer``) selects real WordPiece
    segmentation; None selects the deterministic fixed-width fallback."""
    words_out: list[tuple[str, int, int]] = []
    subtokens: list[Subtoken] = []
    for word_text, w_start, _w_end in tokenize_words(text):
        first = len(subtokens)
        if wp is None:
            subtokens.extend(subtokenize(word_text, w_start))
        else:
            subtokens.extend(subtokenize_wordpiece(word_text, w_start, wp))
        words_out.append((word_text, first, len(subtokens)))
    return words_out, subtokens
