"""Offset-exact word + subword tokenization.

Re-expresses the reference tokenizer's observable contract
(data_processing/tokenization.py:123-217) without razdel/HF dependencies:

* ``tokenize_words(text)`` → list of ``(word_text, start, end)`` with
  half-open char bounds into the original text; zero-width space U+200B is
  whitespace (tokenization.py:136); words are split on punctuation, each
  punctuation char its own token (tokenization.py:140-141).
* ``subtokenize(word)`` → deterministic WordPiece-shaped pieces: the real
  model's vocab is unavailable in-sandbox, so pieces are fixed-width chunks
  (≤4 chars, continuations prefixed ``##``) — preserving the structural
  properties the decoder depends on: every word maps to ≥1 subtoken,
  subtokens carry exact char bounds, and multi-subtoken words exercise the
  INIT/MIDDLE/FIN transition matrices (postprocessing.py:128-138).
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


def tokenize_text(text: str) -> tuple[list[tuple[str, int, int]], list[Subtoken]]:
    """Words in subtoken-index space + flat subtoken list with char bounds."""
    words_out: list[tuple[str, int, int]] = []
    subtokens: list[Subtoken] = []
    for word_text, w_start, _w_end in tokenize_words(text):
        first = len(subtokens)
        subtokens.extend(subtokenize(word_text, w_start))
        words_out.append((word_text, first, len(subtokens)))
    return words_out, subtokens
