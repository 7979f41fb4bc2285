"""Text normalization kernels (reference semantics: T1/T2 in SURVEY.md §2.2).

``remove_accents`` reproduces the observable behavior of the reference's
accent folding (data_processing/tokenization.py:59-76): every character is
NFKD-decomposed, combining marks are dropped, and any character whose
decomposition produces nothing printable is replaced by a backtick
placeholder so that *string length and character offsets are preserved* —
the property the downstream offset-exact tokenizer relies on.

``find_substring`` reproduces the tolerant substring search
(tokenization.py:79-120): it locates ``needle`` inside ``haystack`` where the
haystack may contain backtick placeholders at arbitrary positions, returning
half-open character bounds including any trailing placeholders consumed.

Both are pure Python, called only inside pandas UDFs on normalized short
strings (single words), never per-DataFrame-row from the JVM.
"""

from __future__ import annotations

import unicodedata
from functools import lru_cache

PLACEHOLDER = "`"


def remove_accents(text: str) -> str:
    """Accent-fold preserving length: 1 output char per input char."""
    if text.isascii():  # fast path: ASCII has no combining marks
        return text
    out = []
    for ch in text:
        decomposed = unicodedata.normalize("NFKD", ch)
        base = "".join(c for c in decomposed if not unicodedata.combining(c))
        if len(base) == 0:
            out.append(PLACEHOLDER)
        else:
            # keep exactly one char so offsets never shift
            out.append(base[0])
    return "".join(out)


def find_substring(s: str, substring: str) -> tuple[int, int]:
    """Reference-contract tolerant substring search (tokenization.py:79-120,
    goldens tests/test_tokenization.py:671-723): find ``substring`` in ``s``
    where ``s`` may contain PLACEHOLDER chars left by accent folding
    (standalone combining marks). Placeholders in ``s`` are SKIPPED during
    matching (they are mark remnants, not wildcards); leading placeholders
    immediately before the match and trailing placeholders after it are
    consumed into the returned half-open bounds. Raises ValueError if the
    substring itself contains a placeholder or edge whitespace. The match is
    anchored at the FIRST occurrence of the substring's first char (the
    reference searches one normalized word at a time, so one anchor
    suffices)."""
    if PLACEHOLDER in substring:
        raise ValueError(
            f"{substring!r} is a wrong sub-word: it contains {PLACEHOLDER!r}"
        )
    if substring != substring.strip():
        raise ValueError(
            f"{substring!r} is a wrong sub-word: it has edge whitespace"
        )
    if len(substring) == 0:
        return (-1, -1)
    if PLACEHOLDER not in s:
        start_pos = s.find(substring)
        if start_pos < 0:
            return (-1, -1)
        return (start_pos, start_pos + len(substring))
    found_idx = s.find(substring[0])
    if found_idx < 0:
        return (-1, -1)
    idx1 = found_idx + 1
    while found_idx > 0 and s[found_idx - 1] == PLACEHOLDER:
        found_idx -= 1
    for ch in substring[1:]:
        while idx1 < len(s) and s[idx1] == PLACEHOLDER:
            idx1 += 1
        if idx1 >= len(s) or s[idx1] != ch:
            break
        idx1 += 1
    if s[found_idx:idx1].replace(PLACEHOLDER, "") != substring:
        return (-1, -1)
    while idx1 < len(s) and s[idx1] == PLACEHOLDER:
        idx1 += 1
    return (found_idx, idx1)


def normalize_surface(text: str) -> str:
    """Canonical surface form for entity linking blocking keys:
    accent-fold, lowercase, collapse internal whitespace."""
    folded = remove_accents(text).lower()
    return " ".join(folded.split())


@lru_cache(maxsize=1 << 16)
def normalize_word_cached(word: str) -> str:
    """Memoized normalize for the tokenizer/scorer hot path — natural-language
    word vocabularies repeat heavily, so this is nearly always a dict hit.
    (Pure function; cache is per Python worker.)"""
    return normalize_surface(word)
