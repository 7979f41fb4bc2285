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


def find_substring(needle: str, haystack: str, start: int = 0) -> tuple[int, int]:
    """Find ``needle`` in ``haystack`` starting at ``start``, where haystack
    characters may be PLACEHOLDER wildcards. Returns half-open (begin, end)
    char bounds or (-1, -1) if absent. Comparison is case-insensitive (the
    reference searches over accent-folded, case-matched strings)."""
    n, h = needle.lower(), haystack.lower()
    ln, lh = len(n), len(h)
    if ln == 0:
        return (-1, -1)
    for i in range(start, lh - ln + 1):
        ok = True
        for j in range(ln):
            hc = h[i + j]
            if hc != n[j] and hc != PLACEHOLDER and n[j] != PLACEHOLDER:
                ok = False
                break
        if ok:
            return (i, i + ln)
    return (-1, -1)


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
