"""Sentence segmentation with offset-exact half-open char bounds.

Re-expresses the *semantics* of the reference's sentenizer stack
(data_processing/tokenization.py:220-354: ``is_exclusion``,
``find_quoted_substrings``, ``sentenize_with_exclusions``, ``sentenize_text``)
without its razdel dependency (razdel is not available here and the reference
code may not be copied). The preserved observable properties are:

* output is a list of half-open ``(start, end)`` bounds into the ORIGINAL
  text — ``text[start:end]`` is the sentence, whitespace-trimmed;
* zero-width spaces (U+200B) are treated as ordinary spaces
  (tokenization.py:136,330);
* newline blocks are hard sentence boundaries (tokenization.py:304-354);
* sentence-final abbreviations from an exclusion list do NOT end a sentence
  (tokenization.py:220-233);
* a sentence break never occurs inside a quoted span — paired ``"``/``'``
  and outermost ``«»`` (tokenization.py:282-301);
* a terminator ends a sentence only when followed by whitespace and an
  upper-case/digit/quote-opening continuation.

Pure Python; runs inside pandas UDFs only.
"""

from __future__ import annotations

ZWSP = "​"
TERMINATORS = ".!?…"

# sentence-final abbreviation exclusions (reference keeps a 56-entry Russian
# list at tokenization.py:9-56; ours covers the same role for the synthetic
# and mixed-language corpora this engine is tested on)
ABBREVIATIONS = frozenset(
    {
        "mr", "mrs", "ms", "dr", "prof", "st", "vs", "etc", "e.g", "i.e",
        "inc", "ltd", "co", "corp", "jr", "sr", "no", "vol", "fig", "approx",
        "г", "гг", "ул", "им", "т.е", "т.д", "т.п", "др", "проф", "акад",
        "с", "стр", "рис", "табл", "см", "млн", "млрд", "тыс", "руб",
    }
)

QUOTE_PAIRS = {"«": "»", "“": "”", "‘": "’"}
SYMMETRIC_QUOTES = {'"', "'"}


def _clean(text: str) -> str:
    return text.replace(ZWSP, " ")


def find_quoted_spans(text: str) -> list[tuple[int, int]]:
    """Half-open char bounds of quoted spans: symmetric quotes toggle,
    asymmetric quotes nest (outermost span reported)."""
    spans: list[tuple[int, int]] = []
    open_sym: dict[str, int] = {}
    stack: list[tuple[str, int]] = []  # (open_char, pos) for nesting quotes
    for i, ch in enumerate(text):
        if ch in SYMMETRIC_QUOTES:
            if ch in open_sym:
                spans.append((open_sym.pop(ch), i + 1))
            else:
                open_sym[ch] = i
        elif ch in QUOTE_PAIRS:
            stack.append((ch, i))
        elif stack and ch == QUOTE_PAIRS[stack[-1][0]]:
            _, start = stack.pop()
            if not stack:  # outermost only
                spans.append((start, i + 1))
    return sorted(spans)


def _is_abbreviation(text: str, dot_pos: int) -> bool:
    """Token immediately before the terminator at ``dot_pos`` is an
    exclusion-list abbreviation or a single letter (initials)."""
    j = dot_pos - 1
    while j >= 0 and (text[j].isalnum() or text[j] == "."):
        j -= 1
    token = text[j + 1 : dot_pos].lower().rstrip(".")
    if not token:
        return False
    return token in ABBREVIATIONS or (len(token) == 1 and token.isalpha())


def _trim_bounds(text: str, start: int, end: int) -> tuple[int, int] | None:
    while start < end and text[start].isspace():
        start += 1
    while end > start and text[end - 1].isspace():
        end -= 1
    if start >= end:
        return None
    return (start, end)


def sentenize_block(text: str, offset: int, block: str) -> list[tuple[int, int]]:
    """Sentence bounds within one newline-free block. ``offset`` rebases the
    bounds into the full document."""
    quoted = find_quoted_spans(block)

    def in_quote(pos: int) -> bool:
        return any(s <= pos < e for s, e in quoted)

    bounds: list[tuple[int, int]] = []
    n = len(block)
    sent_start = 0
    i = 0
    while i < n:
        ch = block[i]
        if ch in TERMINATORS and not in_quote(i):
            # swallow a terminator run (e.g. "?!", "...")
            j = i
            while j + 1 < n and block[j + 1] in TERMINATORS:
                j += 1
            # find next non-space char
            k = j + 1
            while k < n and block[k].isspace():
                k += 1
            follows_break = k >= n or (
                k > j + 1
                and (
                    block[k].isupper()
                    or block[k].isdigit()
                    or block[k] in QUOTE_PAIRS
                    or block[k] in SYMMETRIC_QUOTES
                )
            )
            if ch == "." and i == j and _is_abbreviation(block, i):
                follows_break = False
            if follows_break:
                tb = _trim_bounds(block, sent_start, j + 1)
                if tb:
                    bounds.append((tb[0] + offset, tb[1] + offset))
                sent_start = k
                i = k
                continue
            i = j + 1
            continue
        i += 1
    tb = _trim_bounds(block, sent_start, n)
    if tb:
        bounds.append((tb[0] + offset, tb[1] + offset))
    return bounds


def sentenize_text(text: str) -> list[tuple[int, int]]:
    """Half-open sentence bounds into ``text``. Newlines are hard breaks."""
    cleaned = _clean(text)
    bounds: list[tuple[int, int]] = []
    pos = 0
    for block in cleaned.split("\n"):
        bounds.extend(sentenize_block(cleaned, pos, block))
        pos += len(block) + 1
    return bounds
