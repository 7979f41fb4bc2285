"""Sentence segmentation with offset-exact half-open char bounds.

Re-expresses the reference's sentenizer stack
(data_processing/tokenization.py:220-354: ``is_exclusion``,
``find_quoted_substrings``, ``sentenize_with_exclusions``, ``sentenize_text``)
without its razdel dependency (razdel is not available here and the reference
code may not be copied). Reference-parity properties, verified against the
ported goldens in tests/test_reference_goldens.py
(reference tests/test_tokenization.py:564-669):

* output is half-open ``(start, end)`` bounds into the ORIGINAL text;
* zero-width spaces (U+200B) are ordinary spaces (tokenization.py:330);
* newline-block segmentation is CONDITIONAL (tokenization.py:304-354): at
  the first non-space char after a ``\\n``/``\\r`` run, the block breaks only
  when the last non-space char before the run was ``?``/``!``/``.`` or the
  new char is title-case — otherwise the sentence continues ACROSS the
  newline (reference golden test_sentenize_text_4);
* a sentence-final token matching the dotted exclusion list does NOT end a
  sentence (is_exclusion semantics: the candidate sentence text ends with
  the exclusion, preceded by a non-alphanumeric char or start-of-text);
* single-letter initials ('И.И. Петров') do not end a sentence (razdel
  behavior, re-expressed as a last-dot-component rule);
* a sentence break never occurs inside a quoted span; quoted spans follow
  the reference's toggle semantics (tokenization.py:282-301): ``"``/``'``
  share one open-slot and any of them closes it, ``«`` opens if no span is
  open, ``»`` closes — NO nesting (golden test_find_quoted_substrings_8:
  '«a «b» c»' reports (start_of_first_«, end_of_first_»)).

In-block splitting is our own terminator scanner standing in for razdel
(documented divergence: razdel's learned Russian heuristics are not
reproduced beyond the golden cases; a terminator ends a sentence only when
followed by whitespace and an upper-case/digit/quote-opening continuation).

Pure Python; runs inside pandas UDFs only.
"""

from __future__ import annotations

ZWSP = "​"
TERMINATORS = ".!?…"

# dotted sentence-final exclusions, adopted from the reference's
# SENTENIZE_EXCLUSIONS (data_processing/tokenization.py:9-56) — entries are
# matched against the END of a candidate sentence, case-insensitively,
# preceded by a non-alphanumeric char or start-of-text
SENTENIZE_EXCLUSIONS = frozenset(
    {
        "st.", "св.", "г.", "с.", "ftf.", "e.g.", "g.", "i.e.", "e.", "vs.",
        "jr.", "sr.", "smth.", "smb.", "vip.", "v.i.p.", "p.", "n.", "v.",
        "pp.", "par.", "ex.", "pl.", "sing.", "p.s.", "p.p.s.", "re.", "rf.",
        "edu.", "appx.", "in.", "sec.", "gm.", "cm.", "qt.", "mph.", "kph.",
        "ft.", "lb.", "oz.", "pt.", "yr.", "div.", "род.", "рожд.",
    }
)

# additional token-level abbreviations kept from round 1 (this engine also
# serves English/mixed corpora; entries are dotless tokens)
ABBREVIATIONS = frozenset(
    {
        "mr", "mrs", "ms", "dr", "prof", "st", "vs", "etc", "e.g", "i.e",
        "inc", "ltd", "co", "corp", "jr", "sr", "no", "vol", "fig", "approx",
        "г", "гг", "ул", "им", "т.е", "т.д", "т.п", "др", "проф", "акад",
        "с", "стр", "рис", "табл", "см", "млн", "млрд", "тыс", "руб",
    }
)

QUOTE_OPENERS = {'"', "'", "«", "“", "‘"}


def _clean(text: str) -> str:
    return text.replace(ZWSP, " ")


def find_quoted_spans(text: str) -> list[tuple[int, int]]:
    """Half-open char bounds of quoted spans, reference toggle semantics
    (tokenization.py:282-301): one open-slot shared by '"' and "'", «
    opens only when nothing is open, » closes. No nesting."""
    spans: list[tuple[int, int]] = []
    span_start = -1
    for i, ch in enumerate(text):
        if ch in ('"', "'"):
            if span_start < 0:
                span_start = i
            else:
                spans.append((span_start, i + 1))
                span_start = -1
        elif ch == "«":
            if span_start < 0:
                span_start = i
        elif ch == "»":
            if span_start >= 0:
                spans.append((span_start, i + 1))
                span_start = -1
    return spans


def is_exclusion(sentence_text: str) -> bool:
    """True when the candidate sentence ends with a dotted exclusion
    preceded by a non-alphanumeric char or start-of-text (reference
    is_exclusion, tokenization.py:220-233)."""
    low = sentence_text.lower()
    for excl in SENTENIZE_EXCLUSIONS:
        if low.endswith(excl):
            if len(low) == len(excl) or not low[-len(excl) - 1].isalnum():
                return True
    return False


def _is_abbreviation(text: str, dot_pos: int) -> bool:
    """Token immediately before the terminator at ``dot_pos`` is an
    exclusion-list abbreviation or ends in a single-letter dot-component
    (initials: 'И.И.' → last component 'И')."""
    j = dot_pos - 1
    while j >= 0 and (text[j].isalnum() or text[j] == "."):
        j -= 1
    token = text[j + 1 : dot_pos].lower().rstrip(".")
    if not token:
        return False
    if token in ABBREVIATIONS:
        return True
    last_component = token.rsplit(".", 1)[-1]
    return len(last_component) == 1 and last_component.isalpha()


def _trim_bounds(text: str, start: int, end: int) -> tuple[int, int] | None:
    while start < end and text[start].isspace():
        start += 1
    while end > start and text[end - 1].isspace():
        end -= 1
    if start >= end:
        return None
    return (start, end)


def sentenize_block(text: str, offset: int, block: str) -> list[tuple[int, int]]:
    """Sentence bounds within one block (which may span unbroken newlines).
    ``offset`` rebases the bounds into the full document."""
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
                    or block[k] in QUOTE_OPENERS
                )
            )
            if ch == "." and i == j:
                if _is_abbreviation(block, i) or is_exclusion(
                    block[sent_start : i + 1].strip()
                ):
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
    """Half-open sentence bounds into ``text``. Newline handling follows the
    reference scanner (tokenization.py:304-354): a ``\\n``/``\\r`` run ends
    the current block only when the preceding non-space char was ?/!/. or
    the first following non-space char is title-case; otherwise the sentence
    continues across the newline."""
    cleaned = _clean(text)
    bounds: list[tuple[int, int]] = []
    sent_start = -1
    newline_counter = 0
    last_char = ""

    def flush(start: int, end: int) -> None:
        while end > start and cleaned[end - 1].isspace():
            end -= 1
        if end > start:
            bounds.extend(sentenize_block(cleaned, start, cleaned[start:end]))

    for idx, ch in enumerate(cleaned):
        if ch in ("\n", "\r"):
            newline_counter += 1
        elif not ch.isspace():
            if sent_start < 0:
                sent_start = idx
            elif newline_counter > 0:
                if last_char in ("?", "!") or ch.istitle() or last_char == ".":
                    flush(sent_start, idx)
                    sent_start = idx
                newline_counter = 0
            last_char = ch
    if sent_start >= 0:
        flush(sent_start, len(cleaned))
    return bounds
