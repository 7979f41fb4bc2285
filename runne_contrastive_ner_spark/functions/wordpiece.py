"""Greedy WordPiece subtokenization with BERT basic normalization.

Implements the PUBLIC BERT tokenization algorithm (Devlin et al. 2019,
"BERT: Pre-training of Deep Bidirectional Transformers"; the
``BertTokenizer.tokenize`` contract the reference drives through HuggingFace
transformers in data_processing/tokenization.py:123-217). The reference
ships the trained vocabularies as public test fixtures —
tests/data/bert/vocab.txt (cased, 119 547 entries, tokenizer_config.json
``do_lower_case: false``) and tests/data/bert-uncased/vocab.txt (120 138
entries, lowercasing default) — and pins per-subtoken goldens against them
in tests/test_tokenization.py:49-411; this module makes those goldens
assertable byte-exact at the SUBTOKEN layer.

Two stages, written from the published algorithm (not ported from any
implementation):

* basic normalization per word: control-char cleaning, CJK-ideograph
  isolation, optional lowercasing + combining-mark stripping (NFD, category
  Mn), splitting on Unicode punctuation (ASCII symbol ranges + category P*);
* greedy longest-match-first segmentation against the vocab, continuations
  prefixed ``##``, per-basic-token fallback to ``[UNK]``, tokens longer than
  ``max_chars_per_token`` mapped straight to ``[UNK]``.

Pure Python. At Spark scale the vocab is loaded once per Python worker and
memoized by directory path (``load_wordpiece`` is lru_cached), so executors
pay the 120k-line read once, not per batch.
"""

from __future__ import annotations

import json
import os
import unicodedata
from functools import lru_cache

UNK_TOKEN = "[UNK]"
CLS_TOKEN = "[CLS]"
SEP_TOKEN = "[SEP]"
MAX_CHARS_PER_TOKEN = 100

# CJK unified-ideograph blocks (the published BERT list): ideographs are
# isolated as single-char tokens before wordpiece
_CJK_RANGES = (
    (0x4E00, 0x9FFF),
    (0x3400, 0x4DBF),
    (0x20000, 0x2A6DF),
    (0x2A700, 0x2B73F),
    (0x2B740, 0x2B81F),
    (0x2B820, 0x2CEAF),
    (0xF900, 0xFAFF),
    (0x2F800, 0x2FA1F),
)


def _is_cjk(cp: int) -> bool:
    return any(lo <= cp <= hi for lo, hi in _CJK_RANGES)


def _is_punctuation(ch: str) -> bool:
    """BERT punctuation: the four ASCII non-alnum ranges are punctuation
    even where Unicode classes them as symbols ($, ^, `), plus every
    category-P codepoint."""
    cp = ord(ch)
    if (
        33 <= cp <= 47
        or 58 <= cp <= 64
        or 91 <= cp <= 96
        or 123 <= cp <= 126
    ):
        return True
    return unicodedata.category(ch).startswith("P")


def _is_whitespace(ch: str) -> bool:
    return ch in " \t\n\r" or unicodedata.category(ch) == "Zs"


def _is_control(ch: str) -> bool:
    if ch in "\t\n\r":
        return False
    return unicodedata.category(ch).startswith("C")


def _strip_marks(token: str) -> str:
    decomposed = unicodedata.normalize("NFD", token)
    return "".join(
        c for c in decomposed if unicodedata.category(c) != "Mn"
    )


class WordPieceTokenizer:
    """``tokenize(word) -> pieces`` with BertTokenizer semantics.

    ``vocab`` is any container supporting ``in`` (set/dict/frozenset);
    ``do_lower_case`` lowercases AND strips combining marks (the published
    default coupling; pass ``strip_accents`` explicitly to decouple).
    """

    def __init__(
        self,
        vocab,
        do_lower_case: bool = True,
        strip_accents: bool | None = None,
        unk_token: str = UNK_TOKEN,
        max_chars_per_token: int = MAX_CHARS_PER_TOKEN,
    ) -> None:
        self.vocab = vocab if isinstance(vocab, (set, frozenset, dict)) else set(vocab)
        self.do_lower_case = do_lower_case
        self.strip_accents = strip_accents
        self.unk_token = unk_token
        self.max_chars_per_token = max_chars_per_token
        self.cls_token = CLS_TOKEN
        self.sep_token = SEP_TOKEN

    # --- basic normalization ------------------------------------------------
    def _clean(self, text: str) -> str:
        out = []
        for ch in text:
            cp = ord(ch)
            if cp == 0 or cp == 0xFFFD or _is_control(ch):
                continue
            if _is_cjk(cp):
                out.append(" ")
                out.append(ch)
                out.append(" ")
            elif _is_whitespace(ch):
                out.append(" ")
            else:
                out.append(ch)
        return "".join(out)

    def basic_tokens(self, text: str) -> list[str]:
        """Normalized punctuation-split tokens of ``text``."""
        tokens: list[str] = []
        for raw in self._clean(text).split():
            if self.do_lower_case:
                raw = raw.lower()
                if self.strip_accents is not False:
                    raw = _strip_marks(raw)
            elif self.strip_accents:
                raw = _strip_marks(raw)
            # split into maximal runs of non-punctuation; each punctuation
            # char is its own token
            run: list[str] = []
            for ch in raw:
                if _is_punctuation(ch):
                    if run:
                        tokens.append("".join(run))
                        run = []
                    tokens.append(ch)
                else:
                    run.append(ch)
            if run:
                tokens.append("".join(run))
        return tokens

    # --- greedy wordpiece ---------------------------------------------------
    def wordpiece(self, token: str) -> list[str]:
        """Greedy longest-match-first segmentation of one basic token."""
        n = len(token)
        if n > self.max_chars_per_token:
            return [self.unk_token]
        pieces: list[str] = []
        start = 0
        while start < n:
            end = n
            match = None
            while end > start:
                cand = token[start:end]
                if start > 0:
                    cand = "##" + cand
                if cand in self.vocab:
                    match = cand
                    break
                end -= 1
            if match is None:
                return [self.unk_token]
            pieces.append(match)
            start = end
        return pieces

    def tokenize(self, word: str) -> list[str]:
        """BertTokenizer.tokenize: basic-normalize then wordpiece each
        basic token; concatenation over basic tokens."""
        out: list[str] = []
        for tok in self.basic_tokens(word):
            out.extend(self.wordpiece(tok))
        return out


@lru_cache(maxsize=8)
def load_vocab_ids(vocab_path: str) -> dict:
    """token → row index (the BERT id space: vocab.txt line number).
    Memoized per path like load_wordpiece."""
    with open(vocab_path, encoding="utf-8") as f:
        return {
            line.rstrip("\n"): i for i, line in enumerate(f) if line.rstrip("\n")
        }


def load_vocab(vocab_path: str) -> frozenset[str]:
    with open(vocab_path, encoding="utf-8") as f:
        return frozenset(line.rstrip("\n") for line in f if line.rstrip("\n"))


@lru_cache(maxsize=8)
def load_wordpiece(model_dir: str) -> WordPieceTokenizer:
    """Load a WordPiece tokenizer from a BERT model directory: ``vocab.txt``
    plus (optional) ``tokenizer_config.json`` for ``do_lower_case`` (absent
    config means the published default, lowercase=True). Memoized per path —
    one vocab read per Python worker process."""
    if os.path.isdir(model_dir):
        vocab_path = os.path.join(model_dir, "vocab.txt")
        cfg_path = os.path.join(model_dir, "tokenizer_config.json")
    else:
        vocab_path = model_dir
        cfg_path = os.path.join(os.path.dirname(model_dir), "tokenizer_config.json")
    do_lower = True
    if os.path.exists(cfg_path):
        with open(cfg_path, encoding="utf-8") as f:
            do_lower = bool(json.load(f).get("do_lower_case", True))
    return WordPieceTokenizer(load_vocab(vocab_path), do_lower_case=do_lower)
