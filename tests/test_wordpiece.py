"""Subtoken-layer parity with the reference tokenizer goldens.

The reference pins exact per-subtoken strings, char bounds, and {0,1,2}
indicator vectors against its own PUBLIC vocab fixtures
(tests/test_tokenization.py:49-562, fixtures tests/data/bert{,-uncased}).
Golden DATA below (input strings, expected subtokens/bounds/indicators) is
reproduced from that test suite — the goldens ARE the parity contract.
The implementation under test is the engine's own
(functions/wordpiece.py + functions/tokenizer.py), written from the
published BERT WordPiece algorithm.

Tests are skipped when the vocab fixtures are not present (they live in the
read-only reference checkout, not in this repo)."""

from __future__ import annotations

import os

import pytest

from runne_contrastive_ner_spark.functions.tokenizer import tokenize_text
from runne_contrastive_ner_spark.functions.trainset_kernel import (
    indicator_for_type,
)
from runne_contrastive_ner_spark.functions.wordpiece import (
    WordPieceTokenizer,
    load_wordpiece,
)

CASED_DIR = "/root/reference/tests/data/bert"
UNCASED_DIR = "/root/reference/tests/data/bert-uncased"

needs_fixtures = pytest.mark.skipif(
    not (os.path.isdir(CASED_DIR) and os.path.isdir(UNCASED_DIR)),
    reason="reference vocab fixtures unavailable",
)


@pytest.fixture(scope="module")
def cased():
    return load_wordpiece(CASED_DIR)


@pytest.fixture(scope="module")
def uncased():
    return load_wordpiece(UNCASED_DIR)


def reference_shape(s: str, wp):
    """Engine tokenize_text projected to the reference's golden shape:
    [CLS]/[SEP] sentinels, word subtoken indices offset by the CLS slot."""
    words, subs = tokenize_text(s, wp=wp)
    return (
        [(w, f + 1, l + 1) for w, f, l in words],
        ["[CLS]"] + [p for p, _, _ in subs] + ["[SEP]"],
        [None] + [(a, b) for _, a, b in subs] + [None],
    )


S_POISON = (
    "По предварительным данным, его отравили в аэропорту, "
    "когда он направлялся из Малайзии в Макао."
)
S_NUMERO = (
    " В тексте знак «№» применяется только с относящимся к нему "
    "числом, от которого при наборе отделяется пробельным материалом "
    "(например,  № 11)."
)
S_GUTERRES = "António Manuel de Oliveira Guterres"
S_ACCENTS = "Их имена — Диа́с Кадырба́ев и Азама́т Тажая́ков."
S_SAMSUNG = "Samsung и Nokia будут платить «налог на болванки»."
S_OTNINE = "Отныне Samsung и Nokia будут платить «налог на болванки»."


# --- tokenize_text goldens (reference tests/test_tokenization.py:49-411) ----

@needs_fixtures
def test_tokenize_text_golden_1_cased(cased):
    words, subs, bounds = reference_shape(S_POISON, cased)
    assert words == [
        ("По", 1, 2), ("предварительным", 2, 3), ("данным", 3, 4),
        (",", 4, 5), ("его", 5, 6), ("отравили", 6, 8), ("в", 8, 9),
        ("аэропорту", 9, 10), (",", 10, 11), ("когда", 11, 12),
        ("он", 12, 13), ("направлялся", 13, 14), ("из", 14, 15),
        ("Малайзии", 15, 16), ("в", 16, 17), ("Макао", 17, 18),
        (".", 18, 19),
    ]
    assert subs == [
        "[CLS]", "По", "предварительным", "данным", ",", "его", "отрав",
        "##или", "в", "аэропорту", ",", "когда", "он", "направлялся",
        "из", "Малайзии", "в", "Макао", ".", "[SEP]",
    ]
    assert bounds == [
        None, (0, 2), (3, 18), (19, 25), (25, 26), (27, 30), (31, 36),
        (36, 39), (40, 41), (42, 51), (51, 52), (53, 58), (59, 61),
        (62, 73), (74, 76), (77, 85), (86, 87), (88, 93), (93, 94), None,
    ]


@needs_fixtures
def test_tokenize_text_golden_2_cased(cased):
    words, subs, bounds = reference_shape(S_NUMERO, cased)
    assert words == [
        ("В", 1, 2), ("тексте", 2, 3), ("знак", 3, 4), ("«", 4, 5),
        ("№", 5, 6), ("»", 6, 7), ("применяется", 7, 8), ("только", 8, 9),
        ("с", 9, 10), ("относящимся", 10, 11), ("к", 11, 12),
        ("нему", 12, 13), ("числом", 13, 14), (",", 14, 15),
        ("от", 15, 16), ("которого", 16, 17), ("при", 17, 18),
        ("наборе", 18, 19), ("отделяется", 19, 20), ("пробельным", 20, 23),
        ("материалом", 23, 24), ("(", 24, 25), ("например", 25, 26),
        (",", 26, 27), ("№", 27, 28), ("11", 28, 29), (")", 29, 30),
        (".", 30, 31),
    ]
    assert subs == [
        "[CLS]", "В", "тексте", "знак", "«", "№", "»", "применяется",
        "только", "с", "относящимся", "к", "нему", "числом", ",", "от",
        "которого", "при", "наборе", "отделяется", "пробел", "##ь",
        "##ным", "материалом", "(", "например", ",", "№", "11", ")", ".",
        "[SEP]",
    ]
    assert bounds == [
        None, (1, 2), (3, 9), (10, 14), (15, 16), (16, 17), (17, 18),
        (19, 30), (31, 37), (38, 39), (40, 51), (52, 53), (54, 58),
        (59, 65), (65, 66), (67, 69), (70, 78), (79, 82), (83, 89),
        (90, 100), (101, 107), (107, 108), (108, 111), (112, 122),
        (123, 124), (124, 132), (132, 133), (135, 136), (137, 139),
        (139, 140), (140, 141), None,
    ]


@needs_fixtures
def test_tokenize_text_golden_3_uncased(uncased):
    words, subs, bounds = reference_shape(S_POISON, uncased)
    assert words == [
        ("По", 1, 2), ("предварительным", 2, 3), ("данным", 3, 4),
        (",", 4, 5), ("его", 5, 6), ("отравили", 6, 7), ("в", 7, 8),
        ("аэропорту", 8, 9), (",", 9, 10), ("когда", 10, 11),
        ("он", 11, 12), ("направлялся", 12, 13), ("из", 13, 14),
        ("Малайзии", 14, 17), ("в", 17, 18), ("Макао", 18, 20),
        (".", 20, 21),
    ]
    assert subs == [
        "[CLS]", "по", "предварительным", "данным", ",", "его",
        "отравили", "в", "аэропорту", ",", "когда", "он", "направлялся",
        "из", "мала", "##из", "##ии", "в", "мака", "##о", ".", "[SEP]",
    ]
    assert bounds == [
        None, (0, 2), (3, 18), (19, 25), (25, 26), (27, 30), (31, 39),
        (40, 41), (42, 51), (51, 52), (53, 58), (59, 61), (62, 73),
        (74, 76), (77, 81), (81, 83), (83, 85), (86, 87), (88, 92),
        (92, 93), (93, 94), None,
    ]


@needs_fixtures
def test_tokenize_text_golden_4_uncased(uncased):
    words, subs, bounds = reference_shape(S_GUTERRES, uncased)
    assert words == [
        ("António", 1, 4), ("Manuel", 4, 6), ("de", 6, 7),
        ("Oliveira", 7, 10), ("Guterres", 10, 13),
    ]
    assert subs == [
        "[CLS]", "ant", "##oni", "##o", "man", "##uel", "de", "ol",
        "##ive", "##ira", "gu", "##ter", "##res", "[SEP]",
    ]
    assert bounds == [
        None, (0, 3), (3, 6), (6, 7), (8, 11), (11, 14), (15, 17),
        (18, 20), (20, 23), (23, 26), (27, 29), (29, 32), (32, 35), None,
    ]


@needs_fixtures
def test_tokenize_text_golden_5_uncased(uncased):
    words, subs, bounds = reference_shape(S_ACCENTS, uncased)
    assert words == [
        ("Их", 1, 2), ("имена", 2, 3), ("—", 3, 4), ("Диа́с", 4, 6),
        ("Кадырба́ев", 6, 9), ("и", 9, 10), ("Азама́т", 10, 12),
        ("Тажая́ков", 12, 15), (".", 15, 16),
    ]
    assert subs == [
        "[CLS]", "их", "имена", "—", "диа", "##с", "кады", "##рба",
        "##ев", "и", "аза", "##мат", "та", "##жая", "##ков", ".", "[SEP]",
    ]
    assert bounds == [
        None, (0, 2), (3, 8), (9, 10), (11, 15), (15, 16), (17, 21),
        (21, 25), (25, 27), (28, 29), (30, 33), (33, 37), (38, 40),
        (40, 44), (44, 47), (47, 48), None,
    ]


# --- with_ners subtoken-exact indicators (reference :413-562) ---------------
# full golden vectors asserted verbatim, no word-level projection (r2 VERDICT
# item 2); indicator rows are ordered by ne_voc

WITH_NERS_SUBTOKEN_GOLDENS = [
    (
        S_POISON,
        ["EVENT", "COUNTRY", "PERSON", "STATE_OR_PROVINCE", "WORK_OF_ART"],
        [("EVENT", 31, 39), ("COUNTRY", 77, 85), ("STATE_OR_PROVINCE", 88, 93)],
        [
            [0, 0, 0, 0, 0, 0, 2, 1, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0],
            [0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 2, 0, 0, 0, 0],
            [0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0],
            [0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 2, 0, 0],
            [0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0],
        ],
    ),
    (
        S_POISON,
        ["EVENT", "COUNTRY", "LOCATION", "PERSON", "STATE_OR_PROVINCE",
         "WORK_OF_ART"],
        [("EVENT", 31, 39), ("LOCATION", 40, 51), ("COUNTRY", 77, 85),
         ("STATE_OR_PROVINCE", 88, 93), ("LOCATION", 74, 85),
         ("LOCATION", 86, 93)],
        [
            [0, 0, 0, 0, 0, 0, 2, 1, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0],
            [0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 2, 0, 0, 0, 0],
            [0, 0, 0, 0, 0, 0, 0, 0, 2, 1, 0, 0, 0, 0, 2, 1, 2, 1, 0, 0],
            [0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0],
            [0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 2, 0, 0],
            [0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0],
        ],
    ),
    (
        S_SAMSUNG,
        ["EVENT", "LOCATION", "ORGANIZATION"],
        [("ORGANIZATION", 0, 9), ("ORGANIZATION", 10, 15)],
        [
            [0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0],
            [0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0],
            [0, 2, 1, 2, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0],
        ],
    ),
    (
        S_OTNINE,
        ["EVENT", "LOCATION", "ORGANIZATION"],
        [("ORGANIZATION", 7, 14), ("ORGANIZATION", 15, 22)],
        [
            [0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0],
            [0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0],
            [0, 0, 2, 2, 1, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0],
        ],
    ),
]

WITH_NERS_EXPECTED_SUBTOKENS = {
    S_SAMSUNG: [
        "[CLS]", "Samsung", "и", "Nokia", "будут", "платить", "«", "налог",
        "на", "бол", "##ван", "##ки", "»", ".", "[SEP]",
    ],
    S_OTNINE: [
        "[CLS]", "Отныне", "Samsung", "и", "Nokia", "будут", "платить",
        "«", "налог", "на", "бол", "##ван", "##ки", "»", ".", "[SEP]",
    ],
}


@needs_fixtures
@pytest.mark.parametrize("s,ne_voc,ners,expected", WITH_NERS_SUBTOKEN_GOLDENS)
def test_with_ners_subtoken_goldens(cased, s, ne_voc, ners, expected):
    _words, subs = tokenize_text(s, wp=cased)
    if s in WITH_NERS_EXPECTED_SUBTOKENS:
        got_subs = ["[CLS]"] + [p for p, _, _ in subs] + ["[SEP]"]
        assert got_subs == WITH_NERS_EXPECTED_SUBTOKENS[s]
    got = []
    for etype in ne_voc:
        spans = [(a, b) for t, a, b in ners if t == etype]
        body = indicator_for_type(subs, spans)
        got.append([0] + body + [0])  # CLS/SEP carry 0
    assert got == expected


# --- wordpiece unit behavior -------------------------------------------------

def test_wordpiece_greedy_longest_match():
    wp = WordPieceTokenizer({"un", "##aff", "##able", "##a", "u", "##n"})
    assert wp.wordpiece("unaffable") == ["un", "##aff", "##able"]


def test_wordpiece_unknown_token_and_long_token():
    wp = WordPieceTokenizer({"a", "##b"}, max_chars_per_token=5)
    assert wp.wordpiece("az") == ["[UNK]"]       # no match mid-token
    assert wp.wordpiece("abbbbbb") == ["[UNK]"]  # exceeds max chars
    assert wp.wordpiece("abb") == ["a", "##b", "##b"]


def test_basic_tokens_punctuation_and_lowercase():
    wp = WordPieceTokenizer(set(), do_lower_case=True)
    assert wp.basic_tokens("Ab-c") == ["ab", "-", "c"]
    # lowercasing strips combining marks (NFD, category Mn)
    assert wp.basic_tokens("Диа́с") == ["диас"]
    cased = WordPieceTokenizer(set(), do_lower_case=False)
    (tok,) = cased.basic_tokens("Диа́с")
    assert tok == "Диа́с" and len(tok) == 5  # mark preserved, no lowering


def test_basic_tokens_cjk_isolated():
    wp = WordPieceTokenizer(set(), do_lower_case=False)
    assert wp.basic_tokens("ab中文cd") == ["ab", "中", "文", "cd"]


def test_unk_word_collapses_to_single_subtoken():
    from runne_contrastive_ner_spark.functions.tokenizer import (
        subtokenize_wordpiece,
    )

    wp = WordPieceTokenizer({"кот"}, do_lower_case=False)
    assert subtokenize_wordpiece("собака", 10, wp) == [("[UNK]", 10, 16)]
    assert subtokenize_wordpiece("кот", 3, wp) == [("кот", 3, 6)]


@needs_fixtures
def test_load_wordpiece_respects_config(cased, uncased):
    assert cased.do_lower_case is False   # tokenizer_config.json present
    assert uncased.do_lower_case is True  # absent config -> published default


# --- property-based invariants (hypothesis) ----------------------------------

from hypothesis import given, settings
from hypothesis import strategies as st

_tiny_vocab = frozenset(
    list("abcdefgh")
    + ["##" + c for c in "abcdefgh"]
    + ["ab", "##ab", "##cd", "abc", "fgh"]
)


@settings(max_examples=200, deadline=None)
@given(st.text(alphabet="abcdefghxyz", min_size=1, max_size=24))
def test_wordpiece_cover_or_unk(word):
    """Greedy segmentation either tiles the token exactly (## stripped,
    concatenation == input) or collapses to a single [UNK]."""
    wp = WordPieceTokenizer(_tiny_vocab, do_lower_case=False)
    pieces = wp.wordpiece(word)
    if pieces == ["[UNK]"]:
        assert any(ch not in "abcdefgh" for ch in word) or not word
    else:
        rebuilt = "".join(p[2:] if p.startswith("##") else p for p in pieces)
        assert rebuilt == word
        assert not pieces[0].startswith("##")
        assert all(p.startswith("##") for p in pieces[1:])


@settings(max_examples=200, deadline=None)
@given(st.text(alphabet="abcdefgh ́Ёа-", min_size=1, max_size=20))
def test_subtokenize_bounds_tile_word(word):
    """With full single-char coverage the aligned subtokens carry
    contiguous half-open char bounds starting at the word start. The final
    bound follows the reference contract (tokenization.py:204-208): a
    multi-piece word ends at start + len(prep_word); folding is length-
    preserving (marks become placeholders), so that IS the word end."""
    word = word.strip()
    if not word or " " in word:
        return
    folded_chars = set("abcdefgheа-`ё")
    vocab = frozenset(
        list(folded_chars) + ["##" + c for c in folded_chars]
    )
    from runne_contrastive_ner_spark.functions.textnorm import remove_accents
    from runne_contrastive_ner_spark.functions.tokenizer import (
        subtokenize_wordpiece,
    )

    wp = WordPieceTokenizer(vocab, do_lower_case=True)
    try:
        pieces = subtokenize_wordpiece(word, 7, wp)
    except ValueError:
        return  # alignment refusal is allowed; silent misalignment is not
    assert pieces[0][1] == 7
    if len(pieces) > 1:
        assert pieces[-1][2] == 7 + len(remove_accents(word.lower()))
    else:
        assert pieces[-1][2] == 7 + len(word)
    for (_, _, a1), (_, b0, _) in zip(pieces, pieces[1:]):
        assert a1 == b0


def test_subtokenize_nfd_final_bound_matches_reference():
    """Decomposed input (combining acute, NFD): remove_accents is
    length-preserving in BOTH implementations — the standalone mark folds
    to the '`' placeholder rather than being dropped — so prep_word keeps
    the word's length and the final bound is the true word end
    (tokenization.py:59-77, 204-208). The mark's position becomes an
    placeholder that the reference's find_substring CONSUMES into the
    preceding piece's match: 'cafe' spans (10,15) — mark absorbed — and
    '##s' sits at (15,16). Pinned because an accent-STRIPPING fold (the
    natural wrong implementation) would shift every bound after the mark
    left by one."""
    from runne_contrastive_ner_spark.functions.tokenizer import (
        subtokenize_wordpiece,
    )

    word = "cafe\u0301s"  # NFD: 6 chars, mark at index 4
    assert len(word) == 6
    wp = WordPieceTokenizer(frozenset({"cafe", "##s"}), do_lower_case=True)
    pieces = subtokenize_wordpiece(word, 10, wp)
    assert pieces == [("cafe", 10, 15), ("##s", 15, 16)]
