"""Unit tests for the pure-Python kernels (no Spark session needed).

Mirrors the reference's golden-value unit-test style (SURVEY.md §5.1):
tokenization offsets, sentenization edge cases, constrained greedy decoding
with exact tie semantics, embeddings.
"""

import numpy as np
import pytest

from runne_contrastive_ner_spark.functions import decode as D
from runne_contrastive_ner_spark.functions.embed import (
    hash_embedding,
    logistic_similarity,
    mean_pool_l2,
)
from runne_contrastive_ner_spark.functions.hashing import md5_bucket, md5_int
from runne_contrastive_ner_spark.functions.scorer import (
    GazetteerScorer,
    score_windows,
    words_from_pieces,
)
from runne_contrastive_ner_spark.functions.sentenize import find_quoted_spans, sentenize_text
from runne_contrastive_ner_spark.functions.textnorm import (
    find_substring,
    normalize_surface,
    remove_accents,
)
from runne_contrastive_ner_spark.functions.tokenizer import tokenize_text, tokenize_words
from runne_contrastive_ner_spark.functions.vocab import (
    ENTITY_TYPES,
    TEST_GAZETTEER,
    validate_entity_types,
)


class TestTextNorm:
    def test_remove_accents_preserves_length(self):
        s = "café naïve Ωlé ёж"
        out = remove_accents(s)
        assert len(out) == len(s)
        assert out.startswith("cafe naive")

    def test_find_substring_with_placeholder(self):
        # reference contract (tokenization.py:79-120): placeholders in the
        # haystack are skipped/consumed, arg order is (s, substring)
        assert find_substring("x cafe` y", "cafe") == (2, 7)
        assert find_substring("abc", "zzz") == (-1, -1)

    def test_normalize_surface(self):
        assert normalize_surface("  Big   DATA ") == "big data"
        assert normalize_surface("Café") == "cafe"


class TestSentenize:
    def test_basic_split(self):
        t = "One sentence here. Another one! A third?"
        bounds = sentenize_text(t)
        assert [t[a:b] for a, b in bounds] == [
            "One sentence here.", "Another one!", "A third?",
        ]

    def test_abbreviation_no_split(self):
        t = "Dr. Smith arrived. He left."
        got = [t[a:b] for a, b in sentenize_text(t)]
        assert got == ["Dr. Smith arrived.", "He left."]

    def test_quote_protected(self):
        t = "He said «Wait. Stop» loudly! Done."
        got = [t[a:b] for a, b in sentenize_text(t)]
        assert got == ["He said «Wait. Stop» loudly!", "Done."]

    def test_newline_conditional_break(self):
        # reference rule (tokenization.py:304-354): a newline breaks only
        # when the next non-space char is title-case or the previous one
        # was ?/!/.
        t = "first block\nSecond block"
        got = [t[a:b] for a, b in sentenize_text(t)]
        assert got == ["first block", "Second block"]
        t2 = "first block\nsecond block"
        assert [t2[a:b] for a, b in sentenize_text(t2)] == [t2]
        t3 = "first block.\nsecond block"
        got3 = [t3[a:b] for a, b in sentenize_text(t3)]
        assert got3 == ["first block.", "second block"]

    def test_terminator_run(self):
        t = "What?! Really... Yes."
        got = [t[a:b] for a, b in sentenize_text(t)]
        assert got[0] == "What?!"

    def test_empty_and_whitespace(self):
        assert sentenize_text("") == []
        assert sentenize_text("   \n  ") == []

    def test_quoted_spans(self):
        assert find_quoted_spans('a "bc" d') == [(2, 6)]
        # reference toggle semantics (tokenization.py:282-301): an inner «
        # is ignored while a span is open, so the FIRST » closes the span
        assert find_quoted_spans("x «a «b» c» y") == [(2, 8)]


class TestTokenizer:
    def test_word_offsets_exact(self):
        t = "spark, big data!"
        words = tokenize_words(t)
        assert [(w, t[a:b]) for w, a, b in words] == [
            ("spark", "spark"), (",", ","), ("big", "big"), ("data", "data"), ("!", "!"),
        ]

    def test_subtokens_cover_words(self):
        t = "verylongword ok"
        words, subs = tokenize_text(t)
        # pieces reconstruct words, bounds are exact
        assert subs[0][0] == "very" and subs[1][0] == "##long"
        for piece, a, b in subs:
            assert t[a:b] == piece.removeprefix("##")
        # word ranges index into subtoken space
        (w0, f0, l0), (w1, f1, l1) = words
        assert (w0, f0, l0) == ("verylongword", 0, 3)
        assert (w1, f1, l1) == ("ok", 3, 4)

    def test_zwsp_is_space(self):
        words = tokenize_words("a​b")
        assert [w for w, _, _ in words] == ["a", "b"]

    def test_underscore_is_its_own_token(self):
        words = tokenize_words("snake_case")
        assert [w for w, _, _ in words] == ["snake", "_", "case"]


class TestDecode:
    def _proba(self, tags):
        p = np.full((len(tags), 5), 0.02)
        for i, t in enumerate(tags):
            p[i, t] = 0.92
        return p

    def test_multiword_entity(self):
        # words: each 1 subtoken; entity at words 2..4 (START, MIDDLE, END)
        tags = [0, 0, 1, 3, 2, 0]
        words = [(f"w{i}", i, i + 1) for i in range(6)]
        spans = D.decode_entity_spans(self._proba(tags), words)
        assert spans == [(2, 5)]

    def test_single_token_entity(self):
        tags = [0, 4, 0]
        words = [(f"w{i}", i, i + 1) for i in range(3)]
        assert D.decode_entity_spans(self._proba(tags), words) == [(1, 2)]

    def test_adjacent_entities_merge(self):
        # END immediately followed by START -> one merged nonzero run
        tags = [1, 2, 1, 2]
        words = [(f"w{i}", i, i + 1) for i in range(4)]
        assert D.decode_entity_spans(self._proba(tags), words) == [(0, 4)]

    def test_multisubtoken_word(self):
        # one word of 3 subtokens fully covered: START, MIDDLE, END
        tags = [1, 3, 2]
        words = [("abc", 0, 3)]
        assert D.decode_entity_spans(self._proba(tags), words) == [(0, 3)]

    def test_tie_breaks_to_lowest_class(self):
        # uniform rows: greedy must stay at O (class 0) throughout
        p = np.full((4, 5), 0.2)
        words = [(f"w{i}", i, i + 1) for i in range(4)]
        assert D.decode_entity_spans(p, words) == []

    def test_outside_word_range_is_O(self):
        tags = [1, 2]
        p = np.vstack([self._proba([0]), self._proba(tags), self._proba([0])])
        words = [("w", 1, 3)]  # word covers subtokens 1..2 only
        assert D.decode_entity_spans(p, words) == [(1, 3)]

    def test_validation_rejects_bad_rows(self):
        words = [("w", 0, 1)]
        with pytest.raises(ValueError):
            D.decode_entity_spans(np.array([[0.0, 0.5, 0.5, 0.0, 0.0]]), words)
        with pytest.raises(ValueError):
            D.decode_entity_spans(np.array([[1.2, 0.1, 0.1, 0.1, 0.1]]), words)

    def test_long_sequence_no_recursion_limit(self):
        # the reference decoder recurses per subtoken and would overflow here
        n = 5000
        tags = [0] * n
        tags[100:110] = [1] + [3] * 8 + [2]
        words = [(f"w{i}", i, i + 1) for i in range(n)]
        assert D.decode_entity_spans(self._proba(tags), words) == [(100, 110)]

    def test_illegal_transition_suppressed(self):
        # intended START at last position of a FIN subword is illegal from O;
        # decoder must not emit a span that violates the matrices
        p = self._proba([0, 1])  # word of 2 subtokens, START on FIN position
        words = [("ab", 0, 2)]
        spans = D.decode_entity_spans(p, words)
        assert spans == []  # FIN matrix has no O->START transition

    def test_char_span_mapping(self):
        bounds = [(0, 4), (4, 7), (8, 12)]
        assert D.subtoken_spans_to_char_spans([(1, 3)], bounds) == [(4, 12)]


class TestScorer:
    def test_words_from_pieces(self):
        assert words_from_pieces(["very", "##long", "ok"]) == [
            ("verylong", 0, 2), ("ok", 2, 3),
        ]

    def test_gazetteer_detection_nested_and_merge(self):
        text = "fast table and table table and big data"
        from runne_contrastive_ner_spark.operators.mentions import detect_mentions_in_text

        scorer = GazetteerScorer(TEST_GAZETTEER, ENTITY_TYPES)
        got = {(t, text[a:b]) for t, a, b in detect_mentions_in_text(text, scorer)}
        assert ("LOCATION", "fast table") in got
        assert ("ORGANIZATION", "big data") in got
        # nested PRODUCT inside LOCATION + adjacent same-type merged
        assert ("PRODUCT", "table") in got
        assert ("PRODUCT", "table table") in got

    def test_windowing_restacks(self):
        scorer = GazetteerScorer(TEST_GAZETTEER, ENTITY_TYPES, window=4)
        pieces = ["spark"] * 10
        logits = score_windows(scorer, pieces)
        assert logits.shape == (len(ENTITY_TYPES), 10, 5)


class TestEmbed:
    def test_mean_pool_l2_unit_norm(self):
        vecs = np.arange(12, dtype=float).reshape(4, 3)
        mask = np.array([0, 1, 1, 0])
        v = mean_pool_l2(vecs, mask)
        assert np.isclose(np.linalg.norm(v), 1.0)

    def test_logistic_similarity_monotone(self):
        a = np.array([1.0, 0.0])
        assert logistic_similarity(a, a) > logistic_similarity(a, np.array([0.0, 1.0]))

    def test_hash_embedding_deterministic_unit(self):
        v1, v2 = hash_embedding("spark"), hash_embedding("spark")
        assert np.allclose(v1, v2) and np.isclose(np.linalg.norm(v1), 1.0)


class TestHashing:
    def test_md5_int_matches_duckdb(self):
        import duckdb

        for s in ["abc", "big data", "42"]:
            expect = duckdb.sql(
                f"SELECT ('0x' || substr(md5('{s}'), 1, 15))::BIGINT"
            ).fetchone()[0]
            assert md5_int(s) == expect

    def test_bucket_range(self):
        assert 0 <= md5_bucket("x", 100) < 100


class TestVocab:
    def test_entity_types_valid(self):
        validate_entity_types(ENTITY_TYPES)
        assert len(ENTITY_TYPES) == 29

    def test_bad_types_rejected(self):
        for bad in ["", "lower", "B-PER", "X"]:
            with pytest.raises(ValueError):
                validate_entity_types([bad])
        with pytest.raises(ValueError):
            validate_entity_types(["PERSON", "PERSON"])
