"""Entity-type vocabulary + the deterministic test gazetteer.

The 29 RuNNE entity types (reference ners.txt contract: newline-separated,
file order defines the label-head index — train.py:105-112,
tokenization.py:381; name grammar ``^[A-Z]+[_A-Z]*[A-Z]+$``,
train_test_split.py:9).

``TEST_GAZETTEER`` maps surface forms drawn from the driver-provided
synthetic corpus vocabulary (/root/testdata documents.text) to entity types,
chosen so the corpus exercises: multi-word surfaces ("big data",
"fast table"), nesting across types ("table" PRODUCT inside "fast table"
LOCATION), and frequent adjacent same-type occurrences (PRODUCT terms) that
trigger the reference's adjacent-span merging.

``TEST_ALIASES`` are the entity-linking equivalences the canonicalization
stage resolves via connected components; chains force multi-hop propagation.
"""

from __future__ import annotations

import re

ENTITY_TYPES: list[str] = [
    "AGE", "AWARD", "CITY", "COUNTRY", "CRIME", "DATE", "DISEASE", "DISTRICT",
    "EVENT", "FACILITY", "FAMILY", "IDEOLOGY", "LANGUAGE", "LAW", "LOCATION",
    "MONEY", "NATIONALITY", "NUMBER", "ORDINAL", "ORGANIZATION", "PENALTY",
    "PERCENT", "PERSON", "PRODUCT", "PROFESSION", "RELIGION",
    "STATE_OR_PROVINCE", "TIME", "WORK_OF_ART",
]

TYPE_NAME_RE = re.compile(r"^[A-Z]+[_A-Z]*[A-Z]+$")


def validate_entity_types(types: list[str]) -> None:
    """ners.txt loading contract: no empties, no duplicates, grammar check
    (train.py:105-115, train_test_split.py:18-22)."""
    seen = set()
    for t in types:
        if not t:
            raise ValueError("empty entity type name")
        if not TYPE_NAME_RE.match(t):
            raise ValueError(f"bad entity type name {t!r}")
        if t in seen:
            raise ValueError(f"duplicate entity type {t!r}")
        seen.add(t)


# surface form (normalized, space-separated words) -> entity type
TEST_GAZETTEER: dict[str, str] = {
    "spark": "PRODUCT",
    "table": "PRODUCT",
    "customer": "PROFESSION",
    "window": "FACILITY",
    "key": "PERSON",
    "batch": "DATE",
    "vector": "WORK_OF_ART",
    "merge": "EVENT",
    "big data": "ORGANIZATION",
    "fast table": "LOCATION",
}

# evaluation "gold" gazetteer (A5 metric fixtures): differs from the
# prediction gazetteer in both directions — two prediction-only surfaces
# (false positives) and one gold-only surface (false negatives)
EVAL_GOLD_GAZETTEER: dict[str, str] = {
    s: t for s, t in TEST_GAZETTEER.items() if s not in ("key", "fast table")
}
EVAL_GOLD_GAZETTEER["filter"] = "LANGUAGE"

# undirected same-entity equivalences (canonicalization input); the
# spark~vector~merge chain requires ≥2 hash-min iterations to converge
TEST_ALIASES: list[tuple[str, str]] = [
    ("spark", "vector"),
    ("vector", "merge"),
    ("big data", "window"),
]
