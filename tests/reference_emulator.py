"""Sequential single-process reference emulator for parity testing.

Mirrors the reference's inference control flow (recognize.py:44-101: strictly
sequential documents → sentences → score → decode → spans) and the target
pipeline's linking/canonicalization/predicate semantics, WITHOUT using any
engine operator code paths beyond the shared deterministic scorer kernels
(the scorer seam is intentionally shared — SURVEY.md §7.0: both sides run
the same mock scorer so pipeline parity is measurable).

Everything here is naive Python: nested loops, dict unions — an independent
formulation whose agreement with the distributed engine is the P/R metric.
"""

from __future__ import annotations

from runne_contrastive_ner_spark.functions.scorer import GazetteerScorer, Scorer
from runne_contrastive_ner_spark.functions.textnorm import normalize_surface
from runne_contrastive_ner_spark.functions.vocab import (
    ENTITY_TYPES,
    TEST_ALIASES,
    TEST_GAZETTEER,
)
from runne_contrastive_ner_spark.operators.mentions import detect_mentions_in_text

Mention = tuple[str, int, str, int, int, str]  # conv, turn, type, start, end, surface_norm
Triple = tuple[str, str, str, str, int]  # conv, subj, pred, obj, src_turn


def emulate_mentions(
    turns: list[tuple[str, int, str]], scorer: Scorer | None = None
) -> list[Mention]:
    """turns: (conv_id, turn_idx, text), processed strictly sequentially."""
    scorer = scorer or GazetteerScorer(TEST_GAZETTEER, ENTITY_TYPES)
    out: list[Mention] = []
    for conv_id, turn_idx, text in sorted(turns):
        text = text or ""
        for etype, a, b in detect_mentions_in_text(text, scorer):
            out.append((conv_id, turn_idx, etype, a, b, normalize_surface(text[a:b])))
    return out


def emulate_canonical(mentions: list[Mention]) -> dict[str, str]:
    """Naive repeated-pass closure over alias pairs restricted to observed
    surfaces; canonical = min member."""
    surfaces = {m[5] for m in mentions}
    neighbors: dict[str, set[str]] = {s: {s} for s in surfaces}
    for a, b in TEST_ALIASES:
        if a in surfaces and b in surfaces:
            neighbors[a].add(b)
            neighbors[b].add(a)
    canon = {s: s for s in surfaces}
    changed = True
    while changed:
        changed = False
        for s in surfaces:
            best = min(canon[n] for n in neighbors[s] | {s})
            if best < canon[s]:
                canon[s] = best
                changed = True
        # propagate through labels too (two-level: neighbor's canonical)
        for s in surfaces:
            root = canon[canon[s]]
            if root < canon[s]:
                canon[s] = root
                changed = True
    return canon


def emulate_triples(mentions: list[Mention], k: int = 2) -> set[Triple]:
    canon = emulate_canonical(mentions)
    per_turn: dict[tuple[str, int], set[str]] = {}
    for conv, turn, _t, _a, _b, surf in mentions:
        per_turn.setdefault((conv, turn), set()).add(canon[surf])
    triples: set[Triple] = set()
    for (conv, turn), ents in per_turn.items():
        for subj in ents:
            for obj in ents:
                if subj < obj:
                    triples.add((conv, subj, "co_occurs_with", obj, turn))
        for back in range(1, k + 1):
            prev = per_turn.get((conv, turn - back), set())
            for subj in ents:
                for obj in prev:
                    triples.add((conv, subj, "follows", obj, turn))
    return triples


def precision_recall(got: set, expected: set) -> tuple[float, float]:
    if not got and not expected:
        return 1.0, 1.0
    tp = len(got & expected)
    precision = tp / len(got) if got else 0.0
    recall = tp / len(expected) if expected else 0.0
    return precision, recall
