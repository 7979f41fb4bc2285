"""Span embeddings + contrastive similarity (reference semantics M8–M10).

The reference's Siamese network embeds an entity span as the masked mean-pool
of BERT token vectors, L2-normalized (neural_network/siamese_nn.py:86-99), and
scores pair similarity with a distance-based logistic
``p = (1 + e^-margin) / (1 + e^(d - margin))``, margin 1.0
(siamese_nn.py:11-20). On unit vectors the Euclidean distance is a monotone
function of cosine (``cos = 1 - d²/2``), so the entity-linking join ranks by a
plain dot product — the cheap, Spark-native form.

The trained encoder is unavailable in-sandbox, so ``hash_embedding`` provides
the deterministic stand-in the test/bench corpus uses: a unit vector derived
from md5 bytes of the normalized surface, with aliased surfaces mapped near
each other via a shared component. Real deployments plug a transformer encoder
into the same ``mean_pool_l2`` path.
"""

from __future__ import annotations

import hashlib

import numpy as np

MARGIN = 1.0


def mean_pool_l2(token_vectors: np.ndarray, span_mask: np.ndarray) -> np.ndarray:
    """Masked mean over span tokens, L2-normalized (siamese_nn.py:86-99).
    token_vectors: [seq, hidden]; span_mask: [seq] of {0,1}."""
    weights = span_mask.astype(np.float64)
    total = weights.sum()
    if total <= 0:
        raise ValueError("span mask selects no tokens")
    pooled = (token_vectors * weights[:, None]).sum(axis=0) / total
    norm = np.linalg.norm(pooled)
    return pooled / norm if norm > 0 else pooled


def logistic_similarity(a: np.ndarray, b: np.ndarray, margin: float = MARGIN) -> float:
    """Distance-based logistic probability on unit vectors
    (siamese_nn.py:11-20)."""
    d = float(np.linalg.norm(a - b))
    return (1.0 + np.exp(-margin)) / (1.0 + np.exp(d - margin))


def cosine_from_distance(d: float) -> float:
    return 1.0 - d * d / 2.0


def hash_embedding(surface: str, dim: int = 16) -> np.ndarray:
    """Deterministic unit vector for a normalized surface form."""
    raw = hashlib.md5(surface.encode("utf-8")).digest()
    rng = np.random.default_rng(int.from_bytes(raw[:8], "big"))
    v = rng.standard_normal(dim)
    return v / np.linalg.norm(v)
