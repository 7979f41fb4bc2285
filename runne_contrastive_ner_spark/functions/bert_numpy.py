"""Pure-numpy BERT encoder + per-type 5-class linear heads.

The reference's inference model (neural_network/ner.py:449-505) is:
token ids → TFBertModel sequence output → multiply by the pad mask
(MaskCalculator) → one TimeDistributed Dense(5) LOGIT head per entity type
(softmax is applied downstream, recognize.py:90). This module implements
that exact architecture forward in numpy — the published BERT architecture
(Devlin et al. 2019; post-layer-norm, learned positions, erf-GELU) — over
an engine-native ``.npz`` weight bundle, so executors run inference with
ZERO deep-learning-framework dependency. A trained TF ``ner.h5`` converts
to the bundle offline with one small script wherever TF exists; in this
sandbox no trained weights (or TF to diff against) are available, so the
forward is validated structurally and numerically instead: a shape-generic
naive per-position re-implementation must agree to float tolerance, and
attention/LayerNorm/GELU invariants are pinned in tests.

``.npz`` key layout (all float64 or float32 arrays; D = hidden size):

    meta                          [n_layers, n_heads, pad_token_id]
    emb.word [V, D]  emb.pos [P, D]  emb.type [T, D]
    emb.ln.g [D]  emb.ln.b [D]
    layer{i}.q.w [D, D]  layer{i}.q.b [D]   (same for .k / .v / .o)
    layer{i}.ln1.g/.b [D]
    layer{i}.ffn1.w [D, F]  layer{i}.ffn1.b [F]
    layer{i}.ffn2.w [F, D]  layer{i}.ffn2.b [D]
    layer{i}.ln2.g/.b [D]
    head.{TYPE}.w [D, 5]    head.{TYPE}.b [5]
"""

from __future__ import annotations

import math

import numpy as np

LN_EPS = 1e-12  # BertConfig.layer_norm_eps default

# Cody's rational-Chebyshev erf/erfc coefficients (W. J. Cody 1969; the
# SPECFUN `calerf` algorithm, the same machinery libm implementations use).
# A vectorized numpy erf: np.vectorize(math.erf) is a per-element Python
# loop and dominated the encoder forward (~60x slower than the matmuls).
_ERF_A = (3.16112374387056560e0, 1.13864154151050156e2,
          3.77485237685302021e2, 3.20937758913846947e3)
_ERF_A4 = 1.85777706184603153e-1
_ERF_B = (2.36012909523441209e1, 2.44024637934444173e2,
          1.28261652607737228e3, 2.84423683343917062e3)
_ERF_C = (5.64188496988670089e-1, 8.88314979438837594e0,
          6.61191906371416295e1, 2.98635138197400131e2,
          8.81952221241769090e2, 1.71204761263407058e3,
          2.05107837782607147e3)
_ERF_C7 = 1.23033935479799725e3
_ERF_C8 = 2.15311535474403846e-8
_ERF_D = (1.57449261107098347e1, 1.17693950891312499e2,
          5.37181101862009858e2, 1.62138957456669019e3,
          3.29079923573345963e3, 4.36261909014324716e3,
          3.43936767414372164e3)
_ERF_D7 = 1.23033935480374942e3
_ERF_P = (3.05326634961232344e-1, 3.60344899949804439e-1,
          1.25781726111229246e-1, 1.60837851487422766e-2)
_ERF_P4 = 6.58749161529837803e-4
_ERF_P5 = 1.63153871373020978e-2
_ERF_Q = (2.56852019228982242e0, 1.87295284992346047e0,
          5.27905102951428412e-1, 6.05183413124413191e-2)
_ERF_Q4 = 2.33520497626869185e-3
_SQRPI = 5.6418958354775628695e-1  # 1/sqrt(pi)


def _erf(x: np.ndarray) -> np.ndarray:
    """erf over a float64 array, |error| < 1e-15 vs math.erf (pinned in
    tests/test_artifact.py::test_vector_erf_matches_math_erf)."""
    x = np.asarray(x, dtype=np.float64)
    y = np.abs(x)
    out = np.empty_like(y)

    m1 = y <= 0.46875
    if m1.any():
        z = y[m1] * y[m1]
        xnum = _ERF_A4 * z
        xden = z
        for a, b in zip(_ERF_A[:3], _ERF_B[:3]):
            xnum = (xnum + a) * z
            xden = (xden + b) * z
        out[m1] = y[m1] * (xnum + _ERF_A[3]) / (xden + _ERF_B[3])

    m2 = (y > 0.46875) & (y <= 4.0)
    if m2.any():
        yy = y[m2]
        xnum = _ERF_C8 * yy
        xden = yy
        for c, d in zip(_ERF_C, _ERF_D):
            xnum = (xnum + c) * yy
            xden = (xden + d) * yy
        r = (xnum + _ERF_C7) / (xden + _ERF_D7)
        ysq = np.floor(yy * 16.0) / 16.0
        delta = (yy - ysq) * (yy + ysq)
        out[m2] = 1.0 - np.exp(-ysq * ysq) * np.exp(-delta) * r

    m3 = y > 4.0
    if m3.any():
        yy = y[m3]
        z = 1.0 / (yy * yy)
        xnum = _ERF_P5 * z
        xden = z
        for p, q in zip(_ERF_P, _ERF_Q):
            xnum = (xnum + p) * z
            xden = (xden + q) * z
        r = z * (xnum + _ERF_P4) / (xden + _ERF_Q4)
        r = (_SQRPI - r) / yy
        ysq = np.floor(yy * 16.0) / 16.0
        delta = (yy - ysq) * (yy + ysq)
        erfc = np.exp(-ysq * ysq) * np.exp(-delta) * r
        out[m3] = 1.0 - erfc

    return np.copysign(out, x)


def gelu(x: np.ndarray) -> np.ndarray:
    """Exact (erf) GELU — BertConfig hidden_act='gelu'. erf is evaluated in
    float64 (the Cody coefficients are float64-calibrated) and cast back, so
    a float32 activation stream stays float32 end-to-end."""
    x = np.asarray(x)
    e = _erf(x / math.sqrt(2.0)).astype(x.dtype, copy=False)
    return 0.5 * x * (1.0 + e)


def layer_norm(x: np.ndarray, g: np.ndarray, b: np.ndarray) -> np.ndarray:
    mu = x.mean(axis=-1, keepdims=True)
    var = x.var(axis=-1, keepdims=True)
    return (x - mu) / np.sqrt(var + LN_EPS) * g + b


def softmax_last(x: np.ndarray) -> np.ndarray:
    s = x - x.max(axis=-1, keepdims=True)
    e = np.exp(s)
    return e / e.sum(axis=-1, keepdims=True)


class NumpyBertNer:
    """Forward pass over a loaded ``.npz`` bundle.

    ``__call__(ids) -> logits [n_types, seq_len, 5]`` for one sequence of
    token ids (python list or int array). Dropout is inference-mode
    (identity), exactly like the reference's ``model.predict``.

    ``dtype`` selects the arithmetic width: float64 (default — what the
    numeric cross-check tests pin) or float32, which is what the
    reference's TF runtime actually computes in AND roughly halves the
    matmul wall (sgemm vs dgemm + half the memory traffic); the production
    scorer path loads bundles at float32. erf stays float64 internally
    either way (see ``gelu``).
    """

    def __init__(self, weights: dict, entity_types: list[str], dtype=np.float64):
        self.dtype = np.dtype(dtype)
        if self.dtype not in (np.dtype(np.float64), np.dtype(np.float32)):
            raise ValueError(f"dtype must be float32 or float64, got {dtype}")
        self.w = {k: np.asarray(v, dtype=self.dtype) for k, v in weights.items()}
        meta = self.w["meta"].astype(int)
        self.n_layers, self.n_heads, self.pad_id = (
            int(meta[0]),
            int(meta[1]),
            int(meta[2]),
        )
        self.entity_types = entity_types
        d = self.w["emb.word"].shape[1]
        if d % self.n_heads:
            raise ValueError(f"hidden {d} not divisible by heads {self.n_heads}")
        self.hidden = d
        for t in entity_types:
            if f"head.{t}.w" not in self.w:
                raise ValueError(f"bundle is missing the head for {t!r}")

    # --- encoder -------------------------------------------------------------
    def _attention(self, x: np.ndarray, i: int, add_mask: np.ndarray) -> np.ndarray:
        w = self.w
        n, d = x.shape
        h = self.n_heads
        dh = d // h

        def proj(name):
            m = x @ w[f"layer{i}.{name}.w"] + w[f"layer{i}.{name}.b"]
            return m.reshape(n, h, dh).transpose(1, 0, 2)  # [h, n, dh]

        q, k, v = proj("q"), proj("k"), proj("v")
        scores = q @ k.transpose(0, 2, 1) / math.sqrt(dh)  # [h, n, n]
        scores = scores + add_mask[None, None, :]  # mask keys at pad positions
        ctx = softmax_last(scores) @ v  # [h, n, dh]
        ctx = ctx.transpose(1, 0, 2).reshape(n, d)
        return ctx @ w[f"layer{i}.o.w"] + w[f"layer{i}.o.b"]

    def encode(self, ids: np.ndarray) -> np.ndarray:
        w = self.w
        n = len(ids)
        x = w["emb.word"][ids] + w["emb.pos"][:n] + w["emb.type"][0]
        x = layer_norm(x, w["emb.ln.g"], w["emb.ln.b"])
        add_mask = np.where(ids == self.pad_id, -1e9, 0.0).astype(self.dtype)
        for i in range(self.n_layers):
            a = self._attention(x, i, add_mask)
            x = layer_norm(x + a, w[f"layer{i}.ln1.g"], w[f"layer{i}.ln1.b"])
            f = gelu(x @ w[f"layer{i}.ffn1.w"] + w[f"layer{i}.ffn1.b"])
            f = f @ w[f"layer{i}.ffn2.w"] + w[f"layer{i}.ffn2.b"]
            x = layer_norm(x + f, w[f"layer{i}.ln2.g"], w[f"layer{i}.ln2.b"])
        return x

    def __call__(self, ids) -> np.ndarray:
        ids = np.asarray(ids, dtype=np.int64)
        seq = self.encode(ids)
        # MaskCalculator + Multiply: zero out pad positions BEFORE the heads
        seq = seq * (ids != self.pad_id).astype(self.dtype)[:, None]
        out = np.empty((len(self.entity_types), len(ids), 5), dtype=self.dtype)
        for t_idx, t in enumerate(self.entity_types):
            out[t_idx] = seq @ self.w[f"head.{t}.w"] + self.w[f"head.{t}.b"]
        return out

    # --- batched forward (all windows of a document in one pass) -------------
    def _attention_batch(
        self, x: np.ndarray, i: int, add_mask: np.ndarray
    ) -> np.ndarray:
        w = self.w
        bsz, n, d = x.shape
        h = self.n_heads
        dh = d // h

        def proj(name):
            m = x @ w[f"layer{i}.{name}.w"] + w[f"layer{i}.{name}.b"]
            # contiguous copy: BLAS-backed matmul over the strided transpose
            # view runs ~3x slower than over packed operands
            return np.ascontiguousarray(
                m.reshape(bsz, n, h, dh).transpose(0, 2, 1, 3)
            )  # [B,h,n,dh]

        q, k, v = proj("q"), proj("k"), proj("v")
        kt = np.ascontiguousarray(k.transpose(0, 1, 3, 2))
        scores = q @ kt / math.sqrt(dh)  # [B,h,n,n]
        scores = scores + add_mask[:, None, None, :]
        ctx = softmax_last(scores) @ v
        ctx = ctx.transpose(0, 2, 1, 3).reshape(bsz, n, d)
        return ctx @ w[f"layer{i}.o.w"] + w[f"layer{i}.o.b"]

    def batch(self, ids_batch) -> list[np.ndarray]:
        """Score B equal-length windows in ONE forward (the reference runs
        model.predict per window, batch_size=1, recognize.py:73 — this is
        the model-level batching that undoes it). Returns a list of
        [n_types, n, 5] logits, one per window, numerically within BLAS
        reduction tolerance of the per-window forward."""
        ids = np.asarray(ids_batch, dtype=np.int64)  # [B, n]
        w = self.w
        bsz, n = ids.shape
        x = w["emb.word"][ids] + w["emb.pos"][:n][None, :, :] + w["emb.type"][0]
        x = layer_norm(x, w["emb.ln.g"], w["emb.ln.b"])
        add_mask = np.where(ids == self.pad_id, -1e9, 0.0).astype(self.dtype)  # [B, n]
        for i in range(self.n_layers):
            a = self._attention_batch(x, i, add_mask)
            x = layer_norm(x + a, w[f"layer{i}.ln1.g"], w[f"layer{i}.ln1.b"])
            f = gelu(x @ w[f"layer{i}.ffn1.w"] + w[f"layer{i}.ffn1.b"])
            f = f @ w[f"layer{i}.ffn2.w"] + w[f"layer{i}.ffn2.b"]
            x = layer_norm(x + f, w[f"layer{i}.ln2.g"], w[f"layer{i}.ln2.b"])
        x = x * (ids != self.pad_id).astype(self.dtype)[:, :, None]
        out = np.stack(
            [
                x @ self.w[f"head.{t}.w"] + self.w[f"head.{t}.b"]
                for t in self.entity_types
            ]
        )  # [T, B, n, 5]
        return [out[:, b] for b in range(bsz)]


def naive_forward(model: NumpyBertNer, ids) -> np.ndarray:
    """Independent slow re-implementation (per-position python loops, no
    batched matmul reshapes) used by tests to cross-check the vectorized
    forward — the in-sandbox stand-in for diffing against TF."""
    w = model.w
    ids = np.asarray(ids, dtype=np.int64)
    n, d, h = len(ids), model.hidden, model.n_heads
    dh = d // h
    x = np.array(
        [w["emb.word"][ids[p]] + w["emb.pos"][p] + w["emb.type"][0] for p in range(n)]
    )
    x = layer_norm(x, w["emb.ln.g"], w["emb.ln.b"])
    for i in range(model.n_layers):
        heads_out = np.zeros((n, d))
        for head in range(h):
            sl = slice(head * dh, (head + 1) * dh)
            q = np.array([(x[p] @ w[f"layer{i}.q.w"] + w[f"layer{i}.q.b"])[sl] for p in range(n)])
            k = np.array([(x[p] @ w[f"layer{i}.k.w"] + w[f"layer{i}.k.b"])[sl] for p in range(n)])
            v = np.array([(x[p] @ w[f"layer{i}.v.w"] + w[f"layer{i}.v.b"])[sl] for p in range(n)])
            for p in range(n):
                scores = np.array(
                    [
                        q[p] @ k[j] / math.sqrt(dh)
                        + (-1e9 if ids[j] == model.pad_id else 0.0)
                        for j in range(n)
                    ]
                )
                att = softmax_last(scores)
                heads_out[p, sl] = sum(att[j] * v[j] for j in range(n))
        a = heads_out @ w[f"layer{i}.o.w"] + w[f"layer{i}.o.b"]
        x = layer_norm(x + a, w[f"layer{i}.ln1.g"], w[f"layer{i}.ln1.b"])
        f = gelu(x @ w[f"layer{i}.ffn1.w"] + w[f"layer{i}.ffn1.b"])
        f = f @ w[f"layer{i}.ffn2.w"] + w[f"layer{i}.ffn2.b"]
        x = layer_norm(x + f, w[f"layer{i}.ln2.g"], w[f"layer{i}.ln2.b"])
    x = x * (ids != model.pad_id).astype(np.float64)[:, None]
    return np.stack(
        [x @ w[f"head.{t}.w"] + w[f"head.{t}.b"] for t in model.entity_types]
    )


def synthetic_bundle(
    entity_types: list[str],
    vocab_size: int = 32,
    hidden: int = 8,
    n_layers: int = 2,
    n_heads: int = 2,
    max_pos: int = 64,
    ffn: int = 16,
    seed: int = 13,
) -> dict:
    """Seeded random weight bundle for tests and plumbing validation."""
    rng = np.random.default_rng(seed)

    def r(*shape):
        return rng.normal(0.0, 0.05, size=shape)

    w = {
        "meta": np.array([n_layers, n_heads, 0]),
        "emb.word": r(vocab_size, hidden),
        "emb.pos": r(max_pos, hidden),
        "emb.type": r(2, hidden),
        "emb.ln.g": np.ones(hidden),
        "emb.ln.b": np.zeros(hidden),
    }
    for i in range(n_layers):
        for name in ("q", "k", "v", "o"):
            w[f"layer{i}.{name}.w"] = r(hidden, hidden)
            w[f"layer{i}.{name}.b"] = r(hidden)
        w[f"layer{i}.ln1.g"] = np.ones(hidden)
        w[f"layer{i}.ln1.b"] = np.zeros(hidden)
        w[f"layer{i}.ffn1.w"] = r(hidden, ffn)
        w[f"layer{i}.ffn1.b"] = r(ffn)
        w[f"layer{i}.ffn2.w"] = r(ffn, hidden)
        w[f"layer{i}.ffn2.b"] = r(hidden)
        w[f"layer{i}.ln2.g"] = np.ones(hidden)
        w[f"layer{i}.ln2.b"] = np.zeros(hidden)
    for t in entity_types:
        w[f"head.{t}.w"] = r(hidden, 5)
        w[f"head.{t}.b"] = np.zeros(5)
    return w


def load_bundle(
    npz_path: str, entity_types: list[str], dtype=np.float64
) -> NumpyBertNer:
    with np.load(npz_path) as z:
        return NumpyBertNer({k: z[k] for k in z.files}, entity_types, dtype=dtype)
