"""Stage 4 — connected components via alternating large-star/small-star.

Canonicalization groups linked entity nodes into components and names each
component by its minimum member (a deterministic canonical id). Spark has no
fixpoint operator, so this is the one imperative driver loop in the engine
(SURVEY.md §2.4 J5 / §4.2).

The distributed path implements the ALTERNATING ALGORITHM of Kiveris et al.,
"Connected Components in MapReduce and Beyond" (SoCC 2014) — the same
public algorithm GraphFrames uses:

* **large-star** (per node u over the symmetrized neighborhood): connect
  every strictly-larger neighbor to the neighborhood minimum
  ``m = min(Γ(u) ∪ {u})`` — emit ``(v, m)`` for ``v ∈ Γ(u), v > u``;
* **small-star** (per node u over smaller neighbors only): point u and all
  its smaller neighbors at the smallest — with ``L(u) = {v ∈ Γ(u): v < u}``
  and ``m = min(L(u))``, emit ``(u, m)`` and ``(v, m)`` for ``v ∈ L(u)``.

Both steps preserve connectivity and strictly shrink star depth; the edge
set converges to a star forest centered at each component's minimum in
O(log d) rounds (vs O(d) for plain min-label propagation — the round-2
verdict flagged long dedup-cluster chains as the failure case). Each round
is two shuffle pairs (groupBy min + join), ``localCheckpoint`` truncates
lineage per round, and convergence is detected by edge-set fixpoint
(count + order-independent bit_xor of xxhash64 — a 64-bit content hash, so
a false "converged" needs a deliberate collision). Non-convergence within
``max_iter`` raises instead of returning partial labels.

Small graphs (≤100k edges) bypass the loop entirely with one collect +
driver union-find — identical labels, none of the per-round scheduling
overhead.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


SMALL_GRAPH_EDGES = 100_000

# rounds used by the most recent distributed run (test/diagnostic hook; the
# chain-convergence test asserts the O(log d) bound on this)
LAST_DISTRIBUTED_ROUNDS: int | None = None


def _union_find_local(pairs: list[tuple[str, str]]) -> dict[str, str]:
    """Driver-side union-find for small graphs — one collect instead of
    O(log d) distributed rounds of scheduling overhead. Same result as the
    distributed path (component = min member)."""
    parent: dict[str, str] = {}

    def find(x: str) -> str:
        root = x
        while parent[root] != root:
            root = parent[root]
        while parent[x] != root:
            parent[x], x = root, parent[x]
        return root

    for a, b in pairs:
        parent.setdefault(a, a)
        parent.setdefault(b, b)
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {n: find(n) for n in parent}


def _edge_fingerprint(e: DataFrame) -> tuple[int, int]:
    row = e.agg(
        F.count(F.lit(1)).alias("n"),
        F.bit_xor(F.xxhash64("a", "b")).alias("h"),
    ).collect()[0]
    return int(row["n"]), int(row["h"] or 0)


def _large_star(e: DataFrame) -> DataFrame:
    """(v, m) for every strictly-larger neighbor v of every node u, where
    m = min(Γ(u) ∪ {u}) over the symmetrized neighborhood."""
    nbrs = e.unionByName(e.select(F.col("b").alias("a"), F.col("a").alias("b")))
    mins = nbrs.groupBy("a").agg(F.least(F.min("b"), F.first("a")).alias("m"))
    return (
        nbrs.join(mins, "a")
        .filter(F.col("b") > F.col("a"))
        .select(F.col("b").alias("a"), F.col("m").alias("b"))
        .filter(F.col("a") != F.col("b"))
        .distinct()
    )


def _small_star(e: DataFrame) -> DataFrame:
    """Orient each edge large→small, then point each node u and all its
    smaller neighbors at min(L(u) ∪ {u})."""
    directed = e.select(
        F.greatest("a", "b").alias("a"), F.least("a", "b").alias("b")
    ).distinct()
    mins = directed.groupBy("a").agg(F.min("b").alias("m"))
    to_center = directed.join(mins, "a").select(
        F.col("b").alias("a"), F.col("m").alias("b")
    )
    self_edge = mins.select(F.col("a"), F.col("m").alias("b"))
    return (
        to_center.unionByName(self_edge)
        .filter(F.col("a") != F.col("b"))
        .distinct()
    )


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 50,
    small_graph_edges: int = SMALL_GRAPH_EDGES,
) -> DataFrame:
    """edges(src, dst) undirected → (node, component) where component is the
    lexicographic minimum node id of the component.

    Hybrid strategy: graphs under ``small_graph_edges`` are solved with one
    collect + driver union-find; larger graphs run the alternating
    large-star/small-star rounds (O(log d) convergence). Both produce
    identical labels."""
    global LAST_DISTRIBUTED_ROUNDS
    # materialize the symmetrized edge list once: the loop references it every
    # iteration, and without this the entire upstream lineage (which may
    # include the expensive mention-detection UDF stage) re-executes per
    # iteration. persist (releasable) first; promote to localCheckpoint
    # (lineage truncation) only if the distributed loop actually runs —
    # checkpoint blocks have no public unpersist handle until GC, so the
    # small-graph path must not create one.
    sym_cached = (
        edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .unionByName(edges.select(F.col(dst).alias("a"), F.col(src).alias("b")))
        .filter(F.col("a") != F.col("b"))
        .distinct()
        .persist()
    )
    n_edges = sym_cached.count()
    if n_edges <= small_graph_edges:
        pairs = [(r["a"], r["b"]) for r in sym_cached.collect()]
        sym_cached.unpersist()
        labels_map = _union_find_local(pairs)
        spark = edges.sparkSession
        if not labels_map:
            return spark.createDataFrame([], "node string, component string")
        return spark.createDataFrame(
            sorted(labels_map.items()), "node string, component string"
        )
    e = sym_cached.localCheckpoint(eager=True)
    nodes = e.select(F.col("a").alias("node")).distinct().localCheckpoint(eager=True)
    sym_cached.unpersist()

    converged = False
    fp = _edge_fingerprint(e)
    rounds = 0
    for _ in range(max_iter):
        rounds += 1
        e = _small_star(_large_star(e)).localCheckpoint(eager=True)
        new_fp = _edge_fingerprint(e)
        if new_fp == fp:
            converged = True
            break
        fp = new_fp
    LAST_DISTRIBUTED_ROUNDS = rounds
    if not converged:
        raise RuntimeError(
            f"connected_components did not converge within {max_iter} rounds"
            " — raise max_iter (pathological id ordering)"
        )
    # converged edge set is a star forest (child → component min); roots
    # label themselves
    return nodes.join(
        e.select(F.col("a").alias("node"), F.col("b").alias("component")),
        "node",
        "left",
    ).select("node", F.coalesce("component", "node").alias("component"))
