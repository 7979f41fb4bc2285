"""Stage 4 — connected components via iterative hash-min label propagation.

Canonicalization groups linked entity nodes into components and names each
component by its minimum member (a deterministic canonical id). Spark has no
fixpoint operator, so this is the one imperative driver loop in the engine
(SURVEY.md §2.4 J5 / §4.2):

    labels(node) ← node
    repeat: labels(node) ← min(labels(node), min over neighbors of labels)
    until no label changes

Implementation notes for scale:
* edges are symmetrized once; each iteration is one shuffle
  (join + groupBy min) — plain min-propagation needs O(d) iterations for
  graph diameter d (a large-star/small-star variant would give O(log d);
  entity-alias graphs are shallow, so simplicity wins here), and
  non-convergence within max_iter raises instead of returning partial labels;
* ``localCheckpoint`` every iteration truncates the lineage chain, which
  otherwise grows quadratically and overwhelms the optimizer;
* convergence test is an aggregate count of changed labels (cheap, reuses
  the shuffle output); an ``max_iter`` bound guards pathological graphs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


SMALL_GRAPH_EDGES = 100_000


def _union_find_local(pairs: list[tuple[str, str]]) -> dict[str, str]:
    """Driver-side union-find for small graphs — one collect instead of
    O(diameter) distributed iterations of scheduling overhead. Same result
    as the distributed path (component = min member)."""
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


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 25,
    small_graph_edges: int = SMALL_GRAPH_EDGES,
) -> DataFrame:
    """edges(src, dst) undirected → (node, component) where component is the
    lexicographic minimum node id of the component.

    Hybrid strategy: graphs under ``small_graph_edges`` are solved with one
    collect + driver union-find (the distributed loop's per-iteration
    scheduling overhead dwarfs tiny graphs); larger graphs run the
    distributed hash-min iteration. Both produce identical labels."""
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
    sym = sym_cached.localCheckpoint(eager=True)
    sym_cached.unpersist()
    nodes = sym.select(F.col("a").alias("node")).distinct()
    labels = nodes.withColumn("component", F.col("node")).localCheckpoint(eager=True)

    converged = False
    for _ in range(max_iter):
        # candidate label for each node: min over its neighbors' labels
        neighbor_min = (
            sym.join(labels.withColumnRenamed("node", "b"), on="b")
            .groupBy("a")
            .agg(F.min("component").alias("nbr_component"))
            .withColumnRenamed("a", "node")
        )
        updated = (
            labels.join(neighbor_min, on="node", how="left")
            .select(
                "node",
                F.least(
                    F.col("component"), F.coalesce(F.col("nbr_component"), F.col("component"))
                ).alias("component"),
                (F.coalesce(F.col("nbr_component"), F.col("component")) < F.col("component"))
                .cast("int")
                .alias("changed"),
            )
            .localCheckpoint(eager=True)
        )
        n_changed = updated.agg(F.sum("changed")).collect()[0][0] or 0
        labels = updated.drop("changed")
        if n_changed == 0:
            converged = True
            break
    if not converged:
        # plain min-label propagation needs O(component diameter) rounds;
        # returning partial labels would silently split entities
        raise RuntimeError(
            f"connected_components did not converge within {max_iter} iterations"
            " — raise max_iter (graph diameter exceeds it)"
        )
    return labels
