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
  (join + groupBy min) — O(log d) iterations for graph diameter d;
* ``localCheckpoint`` every iteration truncates the lineage chain, which
  otherwise grows quadratically and overwhelms the optimizer;
* convergence test is an aggregate count of changed labels (cheap, reuses
  the shuffle output); an ``max_iter`` bound guards pathological graphs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 25,
) -> DataFrame:
    """edges(src, dst) undirected → (node, component) where component is the
    lexicographic minimum node id of the component."""
    # materialize the symmetrized edge list once: the loop references it every
    # iteration, and without this the entire upstream lineage (which may
    # include the expensive mention-detection UDF stage) re-executes per
    # iteration
    sym = (
        edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .unionByName(edges.select(F.col(dst).alias("a"), F.col(src).alias("b")))
        .filter(F.col("a") != F.col("b"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    nodes = sym.select(F.col("a").alias("node")).distinct()
    labels = nodes.withColumn("component", F.col("node")).localCheckpoint(eager=True)

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
            break
    return labels
