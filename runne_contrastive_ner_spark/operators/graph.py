"""Graph analytics over the materialized KG: fixed-iteration PageRank.

Consumes the symmetrized co-occurrence edge list the linking stage emits
(same graph as the two-hop / degree queries) and ranks canonical entities
by random-walk centrality — the standard "which entities anchor this
corpus" signal a KG product exposes next to degree counts.

Determinism at scale: floating-point summation across a shuffle is
order-dependent, so two runs (or two cluster sizes) of a float PageRank
disagree in the low bits and a value-hash oracle can never pin it. Rank
mass is therefore carried as QUANTIZED INTEGER units (``scale`` = 1e12 of
total mass) with integer division for the per-edge spread and the damping
blend — every step is an associative/commutative int64 operation, so the
result is bit-identical under any partitioning / parallelism and exactly
replayable in ANSI SQL (the DuckDB oracle unrolls the same iterations).
The truncation error this trades away is ~deg/1e12 mass per node per
iteration — invisible at rank granularity.

Shuffle shape: each iteration is one equi-join (ranks × edges, both keyed
on the source node) + one groupBy on the destination — two shuffles per
iteration on stable keys, no driver-side data loops (the only driver
action is the bounded node-count scalar). Fixed ``iterations`` keeps the
lineage short; callers running many iterations should localCheckpoint the
rank table every ~10 rounds (same guidance as components.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SCALE = 10**12


def cooccurrence_edges(triples: DataFrame) -> DataFrame:
    """Symmetrized undirected edge list ``(src, dst)`` from a triple table:
    distinct ``co_occurs_with`` pairs, both directions. The single source
    of the graph shape shared by the PageRank query, the pipeline's
    analytics stage, and any future graph consumer — one place to change
    weighting/filtering without desynchronizing the materialized stage
    from the oracle-checked query."""
    pairs = (
        triples.filter(F.col("pred") == "co_occurs_with")
        .select("subj", "obj")
        .distinct()
    )
    return (
        pairs.unionByName(
            pairs.select(F.col("obj").alias("subj"), F.col("subj").alias("obj"))
        )
        .distinct()
        .select(F.col("subj").alias("src"), F.col("obj").alias("dst"))
    )


def pagerank(
    nbrs: DataFrame,
    iterations: int = 3,
    damping_pct: int = 85,
    scale: int = SCALE,
) -> DataFrame:
    """PageRank over a symmetrized edge list ``(src, dst)``.

    ``nbrs`` must contain each undirected edge in BOTH directions (the
    shape kg_two_hop/kg_entity_degrees already build); every node then has
    out-degree >= 1, so there is no dangling-mass redistribution term.
    ``damping_pct`` is the damping factor in integer percent (85 = 0.85).

    Returns ``(src, pr_q)`` where ``pr_q`` is the quantized rank in
    ``scale`` units of total mass (sum over nodes <= scale; the shortfall
    is integer-truncation dust).
    """
    # truncate the upstream lineage once: every iteration re-references the
    # edge list, and without this the (potentially expensive) graph
    # derivation would be replayed O(iterations) times in the physical plan
    # (same rationale as components.py's checkpoint cadence)
    nbrs = nbrs.localCheckpoint(eager=True)
    deg = nbrs.groupBy("src").agg(F.count(F.lit(1)).cast("long").alias("deg"))
    n = deg.count()  # bounded scalar: one number for the teleport term
    if n == 0:
        return deg.select("src", F.lit(0).cast("long").alias("pr_q"))
    base = (scale * (100 - damping_pct) // 100) // n
    pr = deg.select("src", F.lit(scale // n).cast("long").alias("pr_q"), "deg")
    for _ in range(iterations):
        contrib = pr.join(nbrs, "src").select(
            F.col("dst").alias("src"), F.expr("pr_q DIV deg").alias("c")
        )
        sums = contrib.groupBy("src").agg(F.sum("c").cast("long").alias("s"))
        pr = deg.join(sums, "src", "left").select(
            "src",
            (
                F.lit(base)
                + F.expr(f"({damping_pct} * coalesce(s, 0L)) DIV 100")
            ).cast("long").alias("pr_q"),
            "deg",
        )
    return pr.select("src", "pr_q")


def triangle_counts(nbrs: DataFrame) -> DataFrame:
    """Per-node triangle participation over a symmetrized edge list —
    degree-ordered orientation (the standard O(m^1.5) distributed scheme:
    orient each undirected edge from the (degree, id)-smaller endpoint to
    the larger, enumerate wedges at each tail, close them against the
    oriented edge set). Every stage is an equi-join or groupBy on edge
    keys; the orientation bounds every node's out-degree by O(sqrt(m)), so
    no hub explodes the wedge join — the property that makes this shape
    survive power-law graphs at 100 TB where a naive nbrs^3 join dies.

    Determinism: counting is integer; the orientation total-orders nodes by
    (degree, id), so the result is partitioning-independent and the DuckDB
    oracle replays the identical construction.

    Returns ``(src, n_triangles)`` for nodes in >= 1 triangle.
    """
    nbrs = nbrs.localCheckpoint(eager=True)
    deg = nbrs.groupBy("src").agg(F.count(F.lit(1)).cast("long").alias("deg"))
    und = nbrs.filter(F.col("src") < F.col("dst"))
    da = deg.select(F.col("src").alias("u"), F.col("deg").alias("dega"))
    db = deg.select(F.col("src").alias("v"), F.col("deg").alias("degb"))
    lo_first = F.expr("dega < degb OR (dega = degb AND src < dst)")
    ori = (
        und.join(da, und.src == da.u)
        .join(db, und.dst == db.v)
        .select(
            F.when(lo_first, F.col("src")).otherwise(F.col("dst")).alias("a"),
            F.when(lo_first, F.col("dst")).otherwise(F.col("src")).alias("b"),
        )
        # referenced 3x (both wedge sides + the closing join): materialize
        # once so neither the plan nor the runtime replays the orientation
        .localCheckpoint(eager=True)
    )
    o1 = ori.select(F.col("a").alias("t"), F.col("b").alias("h1"))
    o2 = ori.select(F.col("a").alias("t"), F.col("b").alias("h2"))
    wedge = o1.join(o2, "t").filter(F.col("h1") != F.col("h2"))
    closing = ori.select(F.col("a").alias("h1"), F.col("b").alias("h2"))
    tri = wedge.join(closing, ["h1", "h2"])
    members = (
        tri.select(F.col("t").alias("src"))
        .unionAll(tri.select(F.col("h1").alias("src")))
        .unionAll(tri.select(F.col("h2").alias("src")))
    )
    return members.groupBy("src").agg(
        F.count(F.lit(1)).cast("long").alias("n_triangles")
    )


def label_propagation(nbrs: DataFrame, iterations: int = 4) -> DataFrame:
    """Synchronous label-propagation communities (Raghavan et al. 2007)
    made deterministic: every node starts labeled with itself; each round
    every node adopts its neighbors' most frequent label, ties broken by
    MINIMUM label; all nodes update simultaneously for a fixed number of
    rounds. Frequency + min tie-break makes each round a pure function of
    the previous labeling — no RNG, no visit order — so the result is
    identical under any partitioning and the oracle unrolls the same
    rounds in SQL.

    Shuffle shape per round: one equi-join (labels x edges) + one groupBy
    (node, label) + one per-node top-1 window — all keyed on node ids.

    Returns ``(src, community)``.
    """
    from pyspark.sql import Window

    nbrs = nbrs.localCheckpoint(eager=True)
    lab = nbrs.select("src").distinct().withColumn("lab", F.col("src"))
    pick = Window.partitionBy("node").orderBy(F.desc("c"), F.asc("lab"))
    for _ in range(iterations):
        neigh = nbrs.join(lab, "src").select(
            F.col("dst").alias("node"), "lab"
        )
        cnt = neigh.groupBy("node", "lab").agg(
            F.count(F.lit(1)).cast("long").alias("c")
        )
        lab = (
            cnt.withColumn("rn", F.row_number().over(pick))
            .filter(F.col("rn") == 1)
            .select(F.col("node").alias("src"), "lab")
        )
    return lab.select("src", F.col("lab").alias("community"))
