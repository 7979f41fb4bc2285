"""Distributed connected-components at scale: the hash-min loop (the 100 TB
path, bypassing the small-graph union-find shortcut) must agree with a
driver-side union-find ground truth on a 150k-edge synthetic graph that
mixes star clusters with a long chain (worst case for min-propagation)."""

from pyspark.sql import functions as F

from runne_contrastive_ner_spark.operators.components import (
    _union_find_local,
    connected_components,
)


class TestDistributedCCScale:
    def test_large_graph_matches_union_find(self, spark):
        n_stars, star_size, chain_len = 2000, 70, 20
        # star clusters: hub h connected to star_size members
        stars = spark.range(n_stars * star_size).select(
            F.concat(F.lit("h"), F.lpad((F.col("id") / star_size).cast("int").cast("string"), 6, "0")).alias("src"),
            F.concat(F.lit("m"), F.lpad(F.col("id").cast("string"), 8, "0")).alias("dst"),
        )
        # one long chain (diameter > default max_iter would raise — use the
        # chain to also pin the convergence guard at a passing setting)
        chain = spark.range(chain_len).select(
            F.concat(F.lit("c"), F.lpad(F.col("id").cast("string"), 4, "0")).alias("src"),
            F.concat(F.lit("c"), F.lpad((F.col("id") + 1).cast("string"), 4, "0")).alias("dst"),
        )
        edges = stars.unionByName(chain)
        n_edges = edges.count()
        assert n_edges > 100_000  # above the union-find shortcut threshold

        got = {
            r.node: r.component
            for r in connected_components(edges, max_iter=chain_len + 2).collect()
        }
        expected = _union_find_local(
            [(r.src, r.dst) for r in edges.collect()]
        )
        assert got == expected
        # star hubs label their members; the chain is one component
        assert got["c0019"] == "c0000"

    def test_chain_converges_in_log_rounds(self, spark):
        """The r2 verdict's acceptance test for the alternating algorithm:
        a 200k-node path (the long-chain dedup-cluster shape that kills
        O(diameter) min-propagation) must converge in ≤ 2·log₂(d)+6 rounds
        with labels identical to union-find."""
        import math

        from runne_contrastive_ner_spark.operators import components as cc

        n = 200_000
        chain = spark.range(n - 1).select(
            F.concat(F.lit("c"), F.lpad(F.col("id").cast("string"), 7, "0")).alias("src"),
            F.concat(F.lit("c"), F.lpad((F.col("id") + 1).cast("string"), 7, "0")).alias("dst"),
        )
        got = connected_components(chain)
        # one component labeled by the minimum node
        assert got.select("component").distinct().count() == 1
        assert got.count() == n
        assert got.agg(F.min("component")).collect()[0][0] == "c0000000"
        bound = 2 * math.ceil(math.log2(n)) + 6
        assert cc.LAST_DISTRIBUTED_ROUNDS is not None
        assert cc.LAST_DISTRIBUTED_ROUNDS <= bound, (
            f"{cc.LAST_DISTRIBUTED_ROUNDS} rounds > O(log d) bound {bound}"
        )

    def test_nonconvergence_raises(self, spark):
        chain = spark.range(150_001).select(
            F.concat(F.lit("c"), F.lpad(F.col("id").cast("string"), 7, "0")).alias("src"),
            F.concat(F.lit("c"), F.lpad((F.col("id") + 1).cast("string"), 7, "0")).alias("dst"),
        )
        import pytest

        with pytest.raises(RuntimeError, match="did not converge"):
            connected_components(chain, max_iter=3)
