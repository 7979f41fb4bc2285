"""Tests for incremental bucket ingest (resume-after-crash) and the
Structured Streaming ingest path."""

import time

import pytest
from pyspark.sql import functions as F

from runne_contrastive_ner_spark.operators.mentions import extract_mentions
from runne_contrastive_ner_spark.sources.transcripts import synthesize
from runne_contrastive_ner_spark.streaming.incremental import (
    _load_ledger,
    incremental_mentions,
    streaming_event_counts,
    streaming_mentions,
)


class TestIncremental:
    def test_resume_after_injected_crash(self, spark, tmp_path):
        t = synthesize(spark, n_convs=6, turns_per_conv=6, long_conv_turns=0).cache()
        wh = str(tmp_path / "wh")
        with pytest.raises(RuntimeError, match="injected failure"):
            incremental_mentions(spark, t, wh, n_buckets=4, fail_after_bucket=1)
        done_after_crash = _load_ledger(wh)
        assert 0 < len(done_after_crash) < 4
        # resume: completes the rest, total equals a one-shot run
        out = incremental_mentions(spark, t, wh, n_buckets=4)
        assert out.count() == extract_mentions(t).count()
        # idempotent: running again appends nothing
        again = incremental_mentions(spark, t, wh, n_buckets=4)
        assert again.count() == out.count()

    def test_incremental_triples_resume_matches_scratch(self, spark, tmp_path):
        """End-to-end incremental KG build: crash mid-mention-scan, resume,
        and the final triples equal a from-scratch (non-incremental) run."""
        from runne_contrastive_ner_spark.operators.linking import canonicalize
        from runne_contrastive_ner_spark.operators.predicates import (
            induce_predicates,
        )
        from runne_contrastive_ner_spark.streaming.incremental import (
            incremental_triples,
        )

        t = synthesize(spark, n_convs=6, turns_per_conv=6, long_conv_turns=0).cache()
        wh = str(tmp_path / "wht")
        with pytest.raises(RuntimeError, match="injected failure"):
            incremental_triples(spark, t, wh, n_buckets=4, fail_after_bucket=1)
        got = incremental_triples(spark, t, wh, n_buckets=4)
        _, _, linked = canonicalize(spark, extract_mentions(t))
        want = induce_predicates(linked, entity_col="entity_id")
        key = ["conv_id", "subj", "pred", "obj", "src_turn_idx"]
        assert sorted(map(tuple, got.select(*key).collect())) == sorted(
            map(tuple, want.select(*key).collect())
        )

    def test_ledger_invalidated_when_input_changes(self, spark, tmp_path):
        """Progress recorded against one input must NOT be reused for a
        different input (ADVICE r1: stale-mixed-output bug)."""
        t1 = synthesize(spark, n_convs=4, turns_per_conv=4, long_conv_turns=0).cache()
        t2 = synthesize(spark, n_convs=6, turns_per_conv=5, long_conv_turns=0).cache()
        wh = str(tmp_path / "wh2")
        incremental_mentions(spark, t1, wh, n_buckets=4)
        # re-running with DIFFERENT input recomputes every bucket: the output
        # must equal a fresh full run over t2, not a stale mix
        out = incremental_mentions(spark, t2, wh, n_buckets=4)
        assert out.count() == extract_mentions(t2).count()
        # and same-input rerun still short-circuits (ledger key stable)
        again = incremental_mentions(spark, t2, wh, n_buckets=4)
        assert again.count() == out.count()


class TestStreaming:
    def test_windowed_counts_match_batch(self, spark, tmp_path):
        sf_dir = "/root/testdata/sf0.001"
        # file-stream sources require a directory; stage the table into one
        events_dir = str(tmp_path / "events")
        spark.read.parquet(f"{sf_dir}/events.parquet").write.parquet(events_dir)
        q = streaming_event_counts(spark, events_dir, str(tmp_path / "ckpt"))
        try:
            q.processAllAvailable()
            streamed = spark.sql("SELECT sum(n) AS total FROM event_counts").collect()[0][0]
        finally:
            q.stop()
        batch = spark.read.parquet(f"{sf_dir}/events.parquet").count()
        assert streamed == batch

    def test_streaming_mentions_match_batch(self, spark, tmp_path):
        t = synthesize(spark, n_convs=4, turns_per_conv=6, long_conv_turns=0)
        tdir = str(tmp_path / "transcripts")
        t.write.parquet(tdir)
        out = str(tmp_path / "mentions_out")
        q = streaming_mentions(spark, tdir, out, str(tmp_path / "ck"))
        try:
            q.awaitTermination(120)
        finally:
            q.stop()
        streamed = spark.read.parquet(out)
        assert streamed.count() == extract_mentions(t).count()
        assert "batch_id" in streamed.columns


class TestSkewBalance:
    def test_stateful_sessionization_matches_batch(self, spark, tmp_path):
        """applyInPandasWithState carries per-user session state across
        micro-batches: 2 time-ordered files × maxFilesPerTrigger=1 forces 2
        batches; final counters must equal the batch gaps-and-islands
        computation."""
        from pyspark.sql import Window

        from runne_contrastive_ner_spark.streaming.incremental import (
            streaming_sessionization,
        )

        sf_dir = "/root/testdata/sf0.001"
        events = spark.read.parquet(f"{sf_dir}/events.parquet")
        # stage into two files split at the median epoch so state must carry over
        with_epoch = events.withColumn(
            "ep", F.floor(F.unix_timestamp(F.col("ts").cast("timestamp")))
        )
        median = with_epoch.approxQuantile("ep", [0.5], 0.0)[0]
        events_dir = str(tmp_path / "events_staged")
        early = with_epoch.filter(F.col("ep") <= median).drop("ep")
        late = with_epoch.filter(F.col("ep") > median).drop("ep")
        early.coalesce(1).write.parquet(events_dir)
        time.sleep(1.1)  # distinct mtimes: FileStreamSource reads early first
        late.coalesce(1).write.mode("append").parquet(events_dir)

        q = streaming_sessionization(
            spark,
            events_dir,
            str(tmp_path / "ckpt_sess"),
            max_files_per_trigger=1,
        )
        q.awaitTermination(120)
        got = (
            spark.table("user_sessions")
            .groupBy("user_id")
            .agg(
                F.max("n_sessions").alias("n_sessions"),
                F.max("n_events").alias("n_events"),
            )
        )
        # batch reference: gaps-and-islands over event epochs per user
        w = Window.partitionBy("user_id").orderBy("epoch", "event_id")
        batch = (
            events.withColumn(
                "epoch", F.floor(F.unix_timestamp(F.col("ts").cast("timestamp")))
            )
            .withColumn("prev", F.lag("epoch").over(w))
            .withColumn(
                "new_session",
                F.when(
                    F.col("prev").isNull() | (F.col("epoch") - F.col("prev") > 1800), 1
                ).otherwise(0),
            )
            .groupBy("user_id")
            .agg(
                F.sum("new_session").alias("n_sessions"),
                F.count(F.lit(1)).alias("n_events"),
            )
        )
        got_rows = {r["user_id"]: (r["n_sessions"], r["n_events"]) for r in got.collect()}
        batch_rows = {
            r["user_id"]: (r["n_sessions"], r["n_events"]) for r in batch.collect()
        }
        assert got_rows == batch_rows

    def test_salted_repartition_spreads_long_conversation(self, spark):
        """One conversation 10x longer than the rest must not pin a single
        task: with salting on (conv_id, turn_idx) the max partition holds a
        bounded share of rows (the skew guard from SURVEY.md §7.2)."""
        from pyspark.sql import functions as F2

        t = synthesize(spark, n_convs=4, turns_per_conv=10, long_conv_turns=400)
        salted = t.select("conv_id", "turn_idx", "text").repartition(
            8, F2.col("conv_id"), F2.col("turn_idx")
        )
        sizes = (
            salted.withColumn("pid", F2.spark_partition_id())
            .groupBy("pid")
            .count()
            .collect()
        )
        total = sum(r["count"] for r in sizes)
        biggest = max(r["count"] for r in sizes)
        # unsalted, the long conversation (400 of 440 rows) would land in one
        # partition; salted, no partition may hold even half the rows
        assert biggest < total / 2


def test_streaming_job_tail_ingest(spark, tmp_path):
    """The streaming deployment surface (jobs/run_streaming_pipeline.py):
    drain-what's-there (availableNow), restart picks up ONLY new files via
    the stream checkpoint, a no-new-files restart processes zero batches,
    and the folded triple set equals the batch pipeline over the union."""
    import sys

    sys.path.insert(0, "/root/repo/jobs")
    from run_streaming_pipeline import run_streaming

    from runne_contrastive_ner_spark.operators.linking import canonicalize
    from runne_contrastive_ner_spark.operators.mentions import extract_mentions
    from runne_contrastive_ner_spark.operators.predicates import (
        induce_predicates,
    )
    from runne_contrastive_ner_spark.sources.transcripts import synthesize

    tdir = str(tmp_path / "tail_transcripts")
    wh = str(tmp_path / "stream_wh")
    t1 = synthesize(spark, n_convs=3, turns_per_conv=5)
    t1.write.parquet(tdir)

    s1 = run_streaming(spark, tdir, wh)
    assert s1["new_batches"] >= 1 and s1["mentions"] > 0

    # drop new files: a second synthesized slice with disjoint conv ids
    t2 = synthesize(spark, n_convs=2, turns_per_conv=4).withColumn(
        "conv_id", F.concat(F.lit("late-"), F.col("conv_id"))
    )
    t2.write.mode("append").parquet(tdir)
    s2 = run_streaming(spark, tdir, wh)
    assert s2["new_batches"] >= 1
    assert s2["mentions"] > s1["mentions"]

    # idle restart: checkpoint says nothing new -> zero new batches
    s3 = run_streaming(spark, tdir, wh)
    assert s3["new_batches"] == 0
    assert s3["mentions"] == s2["mentions"]

    # equivalence with the batch path over the full accumulated input
    allt = spark.read.parquet(tdir)
    _, _, linked = canonicalize(spark, extract_mentions(allt))
    want = induce_predicates(linked, k=2, entity_col="entity_id").count()
    assert s3["triples"] == want


def test_streaming_job_crash_between_checkpoint_and_fold(spark, tmp_path):
    """ADVICE r5 (high): if a run crashes AFTER the stream checkpoint
    committed new batches but BEFORE the fold ran, the restart must fold
    those batches — the skip decision keys on the persisted fold manifest,
    not on what the restarting process observed before its own stream."""
    import sys

    sys.path.insert(0, "/root/repo/jobs")
    from run_streaming_pipeline import run_streaming

    from runne_contrastive_ner_spark.operators.linking import canonicalize
    from runne_contrastive_ner_spark.operators.mentions import extract_mentions
    from runne_contrastive_ner_spark.operators.predicates import (
        induce_predicates,
    )
    from runne_contrastive_ner_spark.sources.transcripts import synthesize
    from runne_contrastive_ner_spark.streaming.incremental import (
        streaming_mentions,
    )

    tdir = str(tmp_path / "crash_transcripts")
    wh = str(tmp_path / "crash_wh")
    t1 = synthesize(spark, n_convs=3, turns_per_conv=5)
    t1.write.parquet(tdir)
    s1 = run_streaming(spark, tdir, wh)
    assert s1["triples"] > 0

    # new files land; the stream drains them (checkpoint commits the
    # batches) but the process "crashes" before incremental_kg_fold runs
    t2 = synthesize(spark, n_convs=2, turns_per_conv=4).withColumn(
        "conv_id", F.concat(F.lit("crash-"), F.col("conv_id"))
    )
    t2.write.mode("append").parquet(tdir)
    q = streaming_mentions(
        spark,
        tdir,
        f"{wh}/stream_mentions",
        f"{wh}/_stream_checkpoint",
    )
    q.awaitTermination()

    # restart: its own stream sees nothing new, but the manifest shows the
    # crashed run's batches were never folded -> they enter the delta
    s2 = run_streaming(spark, tdir, wh)
    assert s2["new_batches"] >= 1
    allt = spark.read.parquet(tdir)
    _, _, linked = canonicalize(spark, extract_mentions(allt))
    want = induce_predicates(linked, k=2, entity_col="entity_id").count()
    assert s2["triples"] == want
    assert s2["mentions"] == extract_mentions(allt).count()

    # and the recovery is sticky: an idle restart now skips cleanly
    s3 = run_streaming(spark, tdir, wh)
    assert s3["new_batches"] == 0 and s3["triples"] == want


class TestIncrementalFold:
    """incremental_kg_fold: delta-sized tail maintenance whose result is
    row-identical to a from-scratch batch fold (the invariant), with the
    canonical-id-change propagation case that breaks naive incremental
    linking."""

    MENTION_SCHEMA = (
        "conv_id string, turn_idx int, type string, start int, end int,"
        " surface string, surface_norm string"
    )

    def _mentions(self, spark, rows):
        return spark.createDataFrame(
            [
                (c, t, "PERSON", 0, len(s), s, s)
                for (c, t, s) in rows
            ],
            self.MENTION_SCHEMA,
        )

    def _scratch(self, spark, mentions, aliases):
        from runne_contrastive_ner_spark.operators.linking import canonicalize
        from runne_contrastive_ner_spark.operators.predicates import (
            induce_predicates,
        )

        entities, _, linked = canonicalize(spark, mentions, aliases=aliases)
        triples = induce_predicates(linked, k=2, entity_col="entity_id")
        return entities, triples

    def test_bridge_alias_propagates_to_untouched_conversation(
        self, spark, tmp_path
    ):
        from runne_contrastive_ner_spark.sources.tables import TableIO
        from runne_contrastive_ner_spark.streaming.incremental import (
            incremental_kg_fold,
        )

        aliases = [("aa zz", "bb")]
        io = TableIO(spark, str(tmp_path / "foldwh"))
        batch1 = self._mentions(
            spark, [("c1", 0, "bb"), ("c1", 0, "qq"), ("c3", 0, "rr")]
        )
        s1 = incremental_kg_fold(spark, io, batch1, batch1, aliases=aliases)
        assert s1["incremental"] is False
        # round 2: a NEW surface 'aa zz' bridges into 'bb' and, being
        # lexicographically smaller, STEALS the canonical id — conversation
        # c1 (untouched by the batch) must re-derive its triples
        batch2 = self._mentions(spark, [("c2", 0, "aa zz"), ("c2", 0, "mm")])
        all2 = batch1.unionByName(batch2)
        s2 = incremental_kg_fold(spark, io, all2, batch2, aliases=aliases)
        assert s2["incremental"] is True
        # delta = c2 (new) + c1 (contains 'bb' whose canonical moved); c3
        # holds only the unaffected 'rr' and must NOT re-derive
        assert s2["delta_convs"] == 2
        got_ents = {
            (r.surface_norm, r.canonical_id, r.n_mentions)
            for r in io.read("entities").collect()
        }
        want_entities, want_triples = self._scratch(spark, all2, aliases)
        want_ents = {
            (r.surface_norm, r.canonical_id, r.n_mentions)
            for r in want_entities.collect()
        }
        assert got_ents == want_ents
        assert {tuple(r) for r in io.read("triples").drop("conv_bucket").collect()} == {
            tuple(r)
            for r in want_triples.select(
                *io.read("triples").drop("conv_bucket").columns
            ).collect()
        }
        # the bridged canonical id is in force inside c1's triples
        bb_rows = [
            r for r in io.read("entities").collect() if r.surface_norm == "bb"
        ]
        assert bb_rows[0].canonical_id == "aa zz"

    def test_multi_round_fold_equals_scratch(self, spark, tmp_path):
        """Three random-ish batch rounds; after every fold the tables equal
        the from-scratch fold over the accumulated mentions."""
        from runne_contrastive_ner_spark.sources.tables import TableIO
        from runne_contrastive_ner_spark.streaming.incremental import (
            incremental_kg_fold,
        )

        aliases = [("spark", "apache spark"), ("ml", "machine learning")]
        io = TableIO(spark, str(tmp_path / "foldwh2"))
        surfaces = ["spark", "apache spark", "ml", "machine learning",
                    "table", "join", "shuffle"]
        rows = []
        batches = []
        for rnd in range(3):
            batch_rows = [
                (f"conv-{rnd}-{i % 4}", t, surfaces[(i * 3 + t + rnd) % len(surfaces)])
                for i in range(6)
                for t in range(3)
            ]
            # round 2 also REVISITS an old conversation (reprocessing shape)
            if rnd == 2:
                batch_rows += [("conv-0-1", 9, "ml")]
            batches.append(batch_rows)
            rows += batch_rows
            all_m = self._mentions(spark, rows)
            new_m = self._mentions(spark, batch_rows)
            incremental_kg_fold(spark, io, all_m, new_m, aliases=aliases)
            want_entities, want_triples = self._scratch(spark, all_m, aliases)
            cols = io.read("triples").drop("conv_bucket").columns
            assert {
                tuple(r)
                for r in io.read("triples").drop("conv_bucket").collect()
            } == {
                tuple(r) for r in want_triples.select(*cols).collect()
            }, f"round {rnd} triples diverged"
            got = {
                (r.surface_norm, r.canonical_id, r.n_mentions, r.types)
                for r in io.read("entities").collect()
            }
            want = {
                (r.surface_norm, r.canonical_id, r.n_mentions, ",".join(r.types))
                for r in want_entities.collect()
            }
            assert got == want, f"round {rnd} entities diverged"


class TestAnalyticsRefresh:
    """VERDICT r6 item 6: after a tail fold, refresh_analytics makes the
    materialized analytics tables exactly equal a from-scratch
    analytics_table over the folded triples — and when the tail did not
    change the co-occurrence graph, every stage skips on the edge-set
    fingerprint. The staleness marker is set by the fold and surfaced by
    register_kg_views until the refresh clears it."""

    MENTION_SCHEMA = TestIncrementalFold.MENTION_SCHEMA

    def _mentions(self, spark, rows):
        return TestIncrementalFold._mentions(self, spark, rows)

    def test_refresh_equals_scratch_and_skips_unchanged_graph(
        self, spark, tmp_path
    ):
        from runne_contrastive_ner_spark.plans.pipeline import analytics_table
        from runne_contrastive_ner_spark.plans.views import register_kg_views
        from runne_contrastive_ner_spark.sources.tables import TableIO
        from runne_contrastive_ner_spark.streaming.incremental import (
            analytics_stale_reason,
            incremental_kg_fold,
            refresh_analytics,
        )

        wh = str(tmp_path / "awh")
        io = TableIO(spark, wh)
        batch1 = self._mentions(
            spark,
            [("c1", 0, "aa"), ("c1", 0, "bb"), ("c1", 1, "cc"),
             ("c2", 0, "bb"), ("c2", 0, "cc")],
        )
        incremental_kg_fold(spark, io, batch1, batch1)
        assert analytics_stale_reason(wh) is None  # no analytics yet
        s1 = refresh_analytics(spark, io)
        assert s1["refreshed"] and set(s1["rebuilt"]) == {
            "analytics_pr", "analytics_tri", "analytics_comm",
            "analytics_core", "analytics",
        }

        # tail that CHANGES the graph: a new co-occurring pair
        batch2 = self._mentions(spark, [("c3", 0, "aa"), ("c3", 0, "dd")])
        all2 = batch1.unionByName(batch2)
        incremental_kg_fold(spark, io, all2, batch2)
        assert analytics_stale_reason(wh) is not None
        with pytest.warns(UserWarning, match="STALE"):
            register_kg_views(spark, wh, prefix="t7a_")
        s2 = refresh_analytics(spark, io)
        assert analytics_stale_reason(wh) is None
        assert "analytics" in s2["rebuilt"]
        # exact freshness: folded-then-refreshed ≡ scratch over the folded
        # triples (same operators, same defaults)
        scratch = analytics_table(io.read("triples"))
        assert sorted(map(tuple, io.read("analytics").collect())) == sorted(
            map(tuple, scratch.collect())
        )

        # tail that does NOT change the graph: an existing pair re-occurs
        # in a later turn of an existing conversation — triples change,
        # the distinct edge set does not → every stage skips
        batch3 = self._mentions(spark, [("c1", 5, "aa"), ("c1", 5, "bb")])
        all3 = all2.unionByName(batch3)
        incremental_kg_fold(spark, io, all3, batch3)
        assert analytics_stale_reason(wh) is not None
        s3 = refresh_analytics(spark, io)
        assert s3["rebuilt"] == []
        assert analytics_stale_reason(wh) is None
        # and no warning once fresh
        import warnings as _w

        with _w.catch_warnings():
            _w.simplefilter("error")
            register_kg_views(spark, wh, prefix="t7b_")

    def test_refresh_skips_batch_built_warehouse(self, spark, tmp_path):
        """Cross-seed freshness (review finding): a warehouse whose
        analytics were built by the BATCH pipeline (config-seeded stage
        fingerprints) must not be recomputed by refresh_analytics when the
        graph is unchanged — the fold manifest's recorded edge-set
        fingerprint is the proof, whatever seeded the build. The refresh
        also clears a stray staleness marker without rebuilding."""
        from runne_contrastive_ner_spark.plans.pipeline import (
            PipelineConfig,
            run_pipeline,
        )
        from runne_contrastive_ner_spark.sources.tables import TableIO
        from runne_contrastive_ner_spark.sources.transcripts import synthesize
        from runne_contrastive_ner_spark.streaming.incremental import (
            analytics_stale_reason,
            mark_analytics_stale,
            refresh_analytics,
        )

        t = synthesize(spark, n_convs=4, turns_per_conv=6, long_conv_turns=0)
        wh = str(tmp_path / "bwh")
        cfg = PipelineConfig(warehouse=wh, analytics=True)
        res = run_pipeline(spark, t, cfg, input_fp="b1")
        assert res.analytics is not None
        io = TableIO(spark, wh)
        mark_analytics_stale(wh, reason="test stray marker")
        s = refresh_analytics(spark, io)
        assert s["refreshed"] and s["rebuilt"] == []
        assert analytics_stale_reason(wh) is None

    def test_noop_fold_does_not_mark_stale(self, spark, tmp_path):
        """A fold whose batch yields zero delta conversations (re-delivered
        already-folded content) rewrites nothing, so it must NOT mark the
        analytics tables stale (review finding: unconditional marker)."""
        from runne_contrastive_ner_spark.sources.tables import TableIO
        from runne_contrastive_ner_spark.streaming.incremental import (
            analytics_stale_reason,
            incremental_kg_fold,
            refresh_analytics,
        )

        wh = str(tmp_path / "nwh")
        io = TableIO(spark, wh)
        batch = self._mentions(
            spark, [("c1", 0, "aa"), ("c1", 0, "bb"), ("c2", 0, "cc")]
        )
        incremental_kg_fold(spark, io, batch, batch)
        refresh_analytics(spark, io)
        assert analytics_stale_reason(wh) is None
        # re-fold with an EMPTY new batch: all_mentions unchanged, no new
        # convs, no canonical-id movement → delta_convs 0 → no marker
        empty = self._mentions(spark, [])
        s = incremental_kg_fold(spark, io, batch, empty)
        assert s["delta_convs"] == 0 and s["changed_surfaces"] == 0
        assert analytics_stale_reason(wh) is None

    def test_refresh_tier1_skips_without_deriving_edges(
        self, spark, tmp_path, monkeypatch
    ):
        """When the triples snapshot version is unchanged since the
        analytics build, the refresh must prove freshness from the fold
        manifest alone — ZERO Spark jobs, not even the edge-list
        derivation (the distinct shuffle that would dominate a no-op
        refresh at corpus scale). Asserted by making edge derivation
        explode: tier 1 must never reach it."""
        from runne_contrastive_ner_spark.sources.tables import TableIO
        from runne_contrastive_ner_spark.streaming.incremental import (
            incremental_kg_fold,
            refresh_analytics,
        )

        wh = str(tmp_path / "twh")
        io = TableIO(spark, wh)
        batch = self._mentions(
            spark, [("c1", 0, "aa"), ("c1", 0, "bb"), ("c2", 0, "cc")]
        )
        incremental_kg_fold(spark, io, batch, batch)
        s1 = refresh_analytics(spark, io)
        assert s1["rebuilt"]  # first build

        def _boom(_triples):
            raise AssertionError("tier 1 must not derive the edge list")

        import runne_contrastive_ner_spark.operators.graph as graph_mod

        monkeypatch.setattr(graph_mod, "cooccurrence_edges", _boom)
        s2 = refresh_analytics(spark, io)
        assert s2["refreshed"] and s2["rebuilt"] == []
        assert s2["rows"] == s1["rows"]

    def test_partial_batch_rebuild_mints_no_freshness_proof(
        self, spark, tmp_path
    ):
        """Review finding: a batch run whose config fingerprints let some
        component tables SKIP must not record a freshness proof — only a
        run where every component provably derives from the current graph
        may. Re-running with a changed pagerank_iterations rebuilds only
        pagerank + fold; the new fold manifest must carry NO edges_fp /
        triples_snapshot, and a pre-existing staleness marker must
        survive the run (conservative: refresh_analytics is the path that
        re-proves freshness)."""
        from runne_contrastive_ner_spark.plans.manifest import load_manifest
        from runne_contrastive_ner_spark.plans.pipeline import (
            PipelineConfig,
            run_pipeline,
        )
        from runne_contrastive_ner_spark.sources.tables import TableIO
        from runne_contrastive_ner_spark.sources.transcripts import synthesize
        from runne_contrastive_ner_spark.streaming.incremental import (
            analytics_stale_reason,
            mark_analytics_stale,
        )

        t = synthesize(spark, n_convs=4, turns_per_conv=6, long_conv_turns=0)
        wh = str(tmp_path / "pwh")
        run_pipeline(
            spark, t, PipelineConfig(warehouse=wh, analytics=True), input_fp="p1"
        )
        io = TableIO(spark, wh)
        mf1 = load_manifest(io.path("analytics"))
        assert "edges_fp" in mf1.extra  # full build records the proof

        mark_analytics_stale(wh, reason="simulated out-of-band merge")
        run_pipeline(
            spark,
            t,
            PipelineConfig(warehouse=wh, analytics=True, pagerank_iterations=5),
            input_fp="p1",
        )
        mf2 = load_manifest(io.path("analytics"))
        assert "edges_fp" not in mf2.extra
        assert "triples_snapshot" not in mf2.extra
        assert analytics_stale_reason(wh) is not None  # marker survives


class TestScopedAnalyticsRefresh:
    """VERDICT r7 item 3: when a tail touches one connected component, the
    refresh must not recompute triangles/communities/core for the whole
    graph. The scoped path diffs per-component fingerprints against the
    analytics_compfp table minted by the previous graph-seeded build,
    reuses unchanged components' rows, and recomputes the three operators
    only over the changed components' edges — content must equal the full
    operator over the whole graph, and the returned stats must prove the
    reuse actually happened (the job-scope assertion)."""

    MENTION_SCHEMA = TestIncrementalFold.MENTION_SCHEMA

    def _mentions(self, spark, rows):
        return TestIncrementalFold._mentions(self, spark, rows)

    def test_scoped_refresh_equals_scratch_and_reuses_components(
        self, spark, tmp_path
    ):
        from runne_contrastive_ner_spark.plans.pipeline import analytics_table
        from runne_contrastive_ner_spark.sources.tables import TableIO
        from runne_contrastive_ner_spark.streaming.incremental import (
            incremental_kg_fold,
            refresh_analytics,
        )

        wh = str(tmp_path / "swh")
        io = TableIO(spark, wh)
        # three DISJOINT components: {aa,bb} {cc,dd} {ee,ff}
        batch1 = self._mentions(
            spark,
            [("c1", 0, "aa"), ("c1", 0, "bb"),
             ("c2", 0, "cc"), ("c2", 0, "dd"),
             ("c3", 0, "ee"), ("c3", 0, "ff")],
        )
        incremental_kg_fold(spark, io, batch1, batch1)
        s1 = refresh_analytics(spark, io)
        assert s1["rebuilt"] and not s1["scoped"]  # no diff base yet
        assert io.exists("analytics_compfp")  # minted for the next refresh

        # tail that grows ONLY the {ee,ff} component (ee co-occurs with gg)
        batch2 = self._mentions(spark, [("c4", 0, "ee"), ("c4", 0, "gg")])
        all2 = batch1.unionByName(batch2)
        incremental_kg_fold(spark, io, all2, batch2)
        s2 = refresh_analytics(spark, io)
        assert s2["scoped"], s2
        assert s2["components_total"] == 3
        assert s2["components_unchanged"] == 2
        # the three scoped operators ran over the changed component's edges
        # only — strictly fewer than the whole graph's
        assert 0 < s2["sub_edges"] < s2["edges_total"]
        # content ≡ full recompute over the folded triples
        scratch = analytics_table(io.read("triples"))
        assert sorted(map(tuple, io.read("analytics").collect())) == sorted(
            map(tuple, scratch.collect())
        )
        # reused rows really are the unchanged components': tri/comm/core
        # carry the same values for aa..dd as scratch (checked above) AND
        # the compfp table now describes the new graph
        s3 = refresh_analytics(spark, io)
        assert s3["rebuilt"] == []  # tier 1 — proofs advanced correctly

    def test_scope_full_forces_unscoped_rebuild(self, spark, tmp_path):
        from runne_contrastive_ner_spark.sources.tables import TableIO
        from runne_contrastive_ner_spark.streaming.incremental import (
            incremental_kg_fold,
            refresh_analytics,
        )
        import pytest as _pytest

        wh = str(tmp_path / "fwh")
        io = TableIO(spark, wh)
        batch1 = self._mentions(
            spark, [("c1", 0, "aa"), ("c1", 0, "bb"), ("c2", 0, "cc"), ("c2", 0, "dd")]
        )
        incremental_kg_fold(spark, io, batch1, batch1)
        refresh_analytics(spark, io)
        batch2 = self._mentions(spark, [("c3", 0, "cc"), ("c3", 0, "hh")])
        all2 = batch1.unionByName(batch2)
        incremental_kg_fold(spark, io, all2, batch2)
        s = refresh_analytics(spark, io, scope="full")
        assert not s["scoped"] and "analytics_tri" in s["rebuilt"]
        with _pytest.raises(ValueError, match="scope"):
            refresh_analytics(spark, io, scope="bogus")

    def test_bucket_change_rebuilds_component_tables(self, spark, tmp_path):
        """ADVICE r7 item 1: `buckets` joins every component stage
        fingerprint — changing the bucket count on an UNCHANGED graph must
        rebuild the physically-bucketed component tables with the new
        layout instead of skipping while the manifest stamps the new
        value."""
        from runne_contrastive_ner_spark.plans.manifest import load_manifest
        from runne_contrastive_ner_spark.sources.tables import TableIO
        from runne_contrastive_ner_spark.streaming.incremental import (
            incremental_kg_fold,
            refresh_analytics,
        )

        wh = str(tmp_path / "bwh2")
        io = TableIO(spark, wh)
        batch = self._mentions(
            spark, [("c1", 0, "aa"), ("c1", 0, "bb"), ("c2", 0, "cc"), ("c2", 0, "dd")]
        )
        incremental_kg_fold(spark, io, batch, batch)
        s1 = refresh_analytics(spark, io, buckets=16)
        assert s1["rebuilt"]
        # params-only tier 3 must NOT pay the connected-components job:
        # the graph is unchanged, so the per-component diff is
        # all-unchanged by construction (r8 review finding) — assert by
        # making CC explode
        import runne_contrastive_ner_spark.operators.components as comp_mod

        real_cc = comp_mod.connected_components

        def _boom(*_a, **_k):
            raise AssertionError("params-only rebuild must not run CC")

        comp_mod.connected_components = _boom
        try:
            s2 = refresh_analytics(spark, io, buckets=8)
        finally:
            comp_mod.connected_components = real_cc
        assert {"analytics_tri", "analytics_comm", "analytics_core",
                "analytics"} <= set(s2["rebuilt"]), s2
        mf = load_manifest(io.path("analytics"))
        assert mf.extra["buckets"] == 8
        # and a same-bucket refresh right after is tier-1 quiet again
        s3 = refresh_analytics(spark, io, buckets=8)
        assert s3["rebuilt"] == []

    def test_corrupt_stale_marker_degrades_not_raises(self, spark, tmp_path):
        """ADVICE r7 item 3: a torn/corrupt marker file still MEANS stale
        — analytics_stale_reason must degrade to 'unknown', and the atomic
        write path must leave no .tmp residue."""
        import os

        from runne_contrastive_ner_spark.streaming.incremental import (
            analytics_stale_reason,
            mark_analytics_stale,
        )

        wh = str(tmp_path / "mwh")
        mark_analytics_stale(wh, reason="ok")
        assert analytics_stale_reason(wh) == "ok"
        assert not os.path.exists(
            os.path.join(wh, "_analytics_stale.json.tmp")
        )
        with open(os.path.join(wh, "_analytics_stale.json"), "w") as f:
            f.write('{"reason": "torn')  # simulated torn write
        assert analytics_stale_reason(wh) == "unknown"

    def test_tampered_component_blocks_scoped_reuse(self, spark, tmp_path):
        """Reuse-intactness guard (r8 review finding): the scoped path must
        refuse to reuse a component table whose manifest no longer matches
        the fingerprint the fold's proof was minted over — the state a
        crashed partial rebuild leaves behind. Content must still converge
        to scratch via the full path."""
        from runne_contrastive_ner_spark.plans.manifest import (
            load_manifest,
            write_manifest,
        )
        from runne_contrastive_ner_spark.plans.pipeline import analytics_table
        from runne_contrastive_ner_spark.sources.tables import TableIO
        from runne_contrastive_ner_spark.streaming.incremental import (
            incremental_kg_fold,
            refresh_analytics,
        )

        wh = str(tmp_path / "twh2")
        io = TableIO(spark, wh)
        batch1 = self._mentions(
            spark,
            [("c1", 0, "aa"), ("c1", 0, "bb"),
             ("c2", 0, "cc"), ("c2", 0, "dd")],
        )
        incremental_kg_fold(spark, io, batch1, batch1)
        refresh_analytics(spark, io)  # full build, mints compfp + proof
        # simulate the crashed foreign rebuild: analytics_tri's manifest no
        # longer matches what the fold folded
        mf = load_manifest(io.path("analytics_tri"))
        mf.fingerprint = "tampered-by-crashed-rebuild"
        write_manifest(io.path("analytics_tri"), mf)
        # graph-changing tail touching only component {cc,dd}
        batch2 = self._mentions(spark, [("c3", 0, "cc"), ("c3", 0, "zz")])
        all2 = batch1.unionByName(batch2)
        incremental_kg_fold(spark, io, all2, batch2)
        s = refresh_analytics(spark, io)
        assert not s["scoped"], s  # reuse refused, full path taken
        scratch = analytics_table(io.read("triples"))
        assert sorted(map(tuple, io.read("analytics").collect())) == sorted(
            map(tuple, scratch.collect())
        )
        # proof re-minted: the NEXT graph-changing refresh can scope again
        batch3 = self._mentions(spark, [("c4", 0, "cc"), ("c4", 0, "yy")])
        all3 = all2.unionByName(batch3)
        incremental_kg_fold(spark, io, all3, batch3)
        s2 = refresh_analytics(spark, io)
        assert s2["scoped"] and s2["components_unchanged"] >= 1, s2
