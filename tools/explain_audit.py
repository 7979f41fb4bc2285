"""Physical-plan audit: dump .explain('formatted') for the headline queries
and grep the properties that matter at 100 TB (pushed filters, pruned scan
schemas, broadcast joins, whole-stage codegen coverage, exchange counts).

Writes PLANS.md. Run after operator changes; the point is to iterate until
each plan is the one you'd want on a 1000-executor cluster, not the first
one that passed (see SURVEY.md §4.2).
"""

from __future__ import annotations

import contextlib
import io
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entry_mod
from runne_contrastive_ner_spark.session import build_session

AUDIT = [
    "kg_mentions",
    "kg_triples",
    "kg_pagerank",
    "kg_edge_lift",
    "kg_verb_predicates",
    "rel_pricing_summary",
    "rel_region_order_rollup",
    "rel_stratified_hash_split",
    "rel_sessionization",
    "dd_minhash_lsh_candidates",
    "dd_ngram_jaccard_pairs",
    "dd_simhash_near_pairs",
    "dd_embedding_neardup_pairs",
    "sim_lsh_buckets",
    "sim_ann_lsh_topk",
    "sim_ann_ivf_topk",
    "sim_ann_ivf_kmeans_topk",
    "dd_dedup_clusters",
    "ts_quality_scores",
    "ts_wordpiece_segments",
    "ts_shard_packing",
    "ts_source_mixture",
    "ts_token_quantiles",
    "kg_entities_embedding",
    "kg_triangles",
    "kg_communities",
]

# queries where a quadratic join stage would be a scale bug; the audit FAILS
# (exit 1) if their plans contain BroadcastNestedLoopJoin or CartesianProduct
NO_CARTESIAN = {
    "kg_mentions",
    "kg_triples",
    "kg_pagerank",
    "kg_edge_lift",
    "kg_verb_predicates",
    "dd_minhash_lsh_candidates",
    "dd_ngram_jaccard_pairs",
    "dd_simhash_near_pairs",
    "dd_embedding_neardup_pairs",
    "sim_ann_lsh_topk",
    "dd_dedup_clusters",
    "ts_wordpiece_segments",
    "ts_shard_packing",
    "ts_source_mixture",
    "ts_token_quantiles",
    "kg_entities_embedding",
    "kg_triangles",
    "kg_communities",
    # sim_ann_ivf_topk / sim_ann_ivf_kmeans_topk are audited but exempt:
    # their only nested-loop stage is the broadcast cross join against the
    # K=8 constant centroid table (distance-to-all-centroids / Lloyd
    # assignment), which is O(N*K), not O(N^2)
}

# static-plan Exchange ceilings. kg_edge_lift references its conv_ents
# distinct set 4x; before the localCheckpoint the static plan replayed the
# full mention lineage per reference (186 exchanges in the r3 audit). The
# checkpoint truncates that to the joins/aggs of the lift itself — the bound
# fails the audit if the lineage ever starts leaking into the plan again.
# The other bounds are regression tripwires set with ~25% headroom over the
# r5 audit (kg_triples 32, pagerank 16, verb_predicates 52, communities 20,
# triangles 4, entities_embedding 12, ngram_jaccard 14): they exist to catch
# an order-of-magnitude lineage leak, not to freeze the exact plan.
EXCHANGE_BOUNDS = {
    "kg_edge_lift": 16,
    "kg_triples": 40,
    "kg_pagerank": 20,
    "kg_verb_predicates": 64,
    "kg_communities": 26,
    "kg_triangles": 8,
    "kg_entities_embedding": 16,
    # r9: doc_shingles gained the scan parallelism floor (one REPARTITION
    # exchange per shingle-scan subtree; this plan references the shingle
    # table from 6 subtrees). The floor is a no-op on multi-split
    # production inputs, so the ceiling rises by exactly those 6 with the
    # same ~25% headroom discipline (audited 24 in the r9 run).
    "dd_ngram_jaccard_pairs": 30,
    "kg_mentions": 4,
}


def plan_of(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def summarize(plan: str) -> dict[str, object]:
    return {
        "exchanges": len(re.findall(r"\bExchange\b", plan)),
        "broadcast_joins": len(re.findall(r"BroadcastHashJoin", plan)),
        "sortmerge_joins": len(re.findall(r"SortMergeJoin", plan)),
        "codegen_spans": len(set(re.findall(r"\[codegen id : (\d+)\]", plan))),
        "pushed_filters": bool(re.search(r"PushedFilters: \[[^\]]", plan)),
        "scan_schemas": re.findall(r"ReadSchema: (struct<[^\n]{0,120})", plan),
        "python_stages": len(re.findall(r"(MapInPandas|ArrowEvalPython|BatchEvalPython)", plan)),
        "row_python_udf": bool(re.search(r"BatchEvalPython", plan)),
        "cartesian_stages": len(
            re.findall(r"(BroadcastNestedLoopJoin|CartesianProduct)", plan)
        ),
    }


def resume_fold_plan(spark, sf_dir: str) -> tuple[str, dict]:
    """The post-resume triples fold over BUCKETED stage tables (VERDICT r4
    item 2): run the staged pipeline into a temp warehouse, then rebuild the
    fold the resume path runs — the re-read mentions x entities join. With
    surface_norm-bucketed snapshots this join must carry NO
    hashpartitioning(surface_norm) Exchange: the shuffle was paid once at
    stage-write time."""
    import shutil
    import tempfile

    from runne_contrastive_ner_spark.plans.pipeline import (
        PipelineConfig,
        run_pipeline,
    )
    from runne_contrastive_ner_spark.sources.tables import TableIO
    from runne_contrastive_ner_spark.sources.transcripts import from_documents

    wh = tempfile.mkdtemp(prefix="audit_wh_")
    try:
        cfg = PipelineConfig(warehouse=wh)
        with contextlib.redirect_stdout(io.StringIO()):
            run_pipeline(spark, from_documents(spark, sf_dir), cfg, input_fp="audit")
        tio = TableIO(spark, wh)
        m = tio.read("mentions")
        e = tio.read("entities")
        fold = m.join(
            e.select("surface_norm", "canonical_id", "entity_id"),
            on="surface_norm",
            how="left",
        )
        plan = plan_of(fold)
        s = summarize(plan)
        s["surface_norm_exchange"] = bool(
            re.search(r"hashpartitioning\(surface_norm", plan)
        )
        s["bucketed_scans"] = len(re.findall(r"Bucketed: true", plan))
        return plan, s
    finally:
        shutil.rmtree(wh, ignore_errors=True)


def kcore_round_plan(spark) -> tuple[dict, str]:
    """One inner round of k_core_numbers' distributed phase-peeling
    (operators/graph.py), UNtruncated by the per-round localCheckpoints the
    real loop inserts — the worst-case per-round shape: degree groupBy,
    low/kept split, double anti-join edge removal, vanished-node detection.
    Everything keys on the node id; no cartesian stage may appear and the
    exchange count is bounded (the loop's job count is rounds x this)."""
    from pyspark.sql import functions as F

    edges = (
        spark.range(4000)
        .selectExpr(
            "cast(id % 911 as string) src", "cast((id * 7) % 911 as string) dst"
        )
        .filter("src <> dst")
        .localCheckpoint(eager=True)
    )
    k = 2
    deg = edges.groupBy("src").agg(F.count(F.lit(1)).cast("long").alias("d"))
    low = deg.filter(F.col("d") < k).select("src")
    kept = deg.filter(F.col("d") >= k).select("src")
    next_rem = (
        edges.join(low, "src", "left_anti")
        .join(low.withColumnRenamed("src", "dst"), "dst", "left_anti")
        .select("src", "dst")
    )
    vanished = kept.join(next_rem, "src", "left_anti")
    plan = plan_of(vanished)
    return summarize(plan), plan


def analytics_fold_plan(spark, sf_dir: str) -> tuple[dict, str]:
    """The analytics stage's 4-way fold as the PIPELINE materializes it
    (VERDICT r6 item 5): the four per-entity component tables are written
    through TableIO bucketed on ``src``, and ``fold_analytics`` joins the
    re-read bucketed scans — the audited plan must therefore show ZERO
    exchanges (the shuffles were paid at the component writes; the old
    in-memory composition measured 44 exchanges / 4 SortMergeJoins)."""
    import shutil
    import tempfile

    from runne_contrastive_ner_spark.operators.graph import (
        cooccurrence_edges,
        k_core_numbers,
        label_propagation,
        pagerank,
        triangle_counts,
    )
    from runne_contrastive_ner_spark.plans.pipeline import fold_analytics
    from runne_contrastive_ner_spark.sources.tables import TableIO

    triples = entry_mod.queries()["kg_triples"](spark, sf_dir).localCheckpoint(
        eager=True
    )
    edges = cooccurrence_edges(triples).localCheckpoint(eager=True)
    d = tempfile.mkdtemp(prefix="audit_afold_")
    try:
        io_ = TableIO(spark, d)
        spec = {"cols": ["src"], "n": 4, "sort": ["src"]}
        parts = {
            "analytics_pr": pagerank(edges, iterations=2),
            "analytics_tri": triangle_counts(edges),
            "analytics_comm": label_propagation(edges, iterations=4),
            "analytics_core": k_core_numbers(edges),
        }
        with contextlib.redirect_stdout(io.StringIO()):
            for t, df in parts.items():
                io_.write(df, t, bucket_spec=spec)
        fold = fold_analytics(*[io_.read(t) for t in parts])
        plan = plan_of(fold)
        return summarize(plan), plan
    finally:
        shutil.rmtree(d, ignore_errors=True)


def compfp_probe_plan(spark, sf_dir: str) -> tuple[dict, str]:
    """The component-scoped analytics refresh's diff probe (VERDICT r7
    item 3): per-connected-component fingerprints = one membership
    equi-join + one groupBy over the checkpointed edge list. This is the
    price paid to AVOID recomputing triangles/communities/core over
    unchanged components — it must stay a flat join+agg shape (no
    iterative stage, no cartesian) or the scoped path would cost what it
    saves."""
    from runne_contrastive_ner_spark.operators.components import (
        connected_components,
    )
    from runne_contrastive_ner_spark.operators.graph import cooccurrence_edges
    from runne_contrastive_ner_spark.streaming.incremental import (
        component_fingerprints,
    )

    triples = entry_mod.queries()["kg_triples"](spark, sf_dir).localCheckpoint(
        eager=True
    )
    edges = cooccurrence_edges(triples).localCheckpoint(eager=True)
    membership = connected_components(edges).localCheckpoint(eager=True)
    plan = plan_of(component_fingerprints(edges, membership))
    return summarize(plan), plan


def ntriples_plans(spark, sf_dir: str) -> list[tuple[str, dict, str]]:
    """N-Triples export/scan (sources/rdf.py): the write's line set must be
    one distinct Exchange + a codegen'd projection; the scan must be ONE
    pass over the text file — a single conditional projection classifying
    each line (no union, no join, zero exchanges) — no Python stage in
    either."""
    import shutil
    import tempfile

    from runne_contrastive_ner_spark.sources.rdf import (
        ntriples_lines,
        read_ntriples,
        write_ntriples,
    )

    # the CLI exports the MATERIALIZED triple table (run_kg_pipeline reads
    # the warehouse snapshot, not the live extraction lineage) — emulate
    # with an eager checkpoint so the audited shape is the export's own
    triples = (
        entry_mod.queries()["kg_triples"](spark, sf_dir)
        .selectExpr(
            "cast(subj as string) subj", "pred", "cast(obj as string) obj"
        )
        .localCheckpoint(eager=True)
    )
    wplan = plan_of(ntriples_lines(triples))
    out = [("ntriples_write_lines", summarize(wplan), wplan)]
    d = tempfile.mkdtemp(prefix="audit_nt_")
    try:
        with contextlib.redirect_stdout(io.StringIO()):
            write_ntriples(triples.limit(1000), d + "/nt")
        rplan = plan_of(read_ntriples(spark, d + "/nt"))
        out.append(("ntriples_read", summarize(rplan), rplan))
    finally:
        shutil.rmtree(d, ignore_errors=True)
    return out


# exchange ceilings for the special (non-registry) audited shapes, same
# ~25% headroom discipline as EXCHANGE_BOUNDS. analytics_stage_fold is the
# bucketed-scan 4-way join the pipeline's analytics stage runs (VERDICT r6
# item 5): 0 exchanges measured — the component shuffles are paid at the
# bucketed TableIO writes — so the bound of 1 allows only an AQE artifact;
# any real Exchange here means the fold lost its co-location.
SPECIAL_EXCHANGE_BOUNDS = {
    "kcore_peel_round": 8,
    "analytics_stage_fold": 1,
    "ntriples_write_lines": 4,
    # single-pass conditional projection over one text scan (rdf.py
    # read_ntriples): 0 exchanges measured; 1 allows an AQE artifact
    "ntriples_read": 1,
    # scoped-refresh diff probe (component_fingerprints over checkpointed
    # edges + membership): one join + one agg — 3 exchanges measured with
    # SMJ sides + final agg; 4 allows an AQE artifact
    "analytics_compfp_probe": 4,
}


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    # audit the DISTRIBUTED graph plans (the 100 TB shapes), not the
    # small-graph driver fast path the audit corpus would trigger
    from runne_contrastive_ner_spark.operators import graph as graph_mod

    graph_mod.FORCE_DISTRIBUTED = True
    spark = build_session(app_name="explain-audit")
    spark.sparkContext.setLogLevel("ERROR")
    queries = entry_mod.queries()
    sections = []
    failures = []
    for name in AUDIT:
        plan = plan_of(queries[name](spark, sf_dir))
        s = summarize(plan)
        sections.append((name, s, plan))
        print(name, {k: v for k, v in s.items() if k != "scan_schemas"})
        if name in NO_CARTESIAN and s["cartesian_stages"]:
            failures.append(name)
        bound = EXCHANGE_BOUNDS.get(name)
        if bound is not None and s["exchanges"] > bound:
            failures.append(f"{name} (exchanges {s['exchanges']} > {bound})")
    fold_plan, fold_s = resume_fold_plan(spark, sf_dir)
    sections.append(("pipeline_resume_fold (mentions x entities, bucketed)", fold_s, fold_plan))
    print("pipeline_resume_fold", {k: v for k, v in fold_s.items() if k != "scan_schemas"})
    if fold_s["surface_norm_exchange"]:
        failures.append("pipeline_resume_fold (surface_norm Exchange present)")
    # r5-shape audits (VERDICT r5 item 3): k-core peel round, analytics
    # 4-way fold, N-Triples write/read — same cartesian + exchange tripwires
    specials = [("kcore_peel_round",) + kcore_round_plan(spark),
                ("analytics_stage_fold",) + analytics_fold_plan(spark, sf_dir),
                ("analytics_compfp_probe",) + compfp_probe_plan(spark, sf_dir)]
    specials += ntriples_plans(spark, sf_dir)
    for name, s, plan in specials:
        sections.append((name, s, plan))
        print(name, {k: v for k, v in s.items() if k != "scan_schemas"})
        if s["cartesian_stages"]:
            failures.append(f"{name} (cartesian stage)")
        bound = SPECIAL_EXCHANGE_BOUNDS.get(name)
        if bound is not None and s["exchanges"] > bound:
            failures.append(f"{name} (exchanges {s['exchanges']} > {bound})")
    with open(os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "PLANS.md"), "w") as f:
        f.write(
            "# PLANS.md — physical-plan audit of headline queries\n\n"
            "Generated by tools/explain_audit.py. Checks per plan: shuffle\n"
            "(Exchange) count, join strategies, whole-stage-codegen coverage,\n"
            "parquet filter pushdown + column-pruned ReadSchema, and that no\n"
            "row-at-a-time Python UDF (BatchEvalPython) appears anywhere.\n\n"
        )
        for name, s, plan in sections:
            f.write(f"## {name}\n\n```\n")
            for k, v in s.items():
                f.write(f"{k}: {v}\n")
            f.write("```\n\n<details><summary>full plan</summary>\n\n```\n")
            f.write(plan[:8000])
            f.write("\n```\n</details>\n\n")
    spark.stop()
    if failures:
        print(f"FAIL: cartesian/BNL stage in scale-critical plans: {failures}")
        sys.exit(1)
    print("no cartesian stages in scale-critical plans")


if __name__ == "__main__":
    main()
