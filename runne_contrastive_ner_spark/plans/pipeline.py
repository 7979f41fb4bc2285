"""The five-stage KG-construction pipeline (SURVEY.md §3.4).

    transcripts ─▶ mentions ─▶ entities/edges (linking + CC) ─▶ triples
                                             └▶ materialized node/edge/triple
                                                tables with manifests

Each stage writes its output table through TableIO before the next starts —
the write IS the checkpoint; ``StageRunner`` skips stages whose manifest
fingerprint (inputs + params) matches, giving resumable batch execution with
per-partition lineage, per the north rule.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.vocab import ENTITY_TYPES, TEST_ALIASES, TEST_GAZETTEER
from ..operators.linking import canonicalize
from ..operators.mentions import extract_mentions
from ..operators.predicates import induce_predicates
from ..sources.tables import TableIO
from .manifest import StageRunner, fingerprint


@dataclass
class PipelineConfig:
    warehouse: str
    window_k: int = 2
    gazetteer: dict[str, str] = field(default_factory=lambda: dict(TEST_GAZETTEER))
    aliases: list[tuple[str, str]] = field(default_factory=lambda: list(TEST_ALIASES))
    entity_types: list[str] = field(default_factory=lambda: list(ENTITY_TYPES))
    use_embedding_edges: bool = False
    # knobs for the embedding-edge leg (only read when use_embedding_edges):
    # embedding_method "lsh" = hash-embedding + LSH; "bigram" = the
    # oracle-replayable bigram count-vector cosine. bigram_candidates picks
    # that path's candidate source: "bigram" (df-cap blocking), "lsh"
    # (dictionary-scale sign-LSH), or "auto" (DEFAULT — sign-LSH above
    # BIGRAM_LSH_AUTO_NODES distinct surfaces, so a production run does not
    # silently take the silent-drop df-cap path at 10^7-surface dictionaries;
    # VERDICT r5 item 4).
    embedding_method: str = "lsh"
    embedding_threshold: float | None = None
    bigram_candidates: str = "auto"
    salt_partitions: int | None = None
    # mention/triple tables are written partitioned by this many conversation
    # hash buckets: per-conversation reads prune to one directory, and a
    # 1000-executor writer produces bounded file counts per bucket (the
    # Iceberg deployment maps this to bucket(conv_id, N) partition transform)
    lineage_buckets: int = 16
    # mentions + entities are hash-clustered on surface_norm at write time
    # (TableIO bucket_spec), so the post-resume entity/triple folds join the
    # re-read tables with ZERO surface_norm Exchange — the shuffle is paid
    # once at write instead of on every re-run (VERDICT r4 item 2). The
    # Parquet fallback can't combine bucketBy with partitionBy dirs in one
    # catalog table cleanly, so the bucketed mentions table keeps conv_bucket
    # as a plain COLUMN (still filterable; Iceberg gets both transforms
    # natively). bucket_link_tables=False restores the conv_bucket-dir layout.
    bucket_link_tables: bool = True
    link_buckets: int = 16
    # optional 5th stage: materialize per-entity graph analytics (PageRank
    # centrality) over the triple table, with its own manifest/resume
    analytics: bool = False
    pagerank_iterations: int = 3


def fold_analytics(
    pr: DataFrame, tri: DataFrame, comm: DataFrame, core: DataFrame
) -> DataFrame:
    """The analytics fold: 4-way left join of the per-entity component
    tables on the entity id. In the staged pipeline the four inputs are
    TableIO snapshots BUCKETED on ``src`` (VERDICT r6 item 5), so this
    join chain runs with ZERO Exchange — the shuffle was paid once at the
    component writes; tools/explain_audit.py asserts the exchange-free
    shape as ``analytics_stage_fold``."""
    return (
        pr.join(tri, "src", "left")
        .join(comm, "src", "left")
        .join(core, "src", "left")
        .select(
            F.col("src").alias("entity_id"),
            "pr_q",
            F.coalesce("n_triangles", F.lit(0)).cast("long").alias("n_triangles"),
            F.coalesce("community", F.col("src")).alias("community"),
            F.coalesce("core", F.lit(0)).cast("long").alias("core"),
        )
    )


def analytics_table(triples: DataFrame, pagerank_iterations: int = 3) -> DataFrame:
    """One analytics row per entity: centrality + triangle participation +
    community label + core number, all over the SAME materialized edge list
    (checkpointed once inside each operator; the four are independent
    equi-join/groupBy chains folded by a 4-way left join on the entity id).
    Direct (un-staged) composition for ad-hoc callers; the pipeline's
    analytics stage materializes each component bucketed and folds them
    exchange-free instead."""
    from ..operators.graph import (
        cooccurrence_edges,
        k_core_numbers,
        label_propagation,
        pagerank,
        triangle_counts,
    )

    edges_g = cooccurrence_edges(triples)
    return fold_analytics(
        pagerank(edges_g, iterations=pagerank_iterations),
        triangle_counts(edges_g),
        label_propagation(edges_g, iterations=ANALYTICS_LP_ITERATIONS),
        k_core_numbers(edges_g),
    )


@dataclass
class PipelineResult:
    mentions: DataFrame
    entities: DataFrame
    edges: DataFrame
    triples: DataFrame
    metrics: dict
    analytics: DataFrame | None = None


# label-propagation rounds for the analytics_comm component — ONE constant
# shared by the batch build, its fingerprint, AND the scoped refresh's
# changed-component recompute (review finding: an implicit reliance on the
# operator's default could let the two drift, silently mixing iteration
# counts inside one certified table)
ANALYTICS_LP_ITERATIONS = 4


def run_analytics_stages(
    runner,
    triples: DataFrame,
    fp_seed: str,
    pagerank_iterations: int = 3,
    buckets: int = 16,
    edges: DataFrame | None = None,
    edges_fp: str | None = None,
    seeded_by_graph: bool = False,
    triples_snapshot: int | None = None,
    component_builds: dict | None = None,
) -> DataFrame:
    """The analytics stage group: the four per-entity component tables are
    materialized BUCKETED on the entity id (one shuffle each, paid at
    write), and the 4-way fold joins the co-located scans with zero
    Exchange. Each component resumes independently (changing
    pagerank_iterations recomputes pagerank + the fold, not triangles /
    communities / core). ``fp_seed`` keys the stage fingerprints: the batch
    pipeline seeds with its config lineage (link fingerprint + window_k);
    the incremental refresh (streaming/incremental.refresh_analytics) seeds
    with the EDGE-SET fingerprint and passes ``seeded_by_graph=True``.

    FRESHNESS RECORDING (what refresh_analytics later trusts): the fold
    manifest gets ``edges_fp`` / ``triples_snapshot`` / hyperparameter
    extras ONLY when every component table provably derives from the
    CURRENT graph — i.e. all four components rebuilt in THIS invocation,
    or the stage fingerprints are graph-seeded (then even a skipped
    component's fingerprint embeds the current edge fingerprint). A batch
    run whose config fingerprints let stale components skip after an
    out-of-band incremental merge must NOT mint a freshness proof for
    them (review finding). Pass a pre-checkpointed ``edges`` (and its
    ``edges_fp``, if already computed) to avoid re-deriving them.

    ``component_builds`` (incremental refresh only): replacement build
    callables keyed ``'tri'``/``'comm'``/``'core'`` — the component-scoped
    refresh path passes merged builds (reused unchanged-component rows +
    recompute over changed components only) whose CONTENT equals the full
    operator over the whole graph (property-tested). PageRank is never
    overridden: its teleport term uses the global node count, so it is
    only component-local when the node set is provably unchanged — this
    engine recomputes it globally instead of shipping that cliff. Only
    meaningful with graph-seeded fingerprints (the override is content-
    equal for THIS graph, so a skip on a matching graph-seeded
    fingerprint stays sound)."""
    from ..operators.graph import (
        cooccurrence_edges,
        k_core_numbers,
        label_propagation,
        pagerank,
        triangle_counts,
    )

    estate: dict = {}
    if edges is not None:
        estate["e"] = edges
    if edges_fp is not None:
        estate["efp"] = edges_fp
    built: set = set()
    fold_extra: dict = {}

    def _edges_g() -> DataFrame:
        # shared edge list, derived once from the materialized triples and
        # pinned so four component builds don't re-derive it; its
        # fingerprint (one aggregation over the checkpointed list — cheap
        # next to the iterative ops) is computed alongside
        if "e" not in estate:
            estate["e"] = cooccurrence_edges(triples).localCheckpoint(eager=True)
        if "efp" not in estate:
            from ..streaming.incremental import edges_fingerprint

            estate["efp"] = edges_fingerprint(estate["e"])
        return estate["e"]

    def _component(name, fn):
        def build():
            built.add(name)
            return fn()

        return build

    a_spec = {"cols": ["src"], "n": buckets, "sort": ["src"]}
    # ``buckets`` joins every COMPONENT fingerprint, not just the fold's
    # (ADVICE r7): the component tables are physically bucketed at write,
    # so a bucket-count change must rebuild them with the new layout —
    # previously they skipped on a matching fingerprint while the tier-2/3
    # refresh stamped the new value into the manifest, silently degrading
    # the exchange-free fold guarantee. Cost of the fix: warehouses built
    # before this release recompute the analytics group once on upgrade
    # (safe — content is re-derived, never wrong).
    pr_fp = fingerprint("analytics-pr", fp_seed, pagerank_iterations, buckets)
    tri_fp = fingerprint("analytics-tri", fp_seed, buckets)
    comm_fp = fingerprint("analytics-comm", fp_seed, ANALYTICS_LP_ITERATIONS, buckets)
    core_fp = fingerprint("analytics-core", fp_seed, buckets)
    overrides = component_builds or {}
    pr = runner.run(
        "analytics_pr",
        pr_fp,
        _component("pr", lambda: pagerank(_edges_g(), iterations=pagerank_iterations)),
        lineage_key="src",
        bucket_spec=a_spec,
    )
    tri = runner.run(
        "analytics_tri",
        tri_fp,
        _component(
            "tri", overrides.get("tri") or (lambda: triangle_counts(_edges_g()))
        ),
        lineage_key="src",
        bucket_spec=a_spec,
    )
    comm = runner.run(
        "analytics_comm",
        comm_fp,
        _component(
            "comm",
            overrides.get("comm")
            or (
                lambda: label_propagation(
                    _edges_g(), iterations=ANALYTICS_LP_ITERATIONS
                )
            ),
        ),
        lineage_key="src",
        bucket_spec=a_spec,
    )
    core = runner.run(
        "analytics_core",
        core_fp,
        _component(
            "core", overrides.get("core") or (lambda: k_core_numbers(_edges_g()))
        ),
        lineage_key="src",
        bucket_spec=a_spec,
    )

    def _fold_build():
        sound = seeded_by_graph or built == {"pr", "tri", "comm", "core"}
        if sound and "efp" in estate:
            fold_extra["edges_fp"] = estate["efp"]
            # the triples SNAPSHOT VERSION this build derives from —
            # refresh tier 1 compares it to skip even the edge-list
            # derivation when nothing merged. MUST be the version the
            # caller pinned BEFORE reading triples: re-reading the live
            # pointer here would stamp a concurrent merge's version onto
            # content derived from the older snapshot (review finding —
            # a false tier-1 proof).
            fold_extra["triples_snapshot"] = triples_snapshot
            fold_extra["pagerank_iterations"] = pagerank_iterations
            fold_extra["buckets"] = buckets
            # the component manifest fingerprints this fold actually folded:
            # the scoped refresh refuses to REUSE a component table whose
            # current manifest no longer matches (review finding: a crashed
            # partial batch rebuild can leave one component holding another
            # graph's content while the fold manifest still vouches for the
            # old proof)
            fold_extra["component_fps"] = {
                "analytics_pr": pr_fp,
                "analytics_tri": tri_fp,
                "analytics_comm": comm_fp,
                "analytics_core": core_fp,
            }
        return fold_analytics(pr, tri, comm, core)

    return runner.run(
        "analytics",
        fingerprint("analytics-v4", pr_fp, tri_fp, comm_fp, core_fp, buckets),
        _fold_build,
        lineage_key="entity_id",
        bucket_spec={
            "cols": ["entity_id"],
            "n": buckets,
            "sort": ["entity_id"],
        },
        extra=fold_extra,
    )


def link_fingerprint(cfg: PipelineConfig, base_fp: str) -> str:
    """Fingerprint of the linking stage. Embedding knobs enter ONLY when
    the embedding leg is on, and then as an EXTRA element (ADVICE r6):
    with the leg off the arg list is byte-identical to the PRE-EMBEDDING
    releases, so warehouses from those releases keep their fingerprints on
    upgrade; only embedding-enabled warehouses take the invalidation the
    knobs genuinely imply. Known exception, accepted: a non-embedding
    warehouse built by the one intermediate release whose OFF-shape
    carried a literal ``None`` element recomputes once when upgraded to
    this shape — restoring the long-term stable contract costs that
    cohort a single recompute (safe: content is re-derived, never
    wrong)."""
    link_args: list = [
        "link",
        base_fp,
        sorted(cfg.aliases),
        cfg.use_embedding_edges,
    ]
    if cfg.use_embedding_edges:
        link_args.append(
            (
                cfg.embedding_method,
                cfg.embedding_threshold,
                cfg.bigram_candidates,
            )
        )
    link_args.append(cfg.bucket_link_tables and cfg.link_buckets)
    return fingerprint(*link_args)


def run_pipeline(
    spark: SparkSession, transcripts: DataFrame, cfg: PipelineConfig, input_fp: str
) -> PipelineResult:
    io = TableIO(spark, cfg.warehouse)
    runner = StageRunner(io)

    base_fp = fingerprint(input_fp, sorted(cfg.gazetteer.items()), cfg.entity_types)

    def bucketed(df: DataFrame) -> DataFrame:
        return df.withColumn(
            "conv_bucket", F.pmod(F.xxhash64("conv_id"), F.lit(cfg.lineage_buckets))
        )

    link_spec = (
        {"cols": ["surface_norm"], "n": cfg.link_buckets}
        if cfg.bucket_link_tables
        else None
    )
    # NOTE: the scorer is not a fingerprint component because run_pipeline
    # pins the GazetteerScorer (extract_mentions' default). If a
    # scorer_factory / model path is ever added to PipelineConfig, its
    # identity INCLUDING numeric width (float32 vs float64 flips near-tie
    # decodes) must join this fingerprint, or resumed warehouses will
    # serve stale mentions under a matching fingerprint.
    mentions = runner.run(
        "mentions",
        fingerprint(
            "mentions",
            base_fp,
            cfg.salt_partitions,
            cfg.lineage_buckets,
            cfg.bucket_link_tables and cfg.link_buckets,
        ),
        lambda: bucketed(
            extract_mentions(
                transcripts,
                gazetteer=cfg.gazetteer,
                entity_types=cfg.entity_types,
                salt_partitions=cfg.salt_partitions,
            )
        ),
        partition_cols=None if link_spec else ["conv_bucket"],
        lineage_key="conv_id",
        bucket_spec=link_spec,
    )

    link_fp = link_fingerprint(cfg, base_fp)
    # linking + CC produce two tables from one computation; build once, stage twice
    state: dict[str, DataFrame] = {}

    def _canonicalize():
        return canonicalize(
            spark,
            mentions,
            aliases=cfg.aliases,
            use_embedding_edges=cfg.use_embedding_edges,
            embedding_threshold=cfg.embedding_threshold,
            embedding_method=cfg.embedding_method,
            bigram_candidates=cfg.bigram_candidates,
        )

    def build_linked():
        entities, edges, linked = _canonicalize()
        state["edges"] = edges
        state["linked"] = linked
        return entities

    entities = runner.run(
        "entities",
        link_fp,
        build_linked,
        lineage_key="canonical_id",
        bucket_spec=link_spec,
    )
    edges = runner.run(
        "edges",
        link_fp,
        lambda: state["edges"] if "edges" in state else _canonicalize()[1],
    )

    def build_triples():
        if "linked" in state:
            linked = state["linked"]
        else:
            linked = mentions.join(
                entities.select("surface_norm", "canonical_id", "entity_id"),
                on="surface_norm",
                how="left",
            ).withColumn(
                "canonical_id", F.coalesce(F.col("canonical_id"), F.col("surface_norm"))
            )
        # triples are materialized in normalized form — integer entity ids
        # against the `entities` dictionary; the (subj, pred, obj) string
        # view is a broadcast join away and exists for presentation only
        return induce_predicates(linked, k=cfg.window_k, entity_col="entity_id")

    triples = runner.run(
        "triples",
        fingerprint("triples", link_fp, cfg.window_k, cfg.lineage_buckets),
        lambda: bucketed(build_triples()),
        partition_cols=["conv_bucket"],
        lineage_key="conv_id",
    )

    analytics = None
    if cfg.analytics:
        analytics = run_analytics_stages(
            runner,
            triples,
            fp_seed=fingerprint(link_fp, cfg.window_k),
            pagerank_iterations=cfg.pagerank_iterations,
            buckets=cfg.link_buckets,
            # pinned BEFORE the analytics builds: the triples stage just
            # ran (or skipped) in this process, so the pointer read here
            # names the snapshot the `triples` handle actually reads
            triples_snapshot=getattr(io, "current_version", lambda _t: None)(
                "triples"
            ),
        )
        # clear any staleness marker a previous incremental fold left
        # behind ONLY when the fold manifest now PROVES freshness against
        # the current triples snapshot (run_analytics_stages records that
        # proof exactly when every component derives from the current
        # graph). A partial rebuild over stale skipped components, or a
        # full skip after an out-of-band merge, leaves the marker — and
        # the STALE warning — in force; refresh_analytics is the path
        # that re-establishes freshness there (review finding).
        from .manifest import load_manifest
        from ..streaming.incremental import clear_analytics_stale

        _mf = load_manifest(io.path("analytics"))
        _rec = None if _mf is None else _mf.extra.get("triples_snapshot")
        if _rec is not None and _rec == getattr(
            io, "current_version", lambda _t: None
        )("triples"):
            clear_analytics_stale(cfg.warehouse)

    metrics = {s: vars(m) for s, m in runner.metrics.items()}
    return PipelineResult(mentions, entities, edges, triples, metrics, analytics)
