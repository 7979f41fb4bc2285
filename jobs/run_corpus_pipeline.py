"""spark-submit entry point for the training-corpus pipeline: near-dup
clusters → corpus selection (lang ∧ quality ∧ survivor) → shard packing of
the selected documents → per-source mixing weights + exact token-length
quantiles (the curator's corpus profile).

    zip -r /tmp/engine.zip runne_contrastive_ner_spark
    spark-submit --py-files /tmp/engine.zip jobs/run_corpus_pipeline.py \
        --sf-dir /root/testdata/sf0.001 --warehouse /tmp/corpus_wh

Same deployment contract as run_kg_pipeline.py: stage outputs land as
manifest-tracked tables (resume skips matching stages), one JSON line of
stage metrics on stdout.
"""

from __future__ import annotations

import argparse
import json

from pyspark.sql import SparkSession

from runne_contrastive_ner_spark.operators.dedup import dedup_clusters
from runne_contrastive_ner_spark.operators.textstats import (
    corpus_selection,
    shard_packing,
    source_mixture,
    token_quantiles,
)
from runne_contrastive_ner_spark.plans.manifest import StageRunner, fingerprint
from runne_contrastive_ner_spark.sources.tables import TableIO


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", required=True)
    ap.add_argument("--warehouse", required=True)
    ap.add_argument("--min-quality", type=float, default=0.62)
    ap.add_argument("--shard-budget", type=int, default=256)
    ap.add_argument(
        "--max-top-bigram",
        type=float,
        default=None,
        help="Gopher top-2-gram occurrence-share gate (default 0.20)",
    )
    ap.add_argument(
        "--max-dup-trigram",
        type=float,
        default=None,
        help="Gopher duplicate-3-gram occurrence-share gate (default 0.18)",
    )
    args = ap.parse_args()

    spark = (
        SparkSession.builder.appName("corpus-pipeline")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("WARN")

    from runne_contrastive_ner_spark.operators.textstats import (
        CORPUS_MAX_DUP_TRIGRAM,
        CORPUS_MAX_TOP_BIGRAM,
    )

    max_top_bigram = (
        CORPUS_MAX_TOP_BIGRAM if args.max_top_bigram is None else args.max_top_bigram
    )
    max_dup_trigram = (
        CORPUS_MAX_DUP_TRIGRAM
        if args.max_dup_trigram is None
        else args.max_dup_trigram
    )

    io = TableIO(spark, args.warehouse)
    runner = StageRunner(io)
    base_fp = fingerprint(args.sf_dir, args.min_quality, args.shard_budget)
    # the repetition thresholds change what "selection" MEANS, so they
    # fingerprint the selection stage and everything downstream of it —
    # but not dedup_clusters/source_mixture/token_quantiles, which don't
    # read the selection (a pre-r7 warehouse recomputes exactly the two
    # affected stages once)
    sel_fp = fingerprint(base_fp, max_top_bigram, max_dup_trigram)

    runner.run(
        "dedup_clusters",
        fingerprint("dedup_clusters", base_fp),
        lambda: dedup_clusters(spark, args.sf_dir),
        lineage_key="cluster_id",
    )
    selected = runner.run(
        "corpus_selection",
        fingerprint("corpus_selection", sel_fp),
        lambda: corpus_selection(
            spark,
            args.sf_dir,
            min_quality=args.min_quality,
            max_top_bigram_frac=max_top_bigram,
            max_dup_trigram_frac=max_dup_trigram,
        ),
    )
    runner.run(
        "shards",
        fingerprint("shards", sel_fp),
        lambda: shard_packing(
            spark, args.sf_dir, budget=args.shard_budget, selected=selected
        ),
        partition_cols=["source"],
        lineage_key="shard_idx",
    )
    # corpus-profile stages: per-source mixing weights + exact length
    # quantiles — the numbers a data curator reads before launching a
    # training run (both one-row-per-source aggregates; cheap, resumable)
    runner.run(
        "source_mixture",
        fingerprint("source_mixture", base_fp),
        lambda: source_mixture(spark, args.sf_dir),
    )
    runner.run(
        "token_quantiles",
        fingerprint("token_quantiles", base_fp),
        lambda: token_quantiles(spark, args.sf_dir),
    )
    print(json.dumps({"stages": {k: vars(v) for k, v in runner.metrics.items()}}))
    spark.stop()


if __name__ == "__main__":
    main()
