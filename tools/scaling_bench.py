"""Scaling-efficiency evidence: the same job on the same input at N and 4N
parallelism (local[8] vs local[32] — standing in for N vs 4N executors per
the driver instruction; no real cluster in-sandbox).

Runs the flagship mention-detection + triple-induction job and reports
throughput (turns/sec) at both levels plus efficiency
= (throughput_4N / throughput_N) / 4 (target ≥ 0.8, BASELINE.json
north_rule). Results are appended to BENCH/BASELINE.md.

Each level runs in a fresh subprocess so the JVM/session is cold-started
identically (a restarted in-process session would reuse JIT state and bias
the larger run).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CHILD = r"""
import json, os, sys, time
sys.path.insert(0, %(repo)r)
from runne_contrastive_ner_spark.session import build_session
from runne_contrastive_ner_spark.sources.transcripts import from_documents
from runne_contrastive_ner_spark.operators.mentions import extract_mentions
from runne_contrastive_ner_spark.operators.linking import canonicalize
from runne_contrastive_ner_spark.operators.predicates import induce_predicates

cores = int(sys.argv[1]); sf_dir = sys.argv[2]; replicate = int(sys.argv[3])
spark = build_session(app_name=f"scale-{cores}", master=f"local[{cores}]",
                      shuffle_partitions=cores)
spark.sparkContext.setLogLevel("ERROR")
from pyspark.sql import functions as F
t = from_documents(spark, sf_dir)
if replicate > 1:
    # deterministic conversation replication: scales the input so the
    # measured region is dominated by per-turn work, not fixed overhead.
    # repartition the small base BEFORE the explode so row generation is
    # parallel instead of a single-task serial head.
    t = (t.repartition(cores * 2)
           .select(F.explode(F.expr(f"sequence(0, {replicate - 1})")).alias("rep"), "*")
           .withColumn("conv_id", F.concat_ws("-", "conv_id", F.col("rep").cast("string")))
           .drop("rep"))
n_turns = t.count()
# warm-up: tiny slice initializes Python workers at both levels equally
extract_mentions(t.limit(32)).count()
t0 = time.time()
mentions = extract_mentions(t, salt_partitions=cores * 4)
_, _, linked = canonicalize(spark, mentions)
n_triples = induce_predicates(linked, k=2, entity_col="entity_id").count()
wall = time.time() - t0
print(json.dumps({"cores": cores, "n_turns": n_turns, "wall": wall,
                  "turns_per_sec": n_turns / wall, "n_triples": n_triples}))
spark.stop()
"""


def run_level(cores: int, sf_dir: str, replicate: int) -> dict:
    out = subprocess.run(
        [sys.executable, "-c", CHILD % {"repo": REPO}, str(cores), sf_dir, str(replicate)],
        capture_output=True, text=True, timeout=1800,
    )
    line = [ln for ln in out.stdout.splitlines() if ln.startswith("{")][-1]
    return json.loads(line)


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    # 100x replication (500k turns) puts the job in the regime where
    # per-turn work dominates fixed scheduling overhead — the regime the
    # 10^12-turn target actually lives in (at 40x the fixed ~17s of small
    # stages capped measured efficiency at ~0.5)
    replicate = int(os.environ.get("SPARK_GRAFT_REPLICATE", "100"))
    low, high = 8, 32
    r_low = run_level(low, sf_dir, replicate)
    r_high = run_level(high, sf_dir, replicate)
    eff = (r_high["turns_per_sec"] / r_low["turns_per_sec"]) / (high / low)
    result = {
        "sf": sf_dir,
        "replicate": replicate,
        "n_turns": r_low["n_turns"],
        "n_triples": r_low["n_triples"],
        f"turns_per_sec_local[{low}]": round(r_low["turns_per_sec"], 2),
        f"turns_per_sec_local[{high}]": round(r_high["turns_per_sec"], 2),
        f"wall_local[{low}]": round(r_low["wall"], 2),
        f"wall_local[{high}]": round(r_high["wall"], 2),
        "scaling_efficiency": round(eff, 3),
        "target": 0.8,
    }
    print(json.dumps(result, indent=2))
    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    with open(os.path.join(REPO, "BENCH", "BASELINE.md"), "w") as f:
        f.write(
            "# BENCH/BASELINE.md — measured scaling evidence\n\n"
            "Flagship job (mention detection -> linking/CC -> window predicate\n"
            "induction -> triple count) on the same input at two parallelism\n"
            "levels (N=8, 4N=32 cores; in-sandbox stand-in for N vs 4N\n"
            "executors). Efficiency = (throughput_4N / throughput_N) / 4.\n\n"
            "```json\n" + json.dumps(result, indent=2) + "\n```\n"
        )


if __name__ == "__main__":
    main()
