"""Round-9 stress probe: the reworked dedup/textstats operators at 8x the
sf1.0 corpus (400k documents, ~21M shingle rows) on a MULTI-SPLIT input.

Two claims this evidences (OPTIMIZATION_r09.md):
* the r9 wide-aggregation shapes hold at a volume the bench never sees —
  walls stay near-linear, no OOM, no straggler collapse;
* ``load_floor`` is genuinely scale-adaptive: the replicated input is
  written as 64 parquet files, the scan arrives with >= defaultParallelism
  splits, and the floor adds NO repartition (verified by plan inspection
  here), so nothing in the r9 work is a small-input trick.

Writes BENCH/stress_r09.json. Run: python tools/stress_dedup.py [sf_dir]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from runne_contrastive_ner_spark.session import build_session

REPLICATE = 8


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf1.0"
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    try:
        os.sched_setaffinity(0, set(range(int(cpus))))
    except (AttributeError, OSError):
        pass
    spark = build_session(app_name="stress-dedup", master=f"local[{cpus}]")
    spark.sparkContext.setLogLevel("ERROR")

    base = spark.read.parquet(f"{sf_dir}/documents.parquet")
    n_base = base.count()
    big_dir = tempfile.mkdtemp(prefix="stress_docs_")
    # distinct doc ids per replica; 64 output files so the scan is
    # multi-split (the production shape load_floor must no-op on)
    (
        base.select(
            F.explode(F.expr(f"sequence(0, {REPLICATE - 1})")).alias("r"), "*"
        )
        .withColumn("doc_id", F.col("doc_id") * REPLICATE + F.col("r"))
        .drop("r")
        .repartition(64)
        .write.parquet(f"{big_dir}/documents.parquet")
    )

    from runne_contrastive_ner_spark.operators import dedup as dd
    from runne_contrastive_ner_spark.operators import textstats as ts

    # floor no-op proof: the scan must NOT gain a REPARTITION exchange
    import contextlib
    import io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        dd.doc_shingles(spark, big_dir).explain("formatted")
    floor_noop = "REPARTITION_BY_NUM" not in buf.getvalue()

    out: dict[str, object] = {
        "sf_dir": sf_dir,
        "replicate": REPLICATE,
        "n_docs": n_base * REPLICATE,
        "cpus": int(cpus),
        "scan_files": 64,
        "floor_noop_on_multisplit": floor_noop,
        "walls_sec": {},
        "rows": {},
    }
    probes = {
        "dd_minhash_signatures": lambda: dd.minhash_signatures(spark, big_dir),
        "dd_minhash_lsh_candidates": lambda: dd.minhash_lsh_candidates(spark, big_dir),
        "dd_simhash_values": lambda: dd.simhash_values(spark, big_dir),
        "dd_dedup_clusters": lambda: dd.dedup_clusters(spark, big_dir),
        "ts_quality_scores_floored_noop": lambda: ts.quality_scores(
            spark, big_dir, floor=True
        ),
    }
    for name, build in probes.items():
        spark.sparkContext.setJobDescription(f"stress:{name}")
        t0 = time.time()
        df = build()
        if name.endswith("_noop"):
            df.write.format("noop").mode("overwrite").save()
            n = -1
        else:
            n = df.count()
        out["walls_sec"][name] = round(time.time() - t0, 3)  # type: ignore[index]
        out["rows"][name] = n  # type: ignore[index]
        spark.sparkContext.setJobDescription(None)

    shutil.rmtree(big_dir, ignore_errors=True)
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(here, "BENCH", "stress_r09.json"), "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
