"""Round-9 isolation bench (guide §1.4): time individual declared queries
with the noop sink so the computation is measured, not the sink or the
``.count()`` column pruning, and dump ``.explain('formatted')`` for the
before/after plan evidence in ``plans/r09/``.

This file is SEPARATE from the frozen ``bench.py`` (driver contract) — it
exists so OPTIMIZATION_r09.md can cite isolated per-operator numbers.

Usage:
  python bench_extra.py [--sf DIR] [--plans-dir plans/r09] [--tag before] \
      [--reps 3] [--sink noop|count] query [query ...]

Prints one JSON line: {"sf": ..., "sink": ..., "queries": {name: median},
"reps": {name: [..]}}.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import __spark_entry__ as entry_mod
from runne_contrastive_ner_spark.session import build_session


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--plans-dir", default=None, help="dump explain('formatted') here")
    ap.add_argument("--tag", default="before", help="plan filename suffix (before/after)")
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--sink", choices=["noop", "count"], default="noop")
    ap.add_argument("queries", nargs="+")
    args = ap.parse_args()

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    try:
        os.sched_setaffinity(0, set(range(int(cpus))))
    except (AttributeError, OSError):
        pass
    spark = build_session(app_name="bench-extra", master=f"local[{cpus}]")
    spark.sparkContext.setLogLevel("ERROR")
    qs = entry_mod.queries()

    # same JVM + Python-worker warmup as bench.py so rep medians measure
    # the operators, not process startup
    qs["rel_min_freq_gate"](spark, args.sf).count()
    import pandas as _pd

    spark.range(int(cpus) * 2).repartition(int(cpus)).mapInPandas(
        lambda it: iter([_pd.DataFrame({"id": [sum(len(b) for b in it)]})]), "id long"
    ).count()

    timings: dict[str, float] = {}
    reps_raw: dict[str, list[float]] = {}
    for name in args.queries:
        df = qs[name](spark, args.sf)
        if args.plans_dir:
            import contextlib
            import io

            buf = io.StringIO()
            with contextlib.redirect_stdout(buf):
                df.explain("formatted")
            os.makedirs(args.plans_dir, exist_ok=True)
            with open(os.path.join(args.plans_dir, f"{name}_{args.tag}.txt"), "w") as f:
                f.write(buf.getvalue())
        reps = []
        for _ in range(args.reps):
            entry_mod.release_linked()
            spark.sparkContext.setJobDescription(f"bench_extra:{name}")
            # construction INSIDE the timed region, matching the frozen
            # bench.py run_query contract (some queries run bounded eager
            # jobs — local CC collect, alias isin probe — at build time)
            t0 = time.time()
            df = qs[name](spark, args.sf)
            if args.sink == "noop":
                df.write.format("noop").mode("overwrite").save()
            else:
                df.count()
            reps.append(round(time.time() - t0, 3))
            spark.sparkContext.setJobDescription(None)
        reps_raw[name] = reps
        timings[name] = sorted(reps)[len(reps) // 2]
    print(json.dumps({"sf": args.sf, "sink": args.sink, "queries": timings, "reps": reps_raw}))
    spark.stop()


if __name__ == "__main__":
    main()
