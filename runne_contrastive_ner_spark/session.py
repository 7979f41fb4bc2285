"""SparkSession factory with scale-oriented defaults.

The settings below are the ones that matter on a real multi-executor cluster
reading ~100 TB; on ``local[N]`` they are harmless and keep plans identical:

* AQE on (runtime coalescing, skew-join splitting) — long conversations and
  hub entities are the two skew sources called out in SURVEY.md §7.2.
* Arrow enabled with a bounded batch size so pandas-UDF model scoring gets
  large-but-memory-safe batches (the reference's ``batch_size=1`` inference,
  recognize.py:73, is the anti-pattern we are undoing).
* Shuffle partitions sized for the local harness; a cluster deployment would
  set this (or rely on AQE coalescing) per data volume.
* UTC session timezone so timestamp semantics line up with the DuckDB oracle.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def build_session(
    app_name: str = "runne-kg-engine",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    master = master or f"local[{cpus}]"
    shuffle_partitions = shuffle_partitions or int(cpus)

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "1024")
        .config("spark.sql.session.timeZone", "UTC")
        # local mode: the driver JVM hosts every task; with 32 concurrent
        # hash-aggregate tasks an 8g heap GC-thrashes (measured: the triple
        # distinct stage anti-scaled 11.5s@8c -> 27.3s@32c) — size the heap
        # for the thread count
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "24g"))
        # throughput GC for batch workloads: measured 2.5x on the
        # allocation-heavy triple stage vs default G1 (33.4s -> 13.4s at 32
        # threads); latency is irrelevant for this engine
        .config("spark.driver.extraJavaOptions", "-XX:+UseParallelGC")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.ui.enabled", "false")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
