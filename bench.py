"""Benchmark harness — headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

``value`` is total wall seconds over the headline set. The flagship metric
(turns/sec triple extraction) is also included, along with per-query
timings. Scaling evidence across parallelism levels lives in
tools/scaling_bench.py (writes BENCH/BASELINE.md).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import __spark_entry__ as entry_mod
from runne_contrastive_ner_spark.session import build_session

# headline set: the KG pipeline stages + one representative per operator
# family (quadratic correctness baselines like all-pairs jaccard/cosine are
# exercised by the correctness gate at sf0.01, not benchmarked at sf0.1)
HEADLINE = [
    "kg_mentions",
    "kg_triples",
    "kg_pagerank",
    "rel_pricing_summary",
    "rel_region_order_rollup",
    "rel_sessionization",
    "rel_event_transitions",
    "dd_minhash_lsh_candidates",
    "dd_simhash_values",
    "sim_lsh_buckets",
    "ts_quality_scores",
    "ts_doc_fingerprints",
]


def run_query(q, spark, sf_dir) -> tuple[float, int]:
    t0 = time.time()
    n = q(spark, sf_dir).count()
    return time.time() - t0, n


def scorer_kernel_bench(dtype="float64") -> float:
    """numpy-BERT scorer kernel: windows/sec for one partition's batched
    forward (the score_pieces_batch path the extraction hot loop uses).
    Synthetic bundle at a mid-size shape (hidden 128, 4 layers, window
    128) — an architecture-relative number, not a trained-model claim.
    Measured at BOTH widths: float64 (the historical series) and float32
    (the production TransformerScorer path since round 6 — TF's width,
    ~2x sgemm throughput). Runs BEFORE the Spark session exists: measured
    after a full bench the same call reads 30-40x slower from JVM/worker
    memory+CPU contention."""
    import numpy as np

    from runne_contrastive_ner_spark.functions.bert_numpy import (
        NumpyBertNer,
        synthetic_bundle,
    )

    sw = synthetic_bundle(
        ["PERSON", "ORGANIZATION", "LOCATION"],
        vocab_size=1000,
        hidden=128,
        n_layers=4,
        n_heads=4,
        max_pos=128,
        ffn=256,
    )
    model = NumpyBertNer(sw, ["PERSON", "ORGANIZATION", "LOCATION"], dtype=dtype)
    rng = np.random.default_rng(7)
    wins = rng.integers(4, 1000, size=(64, 128)).tolist()
    model.batch(wins)  # warm
    best = float("inf")
    # best-of-3: back-to-back reps of THIS kernel on this host have been
    # measured at 34.8 / 14.9 / 37.6 w/s with nothing else running — the
    # hypervisor neighbor, not the code; min wall = the operator cost
    for _ in range(3):
        t0 = time.time()
        model.batch(wins)
        best = min(best, time.time() - t0)
    return round(64 / best, 1)


CANARY_HISTORY = os.path.join(
    os.path.dirname(os.path.abspath(__file__)), "BENCH", "canary_history.jsonl"
)
# a reading below this fraction of the host's rolling-best f32 probe marks
# the artifact noise-suspect; 0.55 sits between the quiet-band spread
# (~40-55 w/s on the round-1..6 host, ratio ≥0.7 within band) and the
# measured noisy-neighbor collapses (6-10x, ratio ≤0.2)
CANARY_SUSPECT_FRACTION = 0.55
# absolute floor used only until the history has a first entry for the host
CANARY_BOOTSTRAP_FLOOR = 30.0


def _host_id() -> str:
    import platform

    return f"{platform.node()}|cpus={os.cpu_count()}"


def _rolling_best() -> float:
    """Best f32 probe ever recorded for THIS host in the committed canary
    history (0.0 when the host has no entries yet). Read-only — no
    append."""
    host = _host_id()
    best = 0.0
    try:
        with open(CANARY_HISTORY) as f:
            for line in f:
                # a run killed mid-append can leave a torn line; skip it
                # rather than losing the whole bench run's results
                try:
                    rec = json.loads(line)
                except ValueError:
                    continue
                if rec.get("host") == host:
                    best = max(best, float(rec.get("f32", 0.0)))
    except OSError:
        pass
    return best


def _canary_suspect(
    f32_reading: float, phase: str = "pre", ts: float | None = None
) -> bool:
    """Noise judgement against THIS host's committed rolling best (ADVICE
    r6: an absolute threshold calibrated to one host class permanently
    flags any slower machine). Appends the raw reading + host identity +
    ``phase`` (pre/post — the session is BRACKETED, VERDICT r7) to the
    history, so the judgement is reproducible from the artifact set."""
    best = _rolling_best()
    host = _host_id()
    try:
        os.makedirs(os.path.dirname(CANARY_HISTORY), exist_ok=True)
        with open(CANARY_HISTORY, "a") as f:
            json.dump(
                {
                    "host": host,
                    "f32": f32_reading,
                    # ts of the MEASUREMENT, not the append: the pre probe
                    # runs minutes before this record is judged, and the
                    # history is only usable for correlating probes with
                    # external load events if its timestamps are honest
                    # (review finding)
                    "ts": time.time() if ts is None else ts,
                    "phase": phase,
                },
                f,
            )
            f.write("\n")
    except OSError:
        pass
    if best <= 0.0:
        return bool(f32_reading < CANARY_BOOTSTRAP_FLOOR)
    return bool(f32_reading < CANARY_SUSPECT_FRACTION * max(best, f32_reading))


def _latest_quiet_record(here: str | None = None) -> str | None:
    """Repo-relative path of the newest committed canary-quiet bench
    record (BENCH/quiet_r*.json) — the artifact a reader should treat as
    the round's authoritative numbers when the driver-run artifact is
    noise-flagged (VERDICT r7: two quasi-duplicate records told different
    headline stories with nothing in the artifact adjudicating)."""
    import glob
    import re

    if here is None:
        here = os.path.dirname(os.path.abspath(__file__))

    def round_no(p: str) -> int:
        # numeric sort: lexicographic would put quiet_r100 before quiet_r99
        m = re.search(r"quiet_r(\d+)\.json$", p)
        return int(m.group(1)) if m else -1

    recs = sorted(
        glob.glob(os.path.join(here, "BENCH", "quiet_r*.json")), key=round_no
    )
    return os.path.relpath(recs[-1], here) if recs else None


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    # pin the whole process tree (this interpreter, the JVM it spawns, the
    # Python workers the JVM forks) to exactly `cpus` cores — the same
    # taskset discipline tools/scaling_bench.py uses — so per-rep timings
    # are not scheduler-migration-dependent (VERDICT r3 item 8)
    try:
        os.sched_setaffinity(0, set(range(int(cpus))))
    except (AttributeError, OSError):
        pass  # non-Linux or restricted: run unpinned
    scorer_windows_sec = scorer_kernel_bench()
    scorer_windows_sec_f32 = scorer_kernel_bench(dtype="float32")
    pre_probe_ts = time.time()
    # OPT-IN quiet gate (off for driver runs): SPARK_GRAFT_QUIET_GATE=0.8
    # holds the measured section until the pre-probe reaches that fraction
    # of the host's rolling best, re-probing every 60s up to
    # SPARK_GRAFT_QUIET_GATE_SEC (default 900). Round-8 field experience:
    # noise bursts on this host outlive a single bench but quiet windows
    # DO recur — gating the start is cheaper than discarding flagged
    # artifacts after 10 minutes of measurement.
    gate = float(os.environ.get("SPARK_GRAFT_QUIET_GATE", "0") or 0.0)
    if gate > 0.0:
        best = _rolling_best()
        deadline = time.time() + float(
            os.environ.get("SPARK_GRAFT_QUIET_GATE_SEC", "900")
        )
        while (
            best > 0.0
            and scorer_windows_sec_f32 < gate * best
            and time.time() < deadline
        ):
            print(
                f"[quiet-gate] f32 probe {scorer_windows_sec_f32} < "
                f"{gate} x best {best}; waiting 60s",
                file=sys.stderr,
            )
            time.sleep(60)
            scorer_windows_sec_f32 = scorer_kernel_bench(dtype="float32")
            pre_probe_ts = time.time()
    spark = build_session(app_name="bench", master=f"local[{cpus}]")
    spark.sparkContext.setLogLevel("ERROR")

    queries = entry_mod.queries()
    timings: dict[str, float] = {}
    counts: dict[str, int] = {}
    # warm the JVM once so timings measure the operators
    queries["rel_min_freq_gate"](spark, sf_dir).count()
    # ... and fork the Python workers + import their numpy/pandas stack with
    # a trivial mapInPandas pass: without this, rep 1 of the first
    # mapInPandas query pays ~5s of worker startup that is not operator
    # cost (observed kg_mentions reps 6.07/1.10/0.99 before this warmup)
    import pandas as _pd

    spark.range(int(cpus) * 2).repartition(int(cpus)).mapInPandas(
        lambda it: iter([_pd.DataFrame({"id": [sum(len(b) for b in it)]})]),
        "id long",
    ).count()

    # median-of-3 per query (VERDICT r5 item 2): this host shows
    # noisy-neighbor periods (observed back-to-back full-bench walls of
    # 16.3s / 31.5s / 19.0s on identical code; the r5 judge measured the
    # same query at 14.9s cold / 0.28s warm under load). Median of three
    # reps is robust to a single interfered rep without hiding a genuine
    # regression the way min-of-N can; the raw reps stay in the JSON so a
    # reader can recompute min/max. The kg_* lineage memo is released
    # between reps so every rep re-computes honestly.
    reps_raw: dict[str, list[float]] = {name: [] for name in HEADLINE}
    for _rep in range(3):
        entry_mod.release_linked()
        for name in HEADLINE:
            sec, n = run_query(queries[name], spark, sf_dir)
            reps_raw[name].append(round(sec, 3))
            counts[name] = n
    timings = {name: sorted(r)[1] for name, r in reps_raw.items()}
    total = sum(timings.values())

    # flagship throughput: turns/sec through the full mention→link→triple
    # job at a scale where per-turn work dominates fixed overhead (20x
    # replication of the sf tier ≈ 100k turns)
    from pyspark.sql import functions as F

    from runne_contrastive_ner_spark.operators.linking import canonicalize
    from runne_contrastive_ner_spark.operators.mentions import extract_mentions
    from runne_contrastive_ner_spark.operators.predicates import induce_predicates
    from runne_contrastive_ner_spark.sources.transcripts import from_documents

    base = from_documents(spark, sf_dir)
    n_turns = base.count()
    rep = 20
    big = (
        base.repartition(int(cpus) * 2)
        .select(F.explode(F.expr(f"sequence(0, {rep - 1})")).alias("r"), "*")
        .withColumn("conv_id", F.concat_ws("-", "conv_id", F.col("r").cast("string")))
        .drop("r")
    )
    # best-of-2 walls (both recorded): a single rep is hostage to the same
    # host variance the headline reps show; the mention-extraction python
    # workers are already warm so rep 1 carries no startup edge. The persist
    # registry is drained BETWEEN reps: canonicalize/induce_predicates cache
    # intermediates, and Spark's CacheManager matches by analyzed-plan
    # equality — without the blocking unpersist, rep 2 builds the identical
    # plan and silently reads rep 1's cached mentions, skipping the scoring
    # work entirely (observed 11.6s → 2.9s phantom "speedup").
    flagship_walls = []
    for _ in range(2):
        persists: list = []
        t0 = time.time()
        mentions = extract_mentions(big, salt_partitions=int(cpus) * 4)
        _, _, linked = canonicalize(spark, mentions, persist_registry=persists)
        induce_predicates(
            linked, k=2, entity_col="entity_id", persist_registry=persists
        ).count()
        flagship_walls.append(round(time.time() - t0, 3))
        for df in persists:
            df.unpersist(blocking=True)
    flagship_wall = min(flagship_walls)
    turns_sec = round(n_turns * rep / flagship_wall, 2)

    # resume economics (VERDICT r2 item 7): the manifests must buy WALL TIME,
    # not just row-count equality. Cold 4-stage pipeline at the bench SF,
    # then delete ONLY the triples manifest (that stage recomputes, upstream
    # skips), then re-run untouched (all stages skip).
    import shutil
    import tempfile

    from runne_contrastive_ner_spark.plans.pipeline import (
        PipelineConfig,
        run_pipeline,
    )

    wh = tempfile.mkdtemp(prefix="bench_wh_")
    cfg = PipelineConfig(warehouse=wh)

    def timed_pipeline() -> float:
        # stage/resume progress prints go to stderr: stdout carries ONLY the
        # final JSON line the driver parses
        import contextlib

        t0 = time.time()
        with contextlib.redirect_stdout(sys.stderr):
            run_pipeline(spark, base, cfg, input_fp="bench").triples.count()
        return time.time() - t0

    pipeline_cold = timed_pipeline()
    os.remove(os.path.join(wh, "triples", "_manifest.json"))
    pipeline_resume = timed_pipeline()
    pipeline_skip = timed_pipeline()
    shutil.rmtree(wh, ignore_errors=True)

    # streaming tail-ingest economics (VERDICT r4 item 8): cold drain of a
    # transcripts directory vs re-run after dropping new files in — the
    # checkpoint must confine the expensive mention scan to the NEW files,
    # so the tail wall is fold-dominated (link+triples over the accumulated
    # mentions), not scan-dominated.
    from jobs.run_streaming_pipeline import run_streaming as run_streaming_job

    sdir = tempfile.mkdtemp(prefix="bench_stream_t_")
    swh = tempfile.mkdtemp(prefix="bench_stream_wh_")
    tdir = os.path.join(sdir, "transcripts")
    conv_bucket = F.pmod(F.xxhash64("conv_id"), F.lit(4))
    base_part = base.filter(conv_bucket != 0)  # ~75% of conversations
    tail_part = base.filter(conv_bucket == 0)
    base_part.coalesce(6).write.parquet(tdir)
    t0 = time.time()
    stats_cold = run_streaming_job(spark, tdir, swh)
    stream_cold = time.time() - t0
    tail_part.coalesce(2).write.mode("append").parquet(tdir)
    t0 = time.time()
    stats_tail = run_streaming_job(spark, tdir, swh)
    stream_tail = time.time() - t0
    # attribution run (VERDICT r6): NO new files — pure fixed overhead
    # (stream spin-up + availableNow drain + fold skip). The honest tail
    # economics are (tail - noop) vs (cold - noop): at small SF the fixed
    # overhead dominates both absolute walls, which is what made r6's
    # tail ≈ cold; the overhead-corrected ratio shows the delta
    # confinement.
    t0 = time.time()
    run_streaming_job(spark, tdir, swh)
    stream_noop = time.time() - t0
    shutil.rmtree(sdir, ignore_errors=True)
    shutil.rmtree(swh, ignore_errors=True)

    # canary BRACKETING (VERDICT r7): the pre-session probe alone cannot
    # see a noise burst that starts after it — the r7 driver artifact was
    # probe-quiet yet carried >2x rep spreads. A second probe after the
    # last measured rep closes the window: the artifact is suspect if
    # EITHER side of the bracket is below threshold.
    scorer_windows_sec_f32_post = scorer_kernel_bench(dtype="float32")
    noise_pre = _canary_suspect(
        scorer_windows_sec_f32, phase="pre", ts=pre_probe_ts
    )
    noise_post = _canary_suspect(scorer_windows_sec_f32_post, phase="post")

    out = {
        "metric": "headline_total_sec",
        "value": round(total, 3),
        "unit": "sec",
        "queries": timings,
        "sf": sf_dir,
        "turns_per_sec": turns_sec,
        "flagship_turns": n_turns * rep,
        "flagship_wall_sec": round(flagship_wall, 3),
        "flagship_walls_sec": flagship_walls,
        "n_turns": n_turns,
        "row_counts": counts,
        "cpus": int(cpus),
        "pipeline_cold_sec": round(pipeline_cold, 3),
        "pipeline_resume_triples_sec": round(pipeline_resume, 3),
        "pipeline_skip_sec": round(pipeline_skip, 3),
        "query_reps_sec": reps_raw,
        "scorer_batch_windows_per_sec": scorer_windows_sec,
        "scorer_batch_windows_per_sec_f32": scorer_windows_sec_f32,
        "scorer_batch_windows_per_sec_f32_post": scorer_windows_sec_f32_post,
        # load canary: the pure-numpy kernel probe doubles as a host-noise
        # detector — hypervisor-neighbor periods have measured 6-10x
        # slowdowns with ZERO local load. The session is BRACKETED
        # (VERDICT r7): one probe before the first measured rep, one after
        # the last; the artifact is suspect if either side is below
        # threshold. The threshold is NOT a hard-coded absolute (ADVICE
        # r6: that misreads an ordinarily slower host as permanently
        # noisy): it is a fraction of the best f32 reading recorded for
        # THIS host in the committed canary history
        # (BENCH/canary_history.jsonl; raw readings + host identity +
        # bracket phase are appended every run). When this flag is true,
        # every wall in this artifact is noise-suspect: read quiet_record
        # instead and re-measure before comparing across rounds.
        "host_noise_suspect": noise_pre or noise_post,
        "host_noise_suspect_pre": noise_pre,
        "host_noise_suspect_post": noise_post,
        # the committed canary-quiet record that is authoritative for
        # cross-round comparison whenever this artifact is noise-flagged
        "quiet_record": _latest_quiet_record(),
        "stream_cold_sec": round(stream_cold, 3),
        "stream_tail_sec": round(stream_tail, 3),
        "stream_noop_sec": round(stream_noop, 3),
        "stream_cold_batches": stats_cold["new_batches"],
        "stream_tail_new_batches": stats_tail["new_batches"],
        "stream_mentions": stats_tail["mentions"],
        # incremental-fold confinement: how many conversations the tail run
        # actually re-derived (new + canonical-changed) vs the corpus — the
        # compute-side evidence; wall-clock at this SF is overhead-bound
        "stream_tail_delta_convs": stats_tail.get("delta_convs"),
        "stream_cold_delta_convs": stats_cold.get("delta_convs"),
        "stream_tail_changed_surfaces": stats_tail.get("changed_surfaces"),
    }
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
