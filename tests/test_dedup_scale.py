"""Scale-shape regression tests for the dedup family (VERDICT r1 items 3-5):

* banded SimHash near-pairs must equal the all-pairs formulation exactly
  (pigeonhole banding is lossless for hamming <= max_hamming);
* LSH-candidate embedding near-dup must equal the all-pairs formulation on
  the driver corpus (measured recall 1.0 with 2 planes x 24 tables — this is
  the "prove recall vs all-pairs" check);
* the plans of both must contain no BroadcastNestedLoopJoin/CartesianProduct
  (also asserted for every scale-critical query by tools/explain_audit.py);
* the ngram-Jaccard document-frequency cap bounds per-shingle join fan-out.

Plus the linked-lineage persist discipline: repeated kg_* composition must
not grow the persisted-RDD set (VERDICT r1 "what's wrong" #5).
"""

import contextlib
import io

import pytest

SF = "/root/testdata/sf0.01"


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def _plan(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_simhash_banding_lossless(spark):
    from runne_contrastive_ner_spark.operators import dedup as dd
    from pyspark.sql import functions as F

    banded = dd.simhash_near_pairs(spark, SF, max_hamming=6)
    # independent all-pairs formulation, inline (the old implementation)
    sig = dd.simhash_values(spark, SF)
    a = sig.select(F.col("doc_id").alias("doc_a"), F.col("simhash").alias("ha"))
    b = sig.select(F.col("doc_id").alias("doc_b"), F.col("simhash").alias("hb"))
    allpairs = (
        a.join(b, F.col("doc_a") < F.col("doc_b"))
        .withColumn("hamming", F.expr("bit_count(ha ^ hb)").cast("bigint"))
        .filter(F.col("hamming") <= 6)
        .select("doc_a", "doc_b", "hamming")
    )
    assert _rows(banded) == _rows(allpairs)
    assert "BroadcastNestedLoopJoin" not in _plan(banded)
    assert "CartesianProduct" not in _plan(banded)


def test_embedding_lsh_recall_is_one_on_driver_corpus(spark):
    from runne_contrastive_ner_spark.operators import dedup as dd

    lsh = dd.embedding_neardup_pairs(spark, SF, threshold=0.3, method="lsh")
    exact = dd.embedding_neardup_pairs(spark, SF, threshold=0.3, method="exact")
    lsh_rows, exact_rows = _rows(lsh), _rows(exact)
    missed = set(exact_rows) - set(lsh_rows)
    assert not missed, f"LSH candidates missed {len(missed)} true pairs"
    assert lsh_rows == exact_rows  # no spurious pairs either (cos re-rank)
    p = _plan(lsh)
    assert "BroadcastNestedLoopJoin" not in p
    assert "CartesianProduct" not in p


def test_ngram_df_cap_bounds_fanout(spark):
    from runne_contrastive_ner_spark.operators import dedup as dd
    from pyspark.sql import functions as F

    # with a tiny cap, every surviving shingle has df <= cap by construction
    sh = dd.doc_shingles(spark, SF)
    rare = (
        sh.groupBy("shingle")
        .agg(F.count(F.lit(1)).alias("df"))
        .filter(F.col("df") <= 2)
    )
    max_df = rare.agg(F.max("df")).collect()[0][0]
    assert max_df <= 2
    # capped query still runs and is a subset-or-equal pair set of uncapped
    capped = _rows(dd.ngram_jaccard_pairs(spark, SF, df_cap=2).select("doc_a", "doc_b"))
    uncapped = _rows(
        dd.ngram_jaccard_pairs(spark, SF, df_cap=10**9).select("doc_a", "doc_b")
    )
    # jaccard values shift under the cap, but no pair appears from nowhere:
    # common(capped) <= common(uncapped), so pairs can only drop out
    assert set(capped) <= set(uncapped) or capped == []


def test_embedding_edges_lsh_matches_allpairs(spark):
    """VERDICT r1 item 10: the optional contrastive-linking edge source is
    LSH-bucketed; property-test edge recall vs the all-pairs form. Surfaces
    and hash embeddings are fully deterministic (md5), so exact set equality
    is a stable assertion."""
    from runne_contrastive_ner_spark.operators.linking import embedding_edges

    surfaces = [(f"surface {i:03d}",) for i in range(240)]
    nodes = spark.createDataFrame(surfaces, "surface_norm string")
    kw = dict(threshold=0.6, dim=16, n_tables=16, n_planes=2)
    lsh = sorted(tuple(r) for r in embedding_edges(nodes, method="lsh", **kw).collect())
    exact = sorted(
        tuple(r) for r in embedding_edges(nodes, method="exact", **kw).collect()
    )
    assert len(exact) > 0  # the threshold actually selects pairs
    assert lsh == exact


@pytest.mark.usefixtures("spark")
def test_linked_lineage_persist_discipline(spark):
    import __spark_entry__ as e

    e.release_linked()
    base = len(spark.sparkContext._jsc.getPersistentRDDs())
    e._linked(spark, "/root/testdata/sf0.001")
    e._linked(spark, "/root/testdata/sf0.001")  # memo hit: no new persists
    after_two = len(spark.sparkContext._jsc.getPersistentRDDs())
    e.release_linked()
    released = len(spark.sparkContext._jsc.getPersistentRDDs())
    assert after_two <= base + 3  # mentions, nodes, linked — once, not twice
    assert released <= base


def test_kmeans_ivf_recall_and_numpy_parity(spark):
    """VERDICT r2 item 5: trained IVF must hit recall@k >= 0.9 vs brute
    force at sf0.1, and the Lloyd iterations (quantized-integer centroid
    sums) must match a numpy re-implementation exactly — the determinism
    contract that makes the DuckDB oracle able to replay training."""
    import numpy as np

    from runne_contrastive_ner_spark.operators import similarity as sim

    sf = "/root/testdata/sf0.1"
    cents = sim.kmeans_centroids(spark, sf)
    got = np.array(
        [list(r.cv) for r in cents.orderBy("cell").collect()], dtype=np.float64
    )

    emb = spark.read.parquet(f"{sf}/embeddings.parquet").orderBy("vec_id").collect()
    V = np.array([list(r.embedding) for r in emb], dtype=np.float64)
    ids = np.array([r.vec_id for r in emb])
    Q, stride, K = sim.KMEANS_Q, sim.CENTROID_STRIDE, sim.N_CELLS
    VQ = np.round(V * Q).astype(np.int64)
    C = np.stack(
        [V[np.where(ids == c * stride)[0][0]] for c in range(K)]
    )
    for _ in range(sim.KMEANS_ITERS):
        d2 = ((V[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
        a = d2.argmin(axis=1)  # ties -> smaller cell, like the struct-min
        newC = C.copy()
        for c in range(K):
            mask = a == c
            if mask.any():
                newC[c] = VQ[mask].sum(axis=0) / (Q * mask.sum())
        C = newC
    assert np.abs(got - C).max() == 0.0

    bf = {
        (r.query_id, r.neighbor_id)
        for r in sim.ann_bruteforce_topk(spark, sf, k=3).collect()
    }
    km = {
        (r.query_id, r.neighbor_id)
        for r in sim.ann_ivf_kmeans_topk(spark, sf, k=3).collect()
    }
    recall = len(bf & km) / len(bf)
    assert recall >= 0.9, f"kmeans-IVF recall@3 {recall} < 0.9"


def test_dedup_clusters_members_are_verified(spark):
    """dd_dedup_clusters end-to-end shape: every member belongs to a
    cluster of size >= 2, exactly one survivor per cluster, and the
    survivor is the minimum doc_id."""
    from runne_contrastive_ner_spark.operators.dedup import dedup_clusters

    rows = dedup_clusters(spark, SF).collect()
    assert rows, "driver corpus plants near-dup pairs; clusters expected"
    by_cluster = {}
    for r in rows:
        by_cluster.setdefault(r.cluster_id, []).append(r)
    for cid, members in by_cluster.items():
        assert len(members) >= 2
        assert all(m.cluster_size == len(members) for m in members)
        survivors = [m for m in members if m.is_survivor]
        assert len(survivors) == 1
        assert survivors[0].doc_id == min(m.doc_id for m in members) == cid
