"""DuckDB oracle SQL for every oracle-checkable query in __spark_entry__.

Each SQL string computes, on DuckDB over the driver-registered parquet views,
exactly what the corresponding Spark operator computes — same column names,
same value semantics (decimal accumulation for money, md5-derived hashing,
identical tie-breaking). The KG oracles derive the transcripts table from
``documents`` with the same arithmetic the engine uses
(sources/transcripts.py) and re-implement mention detection as substring
search + island merging, canonicalization as a recursive-CTE transitive
closure — an independent formulation that must agree with the
tokenize→score→decode→CC pipeline.
"""

from __future__ import annotations

from .functions.hashing import duckdb_md5_int_sql
from .functions.vocab import (
    ENTITY_TYPES,
    EVAL_GOLD_GAZETTEER,
    TEST_ALIASES,
    TEST_GAZETTEER,
)
from .sources.transcripts import DUCKDB_TRANSCRIPTS_SQL

# ---------------------------------------------------------------------------
# relational operators
# ---------------------------------------------------------------------------

RELATIONAL: dict[str, str] = {
    "rel_event_type_freqs": """
        SELECT event_type, count(*)::BIGINT AS freq
        FROM events GROUP BY event_type
        ORDER BY freq DESC, event_type
    """,
    "rel_min_freq_gate": """
        SELECT min(freq)::BIGINT AS min_freq, max(freq)::BIGINT AS max_freq,
               sum(freq)::BIGINT AS total, count(*)::BIGINT AS n_types
        FROM (SELECT count(*) AS freq FROM events GROUP BY event_type)
    """,
    "rel_pricing_summary": """
        SELECT l_returnflag, l_linestatus,
               sum(l_quantity::DECIMAL(18,2))::DOUBLE AS sum_qty,
               sum(l_extendedprice::DECIMAL(18,2))::DOUBLE AS sum_base_price,
               sum((l_extendedprice::DECIMAL(18,2)
                    * (1::DECIMAL(18,2) - l_discount::DECIMAL(18,2)))::DECIMAL(22,4))::DOUBLE
                 AS sum_disc_price,
               round(avg(l_quantity::DECIMAL(18,2)), 4)::DOUBLE AS avg_qty,
               count(*)::BIGINT AS count_order
        FROM lineitem
        WHERE l_shipdate < TIMESTAMP '1998-09-01'
        GROUP BY l_returnflag, l_linestatus
        ORDER BY l_returnflag, l_linestatus
    """,
    "rel_top_orders_per_priority": """
        SELECT o_orderpriority, rank::BIGINT AS rank, o_orderkey::BIGINT AS o_orderkey,
               o_totalprice::DECIMAL(18,2)::DOUBLE AS o_totalprice
        FROM (
          SELECT o_orderpriority, o_orderkey, o_totalprice,
                 row_number() OVER (PARTITION BY o_orderpriority
                                    ORDER BY o_totalprice DESC, o_orderkey) AS rank
          FROM orders
        ) WHERE rank <= 3
    """,
    "rel_stratified_hash_split": """
        SELECT CASE WHEN ('0x' || substr(md5(o_orderkey::VARCHAR), 1, 15))::BIGINT % 100 < 85
                    THEN 'train' ELSE 'val' END AS split,
               c_mktsegment, count(*)::BIGINT AS n
        FROM orders JOIN customer ON o_custkey = c_custkey
        GROUP BY 1, 2 ORDER BY 1, 2
    """,
    "rel_token_array_dedup_sort": """
        SELECT doc_id::BIGINT AS doc_id,
               len(toks)::BIGINT AS n_distinct,
               array_to_string(toks[1:5], ',') AS first5
        FROM (SELECT doc_id, list_sort(list_distinct(string_split(text, ' '))) AS toks
              FROM documents)
    """,
    "rel_symmetric_pair_dedup": """
        SELECT DISTINCT least(a.n_name, b.n_name) AS "left",
               greatest(a.n_name, b.n_name) AS "right",
               a.n_regionkey::BIGINT AS regionkey
        FROM nation a JOIN nation b
          ON a.n_regionkey = b.n_regionkey AND a.n_name <> b.n_name
        ORDER BY 1, 2
    """,
    "rel_seeded_sample_rollup": """
        SELECT o_orderpriority, count(*)::BIGINT AS n,
               sum(o_totalprice::DECIMAL(18,2))::DOUBLE AS sum_price
        FROM (
          SELECT * FROM orders
          ORDER BY ('0x' || substr(md5(o_orderkey::VARCHAR), 1, 15))::BIGINT
          LIMIT 1000
        ) GROUP BY 1 ORDER BY 1
    """,
    "rel_region_order_rollup": """
        SELECT r_name, count(*)::BIGINT AS n_orders,
               sum(o_totalprice::DECIMAL(18,2))::DOUBLE AS sum_price
        FROM orders
        JOIN customer ON o_custkey = c_custkey
        JOIN nation ON c_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        GROUP BY r_name ORDER BY r_name
    """,
    "rel_events_within_hour_pairs": """
        SELECT a.event_type AS type_a, b.event_type AS type_b, count(*)::BIGINT AS n_pairs
        FROM events a JOIN events b
          ON a.user_id = b.user_id
         AND b.ts > a.ts AND b.ts <= a.ts + INTERVAL 1 HOUR
        GROUP BY 1, 2 ORDER BY 1, 2
    """,
    "rel_event_transitions": """
        SELECT prev_type, event_type, count(*)::BIGINT AS n
        FROM (SELECT event_type,
                     lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                       AS prev_type
              FROM events)
        WHERE prev_type IS NOT NULL
        GROUP BY 1, 2 ORDER BY 1, 2
    """,
    "rel_sessionization": """
        WITH marked AS (
          SELECT user_id, ts, event_id,
                 CASE WHEN lag(ts) OVER w IS NULL
                        OR floor(epoch(ts))::BIGINT - floor(epoch(lag(ts) OVER w))::BIGINT > 1800
                      THEN 1 ELSE 0 END AS new_session
          FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        ), numbered AS (
          SELECT *, sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                 AS session_no
          FROM marked
        ), sessions AS (
          SELECT user_id, session_no, count(*) AS n_events,
                 max(floor(epoch(ts))::BIGINT) - min(floor(epoch(ts))::BIGINT) AS span_sec
          FROM numbered GROUP BY user_id, session_no
        )
        SELECT count(*)::BIGINT AS n_sessions,
               round(avg(n_events), 4)::DOUBLE AS avg_events,
               round(avg(span_sec), 4)::DOUBLE AS avg_span_sec,
               max(n_events)::BIGINT AS max_events
        FROM sessions
    """,
}

# ---------------------------------------------------------------------------
# dedup / similarity / text-analysis oracles
# ---------------------------------------------------------------------------

_SHINGLES_CTE = """
toks AS (SELECT doc_id, string_split(text, ' ') AS tk FROM documents),
sh AS (
  SELECT DISTINCT doc_id, shingle
  FROM (SELECT doc_id,
               unnest([array_to_string(tk[i:i+2], ' ') FOR i IN range(1, len(tk) - 1)])
                 AS shingle
        FROM toks)
  WHERE shingle != ''
)
"""

# minhash signature + banding CTEs shared by the LSH-candidate and
# dedup-cluster oracles (universal-hash constants mirrored from
# operators/dedup._minhash_consts — portable-hash contract)
_MINHASH_BAND_CTES = """
        hashed AS (SELECT doc_id, ('0x' || substr(md5(shingle), 1, 8))::BIGINT AS h
                   FROM sh),
        sig AS (
          SELECT doc_id, seed,
                 min(([300573,510655,73578,495690,498781,542380,852897,668282,308840,250277,325232,239434,307330,243405,98058,35422][seed::INT + 1] * h + [356273078,466755145,267672130,546645653,574012503,995538962,179374004,502315376,583196615,559567553,794485247,132977063,964342133,124030894,504111746,517523273][seed::INT + 1])
                     % 1000000007) AS minhash
          FROM hashed, unnest(range(0, 16)) AS s(seed)
          GROUP BY doc_id, seed
        ),
        banded AS (
          SELECT doc_id, seed // 4 AS band,
                 md5((seed // 4)::VARCHAR || ':' ||
                     (min(minhash) FILTER (WHERE seed % 4 = 0))::VARCHAR || ':' ||
                     (min(minhash) FILTER (WHERE seed % 4 = 1))::VARCHAR || ':' ||
                     (min(minhash) FILTER (WHERE seed % 4 = 2))::VARCHAR || ':' ||
                     (min(minhash) FILTER (WHERE seed % 4 = 3))::VARCHAR)
                   AS band_key
          FROM sig GROUP BY doc_id, seed // 4
        )
"""

DEDUP: dict[str, str] = {
    "dd_exact_dup_stats": """
        SELECT count(*)::BIGINT AS n_docs,
               count(DISTINCT md5(text))::BIGINT AS n_unique,
               (count(*) - count(DISTINCT md5(text)))::BIGINT AS n_dup_docs
        FROM documents
    """,
    "dd_ngram_jaccard_pairs": f"""
        WITH {_SHINGLES_CTE},
        rare AS (SELECT shingle FROM sh GROUP BY shingle HAVING count(*) <= 16),
        kept AS (SELECT sh.doc_id, sh.shingle FROM sh JOIN rare USING (shingle)),
        sizes AS (SELECT doc_id, count(*) AS n_sh FROM kept GROUP BY doc_id),
        common AS (
          SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS common
          FROM kept a JOIN kept b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
          GROUP BY 1, 2
        )
        SELECT doc_a::BIGINT AS doc_a, doc_b::BIGINT AS doc_b,
               round(common / (sa.n_sh + sb.n_sh - common), 6)::DOUBLE AS jaccard,
               common::BIGINT AS common
        FROM common
        JOIN sizes sa ON sa.doc_id = doc_a
        JOIN sizes sb ON sb.doc_id = doc_b
        WHERE common / (sa.n_sh + sb.n_sh - common) >= 0.12
    """,
    "dd_minhash_signatures": f"""
        WITH {_SHINGLES_CTE},
        hashed AS (SELECT doc_id, ('0x' || substr(md5(shingle), 1, 8))::BIGINT AS h
                   FROM sh)
        SELECT doc_id::BIGINT AS doc_id, seed::BIGINT AS seed,
               min(([300573,510655,73578,495690,498781,542380,852897,668282,308840,250277,325232,239434,307330,243405,98058,35422][seed::INT + 1] * h + [356273078,466755145,267672130,546645653,574012503,995538962,179374004,502315376,583196615,559567553,794485247,132977063,964342133,124030894,504111746,517523273][seed::INT + 1])
                   % 1000000007) AS minhash
        FROM hashed, unnest(range(0, 16)) AS s(seed)
        GROUP BY doc_id, seed
    """,
    "dd_minhash_lsh_candidates": f"""
        WITH {_SHINGLES_CTE},
        {_MINHASH_BAND_CTES}
        SELECT DISTINCT a.doc_id::BIGINT AS doc_a, b.doc_id::BIGINT AS doc_b
        FROM banded a JOIN banded b
          ON a.band_key = b.band_key AND a.doc_id < b.doc_id
    """,
    # LSH candidates -> exact-Jaccard verify (candidates only) -> recursive
    # transitive closure -> survivor = min doc id. Mirrors the engine's
    # dedup_clusters composition with an independent closure formulation.
    "dd_dedup_clusters": f"""
        WITH RECURSIVE {_SHINGLES_CTE},
        {_MINHASH_BAND_CTES},
        cands AS (
          SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
          FROM banded a JOIN banded b
            ON a.band_key = b.band_key AND a.doc_id < b.doc_id
        ),
        sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
        common AS (
          SELECT c.doc_a, c.doc_b, count(*) AS cmn
          FROM cands c
          JOIN sh sa ON sa.doc_id = c.doc_a
          JOIN sh sb ON sb.doc_id = c.doc_b AND sb.shingle = sa.shingle
          GROUP BY c.doc_a, c.doc_b
        ),
        verified AS (
          SELECT co.doc_a, co.doc_b
          FROM common co
          JOIN sizes za ON za.doc_id = co.doc_a
          JOIN sizes zb ON zb.doc_id = co.doc_b
          WHERE co.cmn * 1.0 / (za.n + zb.n - co.cmn) >= 0.9
        ),
        vedges AS (SELECT doc_a AS src, doc_b AS dst FROM verified
                   UNION SELECT doc_b, doc_a FROM verified),
        reach AS (
          SELECT src AS node, dst AS r FROM vedges
          UNION
          SELECT e2.src, r.r FROM vedges e2 JOIN reach r ON r.node = e2.dst
        ),
        canon AS (SELECT node, least(min(r), node) AS cluster_id
                  FROM reach GROUP BY node),
        csz AS (SELECT cluster_id, count(*)::BIGINT AS cluster_size
                FROM canon GROUP BY cluster_id)
        SELECT c.node::BIGINT AS doc_id, c.cluster_id::BIGINT AS cluster_id,
               z.cluster_size, (c.node = c.cluster_id) AS is_survivor
        FROM canon c JOIN csz z USING (cluster_id)
    """,
    "dd_simhash_values": """
        WITH tok AS (
          SELECT doc_id, tok, count(*) AS cnt
          FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents)
          WHERE tok != '' GROUP BY doc_id, tok
        ),
        hashed AS (SELECT *, ('0x' || substr(md5(tok), 1, 8))::BIGINT AS h FROM tok),
        bits AS (
          SELECT doc_id, b,
                 sum((2 * ((floor(h / power(2, b))::BIGINT) % 2) - 1) * cnt) AS v
          FROM hashed, unnest(range(0, 32)) AS u(b)
          GROUP BY doc_id, b
        )
        SELECT doc_id::BIGINT AS doc_id,
               sum(CASE WHEN v >= 0 THEN power(2, b)::BIGINT ELSE 0 END)::BIGINT AS simhash
        FROM bits GROUP BY doc_id
    """,
    "dd_simhash_near_pairs": """
        WITH tok AS (
          SELECT doc_id, tok, count(*) AS cnt
          FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents)
          WHERE tok != '' GROUP BY doc_id, tok
        ),
        hashed AS (SELECT *, ('0x' || substr(md5(tok), 1, 8))::BIGINT AS h FROM tok),
        bits AS (
          SELECT doc_id, b,
                 sum((2 * ((floor(h / power(2, b))::BIGINT) % 2) - 1) * cnt) AS v
          FROM hashed, unnest(range(0, 32)) AS u(b)
          GROUP BY doc_id, b
        ),
        sig AS (
          SELECT doc_id,
                 sum(CASE WHEN v >= 0 THEN power(2, b)::BIGINT ELSE 0 END)::BIGINT
                   AS simhash
          FROM bits GROUP BY doc_id
        )
        SELECT a.doc_id::BIGINT AS doc_a, b.doc_id::BIGINT AS doc_b,
               bit_count(xor(a.simhash, b.simhash))::BIGINT AS hamming
        FROM sig a JOIN sig b ON a.doc_id < b.doc_id
        WHERE bit_count(xor(a.simhash, b.simhash)) <= 6
    """,
    "dd_embedding_neardup_pairs": """
        WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
        pairs AS (
          SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
                 list_sum([a.v[d] * b.v[d] FOR d IN range(1, 65)])
                 / (sqrt(list_sum([a.v[d] * a.v[d] FOR d IN range(1, 65)]))
                    * sqrt(list_sum([b.v[d] * b.v[d] FOR d IN range(1, 65)]))) AS cos
          FROM e a JOIN e b ON a.vec_id < b.vec_id
        )
        SELECT vec_a::BIGINT AS vec_a, vec_b::BIGINT AS vec_b,
               round(cos, 6)::DOUBLE AS cos
        FROM pairs WHERE cos >= 0.3
    """,
}

_DUCK_COS = (
    "list_sum([a.va[d] * b.vb[d] FOR d IN range(1, 65)])"
    " / (sqrt(list_sum([a.va[d] * a.va[d] FOR d IN range(1, 65)]))"
    " * sqrt(list_sum([b.vb[d] * b.vb[d] FOR d IN range(1, 65)])))"
)

_DUCK_PLANE = (
    "((('0x' || substr(md5('p' || p || 'd' || (d - 1)), 1, 15))::BIGINT % 2001) - 1000)"
    " / 1000.0"
)

SIMILARITY: dict[str, str] = {
    "sim_ann_bruteforce_topk": f"""
        WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
        scored AS (
          SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
                 {_DUCK_COS.replace('a.va', 'a.v').replace('b.vb', 'b.v')} AS cos_raw
          FROM e a JOIN e b ON a.vec_id < 10 AND a.vec_id <> b.vec_id
        ),
        ranked AS (
          SELECT *, row_number() OVER (PARTITION BY query_id
                                       ORDER BY cos_raw DESC, neighbor_id) AS rank
          FROM scored
        )
        SELECT query_id::BIGINT AS query_id, rank::BIGINT AS rank,
               neighbor_id::BIGINT AS neighbor_id, round(cos_raw, 6)::DOUBLE AS cos
        FROM ranked WHERE rank <= 5
    """,
    "sim_lsh_buckets": f"""
        WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings)
        SELECT vec_id::BIGINT AS vec_id,
               list_sum([
                 CASE WHEN list_sum([v[d] * ({_DUCK_PLANE}) FOR d IN range(1, 65)]) >= 0
                      THEN power(2, p)::BIGINT ELSE 0 END
                 FOR p IN range(0, 6)])::BIGINT AS bucket
        FROM e
    """,
    "sim_ann_ivf_topk": """
        WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
        cents AS (
          SELECT (vec_id // 13)::INT AS cell, v AS cv FROM e
          WHERE vec_id % 13 = 0 AND vec_id < 13 * 8
        ),
        assign AS (
          SELECT vec_id, cell FROM (
            SELECT e.vec_id, c.cell,
                   row_number() OVER (PARTITION BY e.vec_id
                     ORDER BY list_sum([(e.v[d] - c.cv[d]) * (e.v[d] - c.cv[d]) FOR d IN range(1, 65)]), c.cell) AS rn
            FROM e CROSS JOIN cents c
          ) WHERE rn = 1
        ),
        probes AS (
          SELECT query_id, va, cell FROM (
            SELECT e.vec_id AS query_id, e.v AS va, c.cell,
                   row_number() OVER (PARTITION BY e.vec_id
                     ORDER BY list_sum([(e.v[d] - c.cv[d]) * (e.v[d] - c.cv[d]) FOR d IN range(1, 65)]), c.cell) AS prn
            FROM e CROSS JOIN cents c
            WHERE e.vec_id < 10
          ) WHERE prn <= 2
        ),
        scored AS (
          SELECT p.query_id, a.vec_id AS neighbor_id,
                 list_sum([p.va[d] * e2.v[d] FOR d IN range(1, 65)]) / (sqrt(list_sum([p.va[d] * p.va[d] FOR d IN range(1, 65)])) * sqrt(list_sum([e2.v[d] * e2.v[d] FOR d IN range(1, 65)]))) AS cos_raw
          FROM probes p
          JOIN assign a ON a.cell = p.cell
          JOIN e e2 ON e2.vec_id = a.vec_id
          WHERE a.vec_id <> p.query_id
        ),
        ranked AS (
          SELECT *, row_number() OVER (PARTITION BY query_id
                                       ORDER BY cos_raw DESC, neighbor_id) AS rank
          FROM scored
        )
        SELECT query_id::BIGINT AS query_id, rank::BIGINT AS rank,
               neighbor_id::BIGINT AS neighbor_id, round(cos_raw, 6)::DOUBLE AS cos
        FROM ranked WHERE rank <= 3
    """,
    # full Lloyd replay (2 unrolled iterations): assignment = argmin over
    # current centroids, update = per-dim quantized-integer mean (mirrors
    # the engine's determinism contract: round(v*1e6) BIGINT sums are
    # order-independent, so both systems derive identical centroids), then
    # the standard IVF probe/assign/re-rank over the trained cells.
    "sim_ann_ivf_kmeans_topk": """
        WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
        vq AS (SELECT vec_id,
                      [CAST(round(v[d] * 1000000) AS BIGINT) FOR d IN range(1, 65)] AS q
               FROM e),
        c0 AS (
          SELECT (vec_id // 13)::INT AS cell, v AS cv FROM e
          WHERE vec_id % 13 = 0 AND vec_id < 13 * 8
        ),
        a1 AS (
          SELECT vec_id, cell FROM (
            SELECT t.vec_id, c.cell,
                   row_number() OVER (PARTITION BY t.vec_id
                     ORDER BY list_sum([(t.v[d] - c.cv[d]) * (t.v[d] - c.cv[d]) FOR d IN range(1, 65)]), c.cell) AS rn
            FROM e t CROSS JOIN c0 c
          ) WHERE rn = 1
        ),
        u1 AS (
          SELECT a.cell, t.d, sum(q.q[t.d])::BIGINT AS s, count(*)::BIGINT AS n
          FROM a1 a JOIN vq q USING (vec_id), unnest(range(1, 65)) AS t(d)
          GROUP BY a.cell, t.d
        ),
        u1c AS (SELECT cell, list(s / (1000000 * n) ORDER BY d) AS cv
                FROM u1 GROUP BY cell),
        c1 AS (SELECT c0.cell, coalesce(u.cv, c0.cv) AS cv
               FROM c0 LEFT JOIN u1c u USING (cell)),
        a2 AS (
          SELECT vec_id, cell FROM (
            SELECT t.vec_id, c.cell,
                   row_number() OVER (PARTITION BY t.vec_id
                     ORDER BY list_sum([(t.v[d] - c.cv[d]) * (t.v[d] - c.cv[d]) FOR d IN range(1, 65)]), c.cell) AS rn
            FROM e t CROSS JOIN c1 c
          ) WHERE rn = 1
        ),
        u2 AS (
          SELECT a.cell, t.d, sum(q.q[t.d])::BIGINT AS s, count(*)::BIGINT AS n
          FROM a2 a JOIN vq q USING (vec_id), unnest(range(1, 65)) AS t(d)
          GROUP BY a.cell, t.d
        ),
        u2c AS (SELECT cell, list(s / (1000000 * n) ORDER BY d) AS cv
                FROM u2 GROUP BY cell),
        c2 AS (SELECT c1.cell, coalesce(u.cv, c1.cv) AS cv
               FROM c1 LEFT JOIN u2c u USING (cell)),
        assign AS (
          SELECT vec_id, cell FROM (
            SELECT t.vec_id, c.cell,
                   row_number() OVER (PARTITION BY t.vec_id
                     ORDER BY list_sum([(t.v[d] - c.cv[d]) * (t.v[d] - c.cv[d]) FOR d IN range(1, 65)]), c.cell) AS rn
            FROM e t CROSS JOIN c2 c
          ) WHERE rn = 1
        ),
        probes AS (
          SELECT query_id, va, cell FROM (
            SELECT e.vec_id AS query_id, e.v AS va, c.cell,
                   row_number() OVER (PARTITION BY e.vec_id
                     ORDER BY list_sum([(e.v[d] - c.cv[d]) * (e.v[d] - c.cv[d]) FOR d IN range(1, 65)]), c.cell) AS prn
            FROM e CROSS JOIN c2 c
            WHERE e.vec_id < 10
          ) WHERE prn <= 4
        ),
        scored AS (
          SELECT p.query_id, a.vec_id AS neighbor_id,
                 list_sum([p.va[d] * e2.v[d] FOR d IN range(1, 65)]) / (sqrt(list_sum([p.va[d] * p.va[d] FOR d IN range(1, 65)])) * sqrt(list_sum([e2.v[d] * e2.v[d] FOR d IN range(1, 65)]))) AS cos_raw
          FROM probes p
          JOIN assign a ON a.cell = p.cell
          JOIN e e2 ON e2.vec_id = a.vec_id
          WHERE a.vec_id <> p.query_id
        ),
        ranked AS (
          SELECT *, row_number() OVER (PARTITION BY query_id
                                       ORDER BY cos_raw DESC, neighbor_id) AS rank
          FROM scored
        )
        SELECT query_id::BIGINT AS query_id, rank::BIGINT AS rank,
               neighbor_id::BIGINT AS neighbor_id, round(cos_raw, 6)::DOUBLE AS cos
        FROM ranked WHERE rank <= 3
    """,
    "sim_ann_lsh_topk": f"""
        WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
        eb AS (
          SELECT vec_id, v,
                 list_sum([
                   CASE WHEN list_sum([v[d] * ({_DUCK_PLANE}) FOR d IN range(1, 65)]) >= 0
                        THEN power(2, p)::BIGINT ELSE 0 END
                   FOR p IN range(0, 6)])::BIGINT AS bucket
          FROM e
        ),
        scored AS (
          SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
                 list_sum([a.v[d] * b.v[d] FOR d IN range(1, 65)])
                 / (sqrt(list_sum([a.v[d] * a.v[d] FOR d IN range(1, 65)]))
                    * sqrt(list_sum([b.v[d] * b.v[d] FOR d IN range(1, 65)]))) AS cos_raw
          FROM eb a JOIN eb b ON a.bucket = b.bucket
          WHERE a.vec_id < 10 AND a.vec_id <> b.vec_id
        ),
        ranked AS (
          SELECT *, row_number() OVER (PARTITION BY query_id
                                       ORDER BY cos_raw DESC, neighbor_id) AS rank
          FROM scored
        )
        SELECT query_id::BIGINT AS query_id, rank::BIGINT AS rank,
               neighbor_id::BIGINT AS neighbor_id, round(cos_raw, 6)::DOUBLE AS cos
        FROM ranked WHERE rank <= 3
    """,
}

TEXTSTATS: dict[str, str] = {
    "ts_lang_id": """
        WITH t AS (SELECT doc_id,
                          list_filter(string_split(text, ' '), x -> x != '') AS toks
                   FROM documents),
        s AS (SELECT doc_id, len(toks) AS n_toks,
                     len(list_filter(toks, x -> x IN ('the', 'a'))) AS n_stop
              FROM t),
        r AS (SELECT doc_id,
                     CASE WHEN n_toks > 0 THEN n_stop / n_toks ELSE 0.0 END AS sr
              FROM s)
        SELECT doc_id::BIGINT AS doc_id, round(sr, 6)::DOUBLE AS stop_ratio,
               CASE WHEN sr >= 0.05 THEN 'en' ELSE 'und' END AS pred_lang
        FROM r
    """,
    "ts_quality_scores": """
        WITH t AS (SELECT doc_id,
                          list_filter(string_split(text, ' '), x -> x != '') AS toks
                   FROM documents),
        g AS (SELECT doc_id, toks,
                     list_transform(range(1, len(toks)),
                                    i -> toks[i] || ' ' || toks[i + 1]) AS g2,
                     list_transform(range(1, len(toks) - 1),
                                    i -> toks[i] || ' ' || toks[i + 1]
                                            || ' ' || toks[i + 2]) AS g3
              FROM t),
        s AS (SELECT doc_id, len(toks) AS n_toks,
                     len(list_distinct(toks)) AS n_distinct,
                     len(list_filter(toks, x -> x IN ('the', 'a'))) AS n_stop,
                     len(g2) AS n_bigrams,
                     coalesce(list_max(list_transform(list_distinct(g2),
                         x -> len(list_filter(g2, y -> y = x)))), 0) AS top_bigram_n,
                     len(g3) - len(list_distinct(g3)) AS dup_trigram_n,
                     len(g3) AS n_trigrams
              FROM g)
        SELECT doc_id::BIGINT AS doc_id, n_toks::BIGINT AS n_toks,
               n_distinct::BIGINT AS n_distinct, n_stop::BIGINT AS n_stop,
               top_bigram_n::BIGINT AS top_bigram_n,
               dup_trigram_n::BIGINT AS dup_trigram_n,
               (CASE WHEN n_bigrams > 0
                     THEN round(top_bigram_n / n_bigrams, 6)
                     ELSE 0.0 END)::DOUBLE AS top_bigram_frac,
               (CASE WHEN n_trigrams > 0
                     THEN round(dup_trigram_n / n_trigrams, 6)
                     ELSE 0.0 END)::DOUBLE AS dup_trigram_frac,
               round(0.4 * least(1.0, n_toks / 100.0)
                     + 0.3 * (n_distinct / greatest(n_toks, 1))
                     + 0.3 * (1 - n_stop / greatest(n_toks, 1)), 6)::DOUBLE AS quality
        FROM s
    """,
    "ts_decontamination": """
        WITH t AS (SELECT CAST(doc_id AS BIGINT) AS doc_id,
                          list_filter(string_split(text, ' '), x -> x != '') AS toks
                   FROM documents),
        g AS (SELECT doc_id,
                     list_distinct(list_transform(range(1, len(toks) - 2),
                         i -> array_to_string(toks[i:i+3], ' '))) AS grams
              FROM t),
        bench AS (SELECT DISTINCT unnest(grams) AS gram FROM g
                  WHERE doc_id % 97 = 0),
        corp AS (SELECT doc_id, unnest(grams) AS gram FROM g
                 WHERE doc_id % 97 != 0)
        SELECT doc_id, count(*)::BIGINT AS n_shared_ngrams
        FROM corp JOIN bench USING (gram)
        GROUP BY doc_id
    """,
    "ts_token_stats_by_source": """
        SELECT source, count(*)::BIGINT AS total_tokens,
               count(DISTINCT tok)::BIGINT AS distinct_tokens,
               count(DISTINCT doc_id)::BIGINT AS n_docs
        FROM (SELECT source, doc_id, unnest(string_split(text, ' ')) AS tok
              FROM documents)
        WHERE tok != ''
        GROUP BY source ORDER BY source
    """,
    "ts_bpe_token_counts": """
        SELECT doc_id::BIGINT AS doc_id,
               len(regexp_extract_all(text, '[a-z0-9]+|[^a-z0-9 ]'))::BIGINT
                 AS n_bpe_tokens,
               len(list_filter(string_split(text, ' '), t -> t != ''))::BIGINT
                 AS n_ws_tokens
        FROM documents
    """,
    "ts_pii_scrub_stats": """
        SELECT doc_id::BIGINT AS doc_id,
               len(regexp_extract_all(text,
                   '[a-z0-9._%+-]+@[a-z0-9.-]+[.][a-z]{2,}'))::BIGINT AS n_email,
               len(regexp_extract_all(text, 'https?://[^ ]+'))::BIGINT AS n_url,
               len(regexp_extract_all(text,
                   '[0-9]{3}-[0-9]{3,4}-[0-9]{4}'))::BIGINT AS n_phone,
               length(text)::BIGINT AS orig_len,
               length(regexp_replace(regexp_replace(regexp_replace(text,
                   '[a-z0-9._%+-]+@[a-z0-9.-]+[.][a-z]{2,}', '<email>', 'g'),
                   'https?://[^ ]+', '<url>', 'g'),
                   '[0-9]{3}-[0-9]{3,4}-[0-9]{4}', '<phone>', 'g'))::BIGINT
                 AS scrubbed_len
        FROM documents
    """,
    "ts_chunk_windows": """
        WITH t AS (SELECT doc_id,
                          list_filter(string_split(text, ' '), x -> x != '') AS toks
                   FROM documents),
        w AS (
          SELECT doc_id, toks,
                 unnest(range(0, greatest(ceil((len(toks) - 32) / 24.0)::BIGINT, 0) + 1))
                   AS w
          FROM t WHERE len(toks) > 0
        )
        SELECT doc_id::BIGINT AS doc_id, w::BIGINT AS window_idx,
               len(toks[w * 24 + 1 : w * 24 + 32])::BIGINT AS n_tokens,
               array_to_string(toks[w * 24 + 1 : w * 24 + 32], ' ') AS chunk_text
        FROM w
    """,
    "ts_doc_fingerprints": """
        SELECT doc_id::BIGINT AS doc_id,
               list_reduce(
                 list_prepend(0::BIGINT,
                   [ascii(substr(text, i, 1))::BIGINT
                    FOR i IN range(1, least(length(text), 64) + 1)]),
                 (a, b) -> (a * 31 + b) % 1000000007)::BIGINT AS fingerprint
        FROM documents
    """,
}


def _wordpiece_oracle() -> str:
    """Independent replay of greedy longest-match-first WordPiece as a
    recursive CTE: at each position, a LATERAL picks the longest vocab piece
    matching the remaining suffix (continuations gated on pos>1); words whose
    walk stalls before the end collapse to [UNK]. The mini vocab itself is a
    MIRRORED constant (imported from operators.textstats, like the minhash
    universal-hash constants) — the greedy-walk structure is independent."""
    from .operators.textstats import WORDPIECE_MINI_VOCAB

    vals = ", ".join(f"('{t}')" for t in WORDPIECE_MINI_VOCAB)
    return f"""
WITH RECURSIVE
vocab(tok, core, is_cont) AS (
  SELECT tok,
         CASE WHEN tok LIKE '##%' THEN substr(tok, 3) ELSE tok END,
         tok LIKE '##%'
  FROM (VALUES {vals}) v(tok)
),
dw AS (
  SELECT DISTINCT word
  FROM (SELECT unnest(list_filter(string_split(text, ' '), x -> x != ''))
          AS word FROM documents)
),
walk(word, pos, idx, piece) AS (
  SELECT word, 1, 0, CAST(NULL AS VARCHAR) FROM dw
  UNION ALL
  SELECT w.word, w.pos + length(m.core), w.idx + 1, m.tok
  FROM walk w,
  LATERAL (
    SELECT v.tok, v.core FROM vocab v
    WHERE v.is_cont = (w.pos > 1)
      AND substr(w.word, w.pos, length(v.core)) = v.core
    ORDER BY length(v.core) DESC, v.tok
    LIMIT 1
  ) m
  WHERE w.pos <= length(w.word)
),
perword AS (
  SELECT word, string_agg(piece, ' ' ORDER BY idx) AS ps,
         max(pos) AS maxpos, count(*)::BIGINT AS np
  FROM walk WHERE idx > 0 GROUP BY word
),
seg AS (
  -- the length-cap rule mirrors the engine's MAX_CHARS_PER_TOKEN=100:
  -- over-long words are [UNK] regardless of whether the walk completes
  SELECT d.word,
         CASE WHEN length(d.word) <= 100 AND p.maxpos = length(d.word) + 1
              THEN p.ps ELSE '[UNK]' END AS word_pieces,
         CASE WHEN length(d.word) <= 100 AND p.maxpos = length(d.word) + 1
              THEN p.np ELSE 1::BIGINT END AS word_n_pieces,
         CASE WHEN length(d.word) <= 100 AND p.maxpos = length(d.word) + 1
              THEN 0 ELSE 1 END AS word_is_unk
  FROM dw d LEFT JOIN perword p USING (word)
),
docwords AS (
  SELECT doc_id, i - 1 AS pos, ws[i] AS word
  FROM (SELECT doc_id, list_filter(string_split(text, ' '), x -> x != '')
          AS ws FROM documents) t,
  unnest(range(1, len(ws) + 1)) AS r(i)
)
SELECT dwx.doc_id::BIGINT AS doc_id,
       count(*)::BIGINT AS n_words,
       sum(s.word_n_pieces)::BIGINT AS n_pieces,
       sum(s.word_is_unk)::BIGINT AS n_unk_words,
       string_agg(s.word_pieces, ' ' ORDER BY dwx.pos) AS pieces_str
FROM docwords dwx JOIN seg s USING (word)
GROUP BY dwx.doc_id
"""


TEXTSTATS["ts_wordpiece_segments"] = _wordpiece_oracle()

# two-level packing (VERDICT r3): bucket = md5_int(doc_id) % 8, local
# exclusive running sum within (source, bucket), plus a per-bucket
# token-total prefix offset in bucket order within the source
TEXTSTATS["ts_shard_packing"] = f"""
    WITH t AS (SELECT doc_id, source,
                      len(list_filter(string_split(text, ' '), x -> x != ''))
                        AS n_tokens,
                      {duckdb_md5_int_sql("doc_id::VARCHAR")} % 8 AS bucket
               FROM documents),
    loc AS (
      SELECT *, coalesce(sum(n_tokens) OVER (
                   PARTITION BY source, bucket ORDER BY doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS local_before
      FROM t
    ),
    tot AS (SELECT source, bucket, sum(n_tokens) AS bucket_total
            FROM t GROUP BY source, bucket),
    offs AS (
      SELECT source, bucket, coalesce(sum(bucket_total) OVER (
                 PARTITION BY source ORDER BY bucket
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS bucket_offset
      FROM tot
    )
    SELECT l.doc_id::BIGINT AS doc_id, l.source,
           l.n_tokens::BIGINT AS n_tokens,
           floor((o.bucket_offset + l.local_before) / 256)::BIGINT AS shard_idx
    FROM loc l JOIN offs o ON o.source = l.source AND o.bucket = l.bucket
"""

# quality gate AND language gate AND near-dup-survivor gate (full verified
# cluster chain reused; losers excluded with an anti-join)
# temperature-weighted source mixing (alpha = 0.5): integer-quantized
# sqrt weights, integer thresholds, md5 membership — mirrors
# textstats.source_mixture arithmetic step for step
TEXTSTATS["ts_source_mixture"] = f"""
    WITH d AS (
      SELECT doc_id::BIGINT AS doc_id, source,
             len(list_filter(string_split(text, ' '), x -> x != ''))::BIGINT
               AS n_tokens
      FROM documents
    ),
    per_source AS (
      SELECT source, count(*)::BIGINT AS n_docs,
             sum(n_tokens)::BIGINT AS total_tokens,
             floor(sqrt(sum(n_tokens)::DOUBLE) * 1000)::BIGINT AS q
      FROM d GROUP BY source
    ),
    dn AS (SELECT sum(q)::BIGINT AS denom FROM per_source),
    th AS (
      SELECT p.*, least(1000000, 4000 * p.q * 1000000 // (dn.denom * p.total_tokens))::BIGINT AS keep_ppm,
             (p.q * 1000000 // dn.denom)::BIGINT AS weight_ppm
      FROM per_source p CROSS JOIN dn
    ),
    sampled AS (
      SELECT d.source, count(*)::BIGINT AS sampled_docs,
             sum(d.n_tokens)::BIGINT AS sampled_tokens
      FROM d JOIN th ON th.source = d.source
      WHERE {duckdb_md5_int_sql("d.doc_id::VARCHAR")} % 1000000 < th.keep_ppm
      GROUP BY d.source
    )
    SELECT t.source, t.n_docs, t.total_tokens, t.weight_ppm, t.keep_ppm,
           coalesce(s.sampled_docs, 0)::BIGINT AS sampled_docs,
           coalesce(s.sampled_tokens, 0)::BIGINT AS sampled_tokens
    FROM th t LEFT JOIN sampled s ON s.source = t.source
"""

# exact nearest-rank quantiles over the aggregated value domain —
# mirrors textstats.token_quantiles (cum * 1e6 >= n * ppm pick rule)
TEXTSTATS["ts_token_quantiles"] = """
    WITH d AS (
      SELECT source,
             len(list_filter(string_split(text, ' '), x -> x != ''))::BIGINT
               AS n_tokens
      FROM documents
    ),
    dom AS (SELECT source, n_tokens, count(*)::BIGINT AS c
            FROM d GROUP BY source, n_tokens),
    ranked AS (
      SELECT source, n_tokens, c,
             sum(c) OVER (PARTITION BY source ORDER BY n_tokens)::BIGINT AS cum,
             sum(c) OVER (PARTITION BY source)::BIGINT AS n
      FROM dom
    )
    SELECT source, max(n)::BIGINT AS n_docs_total,
           min(CASE WHEN cum * 1000000 >= n * 250000 THEN n_tokens END)::BIGINT AS p25,
           min(CASE WHEN cum * 1000000 >= n * 500000 THEN n_tokens END)::BIGINT AS p50,
           min(CASE WHEN cum * 1000000 >= n * 750000 THEN n_tokens END)::BIGINT AS p75,
           min(CASE WHEN cum * 1000000 >= n * 900000 THEN n_tokens END)::BIGINT AS p90,
           min(CASE WHEN cum * 1000000 >= n * 990000 THEN n_tokens END)::BIGINT AS p99
    FROM ranked GROUP BY source
"""

TEXTSTATS["ts_corpus_selection"] = f"""
    WITH RECURSIVE {_SHINGLES_CTE},
    {_MINHASH_BAND_CTES},
    cands AS (
      SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM banded a JOIN banded b
        ON a.band_key = b.band_key AND a.doc_id < b.doc_id
    ),
    sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
    common AS (
      SELECT c.doc_a, c.doc_b, count(*) AS cmn
      FROM cands c
      JOIN sh sa ON sa.doc_id = c.doc_a
      JOIN sh sb ON sb.doc_id = c.doc_b AND sb.shingle = sa.shingle
      GROUP BY c.doc_a, c.doc_b
    ),
    verified AS (
      SELECT co.doc_a, co.doc_b
      FROM common co
      JOIN sizes za ON za.doc_id = co.doc_a
      JOIN sizes zb ON zb.doc_id = co.doc_b
      WHERE co.cmn * 1.0 / (za.n + zb.n - co.cmn) >= 0.9
    ),
    vedges AS (SELECT doc_a AS src, doc_b AS dst FROM verified
               UNION SELECT doc_b, doc_a FROM verified),
    reach AS (
      SELECT src AS node, dst AS r FROM vedges
      UNION
      SELECT e2.src, r.r FROM vedges e2 JOIN reach r ON r.node = e2.dst
    ),
    canon AS (SELECT node, least(min(r), node) AS cluster_id
              FROM reach GROUP BY node),
    losers AS (SELECT node AS doc_id FROM canon WHERE node != cluster_id),
    qt AS (SELECT doc_id,
                  list_filter(string_split(text, ' '), x -> x != '') AS toks
           FROM documents),
    qg AS (SELECT doc_id, toks,
                  list_transform(range(1, len(toks)),
                                 i -> toks[i] || ' ' || toks[i + 1]) AS g2,
                  list_transform(range(1, len(toks) - 1),
                                 i -> toks[i] || ' ' || toks[i + 1]
                                         || ' ' || toks[i + 2]) AS g3
           FROM qt),
    qs AS (SELECT doc_id, len(toks) AS n_toks,
                  len(list_distinct(toks)) AS n_distinct,
                  len(list_filter(toks, x -> x IN ('the', 'a'))) AS n_stop,
                  len(g2) AS n_bigrams,
                  coalesce(list_max(list_transform(list_distinct(g2),
                      x -> len(list_filter(g2, y -> y = x)))), 0) AS top_bigram_n,
                  len(g3) - len(list_distinct(g3)) AS dup_trigram_n,
                  len(g3) AS n_trigrams
           FROM qg),
    scored AS (
      SELECT doc_id,
             round(0.4 * least(1.0, n_toks / 100.0)
                   + 0.3 * (n_distinct / greatest(n_toks, 1))
                   + 0.3 * (1 - n_stop / greatest(n_toks, 1)), 6)::DOUBLE
               AS quality,
             (CASE WHEN n_bigrams > 0
                   THEN round(top_bigram_n / n_bigrams, 6)
                   ELSE 0.0 END)::DOUBLE AS top_bigram_frac,
             (CASE WHEN n_trigrams > 0
                   THEN round(dup_trigram_n / n_trigrams, 6)
                   ELSE 0.0 END)::DOUBLE AS dup_trigram_frac,
             CASE WHEN n_toks > 0 AND
                       n_stop * 1.0 / n_toks >= 0.05
                  THEN 'en' ELSE 'und' END AS pred_lang
      FROM qs
    )
    SELECT s.doc_id::BIGINT AS doc_id, s.quality
    FROM scored s
    WHERE s.pred_lang = 'en' AND s.quality >= 0.62
      AND s.top_bigram_frac <= 0.20 AND s.dup_trigram_frac <= 0.18
      AND s.doc_id NOT IN (SELECT doc_id FROM losers)
"""

# ---------------------------------------------------------------------------
# KG pipeline oracles (independent SQL formulation of stages 1, 3/4, 2/5)
# ---------------------------------------------------------------------------


def _terms_values(gazetteer: dict[str, str] | None = None) -> str:
    gazetteer = TEST_GAZETTEER if gazetteer is None else gazetteer
    return ", ".join(
        f"('{surface}', '{etype}')" for surface, etype in sorted(gazetteer.items())
    )


def _alias_values() -> str:
    return ", ".join(f"('{a}', '{b}')" for a, b in TEST_ALIASES)


def mention_ctes(prefix: str, gazetteer: dict[str, str] | None = None) -> str:
    """Standalone mention CTE chain (no WITH keyword) with prefixed names,
    so two gazetteers' mention sets can coexist in one query (the A5
    evaluation oracle)."""
    return f"""
{prefix}terms(term, type) AS (VALUES {_terms_values(gazetteer)}),
{prefix}raw_matches AS (
  SELECT t.conv_id, t.turn_idx, g.type, u.i - 1 AS m_start,
         u.i - 1 + length(g.term) AS m_end, t.text
  FROM transcripts t
  CROSS JOIN {prefix}terms g,
  UNNEST(range(1, length(t.text) - length(g.term) + 2)) AS u(i)
  WHERE substr(lower(t.text), u.i, length(g.term)) = g.term
    AND (u.i = 1 OR NOT regexp_matches(substr(lower(t.text), u.i - 1, 1), '[a-z0-9]'))
    AND (u.i + length(g.term) > length(t.text)
         OR NOT regexp_matches(substr(lower(t.text), u.i + length(g.term), 1), '[a-z0-9]'))
),
{prefix}flagged AS (
  -- island merge mirrors the engine sentenizer's CONDITIONAL newline rule
  -- (reference tokenization.py:304-354): a whitespace gap merges unless it
  -- contains a newline/CR AND the next match starts title-case (matched
  -- surfaces never end in ?/!/., so that branch of the block rule is moot)
  SELECT *, CASE WHEN lag(m_end) OVER w IS NULL THEN 1
                 WHEN regexp_matches(substr(text, lag(m_end) OVER w + 1,
                                             m_start - lag(m_end) OVER w),
                                     '^[[:space:]]*$')
                      AND NOT ((contains(substr(text, lag(m_end) OVER w + 1,
                                                m_start - lag(m_end) OVER w),
                                         chr(10))
                                OR contains(substr(text, lag(m_end) OVER w + 1,
                                                   m_start - lag(m_end) OVER w),
                                            chr(13)))
                               AND regexp_matches(substr(text, m_start + 1, 1),
                                                  '[A-Z]')) THEN 0
                 ELSE 1 END AS new_island
  FROM {prefix}raw_matches
  WINDOW w AS (PARTITION BY conv_id, turn_idx, type ORDER BY m_start)
),
{prefix}islands AS (
  SELECT *, sum(new_island) OVER (PARTITION BY conv_id, turn_idx, type
                                  ORDER BY m_start) AS island
  FROM {prefix}flagged
),
{prefix}mentions AS (
  SELECT conv_id, turn_idx, type,
         min(m_start)::INTEGER AS start, max(m_end)::INTEGER AS "end"
  FROM {prefix}islands
  GROUP BY conv_id, turn_idx, type, island
)
""".strip()


def kg_common_ctes() -> str:
    """Shared CTE chain: derived transcripts → word-boundary substring
    matches → island-merged mentions (the SQL mirror of the reference's
    adjacent-same-type span merging) → surfaces → alias transitive closure
    → canonical entities."""
    return f"""
WITH transcripts AS ({DUCKDB_TRANSCRIPTS_SQL}),
terms(term, type) AS (VALUES {_terms_values()}),
raw_matches AS (
  SELECT t.conv_id, t.turn_idx, g.type, u.i - 1 AS m_start,
         u.i - 1 + length(g.term) AS m_end, t.text
  FROM transcripts t
  CROSS JOIN terms g,
  UNNEST(range(1, length(t.text) - length(g.term) + 2)) AS u(i)
  WHERE substr(lower(t.text), u.i, length(g.term)) = g.term
    AND (u.i = 1 OR NOT regexp_matches(substr(lower(t.text), u.i - 1, 1), '[a-z0-9]'))
    AND (u.i + length(g.term) > length(t.text)
         OR NOT regexp_matches(substr(lower(t.text), u.i + length(g.term), 1), '[a-z0-9]'))
),
flagged AS (
  -- conditional newline block rule mirrored from the engine (see mention_ctes)
  SELECT *, CASE WHEN lag(m_end) OVER w IS NULL THEN 1
                 WHEN regexp_matches(substr(text, lag(m_end) OVER w + 1,
                                             m_start - lag(m_end) OVER w),
                                     '^[[:space:]]*$')
                      AND NOT ((contains(substr(text, lag(m_end) OVER w + 1,
                                                m_start - lag(m_end) OVER w),
                                         chr(10))
                                OR contains(substr(text, lag(m_end) OVER w + 1,
                                                   m_start - lag(m_end) OVER w),
                                            chr(13)))
                               AND regexp_matches(substr(text, m_start + 1, 1),
                                                  '[A-Z]')) THEN 0
                 ELSE 1 END AS new_island
  FROM raw_matches
  WINDOW w AS (PARTITION BY conv_id, turn_idx, type ORDER BY m_start)
),
islands AS (
  SELECT *, sum(new_island) OVER (PARTITION BY conv_id, turn_idx, type
                                  ORDER BY m_start) AS island
  FROM flagged
),
mentions AS (
  SELECT conv_id, turn_idx, type,
         min(m_start)::INTEGER AS start, max(m_end)::INTEGER AS "end",
         substr(any_value(text), min(m_start) + 1, max(m_end) - min(m_start)) AS surface,
         -- engine normalize_surface: lowercase + collapse whitespace runs
         lower(regexp_replace(substr(any_value(text), min(m_start) + 1,
                                     max(m_end) - min(m_start)),
                              '[[:space:]]+', ' ', 'g'))
           AS surface_norm
  FROM islands
  GROUP BY conv_id, turn_idx, type, island
),
surfaces AS (SELECT DISTINCT surface_norm FROM mentions),
alias_pairs(a, b) AS (VALUES {_alias_values()}),
edges AS (
  SELECT p.a AS src, p.b AS dst FROM alias_pairs p
  JOIN surfaces s1 ON s1.surface_norm = p.a
  JOIN surfaces s2 ON s2.surface_norm = p.b
  UNION
  SELECT p.b, p.a FROM alias_pairs p
  JOIN surfaces s1 ON s1.surface_norm = p.a
  JOIN surfaces s2 ON s2.surface_norm = p.b
),
reach AS (
  SELECT src AS node, dst AS r FROM edges
  UNION
  SELECT e.src, r.r FROM edges e JOIN reach r ON r.node = e.dst
),
canon AS (
  SELECT node, least(min(r), node) AS canonical FROM reach GROUP BY node
),
entities AS (
  SELECT s.surface_norm, coalesce(c.canonical, s.surface_norm) AS canonical_id
  FROM surfaces s LEFT JOIN canon c ON c.node = s.surface_norm
)
""".strip()


MULTIMODAL: dict[str, str] = {
    # media payloads are utf-8 bytes of documents.text; the stub decoder's
    # features are the first 8 bytes / 255 — re-derivable from text in SQL
    "mm_media_features": """
        SELECT doc_id::BIGINT AS doc_id,
               CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio'
                    ELSE 'video' END AS kind,
               strlen(text)::BIGINT AS n_bytes,
    """
    + ",\n               ".join(
        f"round(CASE WHEN {i + 1} <= length(text)"
        f" THEN ascii(substr(text, {i + 1}, 1)) / 255.0 ELSE 0.0 END, 6)::DOUBLE"
        f" AS f{i}"
        for i in range(8)
    )
    + """
        FROM documents
    """,
    "mm_frame_sample": """
        WITH video AS (SELECT doc_id, text FROM documents WHERE doc_id % 3 = 2),
        frames AS (
          SELECT doc_id, f.i AS frame_idx,
                 least(16, strlen(text) - f.i * 16) AS frame_bytes,
                 substr(text, f.i * 16 + 1, 16) AS chunk
          FROM video,
          UNNEST(range(0, least(4, greatest(1, strlen(text) // 16)))) AS f(i)
        )
        SELECT doc_id::BIGINT AS doc_id, frame_idx::INTEGER AS frame_idx,
               frame_bytes::INTEGER AS frame_bytes,
               (list_sum(list_prepend(0,
                  [ascii(substr(chunk, i, 1)) FOR i IN range(1, length(chunk) + 1)]))
                % 256)::INTEGER AS checksum
        FROM frames
    """,
}

TRAINSET: dict[str, str] = {}  # filled below (needs the KG mention CTE)

KG: dict[str, str] = {
    "kg_mentions": f"""
WITH RECURSIVE placeholder AS (SELECT 1),
{kg_common_ctes()[5:]}
SELECT conv_id, turn_idx, type, start, "end", surface, surface_norm
FROM mentions
    """,
    "kg_entities": f"""
WITH RECURSIVE placeholder AS (SELECT 1),
{kg_common_ctes()[5:]},
stats AS (
  SELECT m.surface_norm, count(*)::BIGINT AS n_mentions,
         array_to_string(list_sort(list(DISTINCT m.type)), ',') AS types
  FROM mentions m GROUP BY m.surface_norm
)
SELECT e.canonical_id, e.surface_norm, s.n_mentions, s.types
FROM entities e JOIN stats s USING (surface_norm)
    """,
    "kg_edges": f"""
WITH RECURSIVE placeholder AS (SELECT 1),
{kg_common_ctes()[5:]}
SELECT p.a AS src, p.b AS dst, 'alias' AS kind
FROM alias_pairs p
JOIN surfaces s1 ON s1.surface_norm = p.a
JOIN surfaces s2 ON s2.surface_norm = p.b
    """,
    "kg_triples": f"""
WITH RECURSIVE placeholder AS (SELECT 1),
{kg_common_ctes()[5:]},
turn_ents AS (
  SELECT DISTINCT m.conv_id, m.turn_idx, e.canonical_id
  FROM mentions m JOIN entities e ON e.surface_norm = m.surface_norm
),
same_turn AS (
  SELECT a.conv_id, a.canonical_id AS subj, 'co_occurs_with' AS pred,
         b.canonical_id AS obj, a.turn_idx AS src_turn_idx
  FROM turn_ents a JOIN turn_ents b
    ON a.conv_id = b.conv_id AND a.turn_idx = b.turn_idx
   AND a.canonical_id < b.canonical_id
),
follows AS (
  SELECT DISTINCT a.conv_id, a.canonical_id AS subj, 'follows' AS pred,
         b.canonical_id AS obj, a.turn_idx AS src_turn_idx
  FROM turn_ents a JOIN turn_ents b
    ON a.conv_id = b.conv_id
   AND b.turn_idx BETWEEN a.turn_idx - 2 AND a.turn_idx - 1
)
SELECT DISTINCT * FROM (
  SELECT * FROM same_turn UNION ALL SELECT * FROM follows
)
    """,
    # contrastive-embedding linking end-to-end: alias edges UNION
    # bigram-hash cosine edges (integer dot products, one double div/sqrt),
    # closure, min-surface canonical — mirrors linking.bigram_embedding_edges
    "kg_entities_embedding": f"""
WITH RECURSIVE placeholder AS (SELECT 1),
{kg_common_ctes()[5:]},
bgall AS (
  SELECT surface_norm, substr('^' || surface_norm || '$', u.i, 2) AS b
  FROM surfaces,
  UNNEST(range(1, length('^' || surface_norm || '$'))) AS u(i)
),
vb AS (SELECT surface_norm, {duckdb_md5_int_sql("b")} % 32 AS k FROM bgall),
cnts AS (SELECT surface_norm, k, count(*)::BIGINT AS c FROM vb GROUP BY 1, 2),
norms AS (SELECT surface_norm, sum(c * c)::BIGINT AS n2 FROM cnts GROUP BY 1),
bgd AS (SELECT DISTINCT surface_norm, b FROM bgall),
bgdf AS (SELECT b, count(*) AS df FROM bgd GROUP BY b),
cand AS (
  SELECT DISTINCT x.surface_norm AS sa, y.surface_norm AS sb
  FROM bgd x
  JOIN bgdf f ON f.b = x.b AND f.df <= 1000
  JOIN bgd y ON y.b = x.b AND x.surface_norm < y.surface_norm
),
dots AS (
  SELECT c.sa, c.sb, sum(ca.c * cb.c)::BIGINT AS dot
  FROM cand c
  JOIN cnts ca ON ca.surface_norm = c.sa
  JOIN cnts cb ON cb.surface_norm = c.sb AND cb.k = ca.k
  GROUP BY c.sa, c.sb
),
emb_edges AS (
  SELECT d.sa AS src, d.sb AS dst
  FROM dots d
  JOIN norms na ON na.surface_norm = d.sa
  JOIN norms nb ON nb.surface_norm = d.sb
  WHERE d.dot / sqrt((na.n2 * nb.n2)::DOUBLE) >= 0.72
),
e2 AS (
  SELECT src, dst FROM edges
  UNION SELECT src, dst FROM emb_edges
  UNION SELECT dst, src FROM emb_edges
),
reach2 AS (
  SELECT src AS node, dst AS r FROM e2
  UNION
  SELECT e.src, r.r FROM e2 e JOIN reach2 r ON r.node = e.dst
),
canon2 AS (SELECT node, least(min(r), node) AS canonical FROM reach2 GROUP BY node),
ent2 AS (
  SELECT s.surface_norm, coalesce(c.canonical, s.surface_norm) AS canonical_id
  FROM surfaces s LEFT JOIN canon2 c ON c.node = s.surface_norm
),
stats2 AS (
  SELECT m.surface_norm, count(*)::BIGINT AS n_mentions,
         array_to_string(list_sort(list(DISTINCT m.type)), ',') AS types
  FROM mentions m GROUP BY m.surface_norm
)
SELECT e.canonical_id, e.surface_norm, s.n_mentions, s.types
FROM ent2 e JOIN stats2 s USING (surface_norm)
    """,
    "kg_embedding_components": """
WITH RECURSIVE e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
pairs AS (
  SELECT a.vec_id AS va, b.vec_id AS vb
  FROM e a JOIN e b ON a.vec_id < b.vec_id
  WHERE list_sum([a.v[d] * b.v[d] FOR d IN range(1, 65)])
        / (sqrt(list_sum([a.v[d] * a.v[d] FOR d IN range(1, 65)]))
           * sqrt(list_sum([b.v[d] * b.v[d] FOR d IN range(1, 65)]))) >= 0.3
),
edges AS (SELECT va AS src, vb AS dst FROM pairs
          UNION SELECT vb, va FROM pairs),
reach AS (
  SELECT src AS node, dst AS r FROM edges
  UNION
  SELECT e2.src, r.r FROM edges e2 JOIN reach r ON r.node = e2.dst
),
canon AS (SELECT node, least(min(r), node) AS component FROM reach GROUP BY node)
SELECT em.vec_id::BIGINT AS vec_id,
       coalesce(c.component, em.vec_id)::BIGINT AS component
FROM embeddings em LEFT JOIN canon c ON c.node = em.vec_id
    """,
    "kg_conv_summaries": f"""
WITH RECURSIVE placeholder AS (SELECT 1),
{kg_common_ctes()[5:]},
linked AS (
  SELECT m.conv_id, m.turn_idx, e.canonical_id
  FROM mentions m JOIN entities e ON e.surface_norm = m.surface_norm
),
counts AS (
  SELECT conv_id, canonical_id, count(*) AS c FROM linked GROUP BY 1, 2
),
top AS (
  SELECT conv_id, canonical_id AS top_entity FROM (
    SELECT *, row_number() OVER (PARTITION BY conv_id
                                 ORDER BY c DESC, canonical_id) AS rn
    FROM counts
  ) WHERE rn = 1
)
SELECT l.conv_id, count(*)::BIGINT AS n_mentions,
       count(DISTINCT l.turn_idx)::BIGINT AS n_turns,
       count(DISTINCT l.canonical_id)::BIGINT AS n_entities,
       any_value(t.top_entity) AS top_entity
FROM linked l JOIN top t ON t.conv_id = l.conv_id
GROUP BY l.conv_id
    """,
    "kg_entity_degrees": f"""
WITH RECURSIVE placeholder AS (SELECT 1),
{kg_common_ctes()[5:]},
turn_ents AS (
  SELECT DISTINCT m.conv_id, m.turn_idx, e.canonical_id
  FROM mentions m JOIN entities e ON e.surface_norm = m.surface_norm
),
co AS (
  SELECT a.canonical_id AS subj, b.canonical_id AS obj
  FROM turn_ents a JOIN turn_ents b
    ON a.conv_id = b.conv_id AND a.turn_idx = b.turn_idx
   AND a.canonical_id < b.canonical_id
),
neighbors AS (
  SELECT subj AS ent, obj AS nbr FROM co
  UNION
  SELECT obj, subj FROM co
),
degree AS (SELECT ent, count(DISTINCT nbr)::BIGINT AS degree FROM neighbors GROUP BY ent),
mention_counts AS (
  SELECT e.canonical_id AS ent, count(*)::BIGINT AS n_mentions
  FROM mentions m JOIN entities e ON e.surface_norm = m.surface_norm
  GROUP BY e.canonical_id
)
SELECT d.ent AS canonical_id, d.degree, m.n_mentions
FROM degree d JOIN mention_counts m ON m.ent = d.ent
ORDER BY d.degree DESC, canonical_id
    """,
    "kg_mention_eval": f"""
WITH transcripts AS ({DUCKDB_TRANSCRIPTS_SQL}),
{mention_ctes("p_")},
{mention_ctes("g_", EVAL_GOLD_GAZETTEER)},
joined AS (
  SELECT coalesce(p.type, g.type) AS type,
         CASE WHEN p.type IS NOT NULL AND g.type IS NOT NULL THEN 1 ELSE 0 END AS is_tp,
         CASE WHEN p.type IS NOT NULL AND g.type IS NULL THEN 1 ELSE 0 END AS is_fp,
         CASE WHEN p.type IS NULL AND g.type IS NOT NULL THEN 1 ELSE 0 END AS is_fn
  FROM p_mentions p
  FULL OUTER JOIN g_mentions g
    ON p.conv_id = g.conv_id AND p.turn_idx = g.turn_idx AND p.type = g.type
   AND p.start = g.start AND p."end" = g."end"
)
SELECT type, sum(is_tp)::BIGINT AS tp, sum(is_fp)::BIGINT AS fp,
       sum(is_fn)::BIGINT AS fn,
       round(sum(is_tp) / greatest(sum(is_tp) + sum(is_fp), 1), 6)::DOUBLE AS precision,
       round(sum(is_tp) / greatest(sum(is_tp) + sum(is_fn), 1), 6)::DOUBLE AS recall
FROM joined GROUP BY type ORDER BY type
    """,
    # macro aggregation of the span-level eval (the RuNNE competition
    # protocol: unweighted mean over types; F1 from the rounded p/r exactly
    # as the engine computes it)
    "kg_mention_eval_macro": f"""
WITH transcripts AS ({DUCKDB_TRANSCRIPTS_SQL}),
{mention_ctes("p_")},
{mention_ctes("g_", EVAL_GOLD_GAZETTEER)},
joined AS (
  SELECT coalesce(p.type, g.type) AS type,
         CASE WHEN p.type IS NOT NULL AND g.type IS NOT NULL THEN 1 ELSE 0 END AS is_tp,
         CASE WHEN p.type IS NOT NULL AND g.type IS NULL THEN 1 ELSE 0 END AS is_fp,
         CASE WHEN p.type IS NULL AND g.type IS NOT NULL THEN 1 ELSE 0 END AS is_fn
  FROM p_mentions p
  FULL OUTER JOIN g_mentions g
    ON p.conv_id = g.conv_id AND p.turn_idx = g.turn_idx AND p.type = g.type
   AND p.start = g.start AND p."end" = g."end"
),
per AS (
  SELECT type,
         round(sum(is_tp) / greatest(sum(is_tp) + sum(is_fp), 1), 6)::DOUBLE AS precision,
         round(sum(is_tp) / greatest(sum(is_tp) + sum(is_fn), 1), 6)::DOUBLE AS recall
  FROM joined GROUP BY type
),
scored AS (
  SELECT *,
         CASE WHEN precision + recall > 0
              THEN 2 * precision * recall / (precision + recall)
              ELSE 0.0 END AS f1
  FROM per
)
SELECT count(*)::BIGINT AS n_types,
       round(avg(precision), 6)::DOUBLE AS macro_precision,
       round(avg(recall), 6)::DOUBLE AS macro_recall,
       round(avg(f1), 6)::DOUBLE AS macro_f1
FROM scored
    """,
    "kg_role_triples": f"""
WITH RECURSIVE placeholder AS (SELECT 1),
{kg_common_ctes()[5:]},
role_ents AS (
  SELECT DISTINCT m.conv_id, m.turn_idx, t.role, e.canonical_id
  FROM mentions m
  JOIN entities e ON e.surface_norm = m.surface_norm
  JOIN transcripts t ON t.conv_id = m.conv_id AND t.turn_idx = m.turn_idx
)
SELECT u.conv_id, u.canonical_id AS subj, 'elicits' AS pred,
       a.canonical_id AS obj, u.turn_idx AS src_turn_idx
FROM role_ents u
JOIN role_ents a ON a.conv_id = u.conv_id AND a.turn_idx = u.turn_idx + 1
WHERE u.role = 'user' AND a.role = 'assistant'
  AND u.canonical_id <> a.canonical_id
    """,
    "kg_two_hop": f"""
WITH RECURSIVE placeholder AS (SELECT 1),
{kg_common_ctes()[5:]},
turn_ents AS (
  SELECT DISTINCT m.conv_id, m.turn_idx, e.canonical_id
  FROM mentions m JOIN entities e ON e.surface_norm = m.surface_norm
),
co AS (
  SELECT DISTINCT a.canonical_id AS subj, b.canonical_id AS obj
  FROM turn_ents a JOIN turn_ents b
    ON a.conv_id = b.conv_id AND a.turn_idx = b.turn_idx
   AND a.canonical_id < b.canonical_id
),
nbrs AS (SELECT subj, obj FROM co UNION SELECT obj, subj FROM co),
one_hop AS (SELECT subj, count(DISTINCT obj)::BIGINT AS n_one_hop FROM nbrs GROUP BY subj),
expandable AS (SELECT subj FROM one_hop WHERE n_one_hop <= 10000),
two AS (
  SELECT t.subj, count(DISTINCT t.two_obj)::BIGINT AS n_two_hop_only FROM (
    SELECT a.subj, b.obj AS two_obj
    FROM nbrs a
    JOIN expandable x ON x.subj = a.obj
    JOIN nbrs b ON a.obj = b.subj
    WHERE a.subj <> b.obj
  ) t
  LEFT JOIN nbrs d ON d.subj = t.subj AND d.obj = t.two_obj
  WHERE d.subj IS NULL
  GROUP BY t.subj
)
SELECT o.subj AS canonical_id, o.n_one_hop,
       coalesce(t.n_two_hop_only, 0)::BIGINT AS n_two_hop_only
FROM one_hop o LEFT JOIN two t ON t.subj = o.subj
ORDER BY canonical_id
    """,
    "kg_type_freqs": f"""
WITH RECURSIVE placeholder AS (SELECT 1),
{kg_common_ctes()[5:]}
SELECT type, count(*)::BIGINT AS freq
FROM mentions GROUP BY type ORDER BY freq DESC, type
    """,
    # replays operators/graph.py EXACTLY: quantized-integer PageRank, 3
    # unrolled iterations, scale 1e12, damping 85% — every step is int64
    # floor division/sum, so Spark and DuckDB agree bit-for-bit (mirrored
    # constants: scale, damping, iteration count)
    "kg_pagerank": f"""
WITH RECURSIVE placeholder AS (SELECT 1),
{kg_common_ctes()[5:]},
turn_ents AS (
  SELECT DISTINCT m.conv_id, m.turn_idx, e.canonical_id
  FROM mentions m JOIN entities e ON e.surface_norm = m.surface_norm
),
co AS (
  SELECT DISTINCT a.canonical_id AS src, b.canonical_id AS dst
  FROM turn_ents a JOIN turn_ents b
    ON a.conv_id = b.conv_id AND a.turn_idx = b.turn_idx
   AND a.canonical_id < b.canonical_id
),
nbrs AS (SELECT src, dst FROM co UNION SELECT dst, src FROM co),
deg AS (SELECT src, count(*)::BIGINT AS deg FROM nbrs GROUP BY src),
nn AS (SELECT count(*)::BIGINT AS n FROM deg),
pr0 AS (SELECT d.src, (1000000000000 // n)::BIGINT AS pr_q, d.deg
        FROM deg d CROSS JOIN nn),
s1 AS (SELECT nb.dst AS src, sum(p.pr_q // p.deg)::BIGINT AS s
       FROM pr0 p JOIN nbrs nb ON nb.src = p.src GROUP BY nb.dst),
pr1 AS (SELECT d.src,
               ((1000000000000 * 15 // 100 // n)
                + (85 * coalesce(i.s, 0)) // 100)::BIGINT AS pr_q, d.deg
        FROM deg d CROSS JOIN nn LEFT JOIN s1 i ON i.src = d.src),
s2 AS (SELECT nb.dst AS src, sum(p.pr_q // p.deg)::BIGINT AS s
       FROM pr1 p JOIN nbrs nb ON nb.src = p.src GROUP BY nb.dst),
pr2 AS (SELECT d.src,
               ((1000000000000 * 15 // 100 // n)
                + (85 * coalesce(i.s, 0)) // 100)::BIGINT AS pr_q, d.deg
        FROM deg d CROSS JOIN nn LEFT JOIN s2 i ON i.src = d.src),
s3 AS (SELECT nb.dst AS src, sum(p.pr_q // p.deg)::BIGINT AS s
       FROM pr2 p JOIN nbrs nb ON nb.src = p.src GROUP BY nb.dst),
pr3 AS (SELECT d.src,
               ((1000000000000 * 15 // 100 // n)
                + (85 * coalesce(i.s, 0)) // 100)::BIGINT AS pr_q, d.deg
        FROM deg d CROSS JOIN nn LEFT JOIN s3 i ON i.src = d.src)
SELECT src AS canonical_id, pr_q FROM pr3 ORDER BY pr_q DESC, canonical_id
    """,
    # degree-ordered triangle counting: orient each undirected co-occurrence
    # edge from the (deg, id)-smaller endpoint, enumerate wedges at each
    # tail, close against the oriented edge set — the same construction as
    # graph.triangle_counts, so counts match integer-for-integer
    "kg_triangles": f"""
WITH RECURSIVE placeholder AS (SELECT 1),
{kg_common_ctes()[5:]},
turn_ents AS (
  SELECT DISTINCT m.conv_id, m.turn_idx, e.canonical_id
  FROM mentions m JOIN entities e ON e.surface_norm = m.surface_norm
),
co AS (
  SELECT DISTINCT a.canonical_id AS src, b.canonical_id AS dst
  FROM turn_ents a JOIN turn_ents b
    ON a.conv_id = b.conv_id AND a.turn_idx = b.turn_idx
   AND a.canonical_id < b.canonical_id
),
nbrs AS (SELECT src, dst FROM co UNION SELECT dst, src FROM co),
degx AS (SELECT src, count(*)::BIGINT AS deg FROM nbrs GROUP BY src),
ori AS (
  SELECT CASE WHEN da.deg < db.deg OR (da.deg = db.deg AND u.src < u.dst)
              THEN u.src ELSE u.dst END AS a,
         CASE WHEN da.deg < db.deg OR (da.deg = db.deg AND u.src < u.dst)
              THEN u.dst ELSE u.src END AS b
  FROM co u JOIN degx da ON da.src = u.src JOIN degx db ON db.src = u.dst
),
wedge AS (
  SELECT o1.a AS t, o1.b AS h1, o2.b AS h2
  FROM ori o1 JOIN ori o2 ON o2.a = o1.a AND o1.b <> o2.b
),
tri AS (
  SELECT w.t, w.h1, w.h2
  FROM wedge w JOIN ori o ON o.a = w.h1 AND o.b = w.h2
),
members AS (
  SELECT t AS node FROM tri
  UNION ALL SELECT h1 FROM tri
  UNION ALL SELECT h2 FROM tri
)
SELECT node AS canonical_id, count(*)::BIGINT AS n_triangles
FROM members GROUP BY node
ORDER BY n_triangles DESC, canonical_id
    """,
    # deterministic synchronous label propagation, 4 unrolled rounds: each
    # node adopts its neighbors' most frequent label, ties to the minimum —
    # mirrors graph.label_propagation round for round
    "kg_communities": f"""
WITH RECURSIVE placeholder AS (SELECT 1),
{kg_common_ctes()[5:]},
turn_ents AS (
  SELECT DISTINCT m.conv_id, m.turn_idx, e.canonical_id
  FROM mentions m JOIN entities e ON e.surface_norm = m.surface_norm
),
co AS (
  SELECT DISTINCT a.canonical_id AS src, b.canonical_id AS dst
  FROM turn_ents a JOIN turn_ents b
    ON a.conv_id = b.conv_id AND a.turn_idx = b.turn_idx
   AND a.canonical_id < b.canonical_id
),
nbrs AS (SELECT src, dst FROM co UNION SELECT dst, src FROM co),
l0 AS (SELECT DISTINCT src AS node, src AS lab FROM nbrs),
c1 AS (SELECT e.dst AS node, l.lab, count(*) AS c
       FROM nbrs e JOIN l0 l ON l.node = e.src GROUP BY 1, 2),
l1 AS (SELECT node, lab FROM c1
       QUALIFY row_number() OVER (PARTITION BY node ORDER BY c DESC, lab) = 1),
c2 AS (SELECT e.dst AS node, l.lab, count(*) AS c
       FROM nbrs e JOIN l1 l ON l.node = e.src GROUP BY 1, 2),
l2 AS (SELECT node, lab FROM c2
       QUALIFY row_number() OVER (PARTITION BY node ORDER BY c DESC, lab) = 1),
c3 AS (SELECT e.dst AS node, l.lab, count(*) AS c
       FROM nbrs e JOIN l2 l ON l.node = e.src GROUP BY 1, 2),
l3 AS (SELECT node, lab FROM c3
       QUALIFY row_number() OVER (PARTITION BY node ORDER BY c DESC, lab) = 1),
c4 AS (SELECT e.dst AS node, l.lab, count(*) AS c
       FROM nbrs e JOIN l3 l ON l.node = e.src GROUP BY 1, 2),
l4 AS (SELECT node, lab FROM c4
       QUALIFY row_number() OVER (PARTITION BY node ORDER BY c DESC, lab) = 1)
SELECT node AS canonical_id, lab AS community
FROM l4 ORDER BY community, canonical_id
    """,
    # lexical-bridge predicate: first [A-Za-z]+ token of the inter-mention
    # text, bridges capped at 40 chars — mirrored from the engine
    "kg_verb_predicates": f"""
WITH RECURSIVE placeholder AS (SELECT 1),
{kg_common_ctes()[5:]},
ment AS (
  SELECT m.conv_id, m.turn_idx, e.canonical_id, m.start, m."end"
  FROM mentions m JOIN entities e ON e.surface_norm = m.surface_norm
),
pairs AS (
  SELECT a.conv_id, a.turn_idx, a.canonical_id AS subj, b.canonical_id AS obj,
         a."end" AS gap_start, b.start AS gap_end
  FROM ment a JOIN ment b
    ON a.conv_id = b.conv_id AND a.turn_idx = b.turn_idx
   AND a."end" <= b.start AND a.canonical_id <> b.canonical_id
  WHERE b.start - a."end" <= 40
),
bridged AS (
  SELECT p.conv_id, p.subj,
         lower(regexp_extract(
           substr(t.text, p.gap_start + 1, p.gap_end - p.gap_start),
           '[A-Za-z]+')) AS pred,
         p.obj, p.turn_idx AS src_turn_idx
  FROM pairs p
  JOIN transcripts t ON t.conv_id = p.conv_id AND t.turn_idx = p.turn_idx
)
SELECT DISTINCT conv_id, subj, pred, obj, src_turn_idx
FROM bridged WHERE pred <> ''
ORDER BY conv_id, src_turn_idx, subj, pred, obj
    """,
    # integer-exact floor(log2) via length(bin(x))-1 on both engines
    "kg_degree_histogram": f"""
WITH RECURSIVE placeholder AS (SELECT 1),
{kg_common_ctes()[5:]},
turn_ents AS (
  SELECT DISTINCT m.conv_id, m.turn_idx, e.canonical_id
  FROM mentions m JOIN entities e ON e.surface_norm = m.surface_norm
),
co AS (
  SELECT DISTINCT a.canonical_id AS src, b.canonical_id AS dst
  FROM turn_ents a JOIN turn_ents b
    ON a.conv_id = b.conv_id AND a.turn_idx = b.turn_idx
   AND a.canonical_id < b.canonical_id
),
nbrs AS (SELECT src, dst FROM co UNION SELECT dst, src FROM co),
deg AS (SELECT src, count(*)::BIGINT AS degree FROM nbrs GROUP BY src)
SELECT (length(bin(degree)) - 1)::BIGINT AS bucket,
       count(*)::BIGINT AS n_entities,
       min(degree)::BIGINT AS min_degree,
       max(degree)::BIGINT AS max_degree
FROM deg GROUP BY bucket ORDER BY bucket
    """,
    # corrupt-tail negative sampling replay: portable md5 index mod n with
    # step-on-collision — mirrored hash contract (hashing.py)
    "tr_kg_negatives": f"""
WITH RECURSIVE placeholder AS (SELECT 1),
{kg_common_ctes()[5:]},
turn_ents AS (
  SELECT DISTINCT m.conv_id, m.turn_idx, e.canonical_id
  FROM mentions m JOIN entities e ON e.surface_norm = m.surface_norm
),
same_turn AS (
  SELECT a.conv_id, a.canonical_id AS subj, 'co_occurs_with' AS pred,
         b.canonical_id AS obj, a.turn_idx AS src_turn_idx
  FROM turn_ents a JOIN turn_ents b
    ON a.conv_id = b.conv_id AND a.turn_idx = b.turn_idx
   AND a.canonical_id < b.canonical_id
),
follows AS (
  SELECT DISTINCT a.conv_id, a.canonical_id AS subj, 'follows' AS pred,
         b.canonical_id AS obj, a.turn_idx AS src_turn_idx
  FROM turn_ents a JOIN turn_ents b
    ON a.conv_id = b.conv_id
   AND b.turn_idx BETWEEN a.turn_idx - 2 AND a.turn_idx - 1
),
trip AS (
  SELECT DISTINCT subj, pred, obj FROM (
    SELECT subj, pred, obj FROM same_turn
    UNION ALL SELECT subj, pred, obj FROM follows
  )
),
ent_set AS (SELECT DISTINCT canonical_id FROM turn_ents),
nn AS (SELECT count(*)::BIGINT AS n FROM ent_set),
-- the engine's two-level dense_index (operators/indexing.py) orders by
-- (md5-bucket % 32, key); the flat ORDER BY here is value-identical
ents_idx AS (
  SELECT canonical_id,
         row_number() OVER (
           ORDER BY {duckdb_md5_int_sql("canonical_id")} % 32, canonical_id
         ) - 1 AS idx
  FROM ent_set
),
cand AS (
  SELECT t.subj, t.pred, t.obj,
         {duckdb_md5_int_sql("t.subj || '|' || t.pred || '|' || t.obj")}
           % nn.n AS cand_idx, nn.n
  FROM trip t CROSS JOIN nn
),
neg AS (
  SELECT c.subj, c.pred, c.obj,
         CASE WHEN c.cand_idx = oi.idx THEN (c.cand_idx + 1) % c.n
              ELSE c.cand_idx END AS neg_idx
  FROM cand c JOIN ents_idx oi ON oi.canonical_id = c.obj
)
SELECT g.subj, g.pred, g.obj, e.canonical_id AS neg_obj
FROM neg g JOIN ents_idx e ON e.idx = g.neg_idx
WHERE e.canonical_id <> g.obj  -- n=1 degenerate case: no valid negative
ORDER BY subj, pred, obj
    """,
    # staged integer division mirrored from the engine: ((c_ab*1e6) DIV
    # c_a) * n DIV c_b — exact-match contract, bounded magnitude
    "kg_edge_lift": f"""
WITH RECURSIVE placeholder AS (SELECT 1),
{kg_common_ctes()[5:]},
conv_ents AS (
  SELECT DISTINCT m.conv_id, e.canonical_id
  FROM mentions m JOIN entities e ON e.surface_norm = m.surface_norm
),
nn AS (SELECT count(DISTINCT conv_id)::BIGINT AS n FROM conv_ents),
counts AS (SELECT canonical_id, count(*)::BIGINT AS c
           FROM conv_ents GROUP BY canonical_id),
pairs AS (
  SELECT a.canonical_id AS subj, b.canonical_id AS obj,
         count(*)::BIGINT AS n_convs_both
  FROM conv_ents a JOIN conv_ents b
    ON a.conv_id = b.conv_id AND a.canonical_id < b.canonical_id
  GROUP BY a.canonical_id, b.canonical_id
)
SELECT p.subj, p.obj, p.n_convs_both,
       (((p.n_convs_both * 1000000) // cs.c) * nn.n // co.c)::BIGINT AS lift_ppm
FROM pairs p
JOIN counts cs ON cs.canonical_id = p.subj
JOIN counts co ON co.canonical_id = p.obj
CROSS JOIN nn
ORDER BY lift_ppm DESC, subj, obj
    """,
    "kg_entity_lifespans": f"""
WITH RECURSIVE placeholder AS (SELECT 1),
{kg_common_ctes()[5:]},
ment_ts AS (
  SELECT e.canonical_id, m.conv_id, m.turn_idx, t.ts
  FROM mentions m
  JOIN entities e ON e.surface_norm = m.surface_norm
  JOIN transcripts t ON t.conv_id = m.conv_id AND t.turn_idx = m.turn_idx
)
SELECT canonical_id,
       epoch(min(ts))::BIGINT AS first_seen,
       epoch(max(ts))::BIGINT AS last_seen,
       (epoch(max(ts)) - epoch(min(ts)))::BIGINT AS active_sec,
       count(DISTINCT conv_id)::BIGINT AS n_convs,
       count(DISTINCT (conv_id, turn_idx))::BIGINT AS n_turns
FROM ment_ts GROUP BY canonical_id ORDER BY canonical_id
    """,
}

def subtok_ctes() -> str:
    """CTE chain deriving the engine tokenizer's subtoken inventory (docs →
    words → char-offset subtokens → 128-chunked, md5 token ids) in pure SQL;
    shared by the trainset oracles and the token-level mention-eval oracle.
    Appended after a CTE chain that defines ``transcripts``.

    Valid on the driver corpus's input domain (asserted by
    tests/test_trainset_multimodal.py): single-line, single-spaced,
    no-leading/trailing-whitespace ASCII text — there the engine's
    sentenizer returns exactly one sentence (= the whole turn, offsets
    unrebased) and its Unicode word regex degenerates to space-splitting, so
    the tokenizer (fixed-width 4-char subword pieces, '##' continuations,
    md5-derived token ids mod 30522), the per-type {O,START,END,MIDDLE,
    START-END} class planes, and the 128-subtoken chunking are all
    SQL-expressible."""
    type_values = ", ".join(f"({i}, '{t}')" for i, t in enumerate(ENTITY_TYPES))
    return f"""
docs AS (
  SELECT ('0x' || substr(md5(conv_id || ':' || turn_idx), 1, 15))::BIGINT AS id,
         conv_id, turn_idx, text
  FROM transcripts
),
words AS (
  SELECT id, word_arr[i.i::INT] AS word, i.i::INT AS widx
  FROM (SELECT id, string_split(text, ' ') AS word_arr FROM docs) t,
       UNNEST(range(1, len(word_arr) + 1)) AS i(i)
),
wstarts AS (
  SELECT *, (sum(length(word) + 1) OVER (PARTITION BY id ORDER BY widx)
             - length(word) - 1)::INT AS wstart
  FROM words
),
subtoks AS (
  SELECT id, widx, p.i AS k,
         CASE WHEN p.i = 0 THEN substr(word, 1, 4)
              ELSE '##' || substr(word, p.i * 4 + 1, 4) END AS piece,
         wstart + p.i * 4 AS b0,
         wstart + p.i * 4 + length(substr(word, p.i * 4 + 1, 4)) AS b1
  FROM wstarts, UNNEST(range(0, ceil(length(word) / 4.0)::BIGINT)) AS p(i)
),
chunked AS (
  SELECT *, (s // 128)::INT AS chunk_idx, (s % 128)::INT AS pos,
         ('0x' || substr(md5(piece), 1, 8))::BIGINT % 30522 AS tok_id
  FROM (SELECT *, (row_number() OVER (PARTITION BY id ORDER BY widx, k) - 1)::INT AS s
        FROM subtoks)
)
""".strip()


def trainset_ctes() -> str:
    """Label/pair CTEs of the NER tensor trainset (operators/trainset.py
    build_ner_trainset), appended after ``kg_common_ctes()``; includes
    ``subtok_ctes``."""
    type_values = ", ".join(f"({i}, '{t}')" for i, t in enumerate(ENTITY_TYPES))
    return f"""
{subtok_ctes()},
m2 AS (
  SELECT d.id, m.type, m.start AS m_start, m."end" AS m_end
  FROM mentions m JOIN docs d ON d.conv_id = m.conv_id AND d.turn_idx = m.turn_idx
),
covered AS (
  SELECT c.id, m2.type, m2.m_start, c.s
  FROM chunked c JOIN m2 ON m2.id = c.id AND c.b0 >= m2.m_start AND c.b1 <= m2.m_end
),
runs AS (
  SELECT id, type, m_start, min(s) AS first_s, max(s) AS last_s
  FROM covered GROUP BY id, type, m_start
),
cls AS (
  SELECT c.id, c.type, c.s,
         CASE WHEN r.first_s = r.last_s THEN 4
              WHEN c.s = r.first_s THEN 1
              WHEN c.s = r.last_s THEN 2
              ELSE 3 END AS cls
  FROM covered c
  JOIN runs r ON r.id = c.id AND r.type = c.type AND r.m_start = c.m_start
),
types(t_idx, type) AS (VALUES {type_values}),
planes AS (
  SELECT ch.id, ch.chunk_idx, ty.t_idx,
         string_agg(coalesce(cl.cls, 0)::VARCHAR, ',' ORDER BY ch.pos) AS plane
  FROM chunked ch CROSS JOIN types ty
  LEFT JOIN cls cl ON cl.id = ch.id AND cl.s = ch.s AND cl.type = ty.type
  GROUP BY ch.id, ch.chunk_idx, ty.t_idx
),
plane_agg AS (
  SELECT id, chunk_idx, string_agg(plane, '|' ORDER BY t_idx) AS labels_str
  FROM planes GROUP BY id, chunk_idx
),
pieces_agg AS (
  SELECT id, chunk_idx,
         string_agg(piece, ' ' ORDER BY pos) AS pieces_str,
         string_agg(tok_id::VARCHAR, ',' ORDER BY pos) AS token_ids_str
  FROM chunked GROUP BY id, chunk_idx
)
""".strip()


TRAINSET.update(
    {
        "tr_span_inventory": f"""
WITH RECURSIVE placeholder AS (SELECT 1),
{kg_common_ctes()[5:]}
SELECT type, count(*)::BIGINT AS n_spans,
       count(DISTINCT surface_norm)::BIGINT AS n_surfaces,
       min("end" - start)::BIGINT AS min_len,
       max("end" - start)::BIGINT AS max_len
FROM mentions GROUP BY type ORDER BY type
        """,
        "tr_siamese_pairs": f"""
WITH RECURSIVE placeholder AS (SELECT 1),
{kg_common_ctes()[5:]},
keyed AS (
  SELECT type,
         ('0x' || substr(md5(conv_id || ':' || turn_idx || ':' || type || ':' || start),
                         1, 15))::BIGINT AS key
  FROM mentions
),
sel AS (
  SELECT type, key FROM (
    SELECT *, row_number() OVER (PARTITION BY type ORDER BY key) AS rn FROM keyed
  ) WHERE rn <= 20
)
SELECT a.type AS type_a, a.key AS key_a, b.type AS type_b, b.key AS key_b,
       1::INTEGER AS label
FROM sel a JOIN sel b ON a.type = b.type AND a.key < b.key
UNION ALL
SELECT a.type, a.key, b.type, b.key, 0::INTEGER
FROM sel a JOIN sel b ON a.type < b.type AND (a.key + b.key) % 10 < 3
        """,
        "tr_max_seq_len": f"""
WITH transcripts AS ({DUCKDB_TRANSCRIPTS_SQL})
SELECT max(n)::BIGINT AS max_seq_len, round(avg(n), 4)::DOUBLE AS avg_seq_len
FROM (
  SELECT list_sum(list_prepend(0::BIGINT,
           [ceil(length(t) / 4.0)::BIGINT
            FOR t IN regexp_extract_all(text, '[^\\W_]+|[^\\s\\w]|_')])) AS n
  FROM transcripts
)
        """,
    }
)

TRAINSET.update(
    {
        "tr_ner_trainset": f"""
WITH RECURSIVE placeholder AS (SELECT 1),
{kg_common_ctes()[5:]},
{trainset_ctes()}
SELECT p.id, 0::INT AS sent_idx, p.chunk_idx, p.pieces_str, p.token_ids_str,
       l.labels_str
FROM pieces_agg p JOIN plane_agg l USING (id, chunk_idx)
        """,
        "tr_siamese_tensors": f"""
WITH RECURSIVE placeholder AS (SELECT 1),
{kg_common_ctes()[5:]},
{trainset_ctes()},
span_rows AS (
  SELECT r.id, r.type, c.c::INT AS chunk_idx,
         (greatest(r.first_s, c.c * 128) - c.c * 128)::INT AS sub_start,
         (least(r.last_s, c.c * 128 + 127) - c.c * 128 + 1)::INT AS sub_end
  FROM runs r, UNNEST(range(r.first_s // 128, r.last_s // 128 + 1)) AS c(c)
),
chunk_len AS (SELECT id, chunk_idx, count(*) AS n FROM chunked GROUP BY id, chunk_idx),
keyed AS (
  SELECT sr.*, pa.token_ids_str AS ids_str,
         array_to_string([CASE WHEN i - 1 >= sr.sub_start AND i - 1 < sr.sub_end
                               THEN 1 ELSE 0 END
                          FOR i IN range(1, cl.n + 1)], ',') AS mask_str,
         ('0x' || substr(md5(sr.id::VARCHAR || ':0:' || sr.chunk_idx::VARCHAR
                             || ':' || sr.type || ':' || sr.sub_start::VARCHAR),
                         1, 15))::BIGINT AS key
  FROM span_rows sr
  JOIN chunk_len cl ON cl.id = sr.id AND cl.chunk_idx = sr.chunk_idx
  JOIN pieces_agg pa ON pa.id = sr.id AND pa.chunk_idx = sr.chunk_idx
),
sel AS (
  SELECT type, key, ids_str, mask_str FROM (
    SELECT *, row_number() OVER (PARTITION BY type ORDER BY key) AS rn FROM keyed
  ) WHERE rn <= 10
)
SELECT a.ids_str AS left_ids_str, a.mask_str AS left_mask_str,
       b.ids_str AS right_ids_str, b.mask_str AS right_mask_str, 1::INT AS label
FROM sel a JOIN sel b ON a.type = b.type AND a.key < b.key
UNION ALL
SELECT a.ids_str, a.mask_str, b.ids_str, b.mask_str, 0::INT
FROM sel a JOIN sel b ON a.type < b.type AND (a.key + b.key) % 10 < 3
        """,
    }
)

# token-level A5 parity: the reference metric binarizes per-token labels
# to entity-vs-O per type plane and computes micro P/R over tokens
# (neural_network/utils.py:143-180); here a token is one engine subtoken
# and coverage is the mention interval test b0 >= start AND b1 <= end
    
KG["kg_mention_eval_token"] = f"""
WITH transcripts AS ({DUCKDB_TRANSCRIPTS_SQL}),
{mention_ctes("p_")},
{mention_ctes("g_", EVAL_GOLD_GAZETTEER)},
{subtok_ctes()},
p_cov AS (
  SELECT DISTINCT d.conv_id, d.turn_idx, m.type, c.b0
  FROM chunked c JOIN docs d ON d.id = c.id
  JOIN p_mentions m ON m.conv_id = d.conv_id AND m.turn_idx = d.turn_idx
   AND c.b0 >= m.start AND c.b1 <= m."end"
),
g_cov AS (
  SELECT DISTINCT d.conv_id, d.turn_idx, m.type, c.b0
  FROM chunked c JOIN docs d ON d.id = c.id
  JOIN g_mentions m ON m.conv_id = d.conv_id AND m.turn_idx = d.turn_idx
   AND c.b0 >= m.start AND c.b1 <= m."end"
),
joined AS (
  SELECT coalesce(p.type, g.type) AS type,
         CASE WHEN p.type IS NOT NULL AND g.type IS NOT NULL THEN 1 ELSE 0 END AS is_tp,
         CASE WHEN p.type IS NOT NULL AND g.type IS NULL THEN 1 ELSE 0 END AS is_fp,
         CASE WHEN p.type IS NULL AND g.type IS NOT NULL THEN 1 ELSE 0 END AS is_fn
  FROM p_cov p
  FULL OUTER JOIN g_cov g
    ON p.conv_id = g.conv_id AND p.turn_idx = g.turn_idx AND p.type = g.type
   AND p.b0 = g.b0
)
SELECT type, sum(is_tp)::BIGINT AS tp, sum(is_fp)::BIGINT AS fp,
       sum(is_fn)::BIGINT AS fn,
       round(sum(is_tp) / greatest(sum(is_tp) + sum(is_fp), 1), 6)::DOUBLE AS precision,
       round(sum(is_tp) / greatest(sum(is_tp) + sum(is_fn), 1), 6)::DOUBLE AS recall
FROM joined GROUP BY type ORDER BY type
    """
