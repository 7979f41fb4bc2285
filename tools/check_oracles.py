"""Local mirror of the driver's correctness gate.

Runs every ``__spark_entry__.queries()`` entry on Spark and its
``oracle_sql()`` counterpart on DuckDB over the same parquet tables, then
compares row count, column names, and order-insensitive values (floats
rounded to 6 places before hashing to surface real mismatches, not ulps).

Usage: python tools/check_oracles.py [sf_dir] [query_name ...]
"""

from __future__ import annotations

import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def normalize(rows, cols):
    out = []
    for row in rows:
        vals = dict(zip(cols, row))
        norm = []
        for c in sorted(cols):
            v = vals[c]
            if isinstance(v, float):
                if math.isnan(v):
                    v = "NaN"
                else:
                    v = round(v, 6)
                    v = 0.0 if v == 0 else v
            elif hasattr(v, "isoformat"):
                v = v.isoformat()
            elif isinstance(v, (list, tuple)):
                v = tuple(v)
            norm.append(v)
        out.append(tuple(norm))
    out.sort(key=repr)
    return out


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import __spark_entry__ as entry
    from runne_contrastive_ner_spark.session import build_session

    spark = build_session(app_name="check-oracles")
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    queries = entry.queries()
    oracles = entry.oracle_sql()
    failures = []
    for name in sorted(queries):
        if only and name not in only:
            continue
        try:
            sdf = queries[name](spark, sf_dir)
            s_cols = sdf.columns
            s_rows = [tuple(r) for r in sdf.collect()]
        except Exception as e:
            failures.append((name, f"SPARK ERROR: {e}"))
            print(f"[FAIL] {name}: spark error: {e}")
            continue
        if name not in oracles:
            print(f"[rows-only] {name}: {len(s_rows)} rows, cols={s_cols}")
            continue
        try:
            res = con.execute(oracles[name])
            d_cols = [d[0] for d in res.description]
            d_rows = res.fetchall()
        except Exception as e:
            failures.append((name, f"DUCKDB ERROR: {e}"))
            print(f"[FAIL] {name}: duckdb error: {e}")
            continue
        problems = []
        if sorted(s_cols) != sorted(d_cols):
            problems.append(f"cols spark={sorted(s_cols)} duck={sorted(d_cols)}")
        if len(s_rows) != len(d_rows):
            problems.append(f"rowcount spark={len(s_rows)} duck={len(d_rows)}")
        if not problems:
            ns, nd = normalize(s_rows, s_cols), normalize(d_rows, d_cols)
            if ns != nd:
                only_spark = [r for r in ns if r not in set(map(tuple, nd))][:3]
                only_duck = [r for r in nd if r not in set(map(tuple, ns))][:3]
                problems.append(
                    f"values differ; spark-only: {only_spark}; duckdb-only: {only_duck}"
                )
        if problems:
            failures.append((name, "; ".join(problems)))
            print(f"[FAIL] {name}: {'; '.join(problems)}")
        else:
            print(f"[ok] {name}: {len(s_rows)} rows")
    spark.stop()
    if failures:
        print(f"\n{len(failures)} FAILURES")
        sys.exit(1)
    print("\nall oracle checks passed")


if __name__ == "__main__":
    main()
