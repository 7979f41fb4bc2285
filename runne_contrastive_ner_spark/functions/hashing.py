"""Portable deterministic hashing shared by the Spark engine and the DuckDB
oracle SQL.

Spark's builtin ``hash``/``xxhash64`` and DuckDB's ``hash`` are different
functions, so every place the engine needs a *verifiable* deterministic hash
(splits, sampling, minhash, simhash, fingerprints) uses an md5-derived integer
that both systems can compute byte-identically:

    Spark SQL : CAST(conv(substr(md5(s), 1, 15), 16, 10) AS BIGINT)
    DuckDB    : ('0x' || substr(md5(s), 1, 15))::BIGINT

15 hex digits = 60 bits, always non-negative, fits a signed 64-bit int.
The Python mirrors here are used inside pandas UDFs and in tests.
"""

from __future__ import annotations

import hashlib

MD5_BITS = 60  # 15 hex digits
MD5_MOD = 1 << MD5_BITS


def md5_int(s: str, hex_digits: int = 15) -> int:
    """First ``hex_digits`` hex chars of md5(s) as a non-negative int."""
    return int(hashlib.md5(s.encode("utf-8")).hexdigest()[:hex_digits], 16)


def md5_bucket(s: str, buckets: int) -> int:
    """Stable bucket assignment in [0, buckets). Used for deterministic
    train/validation splits (reference: random.shuffle at
    train_test_split.py:49 — replaced with content hashing so the split is
    reproducible under any parallelism)."""
    return md5_int(s) % buckets


def minhash_value(seed: int, shingle: str) -> int:
    """One minhash permutation: hash of 'seed:shingle'."""
    return md5_int(f"{seed}:{shingle}")


# SQL fragment builders (kept next to the Python mirrors so they cannot drift)

def spark_md5_int_sql(col_expr: str, hex_digits: int = 15) -> str:
    return f"CAST(conv(substr(md5({col_expr}), 1, {hex_digits}), 16, 10) AS BIGINT)"


def duckdb_md5_int_sql(col_expr: str, hex_digits: int = 15) -> str:
    return f"(('0x' || substr(md5({col_expr}), 1, {hex_digits}))::BIGINT)"
