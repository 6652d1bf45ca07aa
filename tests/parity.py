"""Local mirror of the driver's DuckDB-oracle correctness gate.

Runs a Spark query and its DuckDB oracle SQL on the same parquet tables and
compares row count, sorted column names, and an order-insensitive normalized
value multiset. Normalization: floats rounded to 6 significant-ish decimals,
timestamps to ISO strings, NaN/None unified — approximating whatever hashing
the driver does while staying strict on real value differences.
"""

from __future__ import annotations

import math
import os
from datetime import datetime

import duckdb

TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)


def duckdb_con(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        path = os.path.join(sf_dir, f"{t}.parquet")
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')")
    return con


def _norm(v):
    if v is None:
        return "∅"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        if v == int(v) and abs(v) < 1e15:
            return str(int(v))
        return repr(v)
    if isinstance(v, datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_norm(x) for x in v) + "]"
    if isinstance(v, dict):
        return "{" + ",".join(f"{k}:{_norm(v[k])}" for k in sorted(v)) + "}"
    return str(v)


def _canon(rows, colnames):
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])
    out = []
    for row in rows:
        vals = list(row)
        out.append(tuple(_norm(vals[i]) for i in order))
    out.sort()
    return out


def compare(spark_df, oracle_sql: str, con) -> tuple[bool, str]:
    s_rows = spark_df.collect()
    s_cols = [c.lower() for c in spark_df.columns]
    rel = con.sql(oracle_sql)
    d_rows = rel.fetchall()
    d_cols = [c.lower() for c in rel.columns]

    if sorted(s_cols) != sorted(d_cols):
        return False, f"schema mismatch: spark={sorted(s_cols)} duckdb={sorted(d_cols)}"
    if len(s_rows) != len(d_rows):
        return False, f"row count mismatch: spark={len(s_rows)} duckdb={len(d_rows)}"
    s_canon = _canon([tuple(r) for r in s_rows], s_cols)
    d_canon = _canon(d_rows, d_cols)
    if s_canon != d_canon:
        diff = [(a, b) for a, b in zip(s_canon, d_canon) if a != b][:3]
        return False, f"value mismatch, first diffs: {diff}"
    return True, f"ok ({len(s_rows)} rows)"
