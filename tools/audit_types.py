"""Audit Spark-vs-DuckDB result *types* for every (query, oracle) pair.

The driver's value-hash is type-sensitive (CORRECTNESS r01/r02 showed
SUM(int)->HUGEINT vs LongType hash-fails even with identical values), so the
oracle SQL must produce the same logical column types as the Spark plan.
This tool runs every registered pair at sf0.001 and reports per-column type
pairs that don't map to the same canonical type.

Usage: python tools/audit_types.py [sf_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"

# canonical type names: Spark simpleString -> canon, DuckDB type -> canon
SPARK_CANON = {
    "bigint": "i64",
    "int": "i32",
    "smallint": "i16",
    "tinyint": "i8",
    "double": "f64",
    "float": "f32",
    "string": "str",
    "boolean": "bool",
    "date": "date",
    "timestamp": "ts",
    "timestamp_ntz": "ts",
    "binary": "bin",
}

DUCK_CANON = {
    "BIGINT": "i64",
    "INTEGER": "i32",
    "SMALLINT": "i16",
    "TINYINT": "i8",
    "HUGEINT": "i128",
    "UBIGINT": "u64",
    "DOUBLE": "f64",
    "FLOAT": "f32",
    "VARCHAR": "str",
    "BOOLEAN": "bool",
    "DATE": "date",
    "TIMESTAMP": "ts",
    "TIMESTAMP_NS": "ts",
    "TIMESTAMP WITH TIME ZONE": "ts",
    "BLOB": "bin",
}


def canon_spark(t: str) -> str:
    if t.startswith("decimal"):
        return t  # decimal(p,s) compares literally
    if t.startswith("array<") or t.startswith("map<") or t.startswith("struct<"):
        return t
    return SPARK_CANON.get(t, t)


def canon_duck(t: str) -> str:
    t = str(t)
    if t.startswith("DECIMAL"):
        return t.lower().replace(" ", "")
    if t.endswith("[]") or t.startswith("STRUCT") or t.startswith("MAP"):
        return t.lower()
    return DUCK_CANON.get(t, t)


def main() -> int:
    from __spark_entry__ import oracle_sql, queries
    from datafusion_loki_spark.session import get_spark
    from tests.parity import duckdb_con

    spark = get_spark()
    con = duckdb_con(SF_DIR)
    qs, oracles = queries(), oracle_sql()
    bad = 0
    for name, fn in qs.items():
        sql = oracles.get(name)
        if sql is None:
            continue
        try:
            sdf = fn(spark, SF_DIR)
            stypes = {c.lower(): canon_spark(t) for c, t in sdf.dtypes}
            rel = con.sql(sql)
            dtypes = {
                c.lower(): canon_duck(t)
                for c, t in zip(rel.columns, rel.types)
            }
        except Exception as e:  # noqa: BLE001
            print(f"ERR  {name}: {type(e).__name__}: {e}")
            bad += 1
            continue
        if set(stypes) != set(dtypes):
            print(f"COLS {name}: spark={sorted(stypes)} duck={sorted(dtypes)}")
            bad += 1
            continue
        diffs = {
            c: (stypes[c], dtypes[c])
            for c in stypes
            if stypes[c] != dtypes[c]
        }
        if diffs:
            print(f"TYPE {name}: {diffs}")
            bad += 1
    print(f"\n{bad} pairs with type issues / {len(oracles)} oracle-checked pairs")
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
