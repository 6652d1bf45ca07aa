"""Run EVERY registered query against its DuckDB oracle at sf0.01 (the
local mirror of the driver's correctness gate) and print the mismatch
list — `MISMATCHES: []` is the green state.

Usage: [SPARK_GRAFT_SF_DIR=...] python tools/preflight.py [name ...]
"""

from __future__ import annotations

import os
import sys
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(
    0,
    os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests"
    ),
)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    from parity import compare, duckdb_con

    import __spark_entry__ as entrymod
    from datafusion_loki_spark.session import get_spark

    spark = get_spark(app_name="preflight_r16")
    con = duckdb_con(sf_dir)
    queries = entrymod.queries()
    oracles = entrymod.oracle_sql()
    names = sys.argv[1:] or sorted(queries)
    bad = []
    for name in names:
        if name not in oracles:
            continue
        try:
            ok, msg = compare(queries[name](spark, sf_dir), oracles[name], con)
        except Exception as e:  # noqa: BLE001 — report, keep going
            ok, msg = False, f"EXC {e}"
            traceback.print_exc()
        print(("OK  " if ok else "BAD ") + name + ": " + msg, flush=True)
        if not ok:
            bad.append(name)
    print("MISMATCHES:", bad)
    spark.stop()


if __name__ == "__main__":
    main()
