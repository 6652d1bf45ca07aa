"""Dump per-query `.explain("formatted")` output into plans/r16/.

Usage: python tools/dump_plans_r16.py before|after [query ...]
Writes plans/r16/<query>_<tag>.txt for each named query (default: all
headline BENCH_QUERIES) at $SPARK_GRAFT_SF_DIR (default sf0.1).
"""

from __future__ import annotations

import contextlib
import io
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    tag = sys.argv[1]
    names = sys.argv[2:]
    from bench import BENCH_QUERIES
    from datafusion_loki_spark.session import get_spark

    import __spark_entry__ as entrymod

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans",
        "r16",
    )
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark(app_name=f"dump_plans_r16_{tag}")
    queries = entrymod.queries()
    for name in names or BENCH_QUERIES:
        df = queries[name](spark, sf_dir)
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        path = os.path.join(out_dir, f"{name}_{tag}.txt")
        with open(path, "w") as f:
            f.write(buf.getvalue().rstrip() + "\n")
        print("wrote", path)
    spark.stop()


if __name__ == "__main__":
    main()
