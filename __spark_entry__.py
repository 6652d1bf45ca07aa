"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

Query inventory lives in ``datafusion_loki_spark/plans/`` and
``datafusion_loki_spark/operators/``; this module only aggregates.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    Runs the Q3-shape join+agg+topk — the densest exercise of the engine
    surface (scan pushdown, broadcast join, shuffle agg, TakeOrdered).
    """
    from datafusion_loki_spark.plans.tpch import q3_shipping_priority

    return q3_shipping_priority(spark, "/root/testdata/sf0.001")


def _registry() -> tuple[dict[str, Callable], dict[str, str]]:
    from datafusion_loki_spark.operators import (
        dedup,
        multimodal,
        sampling,
        similarity,
        text,
    )
    from datafusion_loki_spark.plans import logs, tpch

    queries: dict[str, Callable] = {}
    oracles: dict[str, str] = {}
    for mod in (logs, tpch, dedup, multimodal, sampling, similarity, text):
        queries.update(mod.QUERIES)
        oracles.update(mod.ORACLES)
    return queries, oracles


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return _registry()[0]


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL for each queries() entry (omitted → rows-only)."""
    return _registry()[1]
