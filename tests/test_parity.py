"""Run every queries() entry against its DuckDB oracle at sf0.001 —
the local mirror of the driver's t2 correctness gate."""

from __future__ import annotations

import pytest

import __spark_entry__ as entrymod
from tests.parity import compare, duckdb_con

_QUERIES = entrymod.queries()
_ORACLES = entrymod.oracle_sql()


@pytest.fixture(scope="module")
def con(sf_dir):
    c = duckdb_con(sf_dir)
    yield c
    c.close()


@pytest.mark.parametrize("name", sorted(_QUERIES))
def test_query_parity(name, spark, sf_dir, con):
    df = _QUERIES[name](spark, sf_dir)
    if name not in _ORACLES:
        # rows-only check (driver does the same for non-SQL-expressible ops)
        assert df.count() >= 0
        return
    ok, msg = compare(df, _ORACLES[name], con)
    assert ok, f"{name}: {msg}"


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    assert df.count() > 0


def test_correctness_window_is_pinned():
    # The driver's correctness harness evaluates only the FIRST 50 registry
    # entries; the window is pinned explicitly so a new query can never
    # silently evict a first-ever-checked operator row.
    import __spark_entry__ as e

    names = list(e.queries())
    assert len(e._WINDOW_PRIORITY) == 50
    assert names[:50] == list(e._WINDOW_PRIORITY)
    # round-7 rotation: the six never-driver-checked late-r06 additions
    # lead, then the eleven round-7 registrations, then the thirty
    # r07-changed entries (the module-review fixes), then the 3
    # highest-value r04-stale entries (the CC/keep-list pipeline); the
    # 46-entry stale remainder rotates in r08
    lead = (list(e._R07_NEVER_CHECKED) + list(e._R07_NEW)
            + list(e._R07_CHANGED))
    assert names[: len(lead)] == lead
    assert len(e._R07_NEVER_CHECKED) == 6
    assert len(e._R07_NEW) == 11
    assert len(e._R07_CHANGED) == 30
    assert len(e._R04_STALE) == 3
    # no windowed entry may be oracle-less
    for n in e._WINDOW_PRIORITY:
        assert n in e.oracle_sql(), f"windowed entry {n} has no oracle"
    # the r08 carry-over: the r04-checked tail still outside the window
    for n in ("log_top_user_per_type", "log_rate_per_minute",
              "log_events_by_nation", "log_median_value_pandas",
              "log_agg_by_label", "log_time_bucket",
              "log_funnel", "log_rolling_range", "log_gap_fill",
              "log_asof_join", "log_interval_join_batch",
              "q1_pricing_summary", "q4_order_priority",
              "q22_global_sales_opportunity",
              "q2_min_cost_supplier",
              "q6_forecast_revenue", "q8_market_share",
              "q13_customer_distribution",
              "q16_supplier_part_count",
              "q21_waiting_suppliers",
              "q7_nation_volume", "q9_product_profit",
              "q15_top_supplier", "q17_small_quantity_revenue",
              "q14_promo_revenue", "q19_bracket_filter",
              "q5_local_supplier_volume",
              "q10_returned_items", "q_window_top_orders",
              "q_window_running_sum", "q_subquery_above_avg", "q_set_ops",
              "q_set_ops_all", "q_conditional_agg", "q_having",
              "q_rollup", "q_cube", "q_percentiles",
              "q_window_lead_lag", "q_pivot", "q_window_rank_stats"):
        assert n in names[50:], n
    assert len(names) == 163


def test_unchecked_queries_lead_the_window():
    # Structural guard (round-6 VERDICT #2): a query registered after the
    # window was pinned used to wait silently for a full round. Parse the
    # committed CORRECTNESS_r*.json files — every registry entry that has
    # NEVER earned a driver row must sit inside the current 50-entry
    # window prefix, so the next driver run checks it. If this fails,
    # rotate _WINDOW_PRIORITY before adding more queries.
    import glob
    import json
    import os

    import __spark_entry__ as e

    repo = os.path.dirname(os.path.abspath(e.__file__))
    checked: set[str] = set()
    files = sorted(glob.glob(os.path.join(repo, "CORRECTNESS_r*.json")))
    assert files, "no committed CORRECTNESS files found"
    for f in files:
        checked.update(json.load(open(f)))
    names = list(e.queries())
    never = [n for n in names if n not in checked]
    window = set(names[:50])
    missing = [n for n in never if n not in window]
    assert not missing, (
        f"never-driver-checked queries outside the 50-entry window: "
        f"{missing} — move them into _WINDOW_PRIORITY"
    )

