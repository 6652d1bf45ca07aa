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
    # round-5 rotation: the never-driver-checked entries lead the window —
    # the 8 round-4 operators, log_approx_users (now oracle-backed via its
    # within_bound fold, so its first driver row is a full hash check),
    # and every operator added during round 5
    assert names[: len(e._NEVER_CHECKED)] == list(e._NEVER_CHECKED)
    assert names[:9] == [
        "text_repetition",
        "sample_docs_temperature",
        "mix_token_budget",
        "log_asof_join_chunked",
        "text_token_commonness",
        "sample_docs_hash_split",
        "log_retention_cohorts",
        "dedup_minhash_estimate",
        "log_approx_users",
    ]
    assert "log_approx_users" in e.oracle_sql()
    # every never-checked lead must carry a full-hash oracle, except ops
    # that are rows-only BY DESIGN (none currently in the leads)
    for n in e._NEVER_CHECKED:
        assert n in e.oracle_sql(), f"windowed lead {n} has no oracle"
    # everything outside the window is r03- or r04-driver-green and stays
    # covered by the local all-query parity suite until the next rotation
    r04_green = 50  # r04's window, all driver-checked
    r03_displaced = len(e._R03_BACKFILL) - (50 - len(e._NEVER_CHECKED))
    assert len(names) == 50 + r04_green + r03_displaced
    # pin the round-5 additions explicitly so a new query can't slip in
    # without a deliberate edit here
    assert len(e._NEVER_CHECKED) == 38
    assert len(names) == 138
