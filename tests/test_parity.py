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
    # round-6 rotation: never-checked round-6 additions lead, then
    # changed-this-round entries (their plans must re-earn a driver row),
    # then the full r03-stale tail, then the oldest r04-checked padding
    assert names[:11] == [
        "emb_outlier_zscore",
        "mix_pack_sequences",
        "mix_pack_greedy",
        "dedup_cross_source_overlap",
        "log_burn_alerts",
        "log_transition_matrix",
        "mix_quality_vs_dedup",
        "emb_centroid_drift",
        "log_approx_quantile_audit",
        "sim_ivf_kmeans_topk",
        "sim_pq_adc_topk",
    ]
    lead = list(e._R06_NEW) + list(e._R06_CHANGED)
    assert names[: len(lead)] == lead
    assert (
        names[len(lead) : len(lead) + len(e._R03_STALE)]
        == list(e._R03_STALE)
    )
    # sim_topk_pandas gained its oracle this round — the window row must
    # now be a full-hash check, and no windowed entry may be oracle-less
    assert "sim_topk_pandas" in e.oracle_sql()
    for n in e._WINDOW_PRIORITY:
        assert n in e.oracle_sql(), f"windowed entry {n} has no oracle"
    # the window partition accounts for the whole registry: 8 new + 3
    # changed + 38 r03-stale + 1 of the 50 r04-checked; the other 49 r04
    # entries, the 50 r05-checked entries, and the two r06-late additions
    # (text_lang_confusion, log_spike_attribution — local-parity green,
    # due to lead the r07 window) sit outside, covered by this suite
    assert len(e._R06_NEW) == 8
    assert len(e._R06_CHANGED) == 3
    assert len(e._R03_STALE) == 38
    assert len(e._R04_OLDEST) == 1
    assert "text_lang_confusion" in names[50:]
    assert "log_spike_attribution" in names[50:]
    assert "mm_chunk_dedup" in names[50:]
    assert "log_histogram_drift" in names[50:]
    assert "dedup_pipeline_funnel" in names[50:]
    assert "sim_cell_balance" in names[50:]
    assert len(names) == 152
