"""Unit tests for the shared withhold-max-timestamp pager — specifically
the wire-unit normalization that the e2e suite (whose emulator always
emits TIMESTAMP(NANOS)) cannot reach: a store emitting µs timestamps
cast raw to int64 would make `cur = max_ts` jump back to ~1970 and
re-request the same page forever."""

from __future__ import annotations

import io

import pyarrow as pa
import pyarrow.parquet as pq

from datafusion_loki_spark.sources import loki as loki_mod
from datafusion_loki_spark.sources.loki import _page_tables, _ts_ns_ints

NS = 1_000_000_000


def _parquet_bytes(table: pa.Table) -> bytes:
    buf = io.BytesIO()
    pq.write_table(table, buf)
    return buf.getvalue()


def _table_us(ts_ns_values):
    return pa.table(
        {
            "timestamp": pa.array(
                [v // 1000 for v in ts_ns_values], pa.timestamp("us")
            ),
            "line": [f"l{v}" for v in ts_ns_values],
        }
    )


def test_ts_ns_ints_normalizes_us_wire():
    t = _table_us([5 * NS, 6 * NS])
    assert _ts_ns_ints(t).to_pylist() == [5 * NS, 6 * NS]


def test_ts_ns_ints_passes_through_int64_nanos():
    t = pa.table({"timestamp": pa.array([7 * NS], pa.int64())})
    assert _ts_ns_ints(t).to_pylist() == [7 * NS]


def test_page_tables_terminates_and_loses_nothing_on_us_wire(monkeypatch):
    # 10 rows at distinct seconds, µs-encoded wire, page_limit 3: the
    # pager must visit every row exactly once and terminate. With the
    # old raw int64 cast, max_ts would read as ~epoch-µs (1000× small),
    # cur would never advance past start, and the scan would loop.
    rows = [(i + 1) * NS for i in range(10)]

    def fake_query_range(endpoint, query, start_ns, end_ns, limit):
        keep = [v for v in rows if start_ns <= v < end_ns][:limit]
        return _parquet_bytes(_table_us(keep)) if keep else b""

    monkeypatch.setattr(loki_mod.loki_client, "query_range", fake_query_range)
    got = []
    for t in _page_tables("ep", "{}", 0, 100 * NS, 3):
        got.extend(_ts_ns_ints(t).to_pylist())
    assert got == rows  # no loss, no dup, forward order


def test_page_tables_degenerate_single_ns_full_page(monkeypatch):
    # >page_limit rows in one nanosecond: the pager must emit the page
    # as-is and step 1 ns past it instead of spinning.
    calls = []

    def fake_query_range(endpoint, query, start_ns, end_ns, limit):
        calls.append(start_ns)
        if start_ns <= 5 * NS < end_ns:
            return _parquet_bytes(_table_us([5 * NS] * limit))
        return b""

    monkeypatch.setattr(loki_mod.loki_client, "query_range", fake_query_range)
    got = []
    for t in _page_tables("ep", "{}", 0, 100 * NS, 3):
        got.extend(_ts_ns_ints(t).to_pylist())
    assert got == [5 * NS] * 3
    assert calls == [0, 5 * NS + 1]  # stepped exactly 1 ns past the clump


def test_page_tables_empty_window_no_requests(monkeypatch):
    def boom(*a):
        raise AssertionError("no request expected")

    monkeypatch.setattr(loki_mod.loki_client, "query_range", boom)
    assert list(_page_tables("ep", "{}", 10, 10, 3)) == []
    assert list(_page_tables("ep", "{}", 20, 10, 3)) == []


def _table_i64(ts_ns_values):
    return pa.table(
        {
            "timestamp": pa.array(ts_ns_values, pa.int64()),
            "labels": [[("app", "a")] for _ in ts_ns_values],
            "line": [f"l{v}" for v in ts_ns_values],
        }
    )


def _table_ns(ts_ns_values):
    return pa.table(
        {
            "timestamp": pa.array(ts_ns_values, pa.timestamp("ns")),
            "labels": [[("app", "a")] for _ in ts_ns_values],
            "line": [f"l{v}" for v in ts_ns_values],
        }
    )


def test_stream_rows_normalize_int64_ns_wire():
    # The streaming tail's row conversion must run the SAME wire-unit
    # dispatch as the batch reader: on the int64-ns encoding a raw
    # cast-to-timestamp('us') reinterprets ns counts as µs and puts
    # every streamed row ~1000x in the future while the batch read of
    # the identical page is correct — the silent batch/streaming
    # divergence the shared pager exists to prevent.
    from datafusion_loki_spark.sources.loki import LokiStreamReader

    vals = [5 * NS, 6 * NS]
    for make in (_table_ns, _table_i64):
        rows = LokiStreamReader._rows(make(vals))
        got_ns = [
            int(ts.timestamp() * 1_000_000) * 1000 for ts, _, _ in rows
        ]
        assert got_ns == vals, (make.__name__, got_ns)
        assert all(ts.year == 1970 for ts, _, _ in rows)


def test_page_tables_max_rows_budget(monkeypatch):
    # The pushed-down LIMIT rides the shared pager: pages ask for
    # min(page_limit, remaining), the total never exceeds max_rows, a
    # full page of exactly-remaining rows finishes WITHOUT the withhold
    # step (forward order makes the first N rows the right ones), and
    # the boundary protocol still holds while the scan continues.
    # 10 distinct-second rows + a 3-row single-ns tail (exactly
    # page_limit — MORE than page_limit in one ns is the documented
    # truncation case, not this test's subject)
    rows = [(i + 1) * NS for i in range(10)] + [20 * NS] * 3
    asks = []

    def fake_query_range(endpoint, query, start_ns, end_ns, limit):
        asks.append(limit)
        keep = [v for v in sorted(rows) if start_ns <= v < end_ns][:limit]
        return _parquet_bytes(_table_us(keep)) if keep else b""

    monkeypatch.setattr(loki_mod.loki_client, "query_range", fake_query_range)

    def run(max_rows, page_limit=3):
        asks.clear()
        got = []
        for t in _page_tables("ep", "{}", 0, 100 * NS, page_limit,
                              max_rows=max_rows):
            got.extend(_ts_ns_ints(t).to_pylist())
        return got

    # budget smaller than one page: one request of exactly max_rows
    assert run(2) == [1 * NS, 2 * NS]
    assert asks == [2]
    # budget spanning pages: forward prefix, never over-emitted
    assert run(7) == [(i + 1) * NS for i in range(7)]
    # budget of exactly the store's row count
    assert len(run(13)) == 13
    # no budget: everything (incl. the 3-row single-ns tail)
    assert len(run(None)) == 13
