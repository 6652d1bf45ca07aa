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


# The driver's correctness harness evaluates the FIRST 50 registry entries
# in insertion order. The registry holds more queries than fit, so coverage
# rotates by round. Rotation policy (restated round 8 to match the
# arithmetic: a full pass over N registered queries takes ceil(N/50)
# windows, so the guarantee is "every entry re-checked within
# ceil(N/50)+1 rounds" — the +1 absorbs new/changed entries displacing
# stale slots):
#
#   1. entries NEW or CHANGED this round lead (hand-pinned in
#      _R16_PINNED — their plans and output must re-earn a driver row);
#   2. the rest of the window is DERIVED from the committed
#      CORRECTNESS_r*.json files: never-green entries first (never
#      checked, or checked red), then ascending latest-green round,
#      tie-broken by registration order.
#
# Rounds 1-7 hand-listed the window each round; the bookkeeping drifted
# (round-7 VERDICT: comment said 46 stale, parsing the files gave 41),
# so round 8 computes it at import time. Everything outside the window
# stays covered by the local all-query DuckDB parity suite
# (tests/test_parity.py); the structural guards are
# test_unchecked_queries_lead_the_window (never-checked entries must sit
# in the prefix) and test_correctness_window_is_pinned (prefix ==
# _WINDOW_PRIORITY, staleness ordering holds).
_R16_PINNED: tuple[str, ...] = (
    # --- changed in round 16 (optimization round 2: no new queries;
    # every pin is a face whose internals/plan changed while its output
    # stayed oracle-identical — each must re-earn a driver row) ---
    # CHANGED r16: one shared signature checkpoint feeds both the LSH
    # banding and the estimator join (was two signature DAG executions)
    "dedup_minhash_estimate",
    # CHANGED r16: CC labels enter as an Arrow LocalTableScan (was a
    # pickled-Python RDD) — every composition below consumes them
    "dedup_cc_groups",
    "dedup_keep_list",
    "mm_dedup_keep_list",
    "mm_pipeline_funnel",
    # CHANGED r16: BPE batch/vocab frames are Arrow local relations
    # (one sliced frame for all rounds); vocab-growth spine is literal
    "text_bpe_vocab",
    "text_tokenize_bpe",
    "text_tokenize_bpe_oov",
    "text_vocab_growth",
    # CHANGED r16: IVF lifecycle — fs.exists ingest probe, CollectLimit
    # gate probe, Arrow codebook frame, collected probe frame
    "sim_ivf_index_topk",
    "sim_ivf_index_append",
    "sim_ivf_index_delete",
    "sim_ivf_index_retrain",
    "sim_ivf_snapshot_reads",
    "dedup_semantic_cluster",
    "mm_semantic_dedup",
    # CHANGED r16: local-fit gates (narrow probe + replay guards)
    "sim_ivf_kmeans_topk",
    "sim_pq_adc_topk",
)

_WINDOW_SIZE = 50


def _latest_green_round() -> dict[str, int]:
    """name -> staleness key: the round of the entry's most recent
    committed driver row IF that row was fully green, else -1.

    Keying on the LATEST CHECK (not the latest green) matters for
    regressions: an entry green in r7 but red in r8 must sort as
    never-green (-1) and lead the next rotation — keying on the old
    green round would file a known-broken entry among the freshest and
    delay its re-check by a full rotation (round-8 review)."""
    import glob
    import json
    import re

    here = os.path.dirname(os.path.abspath(__file__))
    latest_check: dict[str, tuple[int, bool]] = {}
    for path in glob.glob(os.path.join(here, "CORRECTNESS_r*.json")):
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", path)
        if not m:
            continue
        rnd = int(m.group(1))
        with open(path) as f:
            rows = json.load(f)
        for name, row in rows.items():
            green = bool(
                row.get("err") is None
                and row.get("rows_match")
                and row.get("schema_match")
                and row.get("hash_match", True)
            )
            if rnd >= latest_check.get(name, (-1, False))[0]:
                latest_check[name] = (rnd, green)
    return {
        name: (rnd if green else -1)
        for name, (rnd, green) in latest_check.items()
    }


def _window_priority(
    registered: list[str], latest: "dict[str, int] | None" = None
) -> tuple[str, ...]:
    """Pinned new/changed entries, then the stalest tail, derived.

    A pinned name missing from the registry is a hard error — the pin
    list is the ONLY hand-maintained piece of the rotation, and a typo
    silently dropping a new query's guaranteed lead slot is exactly the
    failure class the derivation exists to prevent."""
    if latest is None:
        latest = _latest_green_round()
    order = {n: i for i, n in enumerate(registered)}
    unknown = [n for n in _R16_PINNED if n not in order]
    if unknown:
        raise KeyError(
            f"_R16_PINNED names not in the registry (typo?): {unknown}"
        )
    pinned = list(_R16_PINNED)
    tail = sorted(
        (n for n in registered if n not in _R16_PINNED),
        key=lambda n: (latest.get(n, -1), order[n]),
    )
    return tuple((pinned + tail)[:_WINDOW_SIZE])


_REGISTRY_CACHE: "tuple[dict, dict] | None" = None


def _registry() -> tuple[dict[str, Callable], dict[str, str]]:
    # memoized: bench.py / scale_smoke / the parity suite call
    # queries()/oracle_sql() in loops, and the window derivation reads
    # every committed CORRECTNESS file — derive once per process (the
    # committed files don't change mid-run)
    global _REGISTRY_CACHE
    if _REGISTRY_CACHE is not None:
        return _REGISTRY_CACHE
    from datafusion_loki_spark.operators import (
        dedup,
        multimodal,
        sampling,
        similarity,
        text,
    )
    from datafusion_loki_spark.plans import logs, tpch

    merged: dict[str, Callable] = {}
    oracles: dict[str, str] = {}
    for mod in (logs, tpch, dedup, multimodal, sampling, similarity, text):
        merged.update(mod.QUERIES)
        oracles.update(mod.ORACLES)
    queries: dict[str, Callable] = {}
    for name in _window_priority(list(merged)):
        queries[name] = merged[name]
    for name, fn in merged.items():
        queries.setdefault(name, fn)
    _REGISTRY_CACHE = (queries, oracles)
    return _REGISTRY_CACHE


# kept as a module constant so tests (and humans) can inspect the pinned
# window without re-deriving it
_WINDOW_PRIORITY = None  # set lazily below


def _window() -> tuple[str, ...]:
    global _WINDOW_PRIORITY
    if _WINDOW_PRIORITY is None:
        _WINDOW_PRIORITY = tuple(list(_registry()[0])[:_WINDOW_SIZE])
    return _WINDOW_PRIORITY


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return _registry()[0]


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL for each queries() entry (omitted → rows-only)."""
    return _registry()[1]
