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
# in insertion order. The registry holds more queries than fit (the exact
# arithmetic is pinned by tests/test_parity.py::test_correctness_window_is_
# pinned — never trust a count literal here), so coverage rotates by round:
# r01-r02 checked logs + most of tpch; r03 front-loaded the LLM-pipeline
# operators + host-engine capability rows; r04 rotated to the remaining 50;
# r05 closed the loop — every registry entry now has at least one driver
# row and all are green at their latest check.
#
# Round-6 rotation policy ("every entry re-checked within 2 rounds"):
# entries whose implementation CHANGED this round lead (their plans/output
# must re-earn a driver row), then the stalest tail — the 38 entries whose
# last driver row is r03 — then the window pads with the oldest r04-checked
# entries. The r04 remainder rotates in next round; everything outside the
# window stays covered by the local all-query DuckDB parity suite
# (tests/test_parity.py).
_R06_NEW = (
    # added during round 6 — never driver-checked
    "emb_outlier_zscore",
    "mix_pack_sequences",
    "mix_pack_greedy",
    "dedup_cross_source_overlap",
    "log_burn_alerts",
    "log_transition_matrix",
    "mix_quality_vs_dedup",
    "emb_centroid_drift",
)

_R06_CHANGED = (
    # small-group abstention gate added to within_bound this round
    "log_approx_quantile_audit",
    # sample-fit codebook training (round-6 scale fix) changes both DAGs
    "sim_ivf_kmeans_topk",
    "sim_pq_adc_topk",
)

_R03_STALE = (
    # last driver row r03 (sim_topk_pandas additionally gained its
    # full-hash oracle this round — previously rows-only by design)
    "log_sessionize_batch",
    "log_json_unwrap",
    "q12_priority_class",
    "q3_shipping_priority",
    "dedup_exact_docs",
    "dedup_bow",
    "dedup_events_exact",
    "dedup_minhash_lsh",
    "dedup_ngram_jaccard",
    "dedup_edit_distance",
    "dedup_contamination",
    "dedup_embedding_cosine",
    "dedup_chunks",
    "dedup_simhash",
    "sim_topk_cosine",
    "emb_centroid_by_label",
    "emb_vector_stats",
    "emb_stats_arrow",
    "sim_lsh_buckets",
    "sim_lsh_candidates",
    "sim_lsh_multiprobe",
    "sim_ivf_topk",
    "sim_topk_pandas",
    "text_stats",
    "text_chunk_udtf",
    "text_quality_filter",
    "text_lang_id",
    "text_lang_id_ngram",
    "text_fingerprint",
    "text_token_freq",
    "text_token_count_bpe",
    "sample_events_uniform",
    "sample_docs_stratified",
    "sample_docs_per_source_topn",
    "mm_binary_meta",
    "mm_decode_features",
    "mm_resize",
    "mm_frame_sample",
)

_R04_OLDEST = (
    # r04-checked; the oldest slice pads the window, the rest rotate in r07
    "dedup_incremental",
)

_WINDOW_PRIORITY = _R06_NEW + _R06_CHANGED + _R03_STALE + _R04_OLDEST


def _registry() -> tuple[dict[str, Callable], dict[str, str]]:
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
    for name in _WINDOW_PRIORITY:
        queries[name] = merged[name]
    for mod in (dedup, similarity, text, sampling, multimodal, logs, tpch):
        for name, fn in mod.QUERIES.items():
            queries.setdefault(name, fn)
    return queries, oracles


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return _registry()[0]


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL for each queries() entry (omitted → rows-only)."""
    return _registry()[1]
