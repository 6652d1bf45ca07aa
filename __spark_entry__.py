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


# The driver's correctness harness evaluates the FIRST 50 registry entries in
# insertion order. 95 registered queries cannot all fit, so coverage rotates
# by round: rounds 1-2 checked logs + most of tpch (green in r01); round 3
# front-loads the 34 LLM-pipeline operator queries (never driver-checked
# before) plus the 12 host-engine capability rows, the 2 repaired
# hash-mismatch log shapes, and 2 tpch sentinels (q12 proves the BIGINT-cast
# fix, q3 is the flagship). The remaining log shapes and tpch long tail —
# all green under the r01 driver run — follow after the window and rotate
# back in next round.
_WINDOW_PRIORITY = (
    # §2.2 host-engine capability rows (12)
    "log_full_scan",
    "log_projection",
    "log_label_eq",
    "log_label_ne",
    "log_line_like",
    "log_line_not_like",
    "log_line_regex",
    "log_time_range",
    "log_limit",
    "log_map_subscript",
    "log_map_subscript_filter",
    "log_conjunctive",
    # repaired type-sensitive oracle hashes (2)
    "log_sessionize_batch",
    "log_json_unwrap",
    # tpch sentinels (2)
    "q12_priority_class",
    "q3_shipping_priority",
    # the 34 operator queries, pinned explicitly so that NEW registry
    # entries (e.g. dedup_incremental, log_asof_join) land AFTER the
    # window and cannot silently evict a first-ever-checked operator row
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
