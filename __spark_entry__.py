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
# operators + host-engine capability rows (49/50 hash-green); r04 rotated to
# the remaining 50 (all green). Round 5 leads with the only entries that
# have never had a driver row: the 8 operators added during round 4
# (local-parity green only) and log_approx_users, which was deliberately
# oracle-less until this round — it now folds the sketch-vs-exact error
# bound into a deterministic within_bound bit, so its driver row carries a
# full value-hash check instead of the weak rows-only signal. New round-5
# operators follow, then the window backfills with the oldest-checked
# (r03-green) entries as re-green sentinels; the r03 tail left outside the
# window stays covered by the local all-query DuckDB parity suite
# (tests/test_parity.py).
# Window layout: never-driver-checked entries first (r4 ops, the newly
# oracle-backed sketch op, then everything added during round 5), padded to
# 50 with the oldest-checked (r03-green) entries as re-green sentinels.
_NEVER_CHECKED = (
    # added during round 4 — never driver-checked (8)
    "text_repetition",
    "sample_docs_temperature",
    "mix_token_budget",
    "log_asof_join_chunked",
    "text_token_commonness",
    "sample_docs_hash_split",
    "log_retention_cohorts",
    "dedup_minhash_estimate",
    # sketch op, first-ever oracle-backed driver row (1)
    "log_approx_users",
    # added during round 5
    "text_tfidf_topk",
    "log_rate_anomaly",
    "emb_quantize_int8",
    "emb_kmeans_assign",
    "log_scrub_pii",
    "sim_ivf_kmeans_topk",
    "log_value_histogram",
    "log_templates",
    "log_heavy_hitters",
    "text_bigram_lm",
    "sim_pq_adc_topk",
    "emb_pca_project",
    "dedup_method_agreement",
    "corpus_build_manifest",
    "log_approx_quantile_audit",
    "log_session_window_batch",
    "mm_exact_dedup",
    "graph_pagerank_dups",
    "mix_epoch_plan",
    "sim_recall_audit",
    "dedup_similarity_histogram",
    "log_slo_burn",
    "sim_pq_recall_audit",
    "dedup_canonical_by_rank",
    "emb_norm_distribution",
    "sample_docs_importance",
    "log_active_users",
    "text_vocab_growth",
    "dedup_lsh_tuning_curve",
)

_R03_BACKFILL = (
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

_WINDOW_PRIORITY = _NEVER_CHECKED + _R03_BACKFILL[: 50 - len(_NEVER_CHECKED)]


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
