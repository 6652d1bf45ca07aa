"""Deterministic sampling operators for training-data pipelines
(north-star extension per BASELINE.json; no reference analogue).

Sampling at 100 TB must be (a) a pure filter — no shuffle, no
materialized random state — and (b) reproducible across engines, runs,
and partitionings. Spark's ``df.sample`` is per-partition-seeded (results
change under repartitioning) and has no DuckDB twin, so both operators
here derive the sampling decision from md5 over a stable row key: the
decision travels with the row, not with the executor layout.

``substring(md5(key), 1, 4)`` is uniform over 16^4 = 65536 hex buckets;
keeping rows below a hex threshold yields rate = threshold/65536. A pure
string comparison — identical semantics in Spark and DuckDB, fully
codegen'd, pushed to the scan as a filter.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from datafusion_loki_spark.catalog import load_table

# hex thresholds: '1999' ≈ 10% of 65536; '0ccc' ≈ 5%; '3333' ≈ 20%
_RATE_10 = "1999"
_RATE_20 = "3333"
_RATE_5 = "0ccc"


def sample_events_uniform(spark: SparkSession, sf_dir: str) -> DataFrame:
    """~10% uniform deterministic sample of the event stream keyed on
    event_id. The filter is computed from the row alone → identical output
    at any partition count, any cluster size, any run."""
    ev = load_table(spark, sf_dir, "events")
    return ev.where(
        F.expr(f"substring(md5(cast(event_id as string)), 1, 4) < '{_RATE_10}'")
    )


ORACLE_SAMPLE_UNIFORM = f"""
SELECT * FROM events
WHERE substring(md5(CAST(event_id AS VARCHAR)), 1, 4) < '{_RATE_10}'
"""


def sample_docs_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stratified deterministic sample of documents with per-language
    rates (upsample scarce langs, downsample dominant ones) — the standard
    data-mixture rebalancing step before training.

    Per-stratum rate via a CASE over the same md5 bucket; output carries
    the stratum and the bucket for auditability. Pure filter+project —
    at 100 TB this runs at scan speed with the predicate pushed down."""
    docs = load_table(spark, sf_dir, "documents")
    bucket = "substring(md5(cast(doc_id as string)), 1, 4)"
    keep = (
        f"CASE WHEN lang = 'en' THEN {bucket} < '{_RATE_5}' "
        f"WHEN lang IN ('de', 'fr') THEN {bucket} < '{_RATE_20}' "
        f"ELSE {bucket} < '{_RATE_10}' END"
    )
    return docs.where(F.expr(keep)).select(
        "doc_id", "lang", "source", F.expr(bucket).alias("sample_bucket")
    )


ORACLE_SAMPLE_STRATIFIED = f"""
SELECT doc_id, lang, source,
       substring(md5(CAST(doc_id AS VARCHAR)), 1, 4) AS sample_bucket
FROM documents
WHERE CASE WHEN lang = 'en'
             THEN substring(md5(CAST(doc_id AS VARCHAR)), 1, 4) < '{_RATE_5}'
           WHEN lang IN ('de', 'fr')
             THEN substring(md5(CAST(doc_id AS VARCHAR)), 1, 4) < '{_RATE_20}'
           ELSE substring(md5(CAST(doc_id AS VARCHAR)), 1, 4) < '{_RATE_10}' END
"""


def sample_docs_per_source_topn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source cap (top-N by deterministic hash order): keep at most 5
    documents per source — the 'no single crawl domain dominates' guard.

    row_number over (source, hash-order) then filter; one shuffle on
    source. At 100 TB with a skewed source distribution the window
    partitioning is the right tool only because the cap is small; for
    large caps switch to the salted variant in functions/skew.py."""
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents")
    w = Window.partitionBy("source").orderBy(
        F.expr("md5(cast(doc_id as string))"), F.col("doc_id")
    )
    return (
        docs.select("doc_id", "source")
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= 5)
    )


ORACLE_SAMPLE_TOPN = """
SELECT doc_id, source, rn FROM (
  SELECT doc_id, source,
         ROW_NUMBER() OVER (PARTITION BY source
                            ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn
  FROM documents
)
WHERE rn <= 5
"""


QUERIES = {
    "sample_events_uniform": sample_events_uniform,
    "sample_docs_stratified": sample_docs_stratified,
    "sample_docs_per_source_topn": sample_docs_per_source_topn,
}

ORACLES = {
    "sample_events_uniform": ORACLE_SAMPLE_UNIFORM,
    "sample_docs_stratified": ORACLE_SAMPLE_STRATIFIED,
    "sample_docs_per_source_topn": ORACLE_SAMPLE_TOPN,
}
