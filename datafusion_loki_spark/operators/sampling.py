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
from datafusion_loki_spark.operators.text import _NORM_DUCK, _NORM_SPARK

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


def sample_docs_temperature(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-balanced (T=2) language rebalancing: per-language keep
    rate sqrt(n_min / n_lang) — the scarcest language keeps everything,
    dominant languages are downsampled toward the sqrt-flattened mixture
    (the standard multilingual data-mixing rule; T=2 keeps every float op
    an IEEE-exact sqrt/divide, portable across engines bit-for-bit).

    The keep decision is the same deterministic md5 bucket as the other
    samplers, compared against a %04x-rendered threshold — reproducible
    under any partitioning. rate = 1.0 short-circuits the comparison so
    the scarcest language is kept EXACTLY fully (no 'ffff' edge loss).

    100 TB posture: the per-language histogram is a tiny broadcast (two
    map-side-partial aggs over the scan); the decision itself is a pure
    filter — the corpus never shuffles."""
    docs = load_table(spark, sf_dir, "documents")
    counts = docs.groupBy("lang").agg(F.count("*").alias("n_lang"))
    n_min = counts.agg(F.min("n_lang").alias("n_min"))
    rates = counts.crossJoin(F.broadcast(n_min)).select(
        "lang",
        "n_lang",
        F.expr("sqrt(cast(n_min as double) / cast(n_lang as double))").alias(
            "keep_rate"
        ),
    )
    bucket = "substring(md5(cast(doc_id as string)), 1, 4)"
    return (
        docs.join(F.broadcast(rates), "lang")
        .where(
            F.expr(
                f"keep_rate >= 1.0d OR {bucket} < "
                "format_string('%04x', cast(floor(keep_rate * 65536) as int))"
            )
        )
        .select(
            "doc_id", "lang", "keep_rate", F.expr(bucket).alias("sample_bucket")
        )
    )


ORACLE_SAMPLE_TEMPERATURE = """
WITH counts AS (
  SELECT lang, COUNT(*) AS n_lang FROM documents GROUP BY lang
), r AS (
  SELECT lang, n_lang,
         sqrt(CAST((SELECT MIN(n_lang) FROM counts) AS DOUBLE)
              / CAST(n_lang AS DOUBLE)) AS keep_rate
  FROM counts
)
SELECT d.doc_id, d.lang, r.keep_rate,
       substring(md5(CAST(d.doc_id AS VARCHAR)), 1, 4) AS sample_bucket
FROM documents d JOIN r ON d.lang = r.lang
WHERE r.keep_rate >= 1.0
   OR substring(md5(CAST(d.doc_id AS VARCHAR)), 1, 4)
      < printf('%04x', CAST(floor(r.keep_rate * 65536) AS INT))
"""


def sample_docs_hash_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic train/val/test assignment (~90/5/5): the split every
    training pipeline needs, derived from the content-independent doc_id
    hash so it is stable across reprocessing runs, engines, and partition
    layouts — re-ingesting a doc can never move it between splits.

    Pure projection (no shuffle, no RNG); the hex thresholds mirror the
    samplers above ('e666' ≈ 90%, 'f333' ≈ 95% of 16^4 buckets)."""
    docs = load_table(spark, sf_dir, "documents")
    bucket = "substring(md5(cast(doc_id as string)), 1, 4)"
    return docs.select(
        "doc_id",
        "lang",
        "source",
        F.expr(
            f"CASE WHEN {bucket} < 'e666' THEN 'train' "
            f"WHEN {bucket} < 'f333' THEN 'val' ELSE 'test' END"
        ).alias("split"),
    )


ORACLE_SAMPLE_HASH_SPLIT = """
SELECT doc_id, lang, source,
       CASE WHEN substring(md5(CAST(doc_id AS VARCHAR)), 1, 4) < 'e666'
              THEN 'train'
            WHEN substring(md5(CAST(doc_id AS VARCHAR)), 1, 4) < 'f333'
              THEN 'val'
            ELSE 'test' END AS split
FROM documents
"""


MIX_TOKEN_BUDGET = 20_000  # global token budget B for the mixture


def _lang_weight_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(lang, n_docs, avail_tokens, weight, w_sum_dec): the sqrt-weighted
    per-language token inventory with the DECIMAL(38,15)-exact mixture
    denominator riding a 1-row broadcast — shared by the budget allocator
    and the epoch planner."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "lang", F.expr(f"size(split({_NORM_SPARK}, ' '))").alias("n_toks")
    )
    per_lang = toks.groupBy("lang").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_toks").alias("avail_tokens"),
    )
    w = per_lang.withColumn(
        "weight", F.expr("sqrt(cast(avail_tokens as double))")
    )
    total_w = w.agg(
        F.sum(F.col("weight").cast("decimal(38,15)")).alias("w_sum_dec")
    )
    return w.crossJoin(F.broadcast(total_w))


def mix_token_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-mixing budget allocation: split a global token budget across
    languages proportional to sqrt(available tokens) (temperature T=2
    upweighting of scarce languages), capped at what each language
    actually has — the planning table a training-mixture builder emits
    before the sampling pass.

    Cross-engine exactness: the per-language sqrt is one IEEE op; the
    mixture DENOMINATOR (sum of sqrts) is float summation, whose fold
    order differs between engines — so each sqrt is cast to
    DECIMAL(38,15) first (via the double's shortest decimal repr on both
    sides, same trick as emb_centroid_by_label) and summed exactly, then
    the single decimal→double cast feeds ordinary portable double math.

    100 TB posture: one map-side-partial agg over the pruned scan, then
    arithmetic over a #languages-row frame — scan-bound."""
    return (
        _lang_weight_frame(spark, sf_dir)
        .select(
            "lang",
            "n_docs",
            "avail_tokens",
            "weight",
            F.expr(
                f"least(avail_tokens, cast(floor({MIX_TOKEN_BUDGET}.0d * weight"
                " / cast(w_sum_dec as double)) as bigint))"
            ).alias("quota_tokens"),
        )
    )


ORACLE_MIX_TOKEN_BUDGET = f"""
WITH per_lang AS (
  SELECT lang, COUNT(*) AS n_docs,
         SUM(len(string_split({_NORM_DUCK}, ' '))) AS avail_tokens
  FROM documents GROUP BY lang
), w AS (
  SELECT lang, n_docs, avail_tokens,
         sqrt(CAST(avail_tokens AS DOUBLE)) AS weight
  FROM per_lang
), tw AS (
  SELECT SUM(CAST(CAST(weight AS VARCHAR) AS DECIMAL(38,15))) AS w_sum_dec
  FROM w
)
SELECT lang, CAST(n_docs AS BIGINT) AS n_docs,
       CAST(avail_tokens AS BIGINT) AS avail_tokens, weight,
       least(CAST(avail_tokens AS BIGINT),
             CAST(floor({MIX_TOKEN_BUDGET}.0 * weight
                        / CAST(w_sum_dec AS DOUBLE)) AS BIGINT)) AS quota_tokens
FROM w CROSS JOIN tw
"""


# epoch-plan target: deliberately larger than any test corpus so the
# repeat-factor arithmetic is exercised (a budget below availability makes
# every row one partial epoch — the mix_token_budget case)
MIX_EPOCH_TARGET = 5_000_000


def mix_epoch_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Epoching plan — the step after budget allocation when the target
    mixture WANTS more tokens than a language has: each language's
    sqrt-weighted allocation becomes (full epochs over its corpus +
    a remainder slice), the repeat-factor table the training loader
    consumes. Integer-exact throughout: the only floats are the shared
    sqrt weights and the one allocation division (same decimal-sum
    denominator as mix_token_budget); epochs and remainder are pure
    BIGINT ceil-div arithmetic.

    100 TB posture: identical to mix_token_budget — one
    map-side-partial agg over the pruned scan, then arithmetic on a
    #languages-row frame."""
    frame = _lang_weight_frame(spark, sf_dir)
    # clamp the floored allocation to >= 1 token: a language whose
    # sqrt-weight share floors to 0 would otherwise emit the
    # self-contradictory row n_epochs=0 with last_epoch_tokens=avail
    # (the remainder formula assumes target >= 1); one token = the
    # smallest honest allocation, giving n_epochs=1 with a 1-token
    # remainder slice. Oracle mirrors the clamp.
    target = (
        f"greatest(cast(floor({MIX_EPOCH_TARGET}.0d * weight"
        " / cast(w_sum_dec as double)) as bigint), 1L)"
    )
    return frame.select(
        "lang",
        "avail_tokens",
        F.expr(target).alias("target_tokens"),
        F.expr(f"({target} + avail_tokens - 1) div avail_tokens").alias(
            "n_epochs"
        ),
        F.expr(
            f"{target} - (({target} + avail_tokens - 1) div avail_tokens - 1)"
            " * avail_tokens"
        ).alias("last_epoch_tokens"),
    )


ORACLE_MIX_EPOCH_PLAN = f"""
WITH per_lang AS (
  SELECT lang, COUNT(*) AS n_docs,
         SUM(len(string_split({_NORM_DUCK}, ' '))) AS avail_tokens
  FROM documents GROUP BY lang
), w AS (
  SELECT lang, CAST(avail_tokens AS BIGINT) AS avail_tokens,
         sqrt(CAST(avail_tokens AS DOUBLE)) AS weight
  FROM per_lang
), tw AS (
  SELECT SUM(CAST(CAST(weight AS VARCHAR) AS DECIMAL(38,15))) AS w_sum_dec
  FROM w
), t AS (
  SELECT lang, avail_tokens,
         greatest(CAST(floor({MIX_EPOCH_TARGET}.0 * weight
                    / CAST(w_sum_dec AS DOUBLE)) AS BIGINT), 1) AS target_tokens
  FROM w CROSS JOIN tw
)
SELECT lang, avail_tokens, target_tokens,
       (target_tokens + avail_tokens - 1) // avail_tokens AS n_epochs,
       target_tokens
         - ((target_tokens + avail_tokens - 1) // avail_tokens - 1)
           * avail_tokens AS last_epoch_tokens
FROM t
"""


def sample_docs_importance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Importance-weighted deterministic sampling: keep rate proportional
    to the document's quality score (the rung between uniform sampling
    and a hard quality cutoff — low-quality docs are downweighted, not
    erased, preserving distributional coverage). rate = score/100; the
    decision is the same md5 bucket vs %04x-rendered threshold as every
    sampler here — reproducible under any partitioning, no RNG.

    100 TB posture: the quality score is the scan-side projection from
    text_quality_filter's stats; the keep decision is a pure filter —
    the corpus never shuffles."""
    from datafusion_loki_spark.operators.text import text_quality_filter

    q = text_quality_filter(spark, sf_dir)
    bucket = "substring(md5(cast(doc_id as string)), 1, 4)"
    return q.select(
        "doc_id",
        "quality_score",
        F.expr(bucket).alias("sample_bucket"),
    ).where(
        F.expr(
            f"quality_score >= 100 OR {bucket} < format_string('%04x',"
            " cast(floor(quality_score / 100.0d * 65536) as int))"
        )
    )


ORACLE_SAMPLE_IMPORTANCE = """
WITH s AS (
  SELECT doc_id,
         len(string_split(lower(trim(regexp_replace(text, '\\s+', ' ', 'g'))), ' ')) AS n_tokens,
         length(regexp_replace(text, '[^.,;:!?]', '', 'g')) AS n_punct,
         CAST(list_sum(list_transform(string_split(lower(trim(regexp_replace(text, '\\s+', ' ', 'g'))), ' '), t -> length(t)))
              AS DOUBLE) / len(string_split(lower(trim(regexp_replace(text, '\\s+', ' ', 'g'))), ' ')) AS avg_token_len
  FROM documents
), scored AS (
  SELECT doc_id,
         (CASE WHEN n_tokens BETWEEN 10 AND 1000 THEN 40 ELSE 0 END
          + CASE WHEN n_punct * 10 <= n_tokens * 3 THEN 30 ELSE 0 END
          + CASE WHEN avg_token_len BETWEEN 2.0 AND 12.0 THEN 30 ELSE 0 END)
           AS quality_score
  FROM s
)
SELECT doc_id, quality_score,
       substring(md5(CAST(doc_id AS VARCHAR)), 1, 4) AS sample_bucket
FROM scored
WHERE quality_score >= 70
  AND (quality_score >= 100
       OR substring(md5(CAST(doc_id AS VARCHAR)), 1, 4)
          < printf('%04x', CAST(floor(quality_score / 100.0 * 65536) AS INT)))
"""


def corpus_build_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The pipeline's end-to-end deliverable: the training-corpus manifest
    — documents that pass the rule quality gate (text_quality_filter),
    the LEARNED quality gate (text_quality_classifier's NB majority vote
    — the GPT-3-style second opinion that catches rule-passing junk),
    and the dedup keep-list (exact + near-dup clustering), rolled up to
    doc and token counts per (source, lang). This is the number a
    pretraining run is provisioned from, and the composition proves the
    operator family plugs together: rule gate ∧ learned gate ∧
    keep-list ∧ catalog join ∧ manifest agg in one plan.

    100 TB posture: the rule gate is a scan-speed filter; the classifier
    pays one training pass (shard-scale) + one scoring pass; the
    keep-list pays its (bounded, documented) fingerprint + CC cost once;
    the composition joins on doc_id — uniform key, candidate-scale right
    sides — and the final rollup key (source × lang) is
    vocabulary-bounded, so the manifest shuffle is tiny."""
    from datafusion_loki_spark.operators.dedup import dedup_keep_list
    from datafusion_loki_spark.operators.text import (
        text_quality_classifier,
        text_quality_filter,
    )

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "source", "lang"
    )
    quality = text_quality_filter(spark, sf_dir).select("doc_id", "n_tokens")
    learned = text_quality_classifier(spark, sf_dir).where(
        F.col("pred_hq") == 1
    ).select("doc_id")
    keep = dedup_keep_list(spark, sf_dir).where(
        F.col("status") == "keep"
    ).select("doc_id")
    return (
        quality.join(learned, "doc_id")
        .join(keep, "doc_id")
        .join(docs, "doc_id")
        .groupBy("source", "lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tokens").alias("sum_tokens"),
        )
    )


def _oracle_corpus_manifest() -> str:
    from datafusion_loki_spark.operators.dedup import ORACLES as _DEDUP_ORACLES
    from datafusion_loki_spark.operators.text import (
        ORACLE_QUALITY_CLASSIFIER,
        ORACLE_TEXT_QUALITY,
    )

    keep_sql = _DEDUP_ORACLES["dedup_keep_list"]
    return f"""
SELECT d.source, d.lang, COUNT(*) AS n_docs,
       CAST(SUM(q.n_tokens) AS BIGINT) AS sum_tokens
FROM (SELECT doc_id, n_tokens FROM ({ORACLE_TEXT_QUALITY}) x) q
JOIN (SELECT doc_id FROM ({ORACLE_QUALITY_CLASSIFIER}) z
      WHERE pred_hq = 1) c
  USING (doc_id)
JOIN (SELECT doc_id FROM ({keep_sql}) y WHERE status = 'keep') k
  USING (doc_id)
JOIN documents d USING (doc_id)
GROUP BY d.source, d.lang
"""


PACK_CTX = 2048  # training context length (tokens per packed sequence)



# the packing contract's input definition — (doc_id, 2-hex md5 shard,
# whitespace token count) — ONE copy for both packers and both oracles
# (four private copies once defined what "a shard" even is)
_PACK_BASE_DUCK = (
    "SELECT doc_id, text, substring(md5(CAST(doc_id AS VARCHAR)), 1, 2) AS shard,\n"
    f"         len(string_split({_NORM_DUCK}, ' ')) AS n_tok\n"
    "  FROM documents"
)


def _pack_base(docs: DataFrame) -> DataFrame:
    return docs.select(
        "doc_id",
        F.expr("substring(md5(cast(doc_id as string)), 1, 2)").alias("shard"),
        F.expr(f"size(split({_NORM_SPARK}, ' '))").alias("n_tok"),
    )


def mix_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence-packing manifest: concatenate documents in deterministic
    order and chunk the stream into fixed PACK_CTX-token training
    sequences — the last preprocessing step before a training run, and
    the number every data loader needs up front (how many sequences, how
    full are they, how many documents straddle a boundary and will be
    split across samples).

    100 TB posture: a GLOBAL concat-and-chunk needs a global total order
    — a single-partition window, the classic scale-killer. Instead the
    corpus is sharded by a 2-hex md5 bucket of doc_id (256 deterministic
    shards; production sizes the prefix so one shard ≈ one worker's
    training file) and packing runs independently per shard: ONE shuffle
    on the shard key, window + rollup within each shard, output is
    O(shards) rows. Doc order inside a shard is doc_id — deterministic
    under any partitioning, like every sampler in this module. Token
    counts reuse mix_token_budget's whitespace normalization so the two
    manifests agree.

    Per shard: n_docs, n_tokens, n_sequences = ceil(n_tokens/CTX),
    n_docs_split (documents whose [start, end) span crosses a CTX
    boundary — the cross-document-attention contamination metric), and
    fill_ratio = n_tokens / (n_sequences · CTX) (padding waste if the
    tail sequence is not dropped)."""
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents")
    base = _pack_base(docs)
    w = (
        Window.partitionBy("shard")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    per_doc = (
        base.withColumn("cum", F.sum("n_tok").over(w))
        .withColumn("strt", F.col("cum") - F.col("n_tok"))
        .withColumn("first_seq", F.floor(F.col("strt") / PACK_CTX))
        .withColumn("last_seq", F.floor((F.col("cum") - 1) / PACK_CTX))
    )
    agg = per_doc.groupBy("shard").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_tok").alias("n_tokens"),
        (F.floor((F.max("cum") - 1) / PACK_CTX) + 1).alias("n_sequences"),
        F.sum(
            F.when(F.col("first_seq") != F.col("last_seq"), 1).otherwise(0)
        ).alias("n_docs_split"),
    )
    return agg.withColumn(
        "fill_ratio",
        F.col("n_tokens").cast("double") / (F.col("n_sequences") * PACK_CTX),
    )


ORACLE_MIX_PACK = f"""
WITH base AS (
  {_PACK_BASE_DUCK}
), per_doc AS (
  SELECT shard, n_tok,
         SUM(n_tok) OVER (PARTITION BY shard ORDER BY doc_id
                          ROWS UNBOUNDED PRECEDING) AS cum
  FROM base
), seqd AS (
  SELECT shard, n_tok, cum,
         CAST(floor((cum - n_tok) / {PACK_CTX}) AS BIGINT) AS first_seq,
         CAST(floor((cum - 1) / {PACK_CTX}) AS BIGINT) AS last_seq
  FROM per_doc
), agg AS (
  SELECT shard,
         COUNT(*) AS n_docs,
         CAST(SUM(n_tok) AS BIGINT) AS n_tokens,
         CAST(floor((MAX(cum) - 1) / {PACK_CTX}) + 1 AS BIGINT)
           AS n_sequences,
         CAST(SUM(CASE WHEN first_seq != last_seq THEN 1 ELSE 0 END)
              AS BIGINT) AS n_docs_split
  FROM seqd GROUP BY shard
)
SELECT shard, n_docs, n_tokens, n_sequences, n_docs_split,
       CAST(n_tokens AS DOUBLE) / (n_sequences * {PACK_CTX}) AS fill_ratio
FROM agg
"""


def mix_pack_greedy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """No-split greedy packing — the document-boundary-respecting
    alternative to mix_pack_sequences: walk each shard's docs in doc_id
    order, start a new sequence whenever the next document would overflow
    PACK_CTX (documents never straddle sequences; an oversize document
    occupies a sequence alone). Used when cross-document attention
    contamination matters more than padding waste; run both manifests and
    compare fill ratios.

    This is the operator class Spark's windows genuinely cannot express:
    the sequence boundary depends on a running fill that RESETS on
    overflow (a data-dependent prefix-scan, not a frame aggregate), so
    the per-shard walk runs as an Arrow-batched applyInPandas group — and
    the DuckDB oracle expresses the same recurrence as a recursive CTE,
    keeping even the stateful operator value-checked.

    100 TB posture: one shuffle on the 256-way md5 shard key; each group
    is one shard buffered through pandas (production sizes the hex prefix
    so a shard fits an executor — same knob as mix_pack_sequences); the
    Python loop touches O(docs/shard) integers, not text."""
    import pandas as pd

    docs = load_table(spark, sf_dir, "documents")
    # NULL-text docs have n_tok NULL (nothing to pack) and are excluded:
    # Arrow would deliver the NULL as NaN and crash int(t), and the
    # oracle's recursive fill would freeze on NULL propagation — the
    # round-7 NULL-text contract, mirrored in the oracle's base CTE
    base = _pack_base(docs).where(F.col("n_tok").isNotNull())

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("doc_id")
        fill, seq, oversize = 0, 0, 0
        for t in pdf["n_tok"]:
            t = int(t)
            if t > PACK_CTX:
                oversize += 1
            if seq == 0 or fill + t > PACK_CTX:
                seq += 1
                fill = t
            else:
                fill += t
        total = int(pdf["n_tok"].sum())
        return pd.DataFrame(
            [
                {
                    "shard": pdf["shard"].iloc[0],
                    "n_docs": len(pdf),
                    "n_tokens": total,
                    "n_sequences": seq,
                    "n_oversize_docs": oversize,
                    "mean_fill": total / seq,
                }
            ]
        )

    return base.groupBy("shard").applyInPandas(
        pack,
        "shard string, n_docs bigint, n_tokens bigint, n_sequences bigint,"
        " n_oversize_docs bigint, mean_fill double",
    )


ORACLE_MIX_PACK_GREEDY = f"""
WITH RECURSIVE base AS (
  {_PACK_BASE_DUCK}
  WHERE text IS NOT NULL
), ordered AS (
  SELECT shard, n_tok,
         ROW_NUMBER() OVER (PARTITION BY shard ORDER BY doc_id) AS rn
  FROM base
), step AS (
  SELECT shard, rn, n_tok, n_tok AS fill, 1 AS seq
  FROM ordered WHERE rn = 1
  UNION ALL
  SELECT o.shard, o.rn, o.n_tok,
         CASE WHEN s.fill + o.n_tok > {PACK_CTX}
              THEN o.n_tok ELSE s.fill + o.n_tok END,
         CASE WHEN s.fill + o.n_tok > {PACK_CTX}
              THEN s.seq + 1 ELSE s.seq END
  FROM step s JOIN ordered o ON o.shard = s.shard AND o.rn = s.rn + 1
)
SELECT shard,
       COUNT(*) AS n_docs,
       CAST(SUM(n_tok) AS BIGINT) AS n_tokens,
       CAST(MAX(seq) AS BIGINT) AS n_sequences,
       CAST(SUM(CASE WHEN n_tok > {PACK_CTX} THEN 1 ELSE 0 END) AS BIGINT)
         AS n_oversize_docs,
       CAST(SUM(n_tok) AS DOUBLE) / MAX(seq) AS mean_fill
FROM step GROUP BY shard
"""


def mix_quality_vs_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-tuning audit: per quality-score level, what fraction of
    documents survives dedup — the correlation that decides pipeline
    ORDER (if low-quality docs are disproportionately duplicates, dedup
    first and the quality model trains on cleaner negatives; if
    independent, filter first and dedup pays for fewer docs). Joins the
    UNFILTERED quality scores with the keep/drop list and rolls up per
    (score, 25-token length bucket) — the length axis keeps the audit
    informative on corpora where one score level dominates.

    100 TB posture: scoring is scan-speed; the keep-list pays its
    documented bounded cost once; the join key is doc_id (uniform) and
    the rollup key is scores × length-buckets — a handful of values."""
    from datafusion_loki_spark.operators.dedup import dedup_keep_list
    from datafusion_loki_spark.operators.text import quality_scored, text_stats

    scored = quality_scored(text_stats(spark, sf_dir)).select(
        "doc_id",
        "quality_score",
        # integer `div` floors identically on both engines (the
        # log_rolling_range rule)
        F.expr("n_tokens div 25").alias("len_bucket"),
    )
    keep = dedup_keep_list(spark, sf_dir)
    return (
        scored.join(keep, "doc_id")
        .groupBy("quality_score", "len_bucket")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum(
                F.when(F.col("status") == "keep", 1).otherwise(0)
            ).alias("n_kept"),
        )
        .withColumn(
            "keep_rate", F.col("n_kept").cast("double") / F.col("n_docs")
        )
    )


def _oracle_quality_vs_dedup() -> str:
    from datafusion_loki_spark.operators.dedup import ORACLES as _DEDUP_ORACLES
    from datafusion_loki_spark.operators.text import ORACLE_QUALITY_SCORED

    keep_sql = _DEDUP_ORACLES["dedup_keep_list"]
    return f"""
SELECT quality_score, len_bucket, COUNT(*) AS n_docs,
       CAST(SUM(CASE WHEN status = 'keep' THEN 1 ELSE 0 END) AS BIGINT)
         AS n_kept,
       CAST(SUM(CASE WHEN status = 'keep' THEN 1 ELSE 0 END) AS DOUBLE)
         / COUNT(*) AS keep_rate
FROM (SELECT doc_id, quality_score, n_tokens // 25 AS len_bucket
      FROM ({ORACLE_QUALITY_SCORED}) s) q
JOIN (SELECT doc_id, status FROM ({keep_sql}) k) d USING (doc_id)
GROUP BY quality_score, len_bucket
"""


QUERIES = {
    "sample_events_uniform": sample_events_uniform,
    "sample_docs_stratified": sample_docs_stratified,
    "sample_docs_per_source_topn": sample_docs_per_source_topn,
    "sample_docs_temperature": sample_docs_temperature,
    "sample_docs_hash_split": sample_docs_hash_split,
    "mix_token_budget": mix_token_budget,
    "mix_epoch_plan": mix_epoch_plan,
    "mix_pack_sequences": mix_pack_sequences,
    "mix_pack_greedy": mix_pack_greedy,
    "mix_quality_vs_dedup": mix_quality_vs_dedup,
    "sample_docs_importance": sample_docs_importance,
    "corpus_build_manifest": corpus_build_manifest,
}

ORACLES = {
    "sample_events_uniform": ORACLE_SAMPLE_UNIFORM,
    "sample_docs_stratified": ORACLE_SAMPLE_STRATIFIED,
    "sample_docs_per_source_topn": ORACLE_SAMPLE_TOPN,
    "sample_docs_temperature": ORACLE_SAMPLE_TEMPERATURE,
    "sample_docs_hash_split": ORACLE_SAMPLE_HASH_SPLIT,
    "mix_token_budget": ORACLE_MIX_TOKEN_BUDGET,
    "mix_epoch_plan": ORACLE_MIX_EPOCH_PLAN,
    "mix_pack_sequences": ORACLE_MIX_PACK,
    "mix_pack_greedy": ORACLE_MIX_PACK_GREEDY,
    "mix_quality_vs_dedup": _oracle_quality_vs_dedup(),
    "sample_docs_importance": ORACLE_SAMPLE_IMPORTANCE,
    "corpus_build_manifest": _oracle_corpus_manifest(),
}


def corpus_data_card(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The RAW-corpus data card: composition marginals every dataset
    release ships (what you HAVE, before any gate — the complement of
    corpus_build_manifest, which rolls up what you SHIP). One row per
    CUBE(source, lang) cell — both marginals and the grand total — with
    document count, exact token total, how many docs clear the quality
    gate, and the char-length envelope.

    100 TB posture: the stats side is one scan-speed projection (the
    shared-toks barrier in text_stats caps the tokenizer at one run per
    row); the doc_id join is a uniform-key co-partitionable join; CUBE
    over a (sources × langs) vocabulary multiplies the SHUFFLE key space
    by 4, not the data — partial aggregation compresses each task to
    |cells| rows before the exchange. Every aggregate is exact-int
    (count/sum/min/max): no float summation order anywhere."""
    from datafusion_loki_spark.operators.text import quality_scored, text_stats

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "source", "lang", "n_chars"
    )
    scored = quality_scored(text_stats(spark, sf_dir)).select(
        "doc_id", "n_tokens", "quality_score"
    )
    return (
        docs.join(scored, "doc_id")
        .cube("source", "lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tokens").alias("sum_tokens"),
            F.count(F.when(F.col("quality_score") >= 70, 1)).alias(
                "n_quality_docs"
            ),
            F.min("n_chars").alias("min_chars"),
            F.max("n_chars").alias("max_chars"),
        )
    )


def _oracle_data_card() -> str:
    from datafusion_loki_spark.operators.text import ORACLE_QUALITY_SCORED

    return f"""
SELECT d.source, d.lang,
       COUNT(*) AS n_docs,
       CAST(SUM(s.n_tokens) AS BIGINT) AS sum_tokens,
       CAST(COUNT(*) FILTER (WHERE s.quality_score >= 70) AS BIGINT)
         AS n_quality_docs,
       MIN(d.n_chars) AS min_chars,
       MAX(d.n_chars) AS max_chars
FROM documents d JOIN ({ORACLE_QUALITY_SCORED}) s USING (doc_id)
GROUP BY CUBE (d.source, d.lang)
"""


QUERIES["corpus_data_card"] = corpus_data_card
ORACLES["corpus_data_card"] = _oracle_data_card()


# --- cross-generation corpus snapshot diff -----------------------------------

# md5-bucket windows deriving two overlapping deterministic "crawl
# generations" from the one fixture corpus (same compile-time-constant
# contract as the sampling predicates): the previous generation is
# buckets [00, c0), the current is [40, ff]; the slice [80, c0) of the
# overlap ships with revised text in the current generation.
_SNAP_BUCKET = "substring(md5(cast(doc_id as string)), 1, 2)"
_SNAP_BUCKET_DUCK = "substring(md5(CAST(doc_id AS VARCHAR)), 1, 2)"


def corpus_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-generation corpus diff — the crawl-ops query every refresh
    runs before re-training: per source, how many documents were ADDED,
    REMOVED, CHANGED (same id, different content fingerprint), or
    UNCHANGED between the previous and current generation. The two
    generations are deterministic md5-bucket derivations of the fixture
    corpus (the oracle mirrors the windows in lockstep), with a revised
    slice so every status class is non-empty.

    100 TB posture: each side reduces to (doc_id, source, fingerprint)
    AT THE SCAN — the md5 content fingerprint is computed in the scan
    projection, so document text never reaches the diff join; the
    full-outer join shuffles two narrow frames on the uniform doc_id
    key (co-partitionable / AQE-splittable), and the per-(source,
    status) rollup is map-side combined. This is the diff topology that
    survives two 100 TB generations: bytes stay in the scans,
    fingerprints travel."""
    docs = load_table(spark, sf_dir, "documents")
    bucket = F.expr(_SNAP_BUCKET)
    # generation membership rides its own literal flag: inferring
    # presence from fingerprint nullness would misclassify a NULL-text
    # document (md5(NULL) is NULL) as absent from a generation it is in
    prev = docs.where(bucket < "c0").select(
        "doc_id",
        "source",
        F.expr("md5(text)").alias("fp_prev"),
        F.lit(1).alias("in_prev"),
    )
    cur = docs.where(bucket >= "40").select(
        "doc_id",
        "source",
        F.expr(
            f"md5(if({_SNAP_BUCKET} >= '80' and {_SNAP_BUCKET} < 'c0',"
            " concat(text, ' rev2'), text))"
        ).alias("fp_cur"),
        F.lit(1).alias("in_cur"),
    )
    # null-safe fingerprint equality (<=>): two NULL-text generations of
    # a doc are the same content, not a change
    status = (
        F.when(F.col("in_prev").isNull(), F.lit("added"))
        .when(F.col("in_cur").isNull(), F.lit("removed"))
        .when(F.col("fp_prev").eqNullSafe(F.col("fp_cur")), F.lit("unchanged"))
        .otherwise(F.lit("changed"))
    )
    return (
        prev.join(cur, ["doc_id", "source"], "full_outer")
        .select("source", status.alias("status"))
        .groupBy("source", "status")
        .agg(F.count("*").alias("n_docs"))
    )


ORACLE_SNAPSHOT_DIFF = f"""
WITH prev AS (
  SELECT doc_id, source, md5(text) AS fp_prev
  FROM documents WHERE {_SNAP_BUCKET_DUCK} < 'c0'
), cur AS (
  SELECT doc_id, source,
         md5(CASE WHEN {_SNAP_BUCKET_DUCK} >= '80'
                   AND {_SNAP_BUCKET_DUCK} < 'c0'
             THEN text || ' rev2' ELSE text END) AS fp_cur
  FROM documents WHERE {_SNAP_BUCKET_DUCK} >= '40'
)
SELECT COALESCE(prev.source, cur.source) AS source,
       CASE WHEN prev.doc_id IS NULL THEN 'added'
            WHEN cur.doc_id IS NULL THEN 'removed'
            WHEN fp_prev IS NOT DISTINCT FROM fp_cur THEN 'unchanged'
            ELSE 'changed' END AS status,
       COUNT(*) AS n_docs
FROM prev FULL OUTER JOIN cur USING (doc_id, source)
GROUP BY 1, 2
"""

QUERIES["corpus_snapshot_diff"] = corpus_snapshot_diff
ORACLES["corpus_snapshot_diff"] = ORACLE_SNAPSHOT_DIFF


# --- leakage-safe train/val split ---------------------------------------------


def mix_split_leakage_safe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train/val split with EXACT-duplicate leakage quarantine: an
    eval/val document whose normalized content also exists in the train
    split inflates every downstream eval (the train/test-overlap hazard
    the decontamination literature documents, arXiv:2005.14165 App. C —
    here applied at split time, where it is cheapest). Emits one row per
    doc: the md5-bucket initial split (~1/8 val, the sampling module's
    stable-key convention), a ``leaked`` flag, and the final assignment.

    Policy: leaked val docs are QUARANTINED (excluded from both splits),
    not folded into train — their content is already in train, so
    re-adding the duplicate would double-weight it; and leaving them in
    val is the contamination this op exists to remove. NULL-text docs
    fingerprint to NULL and never match (each NULL is its own content in
    the family's contract); empty-text val docs DO leak against
    empty-text train docs (same fingerprint — correct: identical
    content).

    Shape: ONE corpus scan, ONE shuffle — leakage is a per-fingerprint
    property (does any train doc share it?), so it is a window MAX over
    the fingerprint partition, not a val-vs-train self-join (which would
    re-execute the scan+md5 DAG per branch — the union-re-execution
    trap) . 100 TB posture: the shuffle key is the uniform md5; a
    pathological dup cluster (one boilerplate page, millions of copies)
    lands in one window partition, which is the same locality any
    grouping by content has, and the window computes a single running
    MAX — no per-partition materialization beyond the sort."""
    docs = load_table(spark, sf_dir, "documents")
    fp = docs.select(
        "doc_id",
        F.expr(
            "CASE WHEN substring(md5(cast(doc_id as string)), 1, 1) "
            "IN ('0', '1') THEN 'val' ELSE 'train' END"
        ).alias("init_split"),
        F.expr(f"md5({_NORM_SPARK})").alias("fingerprint"),
    )
    from pyspark.sql import Window

    # NULL-text fingerprints would otherwise ALL share one window
    # partition — a straggler task holding every NULL-text row of the
    # corpus (round-8 review), for rows whose `leaked` is constant-false
    # anyway (the isNotNull guard below). Routing each NULL to its own
    # singleton partition keyed by doc_id changes no result: a
    # 32-hex-char md5 never collides with a decimal doc_id string, and
    # has_train_dup is only consulted for non-NULL fingerprints.
    w = Window.partitionBy(
        F.coalesce(F.col("fingerprint"), F.col("doc_id").cast("string"))
    )
    return (
        fp.withColumn(
            "has_train_dup",
            F.max(
                F.when(F.col("init_split") == "train", 1).otherwise(0)
            ).over(w),
        )
        .select(
            "doc_id",
            "init_split",
            (
                (F.col("init_split") == "val")
                & F.col("fingerprint").isNotNull()
                & (F.col("has_train_dup") == 1)
            ).alias("leaked"),
        )
        .withColumn(
            "final_split",
            F.when(F.col("leaked"), F.lit("quarantined")).otherwise(
                F.col("init_split")
            ),
        )
    )


ORACLE_SPLIT_LEAKAGE = f"""
WITH fp AS (
  SELECT doc_id,
         CASE WHEN substring(md5(CAST(doc_id AS VARCHAR)), 1, 1)
              IN ('0', '1') THEN 'val' ELSE 'train' END AS init_split,
         md5({_NORM_DUCK}) AS fingerprint
  FROM documents
),
flagged AS (
  SELECT doc_id, init_split,
         (init_split = 'val' AND fingerprint IS NOT NULL
          AND MAX(CASE WHEN init_split = 'train' THEN 1 ELSE 0 END)
              OVER (PARTITION BY fingerprint) = 1) AS leaked
  FROM fp
)
SELECT doc_id, init_split, leaked,
       CASE WHEN leaked THEN 'quarantined' ELSE init_split END AS final_split
FROM flagged
"""

QUERIES["mix_split_leakage_safe"] = mix_split_leakage_safe
ORACLES["mix_split_leakage_safe"] = ORACLE_SPLIT_LEAKAGE


_VAL_BUCKET = "substring(md5(cast({id} as string)), 1, 1) IN ('0', '1')"
_VAL_BUCKET_DUCK = "substring(md5(CAST({id} AS VARCHAR)), 1, 1) IN ('0', '1')"


def mix_split_neardup_safe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The NEAR-duplicate level of the split-leakage story: a val doc
    that MinHash-LSH-pairs with any train doc is quarantined — near-dups
    leak eval signal just like exact dups (the reason decontamination
    pipelines run fuzzy matching, arXiv:2107.06499 §4 / 2005.14165
    App. C), and document-identity splits cannot see them. Same
    md5-bucket split and quarantine policy as mix_split_leakage_safe
    (the val doc is excluded rather than folded into train; for NEAR
    dups folding would be defensible salvage — kept symmetric so the
    two ops compose as strictness levels of one knob).

    Shape: the split side is a pure EXPRESSION over doc_id, so leakage
    detection adds no join against the corpus — the capped LSH pair
    stream (dedup_minhash_lsh, bounded per bucket) is classified by
    evaluating the bucket predicate on BOTH pair ids in place, and only
    the distinct leaked-val id set (bounded by the pair stream) joins
    back to the per-doc frame. 100 TB posture inherits the LSH
    operator's: banded bucketing, LSH_BUCKET_CAP, one signature pass."""
    from datafusion_loki_spark.operators.dedup import dedup_minhash_lsh

    docs = load_table(spark, sf_dir, "documents")
    is_val_a = F.expr(_VAL_BUCKET.format(id="doc_a"))
    is_val_b = F.expr(_VAL_BUCKET.format(id="doc_b"))
    leaked = (
        dedup_minhash_lsh(spark, sf_dir)
        .where(is_val_a != is_val_b)  # exactly one side in val
        .select(
            F.when(is_val_a, F.col("doc_a")).otherwise(F.col("doc_b")).alias(
                "doc_id"
            )
        )
        .distinct()
        .withColumn("leaked", F.lit(True))
    )
    return (
        docs.select(
            "doc_id",
            F.expr(
                f"CASE WHEN {_VAL_BUCKET.format(id='doc_id')} "
                "THEN 'val' ELSE 'train' END"
            ).alias("init_split"),
        )
        .join(leaked, "doc_id", "left")
        .select(
            "doc_id",
            "init_split",
            F.coalesce("leaked", F.lit(False)).alias("leaked"),
        )
        .withColumn(
            "final_split",
            F.when(F.col("leaked"), F.lit("quarantined")).otherwise(
                F.col("init_split")
            ),
        )
    )


def _oracle_split_neardup() -> str:
    from datafusion_loki_spark.operators.dedup import _oracle_minhash_parts

    ctes, unions = _oracle_minhash_parts()
    val_a = _VAL_BUCKET_DUCK.format(id="doc_a")
    val_b = _VAL_BUCKET_DUCK.format(id="doc_b")
    return f"""
WITH {ctes},
pairs AS (
{unions}
),
leaked AS (
  SELECT DISTINCT CASE WHEN {val_a} THEN doc_a ELSE doc_b END AS doc_id
  FROM pairs
  WHERE ({val_a}) <> ({val_b})
)
SELECT d.doc_id,
       CASE WHEN {_VAL_BUCKET_DUCK.format(id="d.doc_id")}
            THEN 'val' ELSE 'train' END AS init_split,
       (l.doc_id IS NOT NULL) AS leaked,
       CASE WHEN l.doc_id IS NOT NULL THEN 'quarantined'
            WHEN {_VAL_BUCKET_DUCK.format(id="d.doc_id")} THEN 'val'
            ELSE 'train' END AS final_split
FROM documents d LEFT JOIN leaked l ON d.doc_id = l.doc_id
"""


QUERIES["mix_split_neardup_safe"] = mix_split_neardup_safe
ORACLES["mix_split_neardup_safe"] = _oracle_split_neardup()
