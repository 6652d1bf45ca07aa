"""The reference's query surface, re-expressed over the driver's ``events``
table (``ts`` ≙ timestamp, ``event_type`` ≙ a label, ``props`` ≙ line —
mapping per FIXTURES.md §2).

Every query here mirrors a scenario the reference exercises end-to-end
(reference: integration-tests/tests/table.rs:15-99, examples/datafusion.rs:20-32):
full scan, projection, label equality, LIKE / regex line filters, timestamp
range bounds, map-subscript access, and LIMIT. On real Loki data the same
shapes run through the ``loki`` data source (sources/loki.py) with the
filters pushed down as LogQL; here they run on parquet so the driver's
DuckDB oracle can verify values.

Scale notes: every filter below is sargable and reaches the parquet scan as
a PushedFilter; projections prune columns at the reader. No shuffles except
the explicit ORDER BY queries (which Spark executes as a TakeOrdered when
LIMIT-bounded — no full sort at 100 TB).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from datafusion_loki_spark.catalog import load_table
from datafusion_loki_spark.functions import davg, dsum


def log_full_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SELECT * FROM events (ref: integration-tests/tests/table.rs:15-27)."""
    return load_table(spark, sf_dir, "events")


def log_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SELECT timestamp, line → SELECT ts, props (ref: tests/table.rs:29-41)."""
    return load_table(spark, sf_dir, "events").select("ts", "props")


def log_label_eq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """labels['app'] = 'x' ≙ event_type = 'error' (ref: tests/table.rs:59-78,
    expr.rs:11-47 label-filter translation)."""
    return load_table(spark, sf_dir, "events").where(F.col("event_type") == "error")


def log_label_ne(spark: SparkSession, sf_dir: str) -> DataFrame:
    """labels['app'] != 'x' → LogQL k!="v" (ref: expr.rs:38-39)."""
    return load_table(spark, sf_dir, "events").where(F.col("event_type") != "click")


def log_line_like(spark: SparkSession, sf_dir: str) -> DataFrame:
    """line LIKE '%bbb%' → LogQL |= (ref: tests/table.rs:80-99, expr.rs:83-98)."""
    return load_table(spark, sf_dir, "events").where(F.col("props").like('%"k": 8%'))


def log_line_not_like(spark: SparkSession, sf_dir: str) -> DataFrame:
    """line NOT LIKE '%x%' → LogQL != (ref: expr.rs:99-103)."""
    return load_table(spark, sf_dir, "events").where(~F.col("props").like("%1%"))


def log_line_regex(spark: SparkSession, sf_dir: str) -> DataFrame:
    """line ~ 'rx' → LogQL |~ (ref: expr.rs:63-71)."""
    return load_table(spark, sf_dir, "events").where(F.col("props").rlike(r'"k": 1[0-9]\}'))


def log_time_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """timestamp bounds → Loki start/end params (ref: expr.rs:114-152,
    tests/table.rs:43-57)."""
    ev = load_table(spark, sf_dir, "events")
    return ev.where(
        (F.col("ts") >= F.lit("2024-02-01 00:00:00").cast("timestamp_ntz"))
        & (F.col("ts") < F.lit("2024-04-01 00:00:00").cast("timestamp_ntz"))
    )


def log_limit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LIMIT pushdown shape (ref: examples/datafusion.rs:27, scan.rs:131-146).
    Ordered by the unique key so the result set is deterministic."""
    return load_table(spark, sf_dir, "events").orderBy("event_id").limit(10)


def log_map_subscript(spark: SparkSession, sf_dir: str) -> DataFrame:
    """labels['k'] extraction ≙ JSON key extraction from props
    (ref: tests/table.rs:32,62 — map subscript on the labels column)."""
    ev = load_table(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        F.get_json_object("props", "$.k").cast("int").alias("k_val"),
    )


def log_map_subscript_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WHERE labels['k'] = 'v' shape (ref: expr.rs:11-47)."""
    ev = load_table(spark, sf_dir, "events")
    return ev.where(F.get_json_object("props", "$.k").cast("int") > 90).select(
        "event_id", "ts", "event_type", "props"
    )


def log_conjunctive(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AND of label + time + line filters, the reference's flagship example
    (ref: examples/datafusion.rs:20-32)."""
    ev = load_table(spark, sf_dir, "events")
    return ev.where(
        (F.col("event_type") == "purchase")
        & (F.col("ts") >= F.lit("2024-01-15 00:00:00").cast("timestamp_ntz"))
        & F.col("props").like("%9%")
    )


def log_agg_by_label(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Host-engine aggregation over the log table (post-scan GROUP BY —
    the reference delegates this entirely to DataFusion; Spark supplies it)."""
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.count("*").alias("n_events"),
        dsum("value").alias("sum_value"),
        F.countDistinct("user_id").alias("n_users"),
    )


def log_time_bucket(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-day event counts — the windowed-rollup shape a Loki user runs;
    date_trunc keeps the groupBy key low-cardinality (shuffle-friendly)."""
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy(
        F.col("ts").cast("date").alias("day"),
        F.col("event_type"),
    ).agg(
        F.count("*").alias("n"),
        davg("value").alias("avg_value"),
    )


def log_events_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Federation shape: the log/event stream joined to warehouse
    dimensions in one plan — the engine's core pitch (Loki logs × business
    tables in a single SQL surface; the reference can only do this because
    DataFusion hosts both providers, and Spark does the same for us).

    100 TB posture: events⋈customer shuffles on the user key (both sides
    are big at scale — no broadcast); nation broadcasts; the final agg is
    25 rows after map-side partials."""
    ev = load_table(spark, sf_dir, "events")
    cu = load_table(spark, sf_dir, "customer")
    na = load_table(spark, sf_dir, "nation")
    return (
        ev.join(cu, ev.user_id == cu.c_custkey)
        .join(F.broadcast(na), cu.c_nationkey == na.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.count("*").alias("n_events"),
            F.countDistinct("user_id").alias("n_users"),
            dsum("value").alias("sum_value"),
        )
    )


def log_sessionize_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization as a batch window computation — the batch
    twin of streaming/pipeline.py::sessionize (30-min gap): lag() marks
    session starts, a running sum numbers them, then one groupBy rolls
    sessions up. Two window passes + one aggregation, all on the same
    user_id partitioning — Spark reuses the single exchange.

    100 TB posture: one shuffle on user_id total; no state, no iteration —
    this is the canonical replay/backfill path for the streaming operator.
    """
    from pyspark.sql import Window

    # µs epoch on both engines (second-level casts would truncate
    # sub-second gaps differently); event_id tiebreak makes the lag order
    # deterministic when two events share a timestamp
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "ts", "value", "event_id",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("ts_us"),
    )
    w_user = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap_us = 30 * 60 * 1_000_000
    marked = ev.withColumn(
        "new_session",
        F.when(
            F.col("ts_us") - F.lag("ts_us").over(w_user) > gap_us, 1
        ).otherwise(0),
    ).withColumn(
        "session_no",
        F.sum("new_session").over(
            w_user.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    return (
        marked.groupBy("user_id", "session_no")
        .agg(
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
            F.count("*").alias("n_events"),
            dsum("value").alias("total_value"),
        )
    )


ORACLE_SESSIONIZE = """
WITH marked AS (
  SELECT user_id, ts, value, event_id,
         CASE WHEN epoch_us(ts) - epoch_us(LAG(ts) OVER w) > 1800000000
              THEN 1 ELSE 0 END AS new_session
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), numbered AS (
  SELECT user_id, ts, value,
         CAST(SUM(new_session) OVER (
             PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
           AS session_no
  FROM marked
)
SELECT user_id, session_no,
       MIN(ts) AS session_start, MAX(ts) AS session_end,
       COUNT(*) AS n_events,
       CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS total_value
FROM numbered
GROUP BY user_id, session_no
"""


def log_median_value_pandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact per-type median via a pandas GROUPED-AGGREGATE UDF — the
    Arrow-batched UDAF surface (grouped numpy kernel per key), used when
    the aggregate isn't expressible with built-ins (exact median is not:
    percentile_approx is, by design, approximate).

    100 TB posture: one shuffle on the low-cardinality group key; each
    group's values stream to one Python worker as Arrow batches. For
    high-cardinality keys you'd pre-bucket; for global medians you'd
    accept approx — this is the per-segment-exact path."""
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    def _median(v):
        return float(v.median())

    # real (non-string) annotations: `from __future__ import annotations`
    # stringifies inline hints, which pandas_udf's signature inference
    # rejects
    _median.__annotations__ = {"v": pd.Series, "return": float}
    median_udf = pandas_udf(_median, "double")

    ev = load_table(spark, sf_dir, "events")
    # note: a grouped-agg pandas UDF cannot be mixed with built-in
    # aggregates in one agg() — Spark restriction
    return ev.groupBy("event_type").agg(median_udf("value").alias("median_value"))


ORACLE_MEDIAN = """
SELECT event_type, median(value) AS median_value
FROM events GROUP BY event_type
"""


def log_json_unwrap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LogQL ``| json | unwrap k | sum by (label)`` analogue: parse the
    whole props document into a typed struct with from_json (schema-on-read,
    not per-key extraction), then aggregate the unwrapped numeric field by
    label (LogQL metric-query surface; the reference delegates all of this
    to the host engine, Spark supplies from_json natively).

    100 TB posture: from_json is codegen'd JVM parsing (Jackson) — no
    Python; the groupBy key is low-cardinality so partial aggregation
    collapses the shuffle to (tasks × types) rows. Integer sums keep the
    oracle comparison exact."""
    ev = load_table(spark, sf_dir, "events")
    parsed = ev.select(
        "event_type", F.from_json("props", "k INT").alias("j")
    )
    return parsed.groupBy("event_type").agg(
        F.sum("j.k").alias("sum_k"),
        F.count("j.k").alias("n_k"),
        F.min("j.k").alias("min_k"),
        F.max("j.k").alias("max_k"),
    )


ORACLE_JSON_UNWRAP = """
SELECT event_type,
       CAST(SUM(CAST(json_extract_string(props, '$.k') AS INT)) AS BIGINT) AS sum_k,
       COUNT(CAST(json_extract_string(props, '$.k') AS INT)) AS n_k,
       MIN(CAST(json_extract_string(props, '$.k') AS INT)) AS min_k,
       MAX(CAST(json_extract_string(props, '$.k') AS INT)) AS max_k
FROM events GROUP BY event_type
"""


def log_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequential-pattern (funnel) detection: how many users progressed
    view → click → purchase in timestamp order. Classic product-analytics
    query over the event stream.

    Shape: one groupBy(user_id) computing the first timestamp of each stage
    via conditional MIN (no self-joins — a 3-way self-join would shuffle
    the fact table three times; this shuffles it once), then a global
    1-row rollup of stage-ordering predicates."""
    ev = load_table(spark, sf_dir, "events")
    per_user = ev.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "view", F.col("ts"))).alias("t_view"),
        F.min(F.when(F.col("event_type") == "click", F.col("ts"))).alias("t_click"),
        F.min(F.when(F.col("event_type") == "purchase", F.col("ts"))).alias("t_purchase"),
    )
    return per_user.agg(
        F.count("t_view").alias("n_view"),
        F.count(F.when(F.col("t_click") > F.col("t_view"), 1)).alias("n_view_click"),
        F.count(
            F.when(
                (F.col("t_click") > F.col("t_view"))
                & (F.col("t_purchase") > F.col("t_click")),
                1,
            )
        ).alias("n_full_funnel"),
    )


def log_rolling_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing-1-hour rolling aggregate per user — a RANGE-frame window
    (frame membership by timestamp distance, not row count): the classic
    'rate over sliding window' log-metrics shape.

    Ordering by integer epoch-seconds makes the range frame
    engine-portable; decimal sums keep the rolling mean exact. One shuffle
    on user_id; the frame scan is a single ordered pass per partition."""
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_id", "value",
        # integer `div`, not `/`+cast: double→long casts truncate in Spark
        # but round in DuckDB — div floors identically in both
        F.expr("unix_micros(cast(ts as timestamp)) div 1000000").alias("ts_s"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts_s")
        .rangeBetween(-3600, Window.currentRow)
    )
    return ev.select(
        "user_id",
        "event_id",
        F.count("*").over(w).alias("n_1h"),
        # cast the exact decimal sum to double BEFORE dividing: decimal
        # division rounds at engine-specific scales, double÷int doesn't
        (
            F.sum(F.col("value").cast("decimal(12,2)")).over(w).cast("double")
            / F.count("*").over(w)
        ).alias("avg_value_1h"),
    )


ORACLE_ROLLING_RANGE = """
SELECT user_id, event_id,
       COUNT(*) OVER w AS n_1h,
       CAST(SUM(CAST(value AS DECIMAL(12,2))) OVER w AS DOUBLE) / COUNT(*) OVER w
         AS avg_value_1h
FROM (SELECT user_id, event_id, value, epoch_us(ts) // 1000000 AS ts_s
      FROM events)
WINDOW w AS (PARTITION BY user_id ORDER BY ts_s
             RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW)
"""


def log_gap_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-filled per-day event counts (time-spine densification — the
    hypertable-rollup shape): generate the full day spine with sequence(),
    left-join the observed daily counts, fill absent days with zero.

    100 TB posture: the spine is tiny (one row per day) and broadcast;
    the observed side is the already-aggregated rollup, not raw events —
    so the join moves (days × event_types) rows, never the fact table."""
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        F.col("ts").cast("date").alias("day"), "event_type"
    ).agg(F.count("*").alias("n"))
    bounds = daily.agg(F.min("day").alias("d0"), F.max("day").alias("d1"))
    spine = bounds.select(
        F.explode(F.expr("sequence(d0, d1, interval 1 day)")).alias("day")
    )
    types = daily.select("event_type").distinct()
    return (
        spine.crossJoin(types)
        .join(daily, ["day", "event_type"], "left")
        .select("day", "event_type", F.coalesce("n", F.lit(0)).alias("n"))
    )


ORACLE_GAP_FILL = """
WITH daily AS (
  SELECT CAST(ts AS DATE) AS day, event_type, COUNT(*) AS n
  FROM events GROUP BY 1, 2
), spine AS (
  SELECT UNNEST(generate_series((SELECT MIN(day) FROM daily),
                                (SELECT MAX(day) FROM daily),
                                INTERVAL 1 DAY))::DATE AS day
), types AS (SELECT DISTINCT event_type FROM daily)
SELECT s.day, t.event_type, COALESCE(d.n, 0) AS n
FROM spine s CROSS JOIN types t
LEFT JOIN daily d ON d.day = s.day AND d.event_type = t.event_type
"""


ORACLE_FUNNEL = """
WITH per_user AS (
  SELECT user_id,
         MIN(CASE WHEN event_type = 'view' THEN ts END) AS t_view,
         MIN(CASE WHEN event_type = 'click' THEN ts END) AS t_click,
         MIN(CASE WHEN event_type = 'purchase' THEN ts END) AS t_purchase
  FROM events GROUP BY user_id
)
SELECT COUNT(t_view) AS n_view,
       COUNT(CASE WHEN t_click > t_view THEN 1 END) AS n_view_click,
       COUNT(CASE WHEN t_click > t_view AND t_purchase > t_click THEN 1 END)
         AS n_full_funnel
FROM per_user
"""


def log_approx_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch surface: HyperLogLog++ distinct-user counts per event type,
    audited against the exact count IN the query. At 100 TB the exact
    countDistinct shuffles every distinct (type, user) pair; the HLL
    sketch is constant-size per group and merges associatively — this is
    the accuracy audit you run before switching dashboards to sketches.

    The raw estimate is engine-specific (Spark HLL++ vs DuckDB HLL give
    different values), so emitting it would make the row permanently
    oracle-less. Instead the query folds the sketch into a deterministic
    pass/fail bit: ``within_bound`` = |approx − exact| / exact ≤ 3·rsd
    (rsd = 0.02). The oracle asserts the exact counts AND ``TRUE`` — so a
    driver hash-match certifies both the group counts and that Spark's
    sketch landed inside its advertised error envelope (a 3-sigma bound;
    tests/test_plans.py::test_hll_within_error_bound pins the observed
    local error at ≤5%)."""
    ev = load_table(spark, sf_dir, "events")
    agg = ev.groupBy("event_type").agg(
        F.approx_count_distinct("user_id", 0.02).alias("approx_users"),
        F.countDistinct("user_id").alias("exact_users"),
    )
    return agg.select(
        "event_type",
        "exact_users",
        (
            F.abs(F.col("approx_users") - F.col("exact_users"))
            / F.col("exact_users")
            <= F.lit(0.06)
        ).alias("within_bound"),
    )


ORACLE_APPROX_USERS = """
SELECT event_type,
       COUNT(DISTINCT user_id) AS exact_users,
       TRUE AS within_bound
FROM events GROUP BY event_type
"""


# PII redaction rules, ordered most-specific-first so the generic digit
# rule can't mangle an email/IP before its own rule sees it. Patterns stay
# inside the Java∩RE2 common dialect (ASCII classes, \b, bounded repeats)
# so Spark and the DuckDB oracle scrub identically.
PII_RULES = (
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ipv4", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
    ("num", r"\d{2,}", "<NUM>"),
)


def log_scrub_pii(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Log-line PII/identifier redaction — the compliance scrub a log
    store runs before retention or before logs become training data:
    emails, IPv4 addresses, and multi-digit identifier runs replaced by
    typed tags, with per-category hit counts kept for audit.

    Counts are taken on the ORIGINAL line (each rule independently);
    scrubbing applies the rules most-specific-first on one string so an
    email's digits are consumed by <EMAIL>, not shredded into <NUM>.

    100 TB posture: pure regex projection — scan-speed, zero shuffles,
    whole-stage codegen'd; the rule table is a compile-time constant, so
    adding rules never changes the plan shape."""
    ev = load_table(spark, sf_dir, "events")
    scrubbed = F.col("props")
    for _, pat, tag in PII_RULES:
        scrubbed = F.regexp_replace(scrubbed, pat, tag)
    cols = [
        F.regexp_count("props", F.lit(pat)).alias(f"n_{name}")
        for name, pat, _ in PII_RULES
    ]
    return ev.select(
        "event_id", scrubbed.alias("clean_props"), *cols
    )


def _oracle_scrub_pii() -> str:
    scrub = "props"
    for _, pat, tag in PII_RULES:
        scrub = f"regexp_replace({scrub}, '{pat}', '{tag}', 'g')"
    counts = ", ".join(
        f"len(regexp_extract_all(props, '{pat}')) AS n_{name}"
        for name, pat, _ in PII_RULES
    )
    return (
        f"SELECT event_id, {scrub} AS clean_props, {counts} FROM events"
    )


def log_top_user_per_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped argmax via max_by — the aggregate-form 'top row per group'
    (no window, no second shuffle: two chained aggregations on
    successively coarser keys). Tie-broken deterministically by maxing on
    the (value, user_id) pair, since bare max_by picks an arbitrary row
    among equals — same contract as DuckDB's arg_max."""
    ev = load_table(spark, sf_dir, "events")
    per_user = ev.groupBy("event_type", "user_id").agg(
        dsum("value").alias("total_value")
    )
    # lexicographic max over (value, id) — deterministic argmax on both
    # engines (struct comparison is field-order lexicographic in Spark
    # and DuckDB alike; bare max_by/arg_max break ties arbitrarily)
    agged = per_user.groupBy("event_type").agg(
        F.max(F.struct(F.col("total_value").alias("tv"),
                       F.col("user_id").alias("uid"))).alias("m")
    )
    return agged.select(
        "event_type",
        F.col("m.uid").alias("top_user"),
        F.col("m.tv").alias("top_total"),
    )


ORACLE_TOP_USER = """
WITH per_user AS (
  SELECT event_type, user_id,
         CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS total_value
  FROM events GROUP BY event_type, user_id
), agged AS (
  SELECT event_type,
         MAX({'tv': total_value, 'uid': user_id}) AS m
  FROM per_user GROUP BY event_type
)
SELECT event_type, m.uid AS top_user, m.tv AS top_total FROM agged
"""


def log_rate_per_minute(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LogQL metric-query analogue ``rate({type="..."}[1m])``: per-minute
    event counts per type converted to events/second. The reference
    delegates metric queries to Loki itself; on the Spark side the same
    rollup is a date_trunc groupBy — one shuffle on a bounded
    (minute × type) key, partial-aggregated map-side."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(
            F.date_trunc("minute", F.col("ts").cast("timestamp")).alias("minute"),
            "event_type",
        )
        .agg(F.count("*").alias("n"))
        .select(
            F.col("minute").cast("timestamp_ntz").alias("minute"),
            "event_type",
            "n",
            (F.col("n") / F.lit(60.0)).alias("rate_per_sec"),
        )
    )


ORACLE_RATE = """
SELECT date_trunc('minute', ts) AS minute, event_type, COUNT(*) AS n,
       COUNT(*) / 60.0 AS rate_per_sec
FROM events GROUP BY 1, 2
"""


def log_rate_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-minute rate anomaly detection: z-score of each (event_type,
    minute) count against that type's own per-minute distribution — the
    alerting rollup a log-store dashboard runs (spike/dip detection).

    Exactness: the mean/variance come from INTEGER sums (Σn, Σn², count)
    so the doubles are single exactly-rounded divisions — bit-identical on
    both engines; population variance via E[x²]−E[x]², clamped at 0 to
    absorb the catastrophic-cancellation sliver, z forced to 0.0 when the
    variance is 0 (constant-rate type) to dodge engine-specific ±Inf
    division semantics.

    100 TB posture: the fact scan collapses to the bounded
    (type × minute) key with map-side partials — everything after is
    minute-scale. The per-type stats frame is #event_types rows joined
    WITHOUT a forced broadcast hint (type cardinality is vocabulary-bound
    in practice but fact-derived in principle; AQE broadcasts it when it
    fits). Window-free: stats via a second tiny agg, not a window over
    the minute frame, so no minute-frame re-sort."""
    ev = load_table(spark, sf_dir, "events")
    per_min = ev.groupBy(
        F.date_trunc("minute", F.col("ts").cast("timestamp")).alias("minute"),
        "event_type",
    ).agg(F.count("*").alias("n"))
    stats = per_min.groupBy("event_type").agg(
        F.sum("n").alias("sum_n"),
        F.sum(F.col("n") * F.col("n")).alias("sum_n2"),
        F.count("*").alias("n_minutes"),
    )
    mean = F.col("sum_n").cast("double") / F.col("n_minutes").cast("double")
    var = F.greatest(
        F.col("sum_n2").cast("double") / F.col("n_minutes").cast("double")
        - mean * mean,
        F.lit(0.0),
    )
    z = F.when(var <= 0.0, F.lit(0.0)).otherwise(
        (F.col("n").cast("double") - mean) / F.sqrt(var)
    )
    return per_min.join(stats, "event_type").select(
        "event_type",
        F.col("minute").cast("timestamp_ntz").alias("minute"),
        "n",
        z.alias("zscore"),
        (F.abs(z) > F.lit(3.0)).alias("is_anomaly"),
    )


ORACLE_RATE_ANOMALY = """
WITH per_min AS (
  SELECT date_trunc('minute', ts) AS minute, event_type, COUNT(*) AS n
  FROM events GROUP BY 1, 2
), stats AS (
  SELECT event_type,
         CAST(SUM(n) AS BIGINT) AS sum_n,
         CAST(SUM(n * n) AS BIGINT) AS sum_n2,
         COUNT(*) AS n_minutes
  FROM per_min GROUP BY event_type
), scored AS (
  SELECT p.event_type, p.minute, p.n,
         CAST(s.sum_n AS DOUBLE) / CAST(s.n_minutes AS DOUBLE) AS mean,
         GREATEST(
           CAST(s.sum_n2 AS DOUBLE) / CAST(s.n_minutes AS DOUBLE)
             - (CAST(s.sum_n AS DOUBLE) / CAST(s.n_minutes AS DOUBLE))
             * (CAST(s.sum_n AS DOUBLE) / CAST(s.n_minutes AS DOUBLE)),
           0.0) AS var
  FROM per_min p JOIN stats s USING (event_type)
)
SELECT event_type, minute, n,
       CASE WHEN var <= 0.0 THEN 0.0
            ELSE (CAST(n AS DOUBLE) - mean) / sqrt(var) END AS zscore,
       ABS(CASE WHEN var <= 0.0 THEN 0.0
            ELSE (CAST(n AS DOUBLE) - mean) / sqrt(var) END) > 3.0 AS is_anomaly
FROM scored
"""


SPIKE_TOP_USERS = 3


def log_spike_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Anomaly attribution — the question that follows every alert from
    log_rate_anomaly: WHO drove the spike. For each anomalous
    (event_type, minute), the top SPIKE_TOP_USERS contributing users by
    event count (ties to the lowest user_id). Empty when nothing is
    anomalous — at tiny scale every minute holds one event and the
    z-scores are all 0, which is itself the correct answer.

    100 TB posture: the fact scan collapses to (type, minute, user)
    counts with map-side partials BEFORE any join — the anomalous-minute
    frame (doubly aggregated, alert-scale) then prunes it on the bounded
    (type, minute) key, and the top-k is WindowGroupLimit-pruned. No
    fact-scale join, no forced broadcast (anomalies are fact-derived)."""
    from pyspark.sql import Window

    anomalies = (
        log_rate_anomaly(spark, sf_dir)
        .where(F.col("is_anomaly"))
        .select("event_type", "minute")
    )
    ev = load_table(spark, sf_dir, "events")
    contrib = ev.groupBy(
        "event_type",
        F.date_trunc("minute", F.col("ts").cast("timestamp"))
        .cast("timestamp_ntz")
        .alias("minute"),
        "user_id",
    ).agg(F.count("*").alias("n_events"))
    w = Window.partitionBy("event_type", "minute").orderBy(
        F.desc("n_events"), F.asc("user_id")
    )
    return (
        contrib.join(anomalies, ["event_type", "minute"])
        .withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= SPIKE_TOP_USERS)
        .select("event_type", "minute", "rank", "user_id", "n_events")
    )


ORACLE_SPIKE_ATTRIBUTION = f"""
WITH anomalies AS (
  SELECT event_type, minute FROM ({ORACLE_RATE_ANOMALY}) a WHERE is_anomaly
), contrib AS (
  SELECT event_type, date_trunc('minute', ts) AS minute, user_id,
         COUNT(*) AS n_events
  FROM events GROUP BY 1, 2, 3
)
SELECT event_type, minute, rank, user_id,
       CAST(n_events AS BIGINT) AS n_events
FROM (
  SELECT c.*, ROW_NUMBER() OVER (PARTITION BY c.event_type, c.minute
                                 ORDER BY c.n_events DESC, c.user_id ASC)
           AS rank
  FROM contrib c JOIN anomalies USING (event_type, minute)
)
WHERE rank <= {SPIKE_TOP_USERS}
"""


# Histogram bounds: fixed [0, 500) in 20 buckets of 25 (value's generated
# range — see FIXTURES.md; out-of-range values clamp into the edge buckets,
# so the operators are total either way). Shared by log_value_histogram
# and the drift monitor below.
HIST_BUCKETS = 20
HIST_WIDTH = 25.0

DRIFT_CHI2_THRESHOLD = 0.1  # flag types whose halves diverge past this


def log_histogram_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Value-distribution drift per event type: split the stream at the
    midpoint of its time range, histogram `value` into the shared
    fixed-width buckets on each side, and compute a chi-square-family
    divergence between the Laplace-smoothed bucket shares — the
    data-drift monitor run before retraining anything on "the same"
    telemetry (PSI needs ln(), which is not correctly-rounded on either
    engine, so the chi-square form keeps the row hash-checkable).

    Exactness: bucket counts are integers; p, q and each bucket's
    (q−p)²/p term are single exactly-rounded double expressions; the
    per-type SUM of terms goes through DECIMAL(38,20) (associative, so
    partition/merge order cannot move the result — the
    emb_centroid_by_label contract). Buckets empty on BOTH halves are
    excluded identically on both engines (smoothing is per-present-
    bucket; documented, deterministic).

    100 TB posture: one pass collapses the stream to the bounded
    (type × bucket × half) key with map-side partials; the time-range
    bounds ride a 1-row broadcast; everything downstream is
    types × buckets scale."""
    ev = load_table(spark, sf_dir, "events")
    us = "unix_micros(cast(ts as timestamp))"
    bounds = ev.agg(
        F.expr(f"min({us})").alias("mn"), F.expr(f"max({us})").alias("mx")
    )
    bucket = value_hist_bucket()
    halves = (
        ev.crossJoin(F.broadcast(bounds))
        .select(
            "event_type",
            bucket.alias("bucket"),
            (F.expr(us) <= F.expr("(mn + mx) div 2")).alias("in_first"),
        )
        .groupBy("event_type", "bucket")
        .agg(
            F.sum(F.when(F.col("in_first"), 1).otherwise(0)).alias("c_a"),
            F.sum(F.when(~F.col("in_first"), 1).otherwise(0)).alias("c_b"),
        )
    )
    from pyspark.sql import Window

    totals = Window.partitionBy("event_type")
    term = chi2_smoothed_term("c_a", "n_a", "c_b", "n_b")
    scored = halves.withColumn("n_a", F.sum("c_a").over(totals)).withColumn(
        "n_b", F.sum("c_b").over(totals)
    )
    out = scored.groupBy("event_type").agg(
        F.max("n_a").alias("n_first"),
        F.max("n_b").alias("n_second"),
        F.count("*").alias("n_buckets"),
        F.sum(F.expr(f"cast({term} as decimal(38,20))"))
        .cast("double")
        .alias("drift_chi2"),
    )
    return out.withColumn(
        "is_drifted", F.col("drift_chi2") > F.lit(DRIFT_CHI2_THRESHOLD)
    )


ORACLE_HISTOGRAM_DRIFT = f"""
WITH bounds AS (
  SELECT MIN(epoch_us(ts)) AS mn, MAX(epoch_us(ts)) AS mx FROM events
), halves AS (
  SELECT event_type,
         CAST(least(greatest(floor(value / {HIST_WIDTH}), 0),
                    {HIST_BUCKETS - 1}) AS BIGINT) AS bucket,
         SUM(CASE WHEN epoch_us(ts) <= (mn + mx) // 2 THEN 1 ELSE 0 END)
           AS c_a,
         SUM(CASE WHEN epoch_us(ts) <= (mn + mx) // 2 THEN 0 ELSE 1 END)
           AS c_b
  FROM events CROSS JOIN bounds
  GROUP BY 1, 2
), scored AS (
  SELECT event_type, bucket, c_a, c_b,
         SUM(c_a) OVER (PARTITION BY event_type) AS n_a,
         SUM(c_b) OVER (PARTITION BY event_type) AS n_b
  FROM halves
), terms AS (
  SELECT event_type, n_a, n_b,
         ((CAST(c_b + 1 AS DOUBLE) / CAST(n_b + {HIST_BUCKETS} AS DOUBLE))
          - (CAST(c_a + 1 AS DOUBLE) / CAST(n_a + {HIST_BUCKETS} AS DOUBLE)))
         * ((CAST(c_b + 1 AS DOUBLE) / CAST(n_b + {HIST_BUCKETS} AS DOUBLE))
          - (CAST(c_a + 1 AS DOUBLE) / CAST(n_a + {HIST_BUCKETS} AS DOUBLE)))
         / (CAST(c_a + 1 AS DOUBLE) / CAST(n_a + {HIST_BUCKETS} AS DOUBLE))
           AS term
  FROM scored
)
SELECT event_type,
       CAST(MAX(n_a) AS BIGINT) AS n_first,
       CAST(MAX(n_b) AS BIGINT) AS n_second,
       COUNT(*) AS n_buckets,
       CAST(CAST(SUM(CAST(CAST(term AS VARCHAR) AS DECIMAL(38,20)))
                 AS VARCHAR) AS DOUBLE) AS drift_chi2,
       CAST(CAST(SUM(CAST(CAST(term AS VARCHAR) AS DECIMAL(38,20)))
                 AS VARCHAR) AS DOUBLE) > {DRIFT_CHI2_THRESHOLD}
         AS is_drifted
FROM terms GROUP BY event_type
"""


def log_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention: users grouped by their first-activity day, then
    for each (cohort_day, day_offset) the count of distinct cohort members
    active that many days later — the classic product-analytics rollup a
    log-store user runs (LogQL cannot express it; the host engine must).

    Shape: one groupBy(user_id) for first-day (map-side partial MIN), the
    cohort map joined back onto the event scan WITHOUT a broadcast hint —
    user cardinality is unbounded for a log store, so forcing the build
    side resident would OOM at scale; the cohort-map side of the shuffle
    join reuses the groupBy exchange, and AQE still broadcasts it at
    runtime whenever it genuinely fits (no-forced-hint shape pinned by
    tests/test_plans.py::test_retention_cohorts_no_forced_broadcast).
    Final agg lands on the tiny (cohort_day, offset) key; the
    distinct-user count shuffles (cohort, offset, user) tuples — bounded
    by active (user × day) pairs, not raw events, thanks to
    partial-distinct map-side dedup."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", F.date_trunc("day", F.col("ts").cast("timestamp")).alias("day")
    )
    first_day = ev.groupBy("user_id").agg(F.min("day").alias("cohort_day"))
    return (
        ev.join(first_day, "user_id")
        .groupBy(
            F.col("cohort_day").cast("date").alias("cohort_day"),
            F.datediff(F.col("day"), F.col("cohort_day")).alias("day_offset"),
        )
        .agg(F.countDistinct("user_id").alias("n_active_users"))
    )


ORACLE_RETENTION = """
WITH ev AS (
  SELECT user_id, date_trunc('day', ts) AS day FROM events
), first_day AS (
  SELECT user_id, MIN(day) AS cohort_day FROM ev GROUP BY user_id
)
SELECT CAST(f.cohort_day AS DATE) AS cohort_day,
       CAST(date_diff('day', f.cohort_day, e.day) AS INT) AS day_offset,
       COUNT(DISTINCT e.user_id) AS n_active_users
FROM ev e JOIN first_day f ON e.user_id = f.user_id
GROUP BY 1, 2
"""


def log_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: each purchase matched to the user's most recent strictly
    prior click — the attribution / feature-lookup primitive (an operator
    Spark lacks natively; the union+window composition is its scalable
    form).

    Shape: union both event roles into ONE frame, window per user ordered
    by (ts, event_id), carry the last click forward with
    last(..., ignorenulls), keep purchase rows. ONE shuffle on user_id —
    a join-based as-of (per-pair range join + argmax) would shuffle both
    sides and blow up on users with many clicks; this streams each user's
    timeline once. Ties: a click at the same ts counts only if its
    event_id is lower (matching the lateral oracle's deterministic rule).

    Skew at 100 TB: one pathologically hot user_id serializes its whole
    timeline into a single window task. Mitigations, in preference order,
    all preserving these exact semantics: (1) the running state is ONE
    value (last click seen), so the timeline can be re-chunked by
    (user_id, time-slice) with a per-slice "last click" computed first and
    carried across slice boundaries via a second tiny window over the
    per-slice summaries — two bounded shuffles instead of one unbounded
    task (the salted two-phase shape); (2) when purchases are sparse,
    fall back to log_interval_join_batch with a bounded lookback window +
    argmax, which AQE skew-splits freely because the 1-hour bound caps
    per-user fan-out; (3) AQE cannot split a window partition, so cap the
    blast radius operationally with a hot-key sideline (count-min the key
    histogram, route the few hot users through path (1)). The
    single-shuffle plan here is pinned by
    tests/test_plans.py::test_asof_join_single_user_shuffle.
    """
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events").where(
        F.col("event_type").isin("click", "purchase")
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    is_click = F.col("event_type") == "click"
    enriched = ev.select(
        "user_id",
        "ts",
        "event_id",
        "event_type",
        F.last(F.when(is_click, F.col("ts")), ignorenulls=True)
        .over(w)
        .alias("click_ts"),
        F.last(F.when(is_click, F.col("event_id")), ignorenulls=True)
        .over(w)
        .alias("click_id"),
    )
    return (
        enriched.where(F.col("event_type") == "purchase")
        .select(
            F.col("event_id").alias("purchase_id"),
            "user_id",
            F.col("ts").alias("purchase_ts"),
            "click_ts",
            "click_id",
            (
                (
                    F.unix_micros(F.col("ts").cast("timestamp"))
                    - F.unix_micros(F.col("click_ts").cast("timestamp"))
                )
                / F.lit(1000000.0)
            ).alias("gap_sec"),
        )
    )


ORACLE_ASOF = """
WITH c AS (
  SELECT user_id, ts, event_id FROM events WHERE event_type = 'click'
), p AS (
  SELECT user_id, ts, event_id FROM events WHERE event_type = 'purchase'
)
SELECT p.event_id AS purchase_id, p.user_id, p.ts AS purchase_ts,
       cc.click_ts, cc.click_id,
       (epoch_us(p.ts) - epoch_us(cc.click_ts)) / 1000000.0 AS gap_sec
FROM p LEFT JOIN LATERAL (
  SELECT c.ts AS click_ts, c.event_id AS click_id
  FROM c
  WHERE c.user_id = p.user_id
    AND (c.ts < p.ts OR (c.ts = p.ts AND c.event_id < p.event_id))
  ORDER BY c.ts DESC, c.event_id DESC
  LIMIT 1
) cc ON TRUE
"""


def log_asof_join_chunked(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The hot-key-proof two-phase variant of log_asof_join (mitigation (1)
    from its docstring, implemented): identical output, but no single task
    ever holds a whole user's timeline.

    Phase 1 — within-slice: the same (ts, event_id) window as the plain
    as-of, but partitioned by (user_id, day-slice), so a pathological user
    is spread across #days tasks. Phase 2 — carry: per (user, slice) the
    last click of all PRIOR slices, computed from per-slice one-row
    summaries (max (ts,event_id) struct per slice) through a second window
    over the tiny summary frame; a purchase with no in-slice prior click
    takes the carried pair. Same-timestamp ties always fall in the same
    slice (slice is a function of ts), so the tie rule lives entirely in
    phase 1 and the composition is EXACTLY the single-window semantics —
    shared oracle (ORACLE_ASOF) proves it.

    100 TB posture: the fact table shuffles ONCE on (user_id, slice); the
    carry chain shuffles only (users × active slices) summary rows and
    joins back WITHOUT a broadcast hint — the carry frame is fact-derived
    (distinct users × active days, unbounded), so forcing a broadcast
    would OOM the driver in exactly the huge-corpus scenario this variant
    exists for. The join key (user_id, slice) is the key the fact side was
    just window-shuffled on, so the shuffle join is co-partitioned and
    nearly free; AQE still converts it to a broadcast at runtime whenever
    the carry frame genuinely fits (the no-forced-hint shape is pinned by
    tests/test_plans.py::test_asof_chunked_partitions_by_slice). Worst-case
    task = one user-day, not one user-history.
    """
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events").where(
        F.col("event_type").isin("click", "purchase")
    )
    sliced = ev.select(
        "user_id",
        "ts",
        "event_id",
        "event_type",
        F.date_trunc("day", F.col("ts").cast("timestamp")).alias("slice"),
    )
    is_click = F.col("event_type") == "click"
    w1 = (
        Window.partitionBy("user_id", "slice")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    within = sliced.select(
        "user_id",
        "slice",
        "ts",
        "event_id",
        "event_type",
        F.last(F.when(is_click, F.col("ts")), ignorenulls=True)
        .over(w1)
        .alias("w_click_ts"),
        F.last(F.when(is_click, F.col("event_id")), ignorenulls=True)
        .over(w1)
        .alias("w_click_id"),
    )
    # per-slice last click (struct max orders by (ts, event_id) — the same
    # deterministic rule as the window sort)
    summaries = (
        sliced.where(is_click)
        .groupBy("user_id", "slice")
        .agg(F.max(F.struct("ts", "event_id")).alias("lc"))
    )
    spine = sliced.select("user_id", "slice").distinct()
    w2 = (
        Window.partitionBy("user_id")
        .orderBy("slice")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    carried = spine.join(summaries, ["user_id", "slice"], "left").select(
        "user_id",
        "slice",
        F.last(F.col("lc"), ignorenulls=True).over(w2).alias("carry"),
    )
    best = F.when(
        F.col("w_click_id").isNotNull(),
        F.struct(
            F.col("w_click_ts").alias("ts"), F.col("w_click_id").alias("event_id")
        ),
    ).otherwise(F.col("carry"))
    return (
        within.where(F.col("event_type") == "purchase")
        .join(carried, ["user_id", "slice"], "left")
        .withColumn("best", best)
        .select(
            F.col("event_id").alias("purchase_id"),
            "user_id",
            F.col("ts").alias("purchase_ts"),
            F.col("best.ts").alias("click_ts"),
            F.col("best.event_id").alias("click_id"),
            (
                (
                    F.unix_micros(F.col("ts").cast("timestamp"))
                    - F.unix_micros(F.col("best.ts").cast("timestamp"))
                )
                / F.lit(1000000.0)
            ).alias("gap_sec"),
        )
    )


def log_interval_join_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch range/interval join: every (click, purchase) pair of the same
    user with the purchase inside [click_ts, click_ts + 1 hour] — the batch
    twin of the stream-stream interval join (streaming/pipeline.py).

    Shape: equi-join on user_id (one shuffle each side) with the range
    predicates as residual join conditions — Spark evaluates them inside
    the SortMergeJoin, never materializing the per-user cross product
    beyond matching rows. The 1-hour bound keeps per-user fan-out
    bounded regardless of history length."""
    ev = load_table(spark, sf_dir, "events")
    clicks = ev.where(F.col("event_type") == "click").select(
        F.col("user_id").alias("c_user"),
        F.col("ts").alias("click_ts"),
        F.col("event_id").alias("click_id"),
    )
    purchases = ev.where(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user"),
        F.col("ts").alias("purchase_ts"),
        F.col("event_id").alias("purchase_id"),
    )
    return (
        clicks.join(
            purchases,
            (F.col("c_user") == F.col("p_user"))
            & (F.col("purchase_ts") >= F.col("click_ts"))
            & (
                F.col("purchase_ts")
                <= F.col("click_ts") + F.expr("interval 1 hour")
            ),
        )
        .select(
            F.col("c_user").alias("user_id"),
            "click_id",
            "purchase_id",
            "click_ts",
            "purchase_ts",
        )
    )


ORACLE_INTERVAL_JOIN = """
SELECT c.user_id, c.event_id AS click_id, p.event_id AS purchase_id,
       c.ts AS click_ts, p.ts AS purchase_ts
FROM events c JOIN events p
  ON c.user_id = p.user_id
 AND c.event_type = 'click' AND p.event_type = 'purchase'
 AND p.ts >= c.ts AND p.ts <= c.ts + INTERVAL 1 HOUR
"""


def log_active_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DAU / WAU: distinct users per day and per trailing 7-day window —
    the engagement rollup every log-backed product dashboard runs.
    Distinct-over-a-sliding-window has no single-pass exact form in SQL
    window functions, so WAU uses the standard spine shape: the (tiny)
    day spine range-joins the day-distinct user frame over a 6-day
    lookback, then counts distinct per day.

    100 TB posture: the fact table collapses FIRST to (day × user)
    distinct rows — the only corpus-scale shuffle; the spine join then
    multiplies that bounded frame by ≤7 (spine broadcasts; the range
    condition is a residual on the broadcast join), and the final
    per-day distinct is days-scale. Exact, not sketched — the HLL
    variant for when even (day × user) is too big is log_approx_users'
    territory."""
    ev = load_table(spark, sf_dir, "events")
    du = ev.select(
        F.col("ts").cast("date").alias("day"), "user_id"
    ).distinct()
    days = du.select("day").distinct()
    dau = du.groupBy("day").agg(F.count("*").alias("dau"))
    window_pairs = days.join(
        du.select(F.col("day").alias("d2"), "user_id"),
        (F.col("d2") <= F.col("day"))
        & (F.col("d2") >= F.date_sub(F.col("day"), 6)),
    )
    wau = window_pairs.groupBy("day").agg(
        F.countDistinct("user_id").alias("wau")
    )
    return dau.join(wau, "day")


ORACLE_ACTIVE_USERS = """
WITH du AS (
  SELECT DISTINCT CAST(ts AS DATE) AS day, user_id FROM events
), days AS (
  SELECT DISTINCT day FROM du
), dau AS (
  SELECT day, COUNT(*) AS dau FROM du GROUP BY day
), wau AS (
  SELECT d.day, COUNT(DISTINCT u.user_id) AS wau
  FROM days d JOIN du u
    ON u.day <= d.day AND u.day >= d.day - INTERVAL 6 DAY
  GROUP BY d.day
)
SELECT day, dau, wau FROM dau JOIN wau USING (day)
"""


SLO_TARGET = 0.99
# burn = err_rate / (1−SLO), applied as multiplication by the reciprocal:
# 1/(1−0.99) == 100.0 exactly in IEEE double, whereas a runtime
# (1.0 − SLO_TARGET) divisor parses through DECIMAL on DuckDB and lands
# 1 ulp off the IEEE subtraction. The assert ties the literal to
# SLO_TARGET so changing the target cannot silently leave the multiplier
# (and the oracle's matching literal) stale.
_BURN_MULTIPLIER = 100.0
# (checked in the exact direction: 1/100 and the subtraction from 1.0 are
# both IEEE-exact, while (1.0 − 0.99) itself is not)
assert SLO_TARGET == 1.0 - 1.0 / _BURN_MULTIPLIER


def log_slo_burn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-day SLO error-budget burn rate — the SRE rollup a log store
    feeds to alerting: err_rate = errors/total, burn = err_rate/(1−SLO);
    burn > 1 means the day spent budget faster than a 99%-target period
    allows. Pure integer counts + two exactly-rounded divisions (the
    (1−SLO) denominator is a compile-time double literal — identical on
    both engines), so the row is fully hash-checkable.

    100 TB posture: one map-side-combined agg on the bounded day key;
    the conditional error count rides the same partials — no second
    scan, no join."""
    ev = load_table(spark, sf_dir, "events")
    per_day = ev.groupBy(F.col("ts").cast("date").alias("day")).agg(
        F.count("*").alias("n_total"),
        F.sum(
            F.when(F.col("event_type") == "error", 1).otherwise(0)
        ).alias("n_errors"),
    )
    err_rate = F.col("n_errors").cast("double") / F.col("n_total")
    burn = err_rate * F.lit(_BURN_MULTIPLIER)  # see the constant's note
    return per_day.select(
        "day",
        "n_total",
        "n_errors",
        err_rate.alias("err_rate"),
        burn.alias("burn_rate"),
        (burn > F.lit(1.0)).alias("budget_exhausted"),
    )


ORACLE_SLO_BURN = f"""
WITH per_day AS (
  SELECT CAST(ts AS DATE) AS day, COUNT(*) AS n_total,
         SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS n_errors
  FROM events GROUP BY 1
)
SELECT day, n_total, CAST(n_errors AS BIGINT) AS n_errors,
       CAST(n_errors AS DOUBLE) / n_total AS err_rate,
       CAST(n_errors AS DOUBLE) / n_total * CAST({_BURN_MULTIPLIER} AS DOUBLE)
         AS burn_rate,
       CAST(n_errors AS DOUBLE) / n_total * CAST({_BURN_MULTIPLIER} AS DOUBLE)
         > 1.0 AS budget_exhausted
FROM per_day
"""


def log_session_window_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The NATIVE session_window operator run in batch mode — literally
    the same function the streaming pipeline uses
    (streaming.pipeline.session_window_counts), re-invoked on the static
    table: the batch/stream parity contract ("the identical code runs in
    batch mode for backfills") made driver-checkable. Session semantics:
    an event extends the session iff its window [ts, ts+5min) OVERLAPS
    the session so far — i.e. a new session starts exactly when
    ts − prev_ts ≥ gap (touching windows do NOT merge); the oracle
    mirrors that boundary with >=.

    100 TB posture: one shuffle on user_id; Spark's native session merge
    replaces the lag/cumsum two-window-pass shape of
    log_sessionize_batch with a single aggregation."""
    from datafusion_loki_spark.streaming.pipeline import session_window_counts

    ev = load_table(spark, sf_dir, "events")
    out = session_window_counts(ev)
    return out.select(
        F.col("session_start").cast("timestamp_ntz").alias("session_start"),
        F.col("session_end").cast("timestamp_ntz").alias("session_end"),
        "user_id",
        "n_events",
        "sum_value",
    )


ORACLE_SESSION_WINDOW = """
WITH ordered AS (
  SELECT user_id, ts, value, event_id,
         LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
  FROM events
), numbered AS (
  SELECT user_id, ts, value,
         SUM(CASE WHEN prev_ts IS NULL
                    OR ts - prev_ts >= INTERVAL 5 MINUTE THEN 1 ELSE 0 END)
           -- event_id tie-break, as in ORACLE_SESSIONIZE: µs-truncated
           -- timestamps can collide, and an untied cumulative sum could
           -- enumerate a tied row before its own boundary flag,
           -- splitting a session Spark's (tie-insensitive)
           -- session_window keeps whole — a nondeterministic hash flake
           OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS UNBOUNDED PRECEDING) AS sess
  FROM ordered
)
SELECT MIN(ts) AS session_start,
       MAX(ts) + INTERVAL 5 MINUTE AS session_end,
       user_id, COUNT(*) AS n_events,
       CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS sum_value
FROM numbered GROUP BY user_id, sess
"""


def log_approx_quantile_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantile-sketch audit — the p95 twin of log_approx_users: at
    100 TB the exact per-group p95 needs a full sort (or a bounded-group
    collect), while approx_percentile's GK sketch is constant-size and
    merges associatively; this is the audit run before dashboards switch.

    The sketch VALUE is engine- and merge-order-specific (partition merge
    order legally moves it within the error bound), so emitting it would
    make the row permanently oracle-less. Instead the query folds it into
    a deterministic bit computed from exact integers: the EXACT rank of
    the approx p95 (count of values ≤ it, second pass) must land in
    [0.93·n, 0.97·n] — the sketch's rank-error contract (ε = 1/accuracy =
    1e-4, window padded 300×) guarantees the bit is TRUE however the
    merge order falls, and the driver hash then certifies the group
    counts AND the in-bound landing.

    100 TB posture: pass 1 is one map-side-combined sketch agg (constant
    state per group); pass 2 re-scans and joins on the type-bounded key
    (no forced broadcast — AQE handles it); everything emitted is exact
    integer arithmetic."""
    ev = load_table(spark, sf_dir, "events")
    approx = ev.groupBy("event_type").agg(
        F.expr("approx_percentile(value, 0.95d, 10000)").alias("ap")
    )
    return (
        ev.join(approx, "event_type")
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n"),
            F.sum(
                F.when(F.col("value") <= F.col("ap"), 1).otherwise(0)
            ).alias("rank_le"),
        )
        .select(
            "event_type",
            "n",
            # the [0.93n, 0.97n] window is only meaningful once a single
            # rank step (1/n) is small against its 0.04n width: below
            # _QUANTILE_AUDIT_MIN_N the exact rank of the approx p95 can
            # structurally land at ~n (tiny or tie-heavy groups), so the
            # audit abstains (TRUE) rather than fabricate a failure the
            # sketch contract never promised to avoid
            F.when(F.col("n") < _QUANTILE_AUDIT_MIN_N, F.lit(True))
            .otherwise(
                (F.col("rank_le") * 100 >= F.col("n") * 93)
                & (F.col("rank_le") * 100 <= F.col("n") * 97)
            )
            .alias("within_bound"),
        )
    )


# below this group size the audit bit abstains; 100 rows ⇒ the window is
# ≥4 rank steps wide, enough for the GK contract to hold discretely
_QUANTILE_AUDIT_MIN_N = 100

ORACLE_APPROX_QUANTILE = """
SELECT event_type, COUNT(*) AS n, TRUE AS within_bound
FROM events GROUP BY event_type
"""


def log_value_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width value histogram per event type — the LogQL
    ``histogram_quantile``-feeder rollup (bucketed counts, not quantiles:
    buckets merge associatively across shards, quantiles don't).

    100 TB posture: one map-side-combined aggregation on the bounded
    (event_type × bucket) key — the shuffle carries at most
    types × HIST_BUCKETS rows regardless of corpus size. Bucket edges are
    compile-time constants, so the bucket index is a codegen'd projection
    at scan speed (no per-row function call, no sort)."""
    ev = load_table(spark, sf_dir, "events")
    bucket = value_hist_bucket()
    return (
        ev.groupBy("event_type", bucket.alias("bucket"))
        .agg(F.count("*").alias("n"))
        .select(
            "event_type",
            "bucket",
            (F.col("bucket") * HIST_WIDTH).alias("lo"),
            ((F.col("bucket") + 1) * HIST_WIDTH).alias("hi"),
            "n",
        )
    )


ORACLE_VALUE_HISTOGRAM = f"""
WITH b AS (
  SELECT event_type,
         CAST(LEAST(GREATEST(FLOOR(value / {HIST_WIDTH}), 0),
                    {HIST_BUCKETS - 1}) AS BIGINT) AS bucket
  FROM events
)
SELECT event_type, bucket,
       CAST(bucket * {HIST_WIDTH} AS DOUBLE) AS lo,
       CAST((bucket + 1) * {HIST_WIDTH} AS DOUBLE) AS hi,
       COUNT(*) AS n
FROM b GROUP BY event_type, bucket
"""


# Template-mining mask rules, most-specific-first (same ordering discipline
# as PII_RULES): variable fragments collapse to typed placeholders so lines
# that differ only in identifiers share one template. Patterns stay in the
# Java∩RE2 common dialect so both engines mask identically.
TEMPLATE_RULES = (
    (r"\b[0-9a-f]{8}-[0-9a-f]{4}-[0-9a-f]{4}-[0-9a-f]{4}-[0-9a-f]{12}\b", "<UUID>"),
    (r"\b0x[0-9a-fA-F]+\b", "<HEX>"),
    (r"\d+", "<N>"),
)


def log_templates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Log-template mining (the Drain-style pattern extraction a log store
    runs to turn billions of lines into thousands of templates): mask the
    variable fragments of each line, then roll up counts, distinct users,
    and the time span per (label, template).

    100 TB posture: masking is a codegen'd regex projection at scan speed;
    the aggregation key (event_type × template) is vocabulary-sized —
    template cardinality is bounded by the application's log-statement
    count, not by data volume — so the shuffle is tiny and map-side
    partials absorb virtually all rows."""
    ev = load_table(spark, sf_dir, "events")
    tmpl = F.col("props")
    for pat, tag in TEMPLATE_RULES:
        tmpl = F.regexp_replace(tmpl, pat, tag)
    return ev.groupBy("event_type", tmpl.alias("template")).agg(
        F.count("*").alias("n"),
        F.countDistinct("user_id").alias("n_users"),
        F.min("ts").alias("first_ts"),
        F.max("ts").alias("last_ts"),
    )


def _oracle_templates() -> str:
    tmpl = "props"
    for pat, tag in TEMPLATE_RULES:
        tmpl = f"regexp_replace({tmpl}, '{pat}', '{tag}', 'g')"
    return f"""
SELECT event_type, {tmpl} AS template, COUNT(*) AS n,
       COUNT(DISTINCT user_id) AS n_users,
       MIN(ts) AS first_ts, MAX(ts) AS last_ts
FROM events GROUP BY 1, 2
"""


# Misra-Gries summary capacity per partition. The mergeable-summaries
# theorem (Agarwal et al., PODS 2012 — public) gives the union of
# per-partition MG(m) summaries a total undercount ≤ n/(m+1), so the
# candidate set provably contains EVERY key with true count > n/(m+1);
# the exact second pass then makes the final output deterministic and
# partitioning-independent. The threshold below is exactly that bound, so
# the guarantee is airtight (not heuristic).
MG_CAPACITY = 150


def mg_merge(counters: dict, counts: dict, cap: int) -> dict:
    """Merge one batch's exact value-counts into a Misra-Gries summary of
    ≤ ``cap`` entries: add, then subtract the (cap+1)-th largest counter
    from all and drop non-positives (the mergeable-summaries rule). Total
    decrement over any merge sequence covering n items is ≤ n/(cap+1), so
    every key with true count > n/(cap+1) ends with a positive counter —
    the superset guarantee log_heavy_hitters' exact second pass relies
    on, property-tested under arbitrary chunking in tests/test_sketches.py."""
    for k, v in counts.items():
        counters[k] = counters.get(k, 0) + int(v)
    if len(counters) > cap:
        cut = sorted(counters.values(), reverse=True)[cap]
        counters = {k: v - cut for k, v in counters.items() if v - cut > 0}
    return counters


def log_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heavy hitters (users emitting > n/(m+1) of all events) via the
    two-pass sketch-then-verify topology — the shape that matters at
    100 TB: a plain ``GROUP BY user_id`` shuffles every distinct user;
    this shuffles only the candidate set.

    Pass 1: each partition builds a bounded Misra-Gries summary
    (mapInPandas, Arrow-batched, memory ≤ capacity + one Arrow batch —
    never O(distinct keys)); summaries union into a candidate frame of at
    most capacity × partitions rows. Pass 2: a broadcast semi-join pins
    exact counts for candidates only, and the n/(m+1) threshold filter
    (kept in exact integer arithmetic: count·(m+1) > n) yields precisely
    the true heavy hitters — the MG superset guarantee means no true
    hitter can be missing, and the exact recount means no false positive
    survives. Python touches only the sketch pass, and only through
    vectorized value_counts; everything else is codegen'd.

    Note the threshold is FREQUENCY-relative (share > 1/(m+1) of the
    stream), as the sketch's guarantee requires: on a corpus whose user
    distribution stays uniform as n grows (this synthetic data at
    sf >= 0.1), no user crosses it and the empty result is the correct
    answer — "no heavy hitters exist at this capacity" is information,
    not a failure mode."""
    import pandas as pd

    ev = load_table(spark, sf_dir, "events").select("user_id")

    cap = MG_CAPACITY

    def mg_summaries(batches):
        counters: dict = {}
        for pdf in batches:
            counters = mg_merge(
                counters, pdf["user_id"].value_counts().to_dict(), cap
            )
        yield pd.DataFrame({"user_id": list(counters) or []}).astype("int64")

    candidates = ev.mapInPandas(mg_summaries, "user_id long").distinct()
    # reuse the ONE loaded frame: each load_table('events') call re-runs
    # the driver-side encoding probe (a batch read per call); multiple
    # plan references to one DataFrame are semantically identical
    totals = ev.agg(F.count("*").alias("n_total"))
    exact = (
        ev.select("user_id")
        # candidate frame is bounded by capacity × partitions (a config
        # constant, not fact-derived) — broadcast is safe by construction
        .join(F.broadcast(candidates), "user_id")
        .groupBy("user_id")
        .agg(F.count("*").alias("n_events"))
    )
    return (
        exact.crossJoin(F.broadcast(totals))
        .where(F.col("n_events") * (cap + 1) > F.col("n_total"))
        .select("user_id", "n_events")
    )


ORACLE_HEAVY_HITTERS = f"""
WITH tot AS (SELECT COUNT(*) AS n FROM events)
SELECT user_id, COUNT(*) AS n_events
FROM events GROUP BY user_id
HAVING COUNT(*) * {MG_CAPACITY + 1} > (SELECT n FROM tot)
"""


# SRE-workbook page threshold for the (5m, 1h) window pair: burning 2% of
# a 30-day budget within the hour ⇒ burn rate 14.4 (both windows must
# breach — the long window keeps a brief spike from paging, the short one
# ends the page quickly once the burn stops)
BURN_PAGE_THRESHOLD = 14.4
_BURN_BUCKET_US = 300 * 1_000_000  # 5-minute buckets
_BURN_LONG_BUCKETS = 11  # trailing 1 h = current + 11 preceding buckets


def log_burn_alerts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-window multi-burn-rate alerting (the SRE-workbook policy
    log_slo_burn's daily rollup feeds into): per 5-minute bucket, the
    short-window burn rate and the trailing-1-hour burn rate; a page
    fires only when BOTH breach the threshold — the long window
    suppresses one-bucket blips, the short window ends the page promptly
    after recovery.

    100 TB posture: the raw stream collapses to 5-minute buckets in one
    map-side-combined agg (the shuffle carries O(time-range/5min) rows —
    thousands, not billions); the trailing window then runs over the
    bucket table, an integer-keyed RANGE frame in one ordered pass. The
    unpartitioned window is fine BECAUSE it is bucket-level: its input
    is tiny by construction. Burn arithmetic is the exact
    integer-count / IEEE-division contract of log_slo_burn."""
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    per = (
        ev.select(
            F.expr(
                f"unix_micros(cast(ts as timestamp)) div {_BURN_BUCKET_US}"
            ).alias("bucket"),
            "event_type",
        )
        .groupBy("bucket")
        .agg(
            F.count("*").alias("n_total"),
            F.sum(
                F.when(F.col("event_type") == "error", 1).otherwise(0)
            ).alias("n_err"),
        )
    )
    w = Window.orderBy("bucket").rangeBetween(
        -_BURN_LONG_BUCKETS, Window.currentRow
    )
    short_burn = (
        F.col("n_err").cast("double") / F.col("n_total")
        * F.lit(_BURN_MULTIPLIER)
    )
    long_burn = (
        F.sum("n_err").over(w).cast("double") / F.sum("n_total").over(w)
        * F.lit(_BURN_MULTIPLIER)
    )
    return per.select(
        "bucket",
        "n_total",
        "n_err",
        short_burn.alias("short_burn"),
        long_burn.alias("long_burn"),
        (
            (short_burn > F.lit(BURN_PAGE_THRESHOLD))
            & (long_burn > F.lit(BURN_PAGE_THRESHOLD))
        ).alias("page_alert"),
    )


ORACLE_BURN_ALERTS = f"""
WITH per AS (
  SELECT epoch_us(ts) // {_BURN_BUCKET_US} AS bucket,
         COUNT(*) AS n_total,
         SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS n_err
  FROM events GROUP BY 1
)
SELECT bucket, CAST(n_total AS BIGINT) AS n_total,
       CAST(n_err AS BIGINT) AS n_err,
       CAST(n_err AS DOUBLE) / n_total * {_BURN_MULTIPLIER} AS short_burn,
       CAST(SUM(n_err) OVER w AS DOUBLE) / SUM(n_total) OVER w
         * {_BURN_MULTIPLIER} AS long_burn,
       (CAST(n_err AS DOUBLE) / n_total * {_BURN_MULTIPLIER}
          > {BURN_PAGE_THRESHOLD}
        AND CAST(SUM(n_err) OVER w AS DOUBLE) / SUM(n_total) OVER w
          * {_BURN_MULTIPLIER} > {BURN_PAGE_THRESHOLD}) AS page_alert
FROM per
WINDOW w AS (ORDER BY bucket
             RANGE BETWEEN {_BURN_LONG_BUCKETS} PRECEDING AND CURRENT ROW)
"""


def log_transition_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order user-journey transition matrix: for each ordered
    (prev_type → next_type) pair, the transition count and conditional
    probability — the Markov-chain view behind funnel analysis
    (log_funnel checks ONE path; this scores every edge, the input to
    journey mining and next-event prediction baselines).

    Determinism: the per-user sequence orders by (epoch-µs, event_id) on
    BOTH engines — explicit µs so the ns-vs-µs physical encodings cannot
    disagree inside a tie, event_id as the total-order tie-break. The
    probability is one exact IEEE division of two integers (count /
    per-prev-type total via a second window over the tiny pair table).

    100 TB posture: one shuffle on user_id for the lag; the pair rollup
    is map-side combined onto a types² key; the normalizing window runs
    over types² rows — nothing downstream of the first agg is
    corpus-scale."""
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events").select(
        "user_id",
        "event_id",
        "event_type",
        F.expr("unix_micros(cast(ts as timestamp))").alias("ts_us"),
    )
    w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    pairs = (
        ev.withColumn("prev_type", F.lag("event_type").over(w))
        .where(F.col("prev_type").isNotNull())
        .groupBy("prev_type", F.col("event_type").alias("next_type"))
        .agg(F.count("*").alias("n_transitions"))
    )
    w_prev = Window.partitionBy("prev_type")
    return pairs.select(
        "prev_type",
        "next_type",
        "n_transitions",
        (
            F.col("n_transitions").cast("double")
            / F.sum("n_transitions").over(w_prev)
        ).alias("p_transition"),
    )


ORACLE_TRANSITION_MATRIX = """
WITH seq AS (
  SELECT user_id, event_id, event_type,
         LAG(event_type) OVER (PARTITION BY user_id
                               ORDER BY epoch_us(ts), event_id) AS prev_type
  FROM events
), pairs AS (
  SELECT prev_type, event_type AS next_type, COUNT(*) AS n_transitions
  FROM seq WHERE prev_type IS NOT NULL
  GROUP BY 1, 2
)
SELECT prev_type, next_type, CAST(n_transitions AS BIGINT) AS n_transitions,
       CAST(n_transitions AS DOUBLE)
         / SUM(n_transitions) OVER (PARTITION BY prev_type) AS p_transition
FROM pairs
"""


def chi2_smoothed_term(p_count: str, p_total: str, q_count: str, q_total: str) -> str:
    """The Laplace-smoothed chi-square summand as a SQL string —
    ((q-p)^2 / p) with p = (p_count+1)/(p_total+HIST_BUCKETS) and q
    likewise — the ONE copy of the drift math shared by
    log_histogram_drift, histogram_divergence (and through it
    log_window_drift and the streaming drift monitor), and mirrored by
    their committed oracles: a smoothing change edits every consumer
    and its oracle expectation together or not at all."""
    pp = f"(cast({p_count} + 1 as double) / cast({p_total} + {HIST_BUCKETS} as double))"
    qq = f"(cast({q_count} + 1 as double) / cast({q_total} + {HIST_BUCKETS} as double))"
    return f"(({qq} - {pp}) * ({qq} - {pp}) / {pp})"


def value_hist_bucket() -> "F.Column":
    """The shared fixed-width value-bucket expression — ONE definition
    for the batch drift ops AND the streaming monitor (the twin
    relationship is only real while every consumer uses this grid)."""
    return F.least(
        F.greatest(F.floor(F.col("value") / HIST_WIDTH), F.lit(0)),
        F.lit(HIST_BUCKETS - 1),
    ).cast("bigint")


def histogram_divergence(hist: DataFrame, reference: DataFrame) -> DataFrame:
    """Chi-square-family divergence of each (window_start, event_type)
    histogram against a (event_type, bucket, c_ref) reference — the
    SINGLE implementation behind log_window_drift and the streaming
    drift_stream (streaming/pipeline.py imports this; editing the
    smoothing or grid here changes batch twin, stream, and oracle
    expectations together). Laplace smoothing and decimal-exact term
    summation follow log_histogram_drift, with the reference as p.
    Pure rollup-scale batch logic; the reference rides a broadcast."""
    wins = hist.select("window_start", "event_type").distinct()
    ref_exp = wins.join(F.broadcast(reference), "event_type").select(
        "window_start", "event_type", "bucket", "c_ref"
    )
    joined = (
        hist.join(
            ref_exp, ["window_start", "event_type", "bucket"], "full_outer"
        )
        .withColumn("c", F.coalesce("c", F.lit(0)))
        .withColumn("c_ref", F.coalesce("c_ref", F.lit(0)))
    )
    from pyspark.sql import Window

    per = Window.partitionBy("window_start", "event_type")
    term = chi2_smoothed_term("c_ref", "n_ref", "c", "n_win")
    return (
        joined.withColumn("n_win", F.sum("c").over(per))
        .withColumn("n_ref", F.sum("c_ref").over(per))
        .groupBy("window_start", "event_type")
        .agg(
            F.sum("c").alias("n_events"),
            F.count("*").alias("n_buckets"),
            F.sum(F.expr(f"cast({term} as decimal(38,20))"))
            .cast("double")
            .alias("chi2"),
        )
    )


def log_window_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-hour value-distribution drift against the full-corpus
    reference histogram — the BATCH TWIN of the streaming monitor
    (streaming/pipeline.py::drift_stream scores the same chi-square
    form per finalized window in foreachBatch); driver-checking this
    shape is what certifies the streaming op's math. Same smoothing,
    bucket grid, and decimal-sum conventions as log_histogram_drift,
    with the reference as p and each hour's histogram as q; buckets
    live in the union of window∪reference support (full outer per
    window, realized as reference-expansion + outer join).

    100 TB posture: two passes collapse the stream to bounded rollups
    (reference: types × buckets; windows: hours × types × buckets) with
    map-side partials; everything downstream — the expansion join, the
    window totals, the final agg — is rollup-scale."""
    ev = load_table(spark, sf_dir, "events")
    bucket = value_hist_bucket()
    ref = (
        ev.select("event_type", bucket.alias("bucket"))
        .groupBy("event_type", "bucket")
        .agg(F.count("*").alias("c_ref"))
    )
    hist = (
        ev.select(
            F.date_trunc("hour", "ts").alias("window_start"),
            "event_type",
            bucket.alias("bucket"),
        )
        .groupBy("window_start", "event_type", "bucket")
        .agg(F.count("*").alias("c"))
    )
    return histogram_divergence(hist, ref)


ORACLE_WINDOW_DRIFT = f"""
WITH ev AS (
  SELECT date_trunc('hour', CAST(ts AS TIMESTAMP)) AS window_start,
         event_type,
         CAST(least(greatest(floor(value / {HIST_WIDTH}), 0),
                    {HIST_BUCKETS - 1}) AS BIGINT) AS bucket
  FROM events
), ref AS (
  SELECT event_type, bucket, COUNT(*) AS c_ref FROM ev GROUP BY 1, 2
), hist AS (
  SELECT window_start, event_type, bucket, COUNT(*) AS c
  FROM ev GROUP BY 1, 2, 3
), wins AS (
  SELECT DISTINCT window_start, event_type FROM hist
), ref_exp AS (
  SELECT w.window_start, w.event_type, r.bucket, r.c_ref
  FROM wins w JOIN ref r USING (event_type)
), j AS (
  SELECT COALESCE(h.window_start, e.window_start) AS window_start,
         COALESCE(h.event_type, e.event_type) AS event_type,
         COALESCE(h.bucket, e.bucket) AS bucket,
         COALESCE(h.c, 0) AS c, COALESCE(e.c_ref, 0) AS c_ref
  FROM hist h FULL OUTER JOIN ref_exp e
    ON h.window_start = e.window_start AND h.event_type = e.event_type
   AND h.bucket = e.bucket
), t AS (
  SELECT window_start, event_type, c, c_ref,
         SUM(c) OVER (PARTITION BY window_start, event_type) AS n_win,
         SUM(c_ref) OVER (PARTITION BY window_start, event_type) AS n_ref
  FROM j
), terms AS (
  SELECT window_start, event_type, c,
         ((CAST(c + 1 AS DOUBLE) / CAST(n_win + {HIST_BUCKETS} AS DOUBLE))
          - (CAST(c_ref + 1 AS DOUBLE) / CAST(n_ref + {HIST_BUCKETS} AS DOUBLE)))
         * ((CAST(c + 1 AS DOUBLE) / CAST(n_win + {HIST_BUCKETS} AS DOUBLE))
          - (CAST(c_ref + 1 AS DOUBLE) / CAST(n_ref + {HIST_BUCKETS} AS DOUBLE)))
         / (CAST(c_ref + 1 AS DOUBLE) / CAST(n_ref + {HIST_BUCKETS} AS DOUBLE))
           AS term
  FROM t
)
SELECT window_start, event_type,
       CAST(SUM(c) AS BIGINT) AS n_events,
       COUNT(*) AS n_buckets,
       CAST(CAST(SUM(CAST(CAST(term AS VARCHAR) AS DECIMAL(38,20)))
                 AS VARCHAR) AS DOUBLE) AS chi2
FROM terms GROUP BY 1, 2
"""



QUERIES = {
    "log_full_scan": log_full_scan,
    "log_approx_users": log_approx_users,
    "log_top_user_per_type": log_top_user_per_type,
    "log_rate_per_minute": log_rate_per_minute,
    "log_rate_anomaly": log_rate_anomaly,
    "log_scrub_pii": log_scrub_pii,
    "log_events_by_nation": log_events_by_nation,
    "log_sessionize_batch": log_sessionize_batch,
    "log_median_value_pandas": log_median_value_pandas,
    "log_projection": log_projection,
    "log_label_eq": log_label_eq,
    "log_label_ne": log_label_ne,
    "log_line_like": log_line_like,
    "log_line_not_like": log_line_not_like,
    "log_line_regex": log_line_regex,
    "log_time_range": log_time_range,
    "log_limit": log_limit,
    "log_map_subscript": log_map_subscript,
    "log_map_subscript_filter": log_map_subscript_filter,
    "log_conjunctive": log_conjunctive,
    "log_agg_by_label": log_agg_by_label,
    "log_time_bucket": log_time_bucket,
    "log_json_unwrap": log_json_unwrap,
    "log_funnel": log_funnel,
    "log_rolling_range": log_rolling_range,
    "log_gap_fill": log_gap_fill,
    "log_asof_join": log_asof_join,
    "log_asof_join_chunked": log_asof_join_chunked,
    "log_interval_join_batch": log_interval_join_batch,
    "log_retention_cohorts": log_retention_cohorts,
    "log_value_histogram": log_value_histogram,
    "log_templates": log_templates,
    "log_heavy_hitters": log_heavy_hitters,
    "log_approx_quantile_audit": log_approx_quantile_audit,
    "log_session_window_batch": log_session_window_batch,
    "log_slo_burn": log_slo_burn,
    "log_active_users": log_active_users,
    "log_burn_alerts": log_burn_alerts,
    "log_transition_matrix": log_transition_matrix,
    "log_spike_attribution": log_spike_attribution,
    "log_histogram_drift": log_histogram_drift,
    "log_window_drift": log_window_drift,
}

ORACLES = {
    "log_histogram_drift": ORACLE_HISTOGRAM_DRIFT,
    "log_window_drift": ORACLE_WINDOW_DRIFT,
    "log_spike_attribution": ORACLE_SPIKE_ATTRIBUTION,
    "log_burn_alerts": ORACLE_BURN_ALERTS,
    "log_transition_matrix": ORACLE_TRANSITION_MATRIX,
    "log_approx_users": ORACLE_APPROX_USERS,
    "log_asof_join": ORACLE_ASOF,
    # the chunked variant must produce IDENTICAL results — shared oracle
    "log_asof_join_chunked": ORACLE_ASOF,
    "log_retention_cohorts": ORACLE_RETENTION,
    "log_interval_join_batch": ORACLE_INTERVAL_JOIN,
    "log_full_scan": "SELECT * FROM events",
    "log_sessionize_batch": ORACLE_SESSIONIZE,
    "log_median_value_pandas": ORACLE_MEDIAN,
    "log_events_by_nation": (
        "SELECT n_name, COUNT(*) AS n_events,"
        " COUNT(DISTINCT user_id) AS n_users,"
        " CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS sum_value"
        " FROM events JOIN customer ON user_id = c_custkey"
        " JOIN nation ON c_nationkey = n_nationkey GROUP BY n_name"
    ),
    "log_projection": "SELECT ts, props FROM events",
    "log_label_eq": "SELECT * FROM events WHERE event_type = 'error'",
    "log_label_ne": "SELECT * FROM events WHERE event_type <> 'click'",
    "log_line_like": "SELECT * FROM events WHERE props LIKE '%\"k\": 8%'",
    "log_line_not_like": "SELECT * FROM events WHERE props NOT LIKE '%1%'",
    "log_line_regex": r"SELECT * FROM events WHERE regexp_matches(props, '\"k\": 1[0-9]\}')",
    "log_time_range": (
        "SELECT * FROM events WHERE ts >= TIMESTAMP '2024-02-01 00:00:00'"
        " AND ts < TIMESTAMP '2024-04-01 00:00:00'"
    ),
    "log_limit": "SELECT * FROM events ORDER BY event_id LIMIT 10",
    "log_map_subscript": (
        "SELECT event_id, CAST(json_extract_string(props, '$.k') AS INT) AS k_val"
        " FROM events"
    ),
    "log_map_subscript_filter": (
        "SELECT event_id, ts, event_type, props FROM events"
        " WHERE CAST(json_extract_string(props, '$.k') AS INT) > 90"
    ),
    "log_conjunctive": (
        "SELECT * FROM events WHERE event_type = 'purchase'"
        " AND ts >= TIMESTAMP '2024-01-15 00:00:00' AND props LIKE '%9%'"
    ),
    "log_agg_by_label": (
        "SELECT event_type, COUNT(*) AS n_events,"
        " CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS sum_value,"
        " COUNT(DISTINCT user_id) AS n_users FROM events GROUP BY event_type"
    ),
    "log_time_bucket": (
        "SELECT CAST(ts AS DATE) AS day, event_type, COUNT(*) AS n,"
        " CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) / COUNT(value) AS avg_value"
        " FROM events GROUP BY 1, 2"
    ),
    "log_json_unwrap": ORACLE_JSON_UNWRAP,
    "log_funnel": ORACLE_FUNNEL,
    "log_rolling_range": ORACLE_ROLLING_RANGE,
    "log_gap_fill": ORACLE_GAP_FILL,
    "log_top_user_per_type": ORACLE_TOP_USER,
    "log_rate_per_minute": ORACLE_RATE,
    "log_rate_anomaly": ORACLE_RATE_ANOMALY,
    "log_scrub_pii": _oracle_scrub_pii(),
    "log_value_histogram": ORACLE_VALUE_HISTOGRAM,
    "log_templates": _oracle_templates(),
    "log_heavy_hitters": ORACLE_HEAVY_HITTERS,
    "log_approx_quantile_audit": ORACLE_APPROX_QUANTILE,
    "log_session_window_batch": ORACLE_SESSION_WINDOW,
    "log_slo_burn": ORACLE_SLO_BURN,
    "log_active_users": ORACLE_ACTIVE_USERS,
}
