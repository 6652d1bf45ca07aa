"""Relational query surface over the driver's TPC-H-ish tables.

The reference delegates ALL of this to host DataFusion (SURVEY.md §2.2) —
joins, aggregation, windows, sorts, subqueries, set ops are not implemented
by the crate. In the rebuild, Spark SQL/Catalyst supplies them; these
queries pin the semantics and give the driver's DuckDB oracle a surface to
verify, and bench.py uses the heavy ones as the throughput headline.

Determinism: every money aggregate uses exact DECIMAL internally and casts
the final value to DOUBLE (see functions/__init__.py) — double summation
order is nondeterministic across engines/runs, decimal is not.

Scale notes per query are inline. General posture:
- dimension tables (region/nation/supplier/part at TPC-H scale ratios) are
  broadcast — verified via explain() in tests/test_plans.py;
- fact-fact joins (orders⋈lineitem) shuffle on the join key, which AQE
  re-plans at runtime;
- every aggregate is partial-aggregated map-side by Spark automatically;
- ORDER BY + LIMIT compiles to TakeOrderedAndProject (no global sort).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from datafusion_loki_spark.catalog import load_table
from datafusion_loki_spark.functions import RATE, davg, dec, dsum, one_minus, one_plus

# SQL fragments mirroring the helpers, for the DuckDB oracles.
_D = "DECIMAL(12,2)"
_R = "DECIMAL(4,2)"
_REVENUE = (
    f"CAST(SUM(CAST(l_extendedprice AS {_D}) *"
    f" (CAST(1 AS {_R}) - CAST(l_discount AS {_R}))) AS DOUBLE)"
)


def _t(spark, sf_dir, name):
    return load_table(spark, sf_dir, name)


def _ts(day: str) -> F.Column:
    """Midnight-of-day TIMESTAMP_NTZ literal — the one date-predicate
    builder (22 hand-built copies of the lit+cast pair once existed; a
    single wrong cast target in one copy would be invisible until a
    parity run)."""
    return F.lit(day + " 00:00:00").cast("timestamp_ntz")


def _revenue() -> F.Column:
    return F.sum(dec("l_extendedprice") * one_minus("l_discount")).cast("double")


def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape: scan-heavy groupBy aggregation on lineitem.

    100 TB posture: single shuffle on a 6-value grouping key after map-side
    partial aggregation — the reduce side moves only (6 groups × partials).
    """
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.where(F.col("l_shipdate") <= _ts("1998-09-02"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum("l_quantity").alias("sum_qty"),
            dsum("l_extendedprice").alias("sum_base_price"),
            _revenue().alias("sum_disc_price"),
            F.sum(dec("l_extendedprice") * one_minus("l_discount") * one_plus("l_tax"))
            .cast("double")
            .alias("sum_charge"),
            davg("l_quantity").alias("avg_qty"),
            davg("l_extendedprice").alias("avg_price"),
            davg("l_discount", RATE).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
    )


ORACLE_Q1 = f"""
SELECT l_returnflag, l_linestatus,
       CAST(SUM(CAST(l_quantity AS {_D})) AS DOUBLE) AS sum_qty,
       CAST(SUM(CAST(l_extendedprice AS {_D})) AS DOUBLE) AS sum_base_price,
       {_REVENUE} AS sum_disc_price,
       CAST(SUM(CAST(l_extendedprice AS {_D})
                * (CAST(1 AS {_R}) - CAST(l_discount AS {_R}))
                * (CAST(1 AS {_R}) + CAST(l_tax AS {_R}))) AS DOUBLE) AS sum_charge,
       CAST(SUM(CAST(l_quantity AS {_D})) AS DOUBLE) / COUNT(l_quantity) AS avg_qty,
       CAST(SUM(CAST(l_extendedprice AS {_D})) AS DOUBLE) / COUNT(l_extendedprice)
         AS avg_price,
       CAST(SUM(CAST(l_discount AS {_R})) AS DOUBLE) / COUNT(l_discount) AS avg_disc,
       COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
"""


def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: customer ⋈ orders ⋈ lineitem, revenue top-10.

    100 TB posture: customer filter applied before the join (Catalyst pushes
    it to the scan); customer side broadcasts at these scale ratios; the
    orders⋈lineitem join shuffles on o_orderkey — the natural key both sides
    can be bucketed on in a persisted layout. Top-10 via TakeOrdered.
    """
    cu = _t(spark, sf_dir, "customer").where(F.col("c_mktsegment") == "BUILDING")
    od = _t(spark, sf_dir, "orders").where(
        F.col("o_orderdate") < _ts("1998-03-15")
    )
    li = _t(spark, sf_dir, "lineitem").where(
        F.col("l_shipdate") > _ts("1998-03-15")
    )
    return (
        li.join(od, li.l_orderkey == od.o_orderkey)
        .join(F.broadcast(cu), od.o_custkey == cu.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(_revenue().alias("revenue"))
        .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .limit(10)
    )


ORACLE_Q3 = f"""
SELECT l_orderkey, o_orderdate, o_orderpriority, {_REVENUE} AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
  AND l_shipdate > TIMESTAMP '1998-03-15 00:00:00'
GROUP BY l_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, l_orderkey ASC
LIMIT 10
"""


def q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: 6-way join through region→nation→(customer, supplier).

    100 TB posture: region/nation/supplier broadcast (tiny at any SF);
    the only shuffles are orders⋈lineitem and the final 1-row-per-nation agg.
    """
    re = _t(spark, sf_dir, "region").where(F.col("r_name") == "ASIA")
    na = _t(spark, sf_dir, "nation")
    cu = _t(spark, sf_dir, "customer")
    od = _t(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= _ts("1996-01-01"))
        & (F.col("o_orderdate") < _ts("1998-01-01"))
    )
    li = _t(spark, sf_dir, "lineitem")
    su = _t(spark, sf_dir, "supplier")
    return (
        li.join(od, li.l_orderkey == od.o_orderkey)
        .join(F.broadcast(su), li.l_suppkey == su.s_suppkey)
        .join(cu, (od.o_custkey == cu.c_custkey) & (cu.c_nationkey == su.s_nationkey))
        .join(F.broadcast(na), cu.c_nationkey == na.n_nationkey)
        .join(F.broadcast(re), na.n_regionkey == re.r_regionkey)
        .groupBy("n_name")
        .agg(_revenue().alias("revenue"))
    )


ORACLE_Q5 = f"""
SELECT n_name, {_REVENUE} AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN customer ON o_custkey = c_custkey AND c_nationkey = s_nationkey
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
GROUP BY n_name
"""


def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape: revenue lost to returns, per customer, top 20."""
    cu = _t(spark, sf_dir, "customer")
    od = _t(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= _ts("1996-10-01"))
        & (F.col("o_orderdate") < _ts("1997-01-01"))
    )
    li = _t(spark, sf_dir, "lineitem").where(F.col("l_returnflag") == "R")
    na = _t(spark, sf_dir, "nation")
    return (
        li.join(od, li.l_orderkey == od.o_orderkey)
        .join(cu, od.o_custkey == cu.c_custkey)
        .join(F.broadcast(na), cu.c_nationkey == na.n_nationkey)
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(_revenue().alias("revenue"))
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(20)
    )


ORACLE_Q10 = f"""
SELECT c_custkey, c_name, c_acctbal, n_name, {_REVENUE} AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
WHERE l_returnflag = 'R'
  AND o_orderdate >= TIMESTAMP '1996-10-01 00:00:00'
  AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
GROUP BY c_custkey, c_name, c_acctbal, n_name
ORDER BY revenue DESC, c_custkey ASC
LIMIT 20
"""


def q_window_top_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Window function surface: rank each customer's orders by totalprice,
    keep top 3. row_number with a unique tiebreak → deterministic.

    100 TB posture: one shuffle on o_custkey; the window is computed
    per-partition after the hash exchange, no global sort.
    """
    od = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey")
    )
    return (
        od.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= 3)
        .select("o_custkey", "o_orderkey", "o_totalprice", "rn")
    )


ORACLE_WINDOW_TOP = """
SELECT o_custkey, o_orderkey, o_totalprice, rn FROM (
  SELECT o_custkey, o_orderkey, o_totalprice,
         ROW_NUMBER() OVER (PARTITION BY o_custkey
                            ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn
  FROM orders
) WHERE rn <= 3
"""


def q_window_running_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running-total window (unbounded preceding frame) per customer."""
    od = _t(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy(F.asc("o_orderdate"), F.asc("o_orderkey"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return od.select(
        "o_custkey",
        "o_orderkey",
        F.sum(dec("o_totalprice")).over(w).cast("double").alias("running_total"),
    )


ORACLE_WINDOW_RUNNING = f"""
SELECT o_custkey, o_orderkey,
       CAST(SUM(CAST(o_totalprice AS {_D})) OVER (
         PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
         AS running_total
FROM orders
"""


def q_subquery_above_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar-subquery surface: parts priced above their type's average.

    Expressed as an aggregate+broadcast-join (what decorrelation produces).
    The avg comparison is done as price*cnt > sum in exact decimal so the
    boundary can't flip between engines.
    """
    pa = _t(spark, sf_dir, "part")
    grp = pa.groupBy("p_type").agg(
        F.sum(dec("p_retailprice")).alias("sum_price"),
        F.count("p_retailprice").alias("cnt"),
    )
    return (
        pa.join(F.broadcast(grp), "p_type")
        .where(dec("p_retailprice") * F.col("cnt").cast("decimal(10,0)") > F.col("sum_price"))
        .select("p_partkey", "p_name", "p_type", "p_retailprice")
    )


ORACLE_SUBQUERY = f"""
WITH g AS (
  SELECT p_type, SUM(CAST(p_retailprice AS {_D})) AS sum_price,
         COUNT(p_retailprice) AS cnt
  FROM part GROUP BY p_type
)
SELECT p_partkey, p_name, p.p_type, p_retailprice
FROM part p JOIN g ON p.p_type = g.p_type
WHERE CAST(p_retailprice AS {_D}) * CAST(cnt AS DECIMAL(10,0)) > sum_price
"""


def q_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set-operation surface: nations having customers but no suppliers
    (EXCEPT), unioned with nations having both (INTERSECT)."""
    cu = _t(spark, sf_dir, "customer").select(
        F.col("c_nationkey").cast("int").alias("nationkey")
    )
    su = _t(spark, sf_dir, "supplier").select(
        F.col("s_nationkey").cast("int").alias("nationkey")
    )
    only_cust = cu.subtract(su)  # subtract == SQL EXCEPT (set semantics)
    both = cu.intersect(su)
    return (
        only_cust.withColumn("kind", F.lit("customer_only"))
        .unionByName(both.withColumn("kind", F.lit("both")))
    )


ORACLE_SET_OPS = """
SELECT nationkey, 'customer_only' AS kind FROM
  (SELECT c_nationkey AS nationkey FROM customer
   EXCEPT SELECT s_nationkey FROM supplier)
UNION ALL
SELECT nationkey, 'both' AS kind FROM
  (SELECT c_nationkey AS nationkey FROM customer
   INTERSECT SELECT s_nationkey FROM supplier)
"""


def q_set_ops_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multiset set-operation surface (EXCEPT ALL / INTERSECT ALL —
    bag semantics, Spark exceptAll/intersectAll): nation-key occurrence
    counts surviving customer-minus-supplier and customer∩supplier.
    Aggregated to per-key counts so the result is deterministic."""
    cu = _t(spark, sf_dir, "customer").select(
        F.col("c_nationkey").cast("int").alias("nationkey")
    )
    su = _t(spark, sf_dir, "supplier").select(
        F.col("s_nationkey").cast("int").alias("nationkey")
    )
    minus = (
        cu.exceptAll(su)
        .groupBy("nationkey")
        .agg(F.count("*").alias("n"))
        .withColumn("kind", F.lit("except_all"))
    )
    inter = (
        cu.intersectAll(su)
        .groupBy("nationkey")
        .agg(F.count("*").alias("n"))
        .withColumn("kind", F.lit("intersect_all"))
    )
    return minus.unionByName(inter)


ORACLE_SET_OPS_ALL = """
SELECT nationkey, COUNT(*) AS n, 'except_all' AS kind FROM
  (SELECT c_nationkey AS nationkey FROM customer
   EXCEPT ALL SELECT s_nationkey FROM supplier)
GROUP BY nationkey
UNION ALL
SELECT nationkey, COUNT(*) AS n, 'intersect_all' AS kind FROM
  (SELECT c_nationkey AS nationkey FROM customer
   INTERSECT ALL SELECT s_nationkey FROM supplier)
GROUP BY nationkey
"""


def q_conditional_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CASE-WHEN pivot-style aggregation: order counts/value by status."""
    od = _t(spark, sf_dir, "orders")
    return od.groupBy("o_orderpriority").agg(
        F.count("*").alias("n_orders"),
        F.sum(F.when(F.col("o_orderstatus") == "F", 1).otherwise(0)).alias("n_finished"),
        F.sum(F.when(F.col("o_orderstatus") == "O", 1).otherwise(0)).alias("n_open"),
        F.sum(
            F.when(F.col("o_orderstatus") == "F", dec("o_totalprice")).otherwise(
                F.lit(0).cast("decimal(12,2)")
            )
        )
        .cast("double")
        .alias("finished_value"),
    )


ORACLE_CONDITIONAL = f"""
SELECT o_orderpriority,
       COUNT(*) AS n_orders,
       CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT)
         AS n_finished,
       CAST(SUM(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) AS BIGINT)
         AS n_open,
       CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN CAST(o_totalprice AS {_D})
                     ELSE CAST(0 AS {_D}) END) AS DOUBLE) AS finished_value
FROM orders
GROUP BY o_orderpriority
"""


def q_having(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUP BY + HAVING surface: customers with ≥ 15 orders."""
    od = _t(spark, sf_dir, "orders")
    return (
        od.groupBy("o_custkey")
        .agg(
            F.count("*").alias("n_orders"),
            dsum("o_totalprice").alias("total_value"),
        )
        .where(F.col("n_orders") >= 15)
    )


ORACLE_HAVING = f"""
SELECT o_custkey, COUNT(*) AS n_orders,
       CAST(SUM(CAST(o_totalprice AS {_D})) AS DOUBLE) AS total_value
FROM orders
GROUP BY o_custkey
HAVING COUNT(*) >= 15
"""


def q_anti_semi_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi/anti-join surface: customers with no orders (anti) counted
    per nation alongside customers with orders (semi)."""
    cu = _t(spark, sf_dir, "customer")
    od = _t(spark, sf_dir, "orders")
    with_orders = cu.join(od, cu.c_custkey == od.o_custkey, "left_semi")
    without = cu.join(od, cu.c_custkey == od.o_custkey, "left_anti")
    return (
        with_orders.groupBy("c_nationkey")
        .agg(F.count("*").alias("n_active"))
        .join(
            without.groupBy("c_nationkey").agg(F.count("*").alias("n_inactive")),
            "c_nationkey",
            "full_outer",
        )
        .select(
            "c_nationkey",
            F.coalesce("n_active", F.lit(0)).alias("n_active"),
            F.coalesce("n_inactive", F.lit(0)).alias("n_inactive"),
        )
    )


ORACLE_ANTI_SEMI = """
WITH active AS (
  SELECT c_nationkey, COUNT(*) AS n_active FROM customer
  WHERE c_custkey IN (SELECT o_custkey FROM orders) GROUP BY c_nationkey
), inactive AS (
  -- NOT EXISTS, not NOT IN: Spark's left_anti has NOT EXISTS
  -- semantics, while a single NULL o_custkey makes three-valued
  -- NOT IN collapse the whole inactive set to empty (round-7 review;
  -- ORACLE_Q22 already used the correct form)
  SELECT c_nationkey, COUNT(*) AS n_inactive FROM customer c
  WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
  GROUP BY c_nationkey
)
SELECT COALESCE(a.c_nationkey, i.c_nationkey) AS c_nationkey,
       COALESCE(n_active, 0) AS n_active,
       COALESCE(n_inactive, 0) AS n_inactive
FROM active a FULL OUTER JOIN inactive i ON a.c_nationkey = i.c_nationkey
"""


def q_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouping-sets surface: ROLLUP over (returnflag, linestatus)."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.rollup("l_returnflag", "l_linestatus")
        .agg(F.count("*").alias("n"), dsum("l_quantity").alias("qty"))
    )


ORACLE_ROLLUP = f"""
SELECT l_returnflag, l_linestatus, COUNT(*) AS n,
       CAST(SUM(CAST(l_quantity AS {_D})) AS DOUBLE) AS qty
FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
"""


def q7_nation_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape: shipping volume between supplier and customer
    nations by year (kept unfiltered on the nation pair — the driver's
    synthetic nation list differs from TPC-H's, and the full pair×year
    grid is still only ~hundreds of groups).

    100 TB posture: two broadcast dims (nation twice), one fact-fact
    shuffle (lineitem⋈orders); supplier broadcasts at TPC-H ratios."""
    li = _t(spark, sf_dir, "lineitem")
    od = _t(spark, sf_dir, "orders")
    su = _t(spark, sf_dir, "supplier")
    cu = _t(spark, sf_dir, "customer")
    n1 = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    )
    return (
        li.join(od, li.l_orderkey == od.o_orderkey)
        .join(F.broadcast(su), li.l_suppkey == su.s_suppkey)
        .join(cu, od.o_custkey == cu.c_custkey)
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("n2_key"))
        .groupBy(
            "supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year")
        )
        .agg(_revenue().alias("revenue"))
    )


ORACLE_Q7 = f"""
SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
       CAST(year(l_shipdate) AS BIGINT) AS l_year, {_REVENUE} AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN customer ON o_custkey = c_custkey
JOIN nation n1 ON s_nationkey = n1.n_nationkey
JOIN nation n2 ON c_nationkey = n2.n_nationkey
GROUP BY 1, 2, 3
"""


def q12_priority_class(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape (adapted: the synthetic schema has no l_shipmode, so
    l_linestatus plays the grouping role): per line status, how many
    high- vs low-priority orders shipped in 1997."""
    li = _t(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= _ts("1997-01-01"))
        & (F.col("l_shipdate") < _ts("1998-01-01"))
    )
    od = _t(spark, sf_dir, "orders")
    hi = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(od, li.l_orderkey == od.o_orderkey)
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(hi, 1).otherwise(0)).alias("high_line_count"),
            # when(hi, 0).otherwise(1), NOT when(~hi, 1): on a NULL
            # priority ~hi is NULL and the row would land in NEITHER
            # bucket while the oracle's ELSE 1 counts it low — mirror
            # the oracle's branch shape exactly (round-7 review)
            F.sum(F.when(hi, 0).otherwise(1)).alias("low_line_count"),
        )
    )


ORACLE_Q12 = """
SELECT l_linestatus,
       CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT)
         AS high_line_count,
       CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                     THEN 0 ELSE 1 END) AS BIGINT)
         AS low_line_count
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
  AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
GROUP BY l_linestatus
"""


def q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape: % of revenue from PROMO parts in one month. Both
    sums aggregate in exact decimal; only the final ratio divides in
    double — deterministic across engines."""
    li = _t(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= _ts("1997-06-01"))
        & (F.col("l_shipdate") < _ts("1997-07-01"))
    )
    pa = _t(spark, sf_dir, "part")
    rev = dec("l_extendedprice") * one_minus("l_discount")
    zero = F.lit(0).cast("decimal(16,4)")
    return (
        li.join(F.broadcast(pa), li.l_partkey == pa.p_partkey)
        .agg(
            (
                F.lit(100.0)
                * F.sum(F.when(F.col("p_type") == "PROMO", rev).otherwise(zero))
                .cast("double")
                / F.sum(rev).cast("double")
            ).alias("promo_revenue_pct")
        )
    )


ORACLE_Q14 = f"""
SELECT 100.0 * CAST(SUM(CASE WHEN p_type = 'PROMO'
                     THEN CAST(l_extendedprice AS {_D})
                          * (CAST(1 AS {_R}) - CAST(l_discount AS {_R}))
                     ELSE CAST(0 AS DECIMAL(16,4)) END) AS DOUBLE)
       / CAST(SUM(CAST(l_extendedprice AS {_D})
                  * (CAST(1 AS {_R}) - CAST(l_discount AS {_R}))) AS DOUBLE)
         AS promo_revenue_pct
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= TIMESTAMP '1997-06-01 00:00:00'
  AND l_shipdate < TIMESTAMP '1997-07-01 00:00:00'
"""


def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape: revenue from lineitems whose quantity is below 20%
    of their part's average — the correlated scalar-subquery pattern,
    decorrelated into an aggregate + join. The threshold comparison runs
    as quantity * cnt * 5 < sum_qty in exact decimal, so the boundary
    cannot flip between engines (0.2 * avg in double could).

    100 TB posture: the per-part average is one groupBy on l_partkey
    (map-side partial), broadcast back against the same fact."""
    li = _t(spark, sf_dir, "lineitem")
    avg_q = li.groupBy(F.col("l_partkey").alias("p_key")).agg(
        F.sum(dec("l_quantity")).alias("sum_qty"),
        F.count("l_quantity").alias("cnt"),
    )
    return (
        li.join(F.broadcast(avg_q), li.l_partkey == F.col("p_key"))
        .where(
            dec("l_quantity") * F.col("cnt").cast("decimal(10,0)") * F.lit(5).cast("decimal(2,0)")
            < F.col("sum_qty")
        )
        .agg(
            dsum("l_extendedprice").alias("total_price"),
            F.count("*").alias("n_lines"),
        )
    )


ORACLE_Q17 = f"""
WITH g AS (
  SELECT l_partkey AS p_key, SUM(CAST(l_quantity AS {_D})) AS sum_qty,
         COUNT(l_quantity) AS cnt
  FROM lineitem GROUP BY l_partkey
)
SELECT CAST(SUM(CAST(l_extendedprice AS {_D})) AS DOUBLE) AS total_price,
       COUNT(*) AS n_lines
FROM lineitem JOIN g ON l_partkey = p_key
WHERE CAST(l_quantity AS {_D}) * CAST(cnt AS DECIMAL(10,0))
        * CAST(5 AS DECIMAL(2,0)) < sum_qty
"""


def q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape: orders whose total quantity exceeds a threshold,
    with customer attribution — the HAVING-subquery + join-back pattern.

    100 TB posture: the qualifying-order set is produced by one groupBy on
    l_orderkey; the qualifying set is NOT tiny at this threshold
    (~45% of orders) so no broadcast is forced — AQE decides."""
    li = _t(spark, sf_dir, "lineitem")
    od = _t(spark, sf_dir, "orders")
    cu = _t(spark, sf_dir, "customer")
    big = (
        li.groupBy("l_orderkey")
        .agg(dsum("l_quantity").alias("total_qty"))
        .where(F.col("total_qty") > 100.0)
    )
    # NO broadcast hint on `big` (round-7 review): the >100-qty set is
    # ~45% of all orders (674/1500 at sf0.001 — the docstring once
    # called it 'tiny'), i.e. it scales LINEARLY with the fact table;
    # a forced broadcast would ship half the orders table to every
    # executor at scale. AQE picks the strategy from real sizes.
    return (
        od.join(big, od.o_orderkey == F.col("l_orderkey"))
        .join(cu, od.o_custkey == cu.c_custkey)
        .select("c_name", "c_custkey", "o_orderkey", "o_orderdate", "total_qty")
    )


ORACLE_Q18 = f"""
WITH big AS (
  SELECT l_orderkey, CAST(SUM(CAST(l_quantity AS {_D})) AS DOUBLE) AS total_qty
  FROM lineitem GROUP BY l_orderkey
  HAVING CAST(SUM(CAST(l_quantity AS {_D})) AS DOUBLE) > 100.0
)
SELECT c_name, c_custkey, o_orderkey, o_orderdate, total_qty
FROM orders JOIN big ON o_orderkey = l_orderkey
JOIN customer ON o_custkey = c_custkey
"""


def q19_bracket_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape: revenue under an OR-of-ANDs bracket predicate
    (brand × size band × quantity band) — the disjunctive-pushdown
    stress case. Catalyst splits the OR across the join where possible;
    the part side broadcasts."""
    li = _t(spark, sf_dir, "lineitem")
    pa = _t(spark, sf_dir, "part")
    cond = (
        (
            (F.col("p_brand") == "Brand#1")
            & (F.col("p_size").between(1, 10))
            & (F.col("l_quantity").between(1, 20))
        )
        | (
            (F.col("p_brand") == "Brand#2")
            & (F.col("p_size").between(5, 20))
            & (F.col("l_quantity").between(10, 40))
        )
        | (
            (F.col("p_brand") == "Brand#3")
            & (F.col("p_size").between(10, 40))
            & (F.col("l_quantity").between(20, 50))
        )
    )
    return (
        li.join(F.broadcast(pa), li.l_partkey == pa.p_partkey)
        .where(cond)
        .agg(_revenue().alias("revenue"), F.count("*").alias("n_lines"))
    )


ORACLE_Q19 = f"""
SELECT {_REVENUE} AS revenue, COUNT(*) AS n_lines
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 10
       AND l_quantity BETWEEN 1 AND 20)
   OR (p_brand = 'Brand#2' AND p_size BETWEEN 5 AND 20
       AND l_quantity BETWEEN 10 AND 40)
   OR (p_brand = 'Brand#3' AND p_size BETWEEN 10 AND 40
       AND l_quantity BETWEEN 20 AND 50)
"""


def q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: order counts by priority for orders having at least
    one slow lineitem — the correlated-EXISTS pattern, executed as a
    left-semi join (what decorrelation produces). Adapted: the synthetic
    schema lacks commit/receipt dates, so "slow" = shipped more than 60
    days after the order date."""
    od = _t(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= _ts("1997-01-01"))
        & (F.col("o_orderdate") < _ts("1997-07-01"))
    )
    li = _t(spark, sf_dir, "lineitem")
    slow = od.join(
        li,
        (od.o_orderkey == li.l_orderkey)
        & (li.l_shipdate > F.col("o_orderdate") + F.expr("interval 60 days")),
        "left_semi",
    )
    return slow.groupBy("o_orderpriority").agg(F.count("*").alias("order_count"))


ORACLE_Q4 = """
SELECT o_orderpriority, COUNT(*) AS order_count
FROM orders
WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
  AND o_orderdate < TIMESTAMP '1997-07-01 00:00:00'
  AND EXISTS (
    SELECT 1 FROM lineitem
    WHERE l_orderkey = o_orderkey
      AND l_shipdate > o_orderdate + INTERVAL 60 DAY
  )
GROUP BY o_orderpriority
"""


def q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape: profit by supplier nation and year for parts whose
    name matches a pattern (adapted: the synthetic schema has no partsupp,
    so p_retailprice*quantity stands in for supplycost*quantity).

    100 TB posture: part filter pushes to the scan and shrinks the
    broadcast side before the fact join; one lineitem⋈orders shuffle."""
    li = _t(spark, sf_dir, "lineitem")
    od = _t(spark, sf_dir, "orders")
    su = _t(spark, sf_dir, "supplier")
    na = _t(spark, sf_dir, "nation")
    pa = _t(spark, sf_dir, "part").where(F.col("p_name").like("%a%"))
    profit = (
        dec("l_extendedprice") * one_minus("l_discount")
        - dec("p_retailprice") * dec("l_quantity")
    )
    return (
        li.join(F.broadcast(pa), li.l_partkey == pa.p_partkey)
        .join(od, li.l_orderkey == od.o_orderkey)
        .join(F.broadcast(su), li.l_suppkey == su.s_suppkey)
        .join(F.broadcast(na), F.col("s_nationkey") == na.n_nationkey)
        .groupBy(F.col("n_name").alias("nation"), F.year("o_orderdate").alias("o_year"))
        .agg(F.sum(profit).cast("double").alias("sum_profit"))
    )


ORACLE_Q9 = f"""
SELECT n_name AS nation, CAST(year(o_orderdate) AS BIGINT) AS o_year,
       CAST(SUM(CAST(l_extendedprice AS {_D})
                  * (CAST(1 AS {_R}) - CAST(l_discount AS {_R}))
                - CAST(p_retailprice AS {_D}) * CAST(l_quantity AS {_D}))
            AS DOUBLE) AS sum_profit
FROM lineitem
JOIN part ON l_partkey = p_partkey
JOIN orders ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
WHERE p_name LIKE '%a%'
GROUP BY 1, 2
"""


def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape: the supplier(s) with maximum quarterly revenue —
    aggregate → global max → join back (the view + scalar-subquery
    pattern, decorrelated).

    100 TB posture: revenue agg shuffles once on l_suppkey; the global max
    is one row broadcast back over the tiny aggregate."""
    li = _t(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= _ts("1997-01-01"))
        & (F.col("l_shipdate") < _ts("1997-04-01"))
    )
    su = _t(spark, sf_dir, "supplier")
    rev = li.groupBy("l_suppkey").agg(_revenue().alias("total_revenue"))
    max_rev = rev.agg(F.max("total_revenue").alias("m"))
    return (
        rev.join(F.broadcast(max_rev), rev.total_revenue == F.col("m"))
        .join(F.broadcast(su), rev.l_suppkey == su.s_suppkey)
        .select("s_suppkey", "s_name", "total_revenue")
    )


ORACLE_Q15 = f"""
WITH rev AS (
  SELECT l_suppkey, {_REVENUE} AS total_revenue
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
    AND l_shipdate < TIMESTAMP '1997-04-01 00:00:00'
  GROUP BY l_suppkey
)
SELECT s_suppkey, s_name, total_revenue
FROM rev JOIN supplier ON l_suppkey = s_suppkey
WHERE total_revenue = (SELECT MAX(total_revenue) FROM rev)
"""


def q22_global_sales_opportunity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape: customers with above-average positive balance and
    no RECENT orders (none since 2000 — every synthetic customer has some
    order, so plain NOT EXISTS would be vacuous), counted per nation — a
    global scalar subquery (the average) combined with an anti join (the
    NOT EXISTS). The threshold comparison multiplies through in exact
    decimal so the boundary cannot flip.

    100 TB posture: the global average is a 1-row broadcast; the anti join
    shuffles on the customer key; the final agg is per-nation tiny."""
    cu = _t(spark, sf_dir, "customer")
    od = _t(spark, sf_dir, "orders").where(
        F.col("o_orderdate") >= _ts("2000-01-01")
    )
    pos = cu.where(F.col("c_acctbal") > 0.0)
    avg_bal = pos.agg(
        F.sum(dec("c_acctbal")).alias("sum_bal"),
        F.count("c_acctbal").alias("cnt"),
    )
    return (
        cu.join(F.broadcast(avg_bal))
        .where(dec("c_acctbal") * F.col("cnt").cast("decimal(10,0)") > F.col("sum_bal"))
        .join(od, cu.c_custkey == od.o_custkey, "left_anti")
        .groupBy("c_nationkey")
        .agg(
            F.count("*").alias("numcust"),
            dsum("c_acctbal").alias("totacctbal"),
        )
    )


ORACLE_Q22 = f"""
WITH g AS (
  SELECT SUM(CAST(c_acctbal AS {_D})) AS sum_bal, COUNT(c_acctbal) AS cnt
  FROM customer WHERE c_acctbal > 0.0
)
SELECT c_nationkey, COUNT(*) AS numcust,
       CAST(SUM(CAST(c_acctbal AS {_D})) AS DOUBLE) AS totacctbal
FROM customer, g
WHERE CAST(c_acctbal AS {_D}) * CAST(cnt AS DECIMAL(10,0)) > sum_bal
  AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
                  AND o_orderdate >= TIMESTAMP '2000-01-01 00:00:00')
GROUP BY c_nationkey
"""


def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6: single-table filter + global aggregate.

    100 TB posture: the whole query is one scan — all three predicates push
    to parquet (min/max row-group pruning on l_shipdate), and the global sum
    is map-side partial + a 1-row reduce. The discount comparison happens in
    exact decimal so a stored 0.05000000000000000278 double still lands
    inside the [0.03, 0.07] bracket identically in both engines."""
    li = _t(spark, sf_dir, "lineitem")
    d = dec("l_discount", RATE)
    return (
        li.where(
            (F.col("l_shipdate") >= _ts("1997-01-01"))
            & (F.col("l_shipdate") < _ts("1998-01-01"))
            & (d >= F.lit("0.03").cast(RATE))
            & (d <= F.lit("0.07").cast(RATE))
            & (F.col("l_quantity") < 24.0)
        )
        .agg(F.sum(dec("l_extendedprice") * d).cast("double").alias("revenue"))
    )


ORACLE_Q6 = f"""
SELECT CAST(SUM(CAST(l_extendedprice AS {_D}) * CAST(l_discount AS {_R}))
            AS DOUBLE) AS revenue
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
  AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
  AND CAST(l_discount AS {_R}) BETWEEN CAST('0.03' AS {_R}) AND CAST('0.07' AS {_R})
  AND l_quantity < 24.0
"""


def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape: NATION_7's share of ECONOMY-part revenue sold to ASIA
    customers, per order year — a 7-table join with two roles for nation
    (customer's nation restricts the region; supplier's nation feeds the
    conditional numerator).

    100 TB posture: part/supplier/nation/region broadcast; customer⋈orders
    and orders⋈lineitem shuffle on their keys; both share sums aggregate in
    exact decimal and the single final division is the only double op."""
    li = _t(spark, sf_dir, "lineitem")
    pa = _t(spark, sf_dir, "part").where(F.col("p_type") == "ECONOMY")
    od = _t(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= _ts("1996-01-01"))
        & (F.col("o_orderdate") < _ts("1998-01-01"))
    )
    cu = _t(spark, sf_dir, "customer")
    su = _t(spark, sf_dir, "supplier")
    n1 = _t(spark, sf_dir, "nation").alias("n1")
    n2 = _t(spark, sf_dir, "nation").alias("n2")
    re = _t(spark, sf_dir, "region").where(F.col("r_name") == "ASIA")
    vol = dec("l_extendedprice") * one_minus("l_discount")
    return (
        li.join(F.broadcast(pa), li.l_partkey == pa.p_partkey)
        .join(od, li.l_orderkey == od.o_orderkey)
        .join(cu, od.o_custkey == cu.c_custkey)
        .join(F.broadcast(n1), cu.c_nationkey == F.col("n1.n_nationkey"))
        .join(F.broadcast(re), F.col("n1.n_regionkey") == re.r_regionkey)
        .join(F.broadcast(su), li.l_suppkey == su.s_suppkey)
        .join(F.broadcast(n2), su.s_nationkey == F.col("n2.n_nationkey"))
        .groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(
            (
                F.sum(F.when(F.col("n2.n_name") == "NATION_7", vol).otherwise(F.lit("0").cast(_D))).cast("double")
                / F.sum(vol).cast("double")
            ).alias("mkt_share")
        )
    )


ORACLE_Q8 = f"""
SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
       CAST(SUM(CASE WHEN n2.n_name = 'NATION_7'
                     THEN CAST(l_extendedprice AS {_D})
                          * (CAST(1 AS {_R}) - CAST(l_discount AS {_R}))
                     ELSE CAST('0' AS {_D}) END) AS DOUBLE)
       / CAST(SUM(CAST(l_extendedprice AS {_D})
                  * (CAST(1 AS {_R}) - CAST(l_discount AS {_R}))) AS DOUBLE)
         AS mkt_share
FROM lineitem
JOIN part ON l_partkey = p_partkey
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation n1 ON c_nationkey = n1.n_nationkey
JOIN region ON n1.n_regionkey = r_regionkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation n2 ON s_nationkey = n2.n_nationkey
WHERE p_type = 'ECONOMY' AND r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
GROUP BY 1
"""


def q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13: distribution of order counts per customer, via a left
    outer join (customers with zero qualifying orders must appear as
    c_count=0) and a double aggregation. The reference's synthetic orders
    have no comment column, so the exclusion filter is on o_orderpriority.

    100 TB posture: left join and first groupBy share the c_custkey/
    o_custkey shuffle (one exchange, reused); the second groupBy reduces a
    ~50-value domain — negligible."""
    cu = _t(spark, sf_dir, "customer")
    od = _t(spark, sf_dir, "orders").where(F.col("o_orderpriority") != "1-URGENT")
    return (
        cu.join(od, cu.c_custkey == od.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
        .groupBy("c_count")
        .agg(F.count("*").alias("custdist"))
    )


ORACLE_Q13 = """
SELECT c_count, COUNT(*) AS custdist
FROM (
  SELECT c_custkey, COUNT(o_orderkey) AS c_count
  FROM customer LEFT JOIN orders
    ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
  GROUP BY c_custkey
)
GROUP BY c_count
"""


def q21_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape: suppliers who were the SOLE cause of a returned
    multi-supplier order — EXISTS (another supplier shipped in the same
    order) + NOT EXISTS (another supplier also had a returned line). The
    synthetic lineitem has no commit/receipt dates, so "late" is adapted to
    l_returnflag = 'R' on finalized ('F') orders; the two correlated
    subqueries keep Q21's semi-join + anti-join self-join structure.

    100 TB posture: both self-joins are equi-joins on l_orderkey — with
    lineitem bucketed by orderkey they co-locate; here they share one
    exchange. Supplier/nation broadcast; final agg is per-supplier tiny."""
    li = _t(spark, sf_dir, "lineitem")
    od = _t(spark, sf_dir, "orders").where(F.col("o_orderstatus") == "F")
    su = _t(spark, sf_dir, "supplier").where(F.col("s_nationkey") < 5)
    l1 = li.where(F.col("l_returnflag") == "R").alias("l1")
    l2 = li.select("l_orderkey", "l_suppkey").alias("l2")
    l3 = li.where(F.col("l_returnflag") == "R").select("l_orderkey", "l_suppkey").alias("l3")
    return (
        l1.join(
            l2,
            (F.col("l1.l_orderkey") == F.col("l2.l_orderkey"))
            & (F.col("l1.l_suppkey") != F.col("l2.l_suppkey")),
            "left_semi",
        )
        .join(
            l3,
            (F.col("l1.l_orderkey") == F.col("l3.l_orderkey"))
            & (F.col("l1.l_suppkey") != F.col("l3.l_suppkey")),
            "left_anti",
        )
        .join(od, F.col("l1.l_orderkey") == od.o_orderkey)
        .join(F.broadcast(su), F.col("l1.l_suppkey") == su.s_suppkey)
        .groupBy("s_name")
        .agg(F.count("*").alias("numwait"))
        .orderBy(F.desc("numwait"), F.asc("s_name"))
        .limit(20)
    )


ORACLE_Q21 = """
SELECT s_name, COUNT(*) AS numwait
FROM lineitem l1
JOIN orders ON l1.l_orderkey = o_orderkey
JOIN supplier ON l1.l_suppkey = s_suppkey
WHERE l1.l_returnflag = 'R' AND o_orderstatus = 'F' AND s_nationkey < 5
  AND EXISTS (SELECT 1 FROM lineitem l2
              WHERE l2.l_orderkey = l1.l_orderkey
                AND l2.l_suppkey <> l1.l_suppkey)
  AND NOT EXISTS (SELECT 1 FROM lineitem l3
                  WHERE l3.l_orderkey = l1.l_orderkey
                    AND l3.l_suppkey <> l1.l_suppkey
                    AND l3.l_returnflag = 'R')
GROUP BY s_name
ORDER BY numwait DESC, s_name ASC
LIMIT 20
"""


def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape: cheapest EUROPE supplier per qualifying part. The
    synthetic schema has no partsupp, so the part↔supplier catalog is
    derived from lineitem history (min observed price per part+supplier)
    and the correlated MIN subquery is decorrelated into a partition window.

    100 TB posture: the bridge agg shuffles lineitem once on
    (l_partkey, l_suppkey); the window min re-partitions only the
    region-filtered slice by p_partkey; part/supplier/nation/region all
    broadcast. supplycost stays decimal until output, so the min-equality
    cannot be perturbed by double rounding."""
    li = _t(spark, sf_dir, "lineitem")
    pa = _t(spark, sf_dir, "part").where(
        (F.col("p_size") <= 15) & (F.col("p_type") == "SMALL")
    )
    su = _t(spark, sf_dir, "supplier")
    na = _t(spark, sf_dir, "nation")
    re = _t(spark, sf_dir, "region").where(F.col("r_name") == "EUROPE")
    bridge = li.groupBy("l_partkey", "l_suppkey").agg(
        F.min(dec("l_extendedprice")).alias("supplycost")
    )
    w = Window.partitionBy("p_partkey")
    return (
        bridge.join(F.broadcast(pa), bridge.l_partkey == pa.p_partkey)
        .join(F.broadcast(su), bridge.l_suppkey == su.s_suppkey)
        .join(F.broadcast(na), su.s_nationkey == na.n_nationkey)
        .join(F.broadcast(re), na.n_regionkey == re.r_regionkey)
        .withColumn("min_cost", F.min("supplycost").over(w))
        .where(F.col("supplycost") == F.col("min_cost"))
        .select(
            "s_acctbal",
            "s_name",
            "n_name",
            "p_partkey",
            "p_name",
            "s_suppkey",
            F.col("supplycost").cast("double").alias("supplycost"),
        )
        .orderBy(F.desc("s_acctbal"), "n_name", "s_name", "p_partkey", "s_suppkey")
        .limit(100)
    )


ORACLE_Q2 = f"""
WITH bridge AS (
  SELECT l_partkey, l_suppkey, MIN(CAST(l_extendedprice AS {_D})) AS supplycost
  FROM lineitem GROUP BY 1, 2
), j AS (
  SELECT s_acctbal, s_name, n_name, p_partkey, p_name, s_suppkey, supplycost,
         MIN(supplycost) OVER (PARTITION BY p_partkey) AS min_cost
  FROM bridge
  JOIN part ON l_partkey = p_partkey
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation ON s_nationkey = n_nationkey
  JOIN region ON n_regionkey = r_regionkey
  WHERE p_size <= 15 AND p_type = 'SMALL' AND r_name = 'EUROPE'
)
SELECT s_acctbal, s_name, n_name, p_partkey, p_name, s_suppkey,
       CAST(supplycost AS DOUBLE) AS supplycost
FROM j WHERE supplycost = min_cost
ORDER BY s_acctbal DESC, n_name, s_name, p_partkey, s_suppkey
LIMIT 100
"""



def _asia_nations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ASIA's nations resolved BY NAME through the region table — the
    documented semantics. q11/q20 once hard-coded n_regionkey == 2 (and
    their oracles mirrored the constant), so a regenerated fixture with
    reassigned region keys would silently compute some other region
    while parity still passed; the broadcast region dim costs nothing."""
    re = _t(spark, sf_dir, "region").where(F.col("r_name") == "ASIA")
    return (
        _t(spark, sf_dir, "nation")
        .join(
            F.broadcast(re),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .select("n_nationkey", "n_name", "n_regionkey")
    )


def q11_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape: per-part inventory value held by ASIA-nation
    suppliers, keeping parts whose value exceeds 1/10000 of the total — a
    grouped agg HAVING a global-scalar-subquery threshold. partsupp's
    availqty*supplycost is adapted to lineitem's quantity*price.

    100 TB posture: one shuffle on l_partkey after the broadcast
    supplier-nation semi-filter; the global total is a second pass over the
    same tiny per-part aggregate (broadcast 1 row back). The threshold
    multiplies through in exact decimal — no double epsilon at the cut."""
    li = _t(spark, sf_dir, "lineitem")
    su = _t(spark, sf_dir, "supplier")
    na = _asia_nations(spark, sf_dir)
    asian = su.join(F.broadcast(na), su.s_nationkey == na.n_nationkey).select("s_suppkey")
    per_part = (
        li.join(F.broadcast(asian), li.l_suppkey == F.col("s_suppkey"), "left_semi")
        .groupBy("l_partkey")
        .agg(F.sum(dec("l_quantity") * dec("l_extendedprice")).alias("val"))
    )
    total = per_part.agg(F.sum("val").alias("total_val"))
    return (
        per_part.join(F.broadcast(total))
        .where(F.col("val") * F.lit(10000).cast("decimal(10,0)") > F.col("total_val"))
        .select("l_partkey", F.col("val").cast("double").alias("part_value"))
    )


ORACLE_Q11 = f"""
WITH per_part AS (
  SELECT l_partkey, SUM(CAST(l_quantity AS {_D}) * CAST(l_extendedprice AS {_D})) AS val
  FROM lineitem
  WHERE l_suppkey IN (SELECT s_suppkey FROM supplier
                      JOIN nation ON s_nationkey = n_nationkey
                      WHERE n_regionkey =
                              (SELECT r_regionkey FROM region
                               WHERE r_name = 'ASIA'))
  GROUP BY l_partkey
)
SELECT l_partkey, CAST(val AS DOUBLE) AS part_value
FROM per_part, (SELECT SUM(val) AS total_val FROM per_part) g
WHERE val * CAST(10000 AS DECIMAL(10,0)) > total_val
"""


def q16_supplier_part_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape: how many distinct suppliers can provide each
    (brand, type, size) bucket, excluding one brand, one type prefix, and a
    complaint-list of suppliers (adapted: negative account balance). The
    part↔supplier relation comes from lineitem history in place of partsupp.

    100 TB posture: the NOT-IN list is a broadcast anti join; the distinct
    count shuffles once on the 3-column group key after a map-side
    partial-distinct; part is a broadcast."""
    li = _t(spark, sf_dir, "lineitem")
    pa = _t(spark, sf_dir, "part").where(
        (F.col("p_brand") != "Brand#5")
        & (~F.col("p_type").like("PROMO%"))
        & (F.col("p_size").isin(1, 4, 9, 14, 19, 23, 36, 45))
    )
    bad = _t(spark, sf_dir, "supplier").where(F.col("s_acctbal") < 0.0).select("s_suppkey")
    return (
        li.select("l_partkey", "l_suppkey")
        .join(F.broadcast(bad), li.l_suppkey == F.col("s_suppkey"), "left_anti")
        .join(F.broadcast(pa), F.col("l_partkey") == pa.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


ORACLE_Q16 = """
SELECT p_brand, p_type, p_size, COUNT(DISTINCT l_suppkey) AS supplier_cnt
FROM lineitem
JOIN part ON l_partkey = p_partkey
WHERE p_brand <> 'Brand#5'
  AND p_type NOT LIKE 'PROMO%'
  AND p_size IN (1, 4, 9, 14, 19, 23, 36, 45)
  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0.0)
GROUP BY p_brand, p_type, p_size
"""


def q20_excess_inventory_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape: ASIA suppliers who concentrated more than half of
    their all-time shipments of some 'red' part into 1997 — a nested
    aggregate threshold feeding a semi join up to supplier. partsupp's
    availqty > 0.5*qty is adapted to a conditional-sum comparison over
    lineitem, multiplied through (2*qty97 > total) in exact decimal.

    100 TB posture: one shuffle on (l_partkey, l_suppkey) for the inner
    agg (part filter broadcast-pruned before it); the qualifying pairs are
    tiny and broadcast into a semi join against supplier."""
    li = _t(spark, sf_dir, "lineitem")
    pa = _t(spark, sf_dir, "part").where(F.col("p_name").like("red%")).select("p_partkey")
    su = _t(spark, sf_dir, "supplier")
    na = _asia_nations(spark, sf_dir)
    in_97 = (F.col("l_shipdate") >= _ts("1997-01-01")) & (
        F.col("l_shipdate") < _ts("1998-01-01")
    )
    qualifying = (
        li.join(F.broadcast(pa), li.l_partkey == pa.p_partkey, "left_semi")
        .groupBy("l_partkey", "l_suppkey")
        .agg(
            F.sum(F.when(in_97, dec("l_quantity")).otherwise(F.lit("0").cast(_D))).alias("qty97"),
            F.sum(dec("l_quantity")).alias("qty_total"),
        )
        .where(F.col("qty97") * F.lit(2).cast("decimal(2,0)") > F.col("qty_total"))
        .select("l_suppkey")
    )
    return (
        su.join(F.broadcast(na), su.s_nationkey == na.n_nationkey, "left_semi")
        .join(qualifying, su.s_suppkey == F.col("l_suppkey"), "left_semi")
        .select("s_name", "s_acctbal")
        .orderBy("s_name")
    )


ORACLE_Q20 = f"""
SELECT s_name, s_acctbal
FROM supplier
WHERE s_nationkey IN (SELECT n_nationkey FROM nation
                      WHERE n_regionkey = (SELECT r_regionkey FROM region
                                           WHERE r_name = 'ASIA'))
  AND s_suppkey IN (
    SELECT l_suppkey FROM lineitem
    WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_name LIKE 'red%')
    GROUP BY l_partkey, l_suppkey
    HAVING SUM(CASE WHEN l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
                     AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
                    THEN CAST(l_quantity AS {_D})
                    ELSE CAST('0' AS {_D}) END) * CAST(2 AS DECIMAL(2,0))
           > SUM(CAST(l_quantity AS {_D}))
  )
ORDER BY s_name
"""


def q_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouping-sets surface beyond ROLLUP: full CUBE over
    (returnflag, linestatus) — all four grouping-set combinations.

    100 TB posture: Spark expands the cube map-side (each input row feeds
    every grouping set before the shuffle), so it's still one exchange with
    partial aggregation — no N-pass re-scan."""
    li = _t(spark, sf_dir, "lineitem")
    return li.cube("l_returnflag", "l_linestatus").agg(
        F.count("*").alias("n"), dsum("l_quantity").alias("qty")
    )


ORACLE_CUBE = f"""
SELECT l_returnflag, l_linestatus, COUNT(*) AS n,
       CAST(SUM(CAST(l_quantity AS {_D})) AS DOUBLE) AS qty
FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
"""


def q_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles (quartiles of l_quantity per
    returnflag) — the PERCENTILE_CONT surface.

    Spark's exact ``percentile`` and DuckDB's ``quantile_cont`` both sort
    and linearly interpolate at (n-1)*p. The probe points are quarters
    (exact binary fractions) over integer quantities, so the interpolated
    doubles are bit-identical across engines — no float-tolerance games.

    100 TB posture: exact percentile buffers each group's values — fine for
    a bounded per-group domain like quantity (1..50, collapsible to counts);
    for unbounded high-cardinality columns switch to approx_percentile
    (t-digest, constant memory) and drop oracle exactness."""
    li = _t(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.expr("percentile(l_quantity, 0.25)").alias("p25"),
        F.expr("percentile(l_quantity, 0.5)").alias("p50"),
        F.expr("percentile(l_quantity, 0.75)").alias("p75"),
    )


ORACLE_PERCENTILES = """
SELECT l_returnflag,
       quantile_cont(l_quantity, 0.25) AS p25,
       quantile_cont(l_quantity, 0.5)  AS p50,
       quantile_cont(l_quantity, 0.75) AS p75
FROM lineitem GROUP BY l_returnflag
"""


def q_window_rank_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution-rank window surface: dense_rank / percent_rank /
    cume_dist of customers by account balance within their nation —
    rounds out the window families (navigation → q_window_lead_lag,
    ranking-with-ties and distribution stats → here). One shuffle on
    c_nationkey shared by all four functions."""
    cu = _t(spark, sf_dir, "customer")
    w = Window.partitionBy("c_nationkey").orderBy(
        F.desc("c_acctbal"), F.asc("c_custkey")
    )
    return cu.select(
        "c_nationkey",
        "c_custkey",
        F.dense_rank().over(w).alias("drank"),
        F.percent_rank().over(w).alias("prank"),
        F.cume_dist().over(w).alias("cdist"),
    )


ORACLE_WINDOW_RANK_STATS = """
SELECT c_nationkey, c_custkey,
       DENSE_RANK() OVER w AS drank,
       PERCENT_RANK() OVER w AS prank,
       CUME_DIST() OVER w AS cdist
FROM customer
WINDOW w AS (PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey ASC)
"""


def q_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS (the general form underlying rollup/cube):
    order totals by (status, priority), by status alone, and the grand
    total — with grouping() flags disambiguating real NULLs from
    subtotal rows. Spark plans this as one Expand + one aggregation —
    a single shuffle regardless of how many sets are requested. Uses the
    native DataFrame groupingSets API (Spark 4) — the SQL route needed a
    session-global temp view, the module's only side effect."""
    od = _t(spark, sf_dir, "orders")
    return (
        od.groupingSets(
            [["o_orderstatus", "o_orderpriority"], ["o_orderstatus"], []],
            "o_orderstatus",
            "o_orderpriority",
        )
        .agg(
            F.grouping("o_orderstatus").alias("g_status"),
            F.grouping("o_orderpriority").alias("g_priority"),
            F.count("*").alias("n_orders"),
            F.sum(F.col("o_totalprice").cast(_D))
            .cast("double")
            .alias("total_price"),
        )
        .select(
            "o_orderstatus",
            "o_orderpriority",
            "g_status",
            "g_priority",
            "n_orders",
            "total_price",
        )
    )


ORACLE_GROUPING_SETS = f"""
SELECT o_orderstatus, o_orderpriority,
       GROUPING(o_orderstatus) AS g_status,
       GROUPING(o_orderpriority) AS g_priority,
       COUNT(*) AS n_orders,
       CAST(SUM(CAST(o_totalprice AS {_D})) AS DOUBLE) AS total_price
FROM orders
GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority), (o_orderstatus), ())
"""


def q_window_lead_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Navigation-function window surface: lag / lead / ntile per customer
    order history (order-value delta vs previous order, next order date,
    spend-quartile bucketing). Complements the rank/running-sum shapes —
    together they cover Spark's full window-function families.

    Scale: one shuffle on o_custkey shared by all three functions (same
    window spec → one exchange + one sort); deterministic because the
    ordering key (o_orderdate, o_orderkey) is unique per partition."""
    od = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(F.asc("o_orderdate"), F.asc("o_orderkey"))
    return od.select(
        "o_custkey",
        "o_orderkey",
        (dec("o_totalprice") - F.lag(dec("o_totalprice")).over(w))
        .cast("double")
        .alias("delta_prev"),
        F.lead("o_orderdate").over(w).alias("next_order_date"),
        F.ntile(4).over(w).alias("spend_quartile"),
    )


ORACLE_WINDOW_LEAD_LAG = f"""
SELECT o_custkey, o_orderkey,
       CAST(CAST(o_totalprice AS {_D}) - LAG(CAST(o_totalprice AS {_D})) OVER w
            AS DOUBLE) AS delta_prev,
       LEAD(o_orderdate) OVER w AS next_order_date,
       NTILE(4) OVER w AS spend_quartile
FROM orders
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC)
"""


def q_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DataFrame pivot surface: order counts per (customer nation ×
    order priority) with priorities pivoted to columns. Spark plans pivot
    as a single groupBy with conditional aggregates — one shuffle on the
    25-row nation key, identical to hand-written CASE WHEN (the oracle
    spells that equivalence out).

    The pivot value list is supplied explicitly: at 100 TB an unlisted
    pivot would first run a distinct() job just to discover column names."""
    od = _t(spark, sf_dir, "orders")
    cu = _t(spark, sf_dir, "customer")
    na = _t(spark, sf_dir, "nation")
    pris = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
    joined = od.join(cu, od.o_custkey == cu.c_custkey).join(
        F.broadcast(na), cu.c_nationkey == na.n_nationkey
    )
    piv = (
        joined.groupBy("n_name")
        .pivot("o_orderpriority", pris)
        .agg(F.count(F.lit(1)))
    )
    # pivot column names contain spaces/dashes; alias to oracle-stable names.
    # coalesce: pivot-count leaves NULL for empty cells where COUNT(CASE)=0
    renames = {p: f"n_pri{p[0]}" for p in pris}
    return piv.select(
        "n_name",
        *[F.coalesce(F.col(f"`{p}`"), F.lit(0)).alias(renames[p]) for p in pris],
    )


ORACLE_PIVOT = """
SELECT n_name,
       COUNT(CASE WHEN o_orderpriority = '1-URGENT' THEN 1 END) AS n_pri1,
       COUNT(CASE WHEN o_orderpriority = '2-HIGH' THEN 1 END) AS n_pri2,
       COUNT(CASE WHEN o_orderpriority = '3-MEDIUM' THEN 1 END) AS n_pri3,
       COUNT(CASE WHEN o_orderpriority = '4-NOT SPECIFIED' THEN 1 END) AS n_pri4,
       COUNT(CASE WHEN o_orderpriority = '5-LOW' THEN 1 END) AS n_pri5
FROM orders JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
GROUP BY n_name
"""


QUERIES = {
    "q1_pricing_summary": q1_pricing_summary,
    "q4_order_priority": q4_order_priority,
    "q22_global_sales_opportunity": q22_global_sales_opportunity,
    "q2_min_cost_supplier": q2_min_cost_supplier,
    "q6_forecast_revenue": q6_forecast_revenue,
    "q8_market_share": q8_market_share,
    "q11_important_stock": q11_important_stock,
    "q13_customer_distribution": q13_customer_distribution,
    "q16_supplier_part_count": q16_supplier_part_count,
    "q20_excess_inventory_suppliers": q20_excess_inventory_suppliers,
    "q21_waiting_suppliers": q21_waiting_suppliers,
    "q7_nation_volume": q7_nation_volume,
    "q9_product_profit": q9_product_profit,
    "q15_top_supplier": q15_top_supplier,
    "q17_small_quantity_revenue": q17_small_quantity_revenue,
    "q12_priority_class": q12_priority_class,
    "q14_promo_revenue": q14_promo_revenue,
    "q18_large_orders": q18_large_orders,
    "q19_bracket_filter": q19_bracket_filter,
    "q3_shipping_priority": q3_shipping_priority,
    "q5_local_supplier_volume": q5_local_supplier_volume,
    "q10_returned_items": q10_returned_items,
    "q_window_top_orders": q_window_top_orders,
    "q_window_running_sum": q_window_running_sum,
    "q_subquery_above_avg": q_subquery_above_avg,
    "q_set_ops": q_set_ops,
    "q_set_ops_all": q_set_ops_all,
    "q_conditional_agg": q_conditional_agg,
    "q_having": q_having,
    "q_anti_semi_join": q_anti_semi_join,
    "q_rollup": q_rollup,
    "q_cube": q_cube,
    "q_percentiles": q_percentiles,
    "q_window_lead_lag": q_window_lead_lag,
    "q_pivot": q_pivot,
    "q_grouping_sets": q_grouping_sets,
    "q_window_rank_stats": q_window_rank_stats,
}

ORACLES = {
    "q1_pricing_summary": ORACLE_Q1,
    "q4_order_priority": ORACLE_Q4,
    "q22_global_sales_opportunity": ORACLE_Q22,
    "q2_min_cost_supplier": ORACLE_Q2,
    "q6_forecast_revenue": ORACLE_Q6,
    "q8_market_share": ORACLE_Q8,
    "q11_important_stock": ORACLE_Q11,
    "q13_customer_distribution": ORACLE_Q13,
    "q16_supplier_part_count": ORACLE_Q16,
    "q20_excess_inventory_suppliers": ORACLE_Q20,
    "q21_waiting_suppliers": ORACLE_Q21,
    "q7_nation_volume": ORACLE_Q7,
    "q9_product_profit": ORACLE_Q9,
    "q15_top_supplier": ORACLE_Q15,
    "q17_small_quantity_revenue": ORACLE_Q17,
    "q12_priority_class": ORACLE_Q12,
    "q14_promo_revenue": ORACLE_Q14,
    "q18_large_orders": ORACLE_Q18,
    "q19_bracket_filter": ORACLE_Q19,
    "q3_shipping_priority": ORACLE_Q3,
    "q5_local_supplier_volume": ORACLE_Q5,
    "q10_returned_items": ORACLE_Q10,
    "q_window_top_orders": ORACLE_WINDOW_TOP,
    "q_window_running_sum": ORACLE_WINDOW_RUNNING,
    "q_subquery_above_avg": ORACLE_SUBQUERY,
    "q_set_ops": ORACLE_SET_OPS,
    "q_set_ops_all": ORACLE_SET_OPS_ALL,
    "q_conditional_agg": ORACLE_CONDITIONAL,
    "q_having": ORACLE_HAVING,
    "q_anti_semi_join": ORACLE_ANTI_SEMI,
    "q_rollup": ORACLE_ROLLUP,
    "q_cube": ORACLE_CUBE,
    "q_percentiles": ORACLE_PERCENTILES,
    "q_window_lead_lag": ORACLE_WINDOW_LEAD_LAG,
    "q_pivot": ORACLE_PIVOT,
    "q_grouping_sets": ORACLE_GROUPING_SETS,
    "q_window_rank_stats": ORACLE_WINDOW_RANK_STATS,
}
