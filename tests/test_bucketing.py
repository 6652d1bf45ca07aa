"""Bucketed-layout co-located join: the persisted-table answer to the
orders⋈lineitem shuffle.

At 100 TB the dominant cost of the TPC-H joins is shuffling both fact
tables on o_orderkey/l_orderkey. Writing them bucketed on that key makes
the join zero-shuffle forever after: Spark reads co-located buckets and
joins them with SortMergeJoin and NO Exchange on either side. This test
pins that plan property end-to-end (write bucketed → join → assert no
exchange over the fact sides) and value-equivalence with the plain join.
"""

from __future__ import annotations

import pytest
import pyspark.sql.functions as F

from datafusion_loki_spark.catalog import load_table

N_BUCKETS = 8


@pytest.fixture(scope="module")
def bucketed_tables(spark, sf_dir, tmp_path_factory):
    wh = tmp_path_factory.mktemp("warehouse")
    od = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    (
        od.write.bucketBy(N_BUCKETS, "o_orderkey")
        .sortBy("o_orderkey")
        .option("path", str(wh / "orders_b"))
        .mode("overwrite")
        .saveAsTable("orders_b")
    )
    (
        li.write.bucketBy(N_BUCKETS, "l_orderkey")
        .sortBy("l_orderkey")
        .option("path", str(wh / "lineitem_b"))
        .mode("overwrite")
        .saveAsTable("lineitem_b")
    )
    yield "orders_b", "lineitem_b"
    spark.sql("DROP TABLE IF EXISTS orders_b")
    spark.sql("DROP TABLE IF EXISTS lineitem_b")


def test_bucketed_join_has_no_exchange(spark, bucketed_tables):
    od_b, li_b = bucketed_tables
    # at test SF the pruned fact side fits the broadcast threshold, which
    # would mask the property under test; at 100 TB neither side
    # broadcasts — emulate that by disabling broadcast for this plan
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = (
            spark.table(li_b)
            .join(spark.table(od_b), F.col("l_orderkey") == F.col("o_orderkey"))
            .groupBy("o_orderpriority")
            .agg(F.count("*").alias("n"))
        )
        plan = joined._jdf.queryExecution().executedPlan().toString()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    # the join must read co-located buckets: no Exchange below the join —
    # the only exchange allowed anywhere is the final tiny aggregation's
    assert "SortMergeJoin" in plan, plan
    join_part = plan.split("SortMergeJoin", 1)[1]
    assert "Exchange" not in join_part, plan
    assert "Bucketed: true" in plan, plan


def test_bucketed_join_matches_plain_join(spark, sf_dir, bucketed_tables):
    od_b, li_b = bucketed_tables
    bucketed = (
        spark.table(li_b)
        .join(spark.table(od_b), F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("n"))
        .collect()
    )
    plain = (
        load_table(spark, sf_dir, "lineitem")
        .join(
            load_table(spark, sf_dir, "orders"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("n"))
        .collect()
    )
    assert sorted(map(tuple, bucketed)) == sorted(map(tuple, plain))
