"""salted_join: equivalence with a plain join, and salt-spread evidence."""

from __future__ import annotations

import pyspark.sql.functions as F

from datafusion_loki_spark.functions.skew import salted_join


def _skewed_frames(spark):
    # 90% of fact rows share one hot key — the shape AQE's split can
    # still leave pinned when one key IS the partition.
    fact = spark.range(0, 10_000).select(
        F.when(F.col("id") % 10 < 9, F.lit(7)).otherwise(F.col("id") % 100)
        .cast("long")
        .alias("k"),
        F.col("id").alias("fact_id"),
    )
    dim = spark.range(0, 100).select(
        F.col("id").alias("k"), F.concat(F.lit("d"), F.col("id")).alias("dval")
    )
    return fact, dim

def test_salted_join_matches_plain_join(spark):
    fact, dim = _skewed_frames(spark)
    plain = fact.join(dim, "k").select("k", "fact_id", "dval")
    salted = salted_join(fact, dim, ["k"], n_salts=8).select("k", "fact_id", "dval")
    assert sorted(map(tuple, salted.collect())) == sorted(map(tuple, plain.collect()))


def test_salted_join_left_outer(spark):
    fact, dim = _skewed_frames(spark)
    plain = fact.join(dim, "k", "left").select("k", "fact_id", "dval")
    salted = salted_join(fact, dim, ["k"], n_salts=4, how="left").select(
        "k", "fact_id", "dval"
    )
    assert sorted(
        map(tuple, salted.fillna("?").collect())
    ) == sorted(map(tuple, plain.fillna("?").collect()))


def test_salt_spreads_hot_key(spark):
    fact, dim = _skewed_frames(spark)
    salted = salted_join(fact, dim, ["k"], n_salts=8)
    # the hot key's rows must traverse >1 (k, salt) shuffle key
    from datafusion_loki_spark.functions.skew import SALT_COL

    left = fact.withColumn(
        SALT_COL,
        F.pmod(F.xxhash64(*[F.col(c) for c in fact.columns]), F.lit(8)).cast("int"),
    )
    n_subkeys = left.where(F.col("k") == 7).select(SALT_COL).distinct().count()
    assert n_subkeys > 1
    assert salted.count() == fact.join(dim, "k").count()
