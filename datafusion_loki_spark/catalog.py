"""Load the driver's parquet tables (see TESTDATA.md / FIXTURES.md).

The one wrinkle: ``events.ts`` is parquet ``TIMESTAMP(NANOS)``, which Spark
rejects outright ([PARQUET_TYPE_ILLEGAL]). We read the raw int64 nanos via
``spark.sql.legacy.parquet.nanosAsLong`` and floor-convert to µs
TIMESTAMP_NTZ — exactly the truncation DuckDB applies when it reads the same
file, so oracle comparisons agree. This mirrors the reference's ns-precision
decision (reference: datafusion-loki/src/table.rs:17, SURVEY.md §7.4):
ns on the wire, µs in SQL.
"""

from __future__ import annotations

import os

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = "/root/testdata/sf0.001"


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one driver table; normalizes events.ts ns→µs TIMESTAMP_NTZ."""
    path = os.path.join(sf_dir, f"{name}.parquet")
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(path)
        # ts arrives as int64 nanoseconds; floor-divide to µs like DuckDB.
        return df.withColumn(
            "ts",
            F.timestamp_micros(F.expr("ts div 1000")).cast("timestamp_ntz"),
        )
    return spark.read.parquet(path)


def register_views(spark: SparkSession, sf_dir: str, tables=TABLES) -> None:
    """Register every driver table as a temp view named after itself."""
    for name in tables:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
