"""Load the driver's parquet tables (see TESTDATA.md / FIXTURES.md).

The one wrinkle: ``events.ts`` has shipped in two physical encodings across
testdata generations: parquet ``TIMESTAMP(NANOS)`` (which Spark can only read
as raw int64 via ``spark.sql.legacy.parquet.nanosAsLong``) and plain
``TIMESTAMP(MICROS)`` (which reads natively as timestamp_ntz). We
type-dispatch on the loaded dtype: int64 → floor-convert ns→µs (the same
truncation DuckDB applies), timestamp → pass through, cast to timestamp_ntz
for a uniform logical schema either way. This mirrors the reference's
ns-precision decision (reference: datafusion-loki/src/table.rs:17,
SURVEY.md §7.4): ns on the wire, µs in SQL.
"""

from __future__ import annotations

import os

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import LongType

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
        try:
            df = spark.read.parquet(path)
        except Exception:
            # TIMESTAMP(NANOS) parquet: Spark raises unless read as raw int64.
            spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
            df = spark.read.parquet(path)
        ts_type = df.schema["ts"].dataType
        if isinstance(ts_type, LongType):
            # int64 nanoseconds; floor-divide to µs like DuckDB.
            return df.withColumn(
                "ts",
                F.timestamp_micros(F.expr("ts div 1000")).cast("timestamp_ntz"),
            )
        # Already a timestamp (µs parquet) — normalize to timestamp_ntz.
        return df.withColumn("ts", F.col("ts").cast("timestamp_ntz"))
    return spark.read.parquet(path)


def register_views(spark: SparkSession, sf_dir: str, tables=TABLES) -> None:
    """Register every driver table as a temp view named after itself."""
    for name in tables:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
