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


def probe_events_ts_is_long(spark: SparkSession, path: str) -> bool:
    """Whether the events parquet at ``path`` carries ts as raw int64
    nanos (TIMESTAMP(NANOS) physical encoding — readable only with
    nanosAsLong) rather than TIMESTAMP(MICROS). The ONE probe shared by
    the batch loader and the file-stream source, so the two paths can
    never disagree on the encoding dispatch."""
    try:
        df = spark.read.parquet(path)
    except Exception:
        # TIMESTAMP(NANOS) parquet: Spark raises unless read as raw int64.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(path)
    return isinstance(df.schema["ts"].dataType, LongType)


def normalize_events_ts(df: DataFrame, ts_is_long: bool) -> DataFrame:
    """events.ts → TIMESTAMP_NTZ(µs), the ONE conversion shared by the
    batch loader and the file-stream source (int64 ns floor-divides to
    µs exactly like DuckDB; µs timestamps just re-type)."""
    if ts_is_long:
        return df.withColumn(
            "ts",
            F.timestamp_micros(F.expr("ts div 1000")).cast("timestamp_ntz"),
        )
    return df.withColumn("ts", F.col("ts").cast("timestamp_ntz"))


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one driver table; normalizes events.ts ns→µs TIMESTAMP_NTZ."""
    path = os.path.join(sf_dir, f"{name}.parquet")
    if name == "events":
        ts_is_long = probe_events_ts_is_long(spark, path)
        return normalize_events_ts(spark.read.parquet(path), ts_is_long)
    return spark.read.parquet(path)


def register_views(spark: SparkSession, sf_dir: str, tables=TABLES) -> None:
    """Register every driver table as a temp view named after itself."""
    for name in tables:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
