"""The fixed Loki log-table schema.

≙ LOG_TABLE_SCHEMA in the reference (datafusion-loki/src/table.rs:14-37):
timestamp Timestamp(ns, UTC) NOT NULL, labels Map<Utf8,Utf8> NOT NULL,
line Utf8 NOT NULL. Spark's TimestampType is µs — the documented
semantic delta (SURVEY.md §7.4.1): µs in SQL, ns on the Loki wire.
"""

from __future__ import annotations

import pyarrow as pa
from pyspark.sql.types import (
    LongType,
    MapType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

LOG_TABLE_SCHEMA = StructType(
    [
        StructField("timestamp", TimestampType(), nullable=False),
        StructField(
            "labels",
            MapType(StringType(), StringType(), valueContainsNull=False),
            nullable=False,
        ),
        StructField("line", StringType(), nullable=False),
    ]
)

# Arrow twin of the batches read() YIELDS (post-conversion: timestamps
# already narrowed ns→µs for Spark). The WIRE carries ns — the emulator's
# parquet responses use TIMESTAMP(NANOS), and _ts_ns_ints normalizes any
# other unit. Entry layout mirrors table.rs:21-27 (struct<key,value>,
# keys non-null).
ARROW_LOG_SCHEMA = pa.schema(
    [
        pa.field("timestamp", pa.timestamp("us"), nullable=False),
        pa.field("labels", pa.map_(pa.string(), pa.string()), nullable=False),
        pa.field("line", pa.string(), nullable=False),
    ]
)

# ≙ the INSERT result schema, count Int64 NOT NULL (insert.rs:26-32).
INSERT_RESULT_SCHEMA = StructType([StructField("count", LongType(), nullable=False)])
