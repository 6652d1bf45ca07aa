"""Host-timezone independence of the loki wire conversions.

Spark hands Python naive datetimes rendered in the HOST-local timezone
(TimestampType.fromInternal). The old code stamped tzinfo=UTC onto them,
which on a non-UTC host shifted written epochs and shrank pushed fetch
windows to the wrong interval. These tests run the round trip in a
subprocess with TZ=America/New_York — a genuinely non-UTC host — and
assert instants survive unchanged.
"""

from __future__ import annotations

import os
import subprocess
import sys

_SCRIPT = r"""
import sys
sys.path.insert(0, {repo!r})
import time
from pyspark.sql import SparkSession
import pyspark.sql.functions as F
from tests.emulator import LokiEmulator
from datafusion_loki_spark import register_loki

spark = (SparkSession.builder.master("local[2]")
         .config("spark.ui.enabled", "false")
         .getOrCreate())
spark.sparkContext.setLogLevel("ERROR")
register_loki(spark)

em = LokiEmulator().start()
try:
    # --- writer: a known UTC instant must land as that exact ns epoch ---
    # 2026-01-01 17:00:00 UTC
    want_ns = 1767286800 * 1_000_000_000
    df = spark.sql(
        "SELECT timestamp_seconds(1767286800) AS timestamp, "
        "map('app', 'a') AS labels, 'x' AS line"
    )
    df.write.format("loki").option("endpoint", {endpoint!r}).mode("append").save()
    got_ns = None  # fetch back via the reader (emulator state lives in the
    # emulator process of the parent; here it is in-process)
    assert em.rows[0][0] == want_ns, f"writer epoch shifted: {{em.rows[0][0]}} != {{want_ns}}"

    # --- reader window pushdown: ts > instant must not exclude the row ---
    em.seed([(want_ns, {{"app": "b"}}, "seeded")])
    rows = (
        spark.read.format("loki").option("endpoint", {endpoint!r})
        .option("default_label", "app").load()
        .where(F.col("timestamp") >= F.timestamp_seconds(F.lit(1767286800)))
        .where(F.col("timestamp") <= F.timestamp_seconds(F.lit(1767286800)))
        .collect()
    )
    assert len(rows) == 2, f"window pushdown lost rows: {{rows}}"
    print("TZ_TEST_OK")
finally:
    em.stop()
"""


def test_wire_conversions_on_non_utc_host(tmp_path):
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    script = _SCRIPT.format(repo=repo, endpoint="PLACEHOLDER")
    # the emulator must run inside the subprocess (its state is in-process),
    # so endpoint is resolved there; rewrite the two reader/writer uses
    script = script.replace("'PLACEHOLDER'", "em.endpoint")
    env = dict(os.environ, TZ="America/New_York")
    proc = subprocess.run(
        [sys.executable, "-c", script],
        capture_output=True,
        text=True,
        env=env,
        timeout=300,
    )
    assert "TZ_TEST_OK" in proc.stdout, (
        f"stdout:\n{proc.stdout[-2000:]}\nstderr:\n{proc.stderr[-2000:]}"
    )
