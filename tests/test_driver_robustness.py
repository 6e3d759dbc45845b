"""Emulate the grading driver: a PLAIN SparkSession (none of get_spark()'s
configs, and a hostile non-UTC JVM timezone) must still run the declared
queries and match the DuckDB oracle — the engine pins its required runtime
confs itself."""

from __future__ import annotations

import subprocess
import sys

SCRIPT = r"""
import sys
sys.path.insert(0, "/root/repo")
from pyspark.sql import SparkSession

# a driver-like session: default configs, hostile timezone
spark = (
    SparkSession.builder.master("local[4]")
    .appName("driver-emulation")
    .config("spark.driver.extraJavaOptions", "-Duser.timezone=America/New_York")
    .config("spark.sql.session.timeZone", "America/New_York")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
)

import __spark_entry__ as mod
from tests.compare import duckdb_conn, assert_frames_match

sf = "/root/testdata/sf0.001"
con = duckdb_conn(sf)
checked = ["q1_pricing_summary", "q_hourly_events", "cdc_latest_state",
           "q_sessionize_events", "q_monthly_orders", "streaming_tumbling_counts"]
for name in checked:
    sdf = mod.queries()[name](spark, sf)
    assert_frames_match(sdf.toPandas(), con.execute(mod.oracle_sql()[name]).df(), name)
    print("OK", name)

assert mod.entry(spark).count() > 0
print("OK entry")
"""


def test_plain_session_matches_oracle():
    res = subprocess.run(
        [sys.executable, "-c", SCRIPT],
        capture_output=True,
        text=True,
        timeout=600,
        cwd="/root/repo",
    )
    assert res.returncode == 0, f"stdout:\n{res.stdout}\nstderr:\n{res.stderr[-3000:]}"
    for name in ("q1_pricing_summary", "q_hourly_events", "cdc_latest_state", "entry"):
        assert f"OK {name}" in res.stdout
