"""The custom Python DataSource over the RestBus poll spool (S1/S4
boundary): batch scan, streaming offsets, restart resume, and the
composition with the http_poller that publishes the spool."""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import functions as F

from buskafkasparkstreaming_spark.sources import restbus_source
from buskafkasparkstreaming_spark.sources.http_poller import poll_to_spool


def _fake_fetch(n_vehicles=3, route=510):
    def fetch(url):
        return {
            "items": [
                {
                    "id": 1000 + i,
                    "routeId": route,
                    "directionId": "510_1_510A",
                    "lat": 43.64 + i * 0.001,
                    "lon": -79.40 - i * 0.001,
                    "secsSinceReport": 5 + i,
                    "predictable": True,
                    "heading": 90,
                    "kph": 20 + i,
                    "leadingVehicleId": None,
                }
                for i in range(n_vehicles)
            ]
        }

    return fetch


def _publish(spool, polls=2, n_vehicles=3, start_ms=1_700_000_000_000):
    clock = iter(range(start_ms, start_ms + 60_000 * polls, 30_000))
    list(
        poll_to_spool(
            spool,
            fetch=_fake_fetch(n_vehicles),
            interval_s=0.0,
            max_polls=polls,
            clock_ms=lambda: next(clock),
        )
    )


def test_batch_read_parses_spool(spark, tmp_path):
    spool = str(tmp_path / "spool")
    _publish(spool, polls=2, n_vehicles=3)
    restbus_source.register(spark)
    df = spark.read.format("restbus_spool").option("path", spool).load()
    assert df.count() == 6
    r = df.orderBy("record_id").first()
    assert r["record_id"] == 1 and r["routeId"] == 510 and r["op"] == "c"
    assert abs(r["lat"] - 43.64) < 1e-9
    # per-file partition parallelism: one partition per poll file
    assert df.rdd.getNumPartitions() == 2


def test_batch_read_empty_spool(spark, tmp_path):
    spool = str(tmp_path / "empty")
    os.makedirs(spool)
    restbus_source.register(spark)
    df = spark.read.format("restbus_spool").option("path", spool).load()
    assert df.count() == 0


def test_stream_resumes_from_committed_offset(spark, tmp_path):
    """Two drains against one checkpoint: the second must read ONLY the
    file published after the first drain (offset log, not re-listing)."""
    spool = str(tmp_path / "spool")
    ckpt = str(tmp_path / "ckpt")
    out = str(tmp_path / "out")
    _publish(spool, polls=2, n_vehicles=2)
    restbus_source.register(spark)

    def drain():
        q = (
            spark.readStream.format("restbus_spool")
            .option("path", spool)
            .load()
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    drain()
    first = spark.read.parquet(out)
    assert first.count() == 4
    # third poll lands after the first drain
    time.sleep(0.05)
    _publish(spool, polls=1, n_vehicles=2, start_ms=1_700_000_100_000)
    drain()
    again = spark.read.parquet(out)
    assert again.count() == 6  # 4 old + 2 new, none reprocessed
    assert again.filter(F.col("event_time") >= 1_700_000_100_000).count() == 2


def test_malformed_lines_are_skipped_not_fatal(spark, tmp_path):
    spool = str(tmp_path / "spool")
    os.makedirs(spool)
    good = {
        "payload": {
            "before": None,
            "after": {"record_id": 7, "id": 1, "routeId": 510,
                      "event_time": 123},
            "op": "c",
            "ts_ms": 123,
        }
    }
    with open(os.path.join(spool, "poll-0000000000001-x.jsonl"), "w") as fh:
        fh.write(json.dumps(good) + "\n")
        fh.write("this is not json {\n")
        fh.write(json.dumps(good) + "\n")
    restbus_source.register(spark)
    df = spark.read.format("restbus_spool").option("path", spool).load()
    assert df.count() == 2
    assert df.select(F.min("record_id")).first()[0] == 7


def test_datasource_to_upsert_pipeline(spark, tmp_path):
    """S1→S7 through the custom source: stream the spool via the Python
    DataSource, latest-state upsert per vehicle id (precombine
    event_time) — the reference's whole pipeline with the DataSource as
    the ingest boundary. Second poll's rows must supersede the first."""
    from pyspark.sql import functions as F

    from buskafkasparkstreaming_spark.cdc.upsert import UpsertTable

    spool = str(tmp_path / "spool")
    _publish(spool, polls=2, n_vehicles=3)  # poll 2 re-reports ids 1000-1002
    restbus_source.register(spark)
    table = UpsertTable(
        spark,
        str(tmp_path / "tbl"),
        key_cols="id",
        precombine_col="event_time",
        partition_col="routeId",
    )
    stream = (
        spark.readStream.format("restbus_spool").option("path", spool).load()
    )
    q = (
        stream.writeStream.foreachBatch(
            lambda df, _bid: table.merge(df)
        )
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    state = {r["id"]: r["event_time"] for r in table.read().collect()}
    assert len(state) == 3  # one row per vehicle, not per poll
    assert all(v == 1_700_000_030_000 for v in state.values()), state
