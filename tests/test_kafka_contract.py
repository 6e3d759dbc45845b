"""Kafka wire-format contract smoke (VERDICT r1 "missing" #2).

No broker exists in the sandbox, so the live leg of `sources.kafka` can't
run — instead this pins the CONTRACT: a DataFrame with exactly the schema
Spark's Kafka source produces (the published columns `key`/`value` binary,
`topic` string, `partition` int, `offset` long, `timestamp` timestamp,
`timestampType` int) must flow through `parse_envelopes` and produce rows
IDENTICAL to the JSONL replay path that CI exercises everywhere else. If
someone changes the parser in a way that only works for the replay shape
(e.g. assumes `value` is a string, or chokes on extra columns), this test
catches it without a broker.

Parity: reference spark-kafka.py:1-6 (the Kafka read), 01-setup-ec-vm.md:166-172.
"""

from __future__ import annotations

import json
from datetime import datetime, timezone

from pyspark.sql import types as T

from buskafkasparkstreaming_spark.cdc import parse_envelopes, route_ops
from buskafkasparkstreaming_spark.schemas import BUS_STATUS_SCHEMA
from buskafkasparkstreaming_spark.sources.files import read_envelope_jsonl

from .test_cdc import FIXTURE, write_jsonl

# the exact output schema of spark.read.format("kafka") — public contract
# from the Structured Streaming + Kafka integration guide
KAFKA_SOURCE_SCHEMA = T.StructType(
    [
        T.StructField("key", T.BinaryType()),
        T.StructField("value", T.BinaryType()),
        T.StructField("topic", T.StringType()),
        T.StructField("partition", T.IntegerType()),
        T.StructField("offset", T.LongType()),
        T.StructField("timestamp", T.TimestampType()),
        T.StructField("timestampType", T.IntegerType()),
    ]
)


def kafka_shaped(spark, envelopes, topic="pt_postgres.public.bus_status"):
    """Materialize envelope dicts as recorded Kafka wire rows: binary
    key/value plus broker metadata, exactly what read_batch would return."""
    rows = []
    for i, e in enumerate(envelopes):
        img = e["payload"]["after"] or e["payload"]["before"]
        key = json.dumps({"record_id": img["record_id"]}).encode("utf-8")
        value = json.dumps(e).encode("utf-8")
        rows.append(
            (
                bytearray(key),
                bytearray(value),
                topic,
                i % 3,  # spread over partitions like a real keyed topic
                i,
                datetime(2021, 1, 1, 0, 0, i, tzinfo=timezone.utc),
                0,
            )
        )
    return spark.createDataFrame(rows, KAFKA_SOURCE_SCHEMA)


def test_kafka_contract_matches_replay(spark, tmp_path):
    kafka_df = kafka_shaped(spark, FIXTURE)
    from_kafka = parse_envelopes(kafka_df, row_schema=BUS_STATUS_SCHEMA)

    p = tmp_path / "replay.jsonl"
    write_jsonl(p, FIXTURE)
    from_replay = parse_envelopes(
        read_envelope_jsonl(spark, str(p)), row_schema=BUS_STATUS_SCHEMA
    )

    assert from_kafka.schema == from_replay.schema
    key = lambda r: (r["record_id"], r["_op"], r["_ts_ms"])  # noqa: E731
    assert sorted(from_kafka.collect(), key=key) == sorted(
        from_replay.collect(), key=key
    )


def test_kafka_meta_columns_survive(spark):
    """keep_kafka_meta must carry broker coordinates (topic/partition/offset)
    through the parse — the audit columns a real deployment reconciles
    offsets with."""
    kafka_df = kafka_shaped(spark, FIXTURE)
    parsed = parse_envelopes(
        kafka_df, row_schema=BUS_STATUS_SCHEMA, keep_kafka_meta=True
    )
    for c in ("_kafka_topic", "_kafka_partition", "_kafka_offset", "_kafka_timestamp"):
        assert c in parsed.columns, c
    rows = parsed.collect()
    assert {r["_kafka_topic"] for r in rows} == {"pt_postgres.public.bus_status"}
    assert sorted(r["_kafka_offset"] for r in rows) == list(range(len(FIXTURE)))
    upserts, deletes, corrupt = route_ops(parsed)
    assert deletes.count() == 1 and corrupt.count() == 0
