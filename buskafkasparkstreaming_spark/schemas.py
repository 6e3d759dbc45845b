"""Explicit schemas for the CDC surface.

The reference *infers* the Debezium envelope schema from a one-line sample
file (reference 01-setup-ec-vm.md:164 `spark.read.json('file:///jars/
bus_status_schema.json').schema`). Inference on a sample is fragile at scale
(one scan per job, silently wrong on field drift), so the engine declares the
envelope as an explicit StructType mirroring the sample envelope
(reference bus_status_schema.json:1, struct dbserver1.demo.bus_status.Envelope)
and the MySQL DDL (reference 01-setup-ec-vm.md:320-333).
"""

from __future__ import annotations

from pyspark.sql import types as T

# payload.after / payload.before — the bus_status row image (FIXTURES.md F1).
BUS_STATUS_SCHEMA = T.StructType(
    [
        T.StructField("record_id", T.IntegerType(), False),
        T.StructField("id", T.IntegerType(), True),
        T.StructField("routeId", T.IntegerType(), True),
        T.StructField("directionId", T.StringType(), True),
        T.StructField("predictable", T.ShortType(), True),
        T.StructField("secsSinceReport", T.IntegerType(), True),
        T.StructField("kph", T.IntegerType(), True),
        T.StructField("heading", T.IntegerType(), True),
        T.StructField("lat", T.DoubleType(), True),
        T.StructField("lon", T.DoubleType(), True),
        T.StructField("leadingVehicleId", T.IntegerType(), True),
        # io.debezium.time.Timestamp — epoch MILLIS (bus_status_schema.json:1)
        T.StructField("event_time", T.LongType(), True),
    ]
)

SOURCE_SCHEMA = T.StructType(
    [
        T.StructField("version", T.StringType(), True),
        T.StructField("connector", T.StringType(), True),
        T.StructField("name", T.StringType(), True),
        T.StructField("ts_ms", T.LongType(), True),
        # io.debezium.data.Enum, allowed true,last,false,incremental
        T.StructField("snapshot", T.StringType(), True),
        T.StructField("db", T.StringType(), True),
        T.StructField("sequence", T.StringType(), True),
        T.StructField("table", T.StringType(), True),
        T.StructField("server_id", T.LongType(), True),
        T.StructField("gtid", T.StringType(), True),
        T.StructField("file", T.StringType(), True),
        T.StructField("pos", T.LongType(), True),
        T.StructField("row", T.IntegerType(), True),
        T.StructField("thread", T.LongType(), True),
        T.StructField("query", T.StringType(), True),
    ]
)

TRANSACTION_SCHEMA = T.StructType(
    [
        T.StructField("id", T.StringType(), True),
        T.StructField("total_order", T.LongType(), True),
        T.StructField("data_collection_order", T.LongType(), True),
    ]
)

# The Kafka message value: Debezium change-event envelope (payload branch).
# The reference's sample also embeds the `schema` descriptor branch; only
# `payload` is ever used (reference 01-setup-ec-vm.md:180 selects
# jsonData.payload.after.*), so the engine's schema covers payload only —
# from_json in PERMISSIVE mode ignores the extra `schema` key.
DEBEZIUM_PAYLOAD_SCHEMA = T.StructType(
    [
        T.StructField("before", BUS_STATUS_SCHEMA, True),
        T.StructField("after", BUS_STATUS_SCHEMA, True),
        T.StructField("source", SOURCE_SCHEMA, True),
        T.StructField("op", T.StringType(), True),  # c/u/d/r
        T.StructField("ts_ms", T.LongType(), True),
        T.StructField("transaction", TRANSACTION_SCHEMA, True),
    ]
)

DEBEZIUM_ENVELOPE_SCHEMA = T.StructType(
    [
        T.StructField("payload", DEBEZIUM_PAYLOAD_SCHEMA, True),
        T.StructField("_corrupt_record", T.StringType(), True),
    ]
)


def envelope_schema_for(row_schema: T.StructType) -> T.StructType:
    """Build a Debezium envelope schema around an arbitrary row image.

    Generalizes the reference's single-table envelope to any table, so the
    CDC machinery (parse → op routing → upsert) is table-agnostic.
    """
    payload = T.StructType(
        [
            T.StructField("before", row_schema, True),
            T.StructField("after", row_schema, True),
            T.StructField("source", SOURCE_SCHEMA, True),
            T.StructField("op", T.StringType(), True),
            T.StructField("ts_ms", T.LongType(), True),
            T.StructField("transaction", TRANSACTION_SCHEMA, True),
        ]
    )
    return T.StructType(
        [
            T.StructField("payload", payload, True),
            T.StructField("_corrupt_record", T.StringType(), True),
        ]
    )
