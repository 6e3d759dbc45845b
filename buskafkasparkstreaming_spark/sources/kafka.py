"""Kafka source/sink wrappers — the reference's transport boundary.

Parity: reference spark-kafka.py:1-6 and 01-setup-ec-vm.md:166-172 (S4).
No broker exists in the test container, so these are thin, untested-live
wrappers; the JSONL replay source (sources.files) yields the identical
`value`-column contract and is what CI exercises. The spark-sql-kafka
package must be on the classpath at deploy time (reference
01-setup-ec-vm.md:116).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def read_stream(
    spark: SparkSession,
    bootstrap_servers: str,
    topic: str,
    starting_offsets: str = "latest",
    max_offsets_per_trigger: int | None = None,
) -> DataFrame:
    """readStream from a topic — reference S4 (01-setup-ec-vm.md:166-172,
    startingOffsets=latest at :171).

    `max_offsets_per_trigger` is the backpressure knob a 30 s-tick
    pipeline needs after downtime: without it the restart micro-batch
    swallows the whole accumulated backlog in one batch (shuffle spill /
    OOM at scale); with it the drain is paced across micro-batches while
    exactly-once state (checkpointed offsets) keeps the final result
    identical — proven for the file analog in
    tests/test_streaming.py::test_rate_limited_drain_same_state."""
    reader = (
        spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("subscribe", topic)
        .option("startingOffsets", starting_offsets)
    )
    if max_offsets_per_trigger is not None:
        reader = reader.option(
            "maxOffsetsPerTrigger", str(max_offsets_per_trigger)
        )
    return reader.load()


def read_batch(
    spark: SparkSession,
    bootstrap_servers: str,
    topic: str,
    starting_offsets: str = "earliest",
) -> DataFrame:
    """Batch topic scan — engine analog of the reference's
    kafka-console-consumer verification step (S10, 01-setup-ec-vm.md:106)."""
    return (
        spark.read.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("subscribe", topic)
        .option("startingOffsets", starting_offsets)
        .load()
    )


def write_stream(
    df: DataFrame,
    bootstrap_servers: str,
    topic: str,
    checkpoint_location: str,
):
    """value-column stream → topic (the Debezium-side emulation boundary)."""
    return (
        df.writeStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("topic", topic)
        .option("checkpointLocation", checkpoint_location)
        .start()
    )
