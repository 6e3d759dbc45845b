"""Streaming state observability — the Spark 4 state-store data source
(`spark.read.format("statestore")`) wrapped for this engine's operators.

Why it matters at scale: a production streaming job's state store is the
blackbox that decides memory footprint and rescale behavior. This reader
turns it into a queryable DataFrame — count keys per operator/partition,
inspect which windows are still open, audit watermark eviction — without
stopping the query or attaching a debugger. It is the engine's answer to
'what is my stream holding, and why' (the reference had only console
eyeballing, 01-setup-ec-vm.md:183).

Invariant the tests pin: for an append-mode windowed aggregation, the
EMITTED rows plus the LIVE state rows together equal the batch aggregate —
state is exactly the windows the watermark has not yet closed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def read_state_store(
    spark: SparkSession,
    checkpoint: str,
    batch_id: int | None = None,
    operator_id: int = 0,
) -> DataFrame:
    """Raw state rows (key struct, value struct, partition_id) for one
    stateful operator of the query checkpointed at `checkpoint`."""
    r = spark.read.format("statestore").option("operatorId", operator_id)
    if batch_id is not None:
        r = r.option("batchId", batch_id)
    return r.load(checkpoint)


def state_metrics(
    spark: SparkSession, checkpoint: str, operator_id: int = 0
) -> DataFrame:
    """Per-partition state-store sizing: (partition_id, n_keys) — the
    skew view an operator rescale decision needs (state partitions with
    10x the keys of their peers are the streaming equivalent of a hot
    shuffle key)."""
    from pyspark.sql import functions as F

    st = read_state_store(spark, checkpoint, operator_id=operator_id)
    return st.groupBy("partition_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_keys")
    )
