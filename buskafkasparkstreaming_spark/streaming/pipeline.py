"""The continuous CDC pipeline — the engine's rebuild of the reference's
production job (SURVEY §3 entry point B, reference 01-setup-ec-vm.md:340-389).

Shape: unbounded `value` stream (Kafka or file replay) → envelope parse
(narrow, codegen) → foreachBatch → keyed-upsert merge into the partitioned
lake table. foreachBatch is deliberate, copied from the reference's one good
architectural decision (:284): inside the batch callback the merge plan is a
*batch* plan, so AQE re-enables (the reference observed AQE auto-disabled in
streaming plans, :290) and the checkpoint advances only after the merge
commits — exactly-once per batch w.r.t. the checkpoint, with an idempotent
merge underneath (same batch replayed → same table state).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming import StreamingQuery

from buskafkasparkstreaming_spark.cdc.envelope import parse_envelopes, route_ops
from buskafkasparkstreaming_spark.cdc.upsert import UpsertTable


def run_cdc_pipeline(
    value_stream: DataFrame,
    table: UpsertTable,
    checkpoint_dir: str,
    row_schema: T.StructType | None = None,
    quarantine_path: str | None = None,
    available_now: bool = True,
    query_name: str = "bss-cdc-pipeline",
) -> StreamingQuery:
    """Start the stream. With `available_now` (the test/replay mode) the
    query drains all pending input then stops — the engine's analog of the
    reference's continuous ASAP-trigger run (:183, no trigger set)."""
    parsed = parse_envelopes(value_stream, row_schema=row_schema)

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        # Mirrors the reference's write_batch(df, epochId) (:278-282), with
        # op routing + quarantine the reference lacked.
        upserts, deletes, corrupt = route_ops(batch_df)
        if quarantine_path is not None:
            corrupt.select("_corrupt").write.mode("append").parquet(quarantine_path)
        changes = upserts.unionByName(deletes)
        table.merge(changes, delete_col="_is_delete")

    writer = (
        parsed.writeStream.queryName(query_name)
        .option("checkpointLocation", checkpoint_dir)
        .foreachBatch(write_batch)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def run_append_sink(
    value_stream: DataFrame,
    path: str,
    checkpoint_dir: str,
    row_schema: T.StructType | None = None,
    available_now: bool = True,
) -> StreamingQuery:
    """Append-only lake sink — the working version of the reference's
    Iceberg variant (S8, 01-setup-ec-vm.md:427-430, which passed the literal
    string 's3_path' as the path and never ran). Parsed change rows append
    to partitioned parquet; no merge, full history retained."""
    parsed = parse_envelopes(value_stream, row_schema=row_schema)
    writer = (
        parsed.writeStream.format("parquet")
        .option("path", path)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def run_console_debug(
    value_stream: DataFrame,
    checkpoint_dir: str,
    row_schema: T.StructType | None = None,
) -> StreamingQuery:
    """Console sink — reference S6 (01-setup-ec-vm.md:183), untruncated."""
    parsed = parse_envelopes(value_stream, row_schema=row_schema)
    return (
        parsed.writeStream.format("console")
        .option("truncate", "false")
        .option("checkpointLocation", checkpoint_dir)
        .start()
    )
