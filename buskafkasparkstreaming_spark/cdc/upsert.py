"""Keyed upsert with precombine — the engine's replacement for the
reference's Hudi sink.

Reference semantics (01-setup-ec-vm.md:262-272): COPY_ON_WRITE table,
record key `record_id`, partition path `routeId`, precombine field
`event_time` — i.e. *for duplicate keys, keep the row with the greatest
precombine value; new batches replace existing rows key-wise*.

Spark-first design (SURVEY §2.3, §7 "custom logic"):

* precombine  = `row_number() OVER (PARTITION BY key ORDER BY precombine
  DESC, tiebreak DESC) = 1` — one shuffle on the key, map-side pipelined.
* merge       = union(existing ∩ touched partitions, batch) → precombine →
  dynamic partition overwrite. Only partitions present in the batch are
  rewritten (mirrors Hudi COW file-group rewrite), so a 100 TB table with a
  skewed hot partition only pays for the hot partition.
* deletes     = tombstone rows (op='d') drop the key during precombine.

At cluster scale the partition column should be a bounded-cardinality key
(the reference used routeId); the shuffle is keyed on the record key so AQE
skew-join/partition-coalescing handles hot keys.
"""

from __future__ import annotations

import json
import os
import shutil
import uuid

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F


def latest_state(
    df: DataFrame,
    key_cols: list[str] | str,
    precombine_col: str,
    tiebreak_cols: list[str] | None = None,
    delete_col: str | None = None,
) -> DataFrame:
    """Reduce a change log to latest-row-per-key (Hudi precombine semantics,
    reference 01-setup-ec-vm.md:269).

    One hash shuffle on `key_cols`; the window sort is per-key and spills
    safely. If `delete_col` (boolean) is given, keys whose latest row is a
    tombstone are dropped entirely.
    """
    keys = [key_cols] if isinstance(key_cols, str) else list(key_cols)
    order = [F.col(precombine_col).desc_nulls_last()]
    for t in tiebreak_cols or []:
        order.append(F.col(t).desc_nulls_last())
    w = Window.partitionBy(*keys).orderBy(*order)
    out = (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )
    if delete_col is not None:
        out = out.filter(~F.coalesce(F.col(delete_col), F.lit(False)))
    return out


class UpsertTable:
    """A partitioned-parquet table with keyed-upsert merge.

    Pure-Spark equivalent of the reference's Hudi COW table `bus_status`
    (record key / partition path / precombine — 01-setup-ec-vm.md:265-269).
    Writes are idempotent: merging the same batch twice yields the same
    table state (the property the reference leaned on for exactly-once,
    01-setup-ec-vm.md:284).

    Key uniqueness is partition-local (Hudi SIMPLE-index semantics): a key
    that changes its partition value would exist in both partitions. The
    reference's keys are partition-stable (a record's routeId never
    changes); tables that need global keys should either partition by a
    function of the key or do a full-table merge.
    """

    def __init__(
        self,
        spark: SparkSession,
        path: str,
        key_cols: list[str] | str,
        precombine_col: str,
        partition_col: str | None = None,
        tiebreak_cols: list[str] | None = None,
    ) -> None:
        self.spark = spark
        self.path = path
        self.key_cols = [key_cols] if isinstance(key_cols, str) else list(key_cols)
        self.precombine_col = precombine_col
        self.partition_col = partition_col
        self.tiebreak_cols = tiebreak_cols or []

    # -- read ----------------------------------------------------------------
    def exists(self) -> bool:
        return os.path.exists(self.path) and any(
            not n.startswith(("_", ".")) for n in os.listdir(self.path)
        )

    @property
    def _schema_sidecar(self) -> str:
        return os.path.join(self.path, "_bss_schema.json")

    def read(self) -> DataFrame:
        """Read the table. Uses the schema sidecar written by merge() — this
        both skips schema inference and keeps a fully-tombstoned (empty)
        table readable."""
        if os.path.exists(self._schema_sidecar):
            from pyspark.sql.types import StructType

            with open(self._schema_sidecar, encoding="utf-8") as fh:
                schema = StructType.fromJson(json.load(fh))
            return self.spark.read.schema(schema).parquet(self.path)
        return self.spark.read.parquet(self.path)

    def register(self, view_name: str) -> DataFrame:
        """Expose for ad-hoc SQL — the engine's Athena analog
        (reference 01-setup-ec-vm.md:305-318)."""
        df = self.read()
        df.createOrReplaceTempView(view_name)
        return df

    # -- write ---------------------------------------------------------------
    def merge(self, batch: DataFrame, delete_col: str | None = None) -> None:
        """Upsert `batch` (change rows) into the table.

        Reads back only the partitions the batch touches (partition-pruned
        scan), unions with the batch at a higher precombine epoch, dedups,
        and dynamically overwrites just those partitions.
        """
        data_cols = [c for c in batch.columns if not c.startswith("_")]
        delete_flag = (
            F.coalesce(F.col(delete_col), F.lit(False))
            if delete_col is not None and delete_col in batch.columns
            else F.lit(False)
        )
        incoming = batch.select(
            *data_cols,
            delete_flag.alias("__deleted"),
            F.lit(1).alias("__gen"),  # incoming beats existing on precombine tie
        )

        touched: list | None = None
        if self.exists():
            existing = self.read().select(
                *data_cols, F.lit(False).alias("__deleted"), F.lit(0).alias("__gen")
            )
            if self.partition_col is not None:
                touched = [
                    r[0]
                    for r in batch.select(self.partition_col).distinct().collect()
                ]
                existing = existing.filter(F.col(self.partition_col).isin(touched))
            unioned = existing.unionByName(incoming)
        else:
            unioned = incoming

        merged = latest_state(
            unioned,
            self.key_cols,
            self.precombine_col,
            tiebreak_cols=[*self.tiebreak_cols, "__gen"],
            delete_col="__deleted",
        ).drop("__deleted", "__gen")

        # Commit protocol: write the merged partitions into a fresh
        # dot-prefixed staging directory (invisible to parquet readers),
        # then swap each partition directory into place with a rename —
        # the write-to-new-files + atomic-publish pattern Hudi's timeline /
        # Delta's log implement. The staging write streams FROM the old
        # files TO new ones, so no plan ever overwrites its own input (the
        # old localCheckpoint lineage-break — which materialized the whole
        # merged state in executor-local storage — is gone), and nothing
        # depends on spark.sql.sources.partitionOverwriteMode, so a
        # host-built session with the 'static' default can't truncate the
        # table. A merge that dies mid-swap is safe to retry: re-merging
        # the same batch is idempotent under the precombine property.
        # (Multi-writer coordination would need a real commit log on top;
        # single-writer matches the reference deployment.)
        staging = os.path.join(self.path, f".bss_staging_{uuid.uuid4().hex[:12]}")
        writer = merged.write.mode("overwrite")
        if self.partition_col is not None:
            writer = writer.partitionBy(self.partition_col)
        writer.parquet(staging)

        try:
            if self.partition_col is not None:
                surviving = set()
                for name in os.listdir(staging):
                    if name.startswith((".", "_")):
                        continue  # _SUCCESS etc.
                    surviving.add(name)
                    target = os.path.join(self.path, name)
                    if os.path.isdir(target):
                        shutil.rmtree(target)
                    os.rename(os.path.join(staging, name), target)
                # a touched partition whose rows were ALL tombstoned writes
                # no staging dir — drop its old files explicitly (mirrors
                # Hudi removing an emptied file group)
                for val in touched or []:
                    name = f"{self.partition_col}={val}"
                    if name not in surviving:
                        part_dir = os.path.join(self.path, name)
                        if os.path.isdir(part_dir):
                            shutil.rmtree(part_dir, ignore_errors=True)
            else:
                stage_base = os.path.basename(staging)
                for name in os.listdir(self.path):
                    if name.startswith((".", "_")) or name == stage_base:
                        continue
                    target = os.path.join(self.path, name)
                    if os.path.isdir(target):
                        shutil.rmtree(target)
                    else:
                        os.remove(target)
                for name in os.listdir(staging):
                    if name.startswith("."):
                        continue
                    os.rename(
                        os.path.join(staging, name), os.path.join(self.path, name)
                    )
        finally:
            shutil.rmtree(staging, ignore_errors=True)

        with open(self._schema_sidecar, "w", encoding="utf-8") as fh:
            json.dump(merged.schema.jsonValue(), fh)
