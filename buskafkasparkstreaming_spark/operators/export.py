"""Training-data export: deterministic sharding of a curated corpus.

The last step of a data pipeline is writing the corpus as N stable shards
that trainers stream independently (one shard per data-loader worker).
Requirements that rule out the obvious primitives:

* `df.repartition(N)` round-robins rows — assignment changes with
  partitioning, input order, and Spark version; a re-run reshuffles every
  shard and invalidates downstream caching/resume bookkeeping.
* `rand()`-based assignment is irreproducible across retries of a task
  (Spark re-executes lost tasks; nondeterministic columns then disagree
  between a task's first and second run — silent row loss/duplication).

So shard membership is a PURE ROW FUNCTION: the md5 of (id, salt) —
reproducible on any cluster size, any partitioning, any engine (the DuckDB
oracle replays it), and stable under task retry. Same keyed-hash idiom as
operators/sampling.py (reference parity: the reference's Hudi sink fixes
layout by record key + partition path the same way, 01-setup-ec-vm.md:265-269).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def assign_shards(
    df: DataFrame, id_col: str, num_shards: int, salt: str = "shard"
) -> DataFrame:
    """Add a deterministic `shard` column in [0, num_shards).

    shard = int(md5(f"{id}:{salt}")[:4], 16) % num_shards — row-local (no
    shuffle; plan stays a pure Project), uniform for num_shards ≪ 2^16.
    The 16-bit prefix keeps the hex→int arithmetic exactly replayable in
    the SQL oracle; raise to 8 hex chars if you ever need > ~1000 shards
    with tight balance."""
    if not 1 <= num_shards <= 65536:
        raise ValueError("num_shards must be in [1, 65536]")
    hx = F.substring(
        F.md5(F.concat_ws(":", F.col(id_col).cast("string"), F.lit(salt))), 1, 4
    )
    h = F.conv(hx, 16, 10).cast("long")
    return df.withColumn("shard", (h % num_shards).cast("int"))


def write_shards(
    df: DataFrame,
    path: str,
    id_col: str,
    num_shards: int,
    salt: str = "shard",
    mode: str = "overwrite",
) -> None:
    """Write the corpus as `shard=K/` parquet partitions, one file per
    shard.

    `repartition(num_shards, shard)` before `partitionBy` co-locates each
    shard's rows in one task, so each shard directory holds exactly one
    file (hash collisions between shard values only merge TASKS, never
    files — partitionBy still splits by value). Without it, every task
    would open a writer per shard it sees: N_tasks × N_shards small files,
    the classic lakehouse small-file explosion at 100 TB."""
    sharded = assign_shards(df, id_col, num_shards, salt)
    (
        sharded.repartition(num_shards, F.col("shard"))
        .write.partitionBy("shard")
        .mode(mode)
        .parquet(path)
    )
