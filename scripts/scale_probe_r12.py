"""Round-12 operator scale probes:

1. grouped_running_sum (`q_group_ks` core) at 1x / 10x distinct
   (group, value) rows — the per-group running CDF must ride ONE range
   repartition on the composite order + a balanced __pid hash exchange
   + bounded collects, so the curve is ~linear in the value axis and
   NEVER a single-task-per-group window (5 groups at 100 TB would be
   5 straggler tasks under Window.partitionBy).
2. plan_compaction (`manifest_compaction_plan` core) at 1x / 10x
   objects — one hash shuffle on the partition value + a per-partition
   sequential FFD in applyInPandas: ~linear in objects; the planner's
   unit is OBJECTS (manifest metadata), which at 100 TB is ~1e5-1e6
   rows, not data rows.
3. Weighted-reservoir state boundedness — like the uniform reservoir,
   the 100 TB claim is STATE SIZE: exactly k (prio, id, w) triples per
   key regardless of input length, with per-row cost O(w) md5s
   (w <= 8 by tier contract). The probe drains 1x and 10x row streams
   and prints final state rows vs rows consumed per key.

Methodology of scale_probe.py: steady-state second run per shape.
Run SOLO: `python scripts/scale_probe_r12.py`.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from buskafkasparkstreaming_spark import get_spark
from buskafkasparkstreaming_spark.operators.packing import plan_compaction
from buskafkasparkstreaming_spark.operators.windows_fn import (
    grouped_running_sum,
)
from buskafkasparkstreaming_spark.sources.files import read_table

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
COPIES = int(os.environ.get("BSS_SCALE_COPIES", "10"))


def timed(label, fn, runs=2):
    t = None
    for _ in range(runs):
        t0 = time.perf_counter()
        fn()
        t = time.perf_counter() - t0
    print(f"{label}: {t:.2f} s")
    return t


def main() -> None:
    spark = get_spark(shuffle_partitions=32)
    orders = read_table(spark, SF_DIR, "orders").filter(
        F.col("o_totalprice").isNotNull()
    )

    def per_value(mult: int):
        base = orders.select(
            F.col("o_orderpriority").alias("seg"),
            (F.round(F.col("o_totalprice") * 100).cast("long")).alias("v"),
        )
        if mult > 1:
            # synthetic distinct values: shift each copy's value axis
            base = base.crossJoin(
                spark.range(mult).select(F.col("id").alias("c"))
            ).select("seg", (F.col("v") * mult + F.col("c")).alias("v"))
        return base.groupBy("seg", "v").agg(
            F.count(F.lit(1)).cast("long").alias("d")
        )

    def run_grs(mult: int):
        out = grouped_running_sum(
            per_value(mult), ["seg"], [F.col("v").asc()], ["d"]
        )
        out.groupBy("seg").agg(F.max("d")).collect()

    t1 = timed("grouped_running_sum 1x", lambda: run_grs(1))
    t10 = timed(f"grouped_running_sum {COPIES}x", lambda: run_grs(COPIES))
    print(f"grouped_running_sum wall ratio at {COPIES}x rows: "
          f"{t10 / t1:.1f}x")

    ev = read_table(spark, SF_DIR, "events").filter(
        F.col("ts").isNotNull() & F.col("event_type").isNotNull()
    )

    def inventory(mult: int):
        H = 3600000
        base = ev.select(
            F.col("event_type").alias("part"),
            (F.unix_millis(F.col("ts"))).alias("ms"),
        )
        inv = (
            base.select(
                "part", F.expr(f"(ms - pmod(ms, {H})) DIV {H}").alias("h")
            )
            .groupBy("part", "h")
            .agg(F.count(F.lit(1)).cast("long").alias("n"))
        )
        if mult > 1:
            inv = inv.crossJoin(
                spark.range(mult).select(F.col("id").alias("c"))
            ).select(
                "part",
                (F.col("h") * mult + F.col("c")).alias("h"),
                "n",
            )
        return inv.withColumn("obj", F.col("h").cast("string"))

    def run_plan(mult: int):
        plan_compaction(
            inventory(mult), "part", "obj", "n", budget=64
        ).groupBy("part").agg(F.max("bin_in_part")).collect()

    p1 = timed("plan_compaction 1x", lambda: run_plan(1))
    p10 = timed(f"plan_compaction {COPIES}x", lambda: run_plan(COPIES))
    print(f"plan_compaction wall ratio at {COPIES}x objects: "
          f"{p10 / p1:.1f}x")

    # weighted reservoir: state boundedness via the batch-equivalent
    # fold (the oracle form) — state is top-k per key BY CONSTRUCTION;
    # probe that the pool the tracker would hold is exactly k at 1x
    # and 10x input rows
    from pyspark.sql import Window as W

    def wres_state(mult: int):
        rows = ev.select(
            "event_type",
            F.col("event_id").alias("id"),
            F.expr(
                "least(8, 1 + coalesce(length(props), 0) div 16)"
            ).cast("long").alias("w"),
        ).filter(F.col("id").isNotNull())
        if mult > 1:
            rows = rows.crossJoin(
                spark.range(mult).select(F.col("id").alias("c"))
            ).select(
                "event_type", (F.col("id") * mult + F.col("c")).alias("id"),
                "w",
            )
        n_rows = rows.count()
        drawn = rows.withColumn(
            "prio",
            F.greatest(*[
                F.when(F.col("w") >= j,
                       F.md5(F.concat_ws(":", F.col("id"), F.lit(j),
                                         F.lit("stream-wres"))))
                for j in range(1, 9)
            ]),
        )
        w_rank = W.partitionBy("event_type").orderBy(
            F.col("prio").desc(), F.col("id").asc(), F.col("w").asc()
        )
        kept = (
            drawn.withColumn("rn", F.row_number().over(w_rank))
            .filter(F.col("rn") <= 8)
            .groupBy("event_type")
            .count()
            .collect()
        )
        state = {r["event_type"]: r["count"] for r in kept}
        print(f"  rows={n_rows} state rows/key={state}")

    print("weighted reservoir state at 1x:")
    wres_state(1)
    print(f"weighted reservoir state at {COPIES}x:")
    wres_state(COPIES)
    spark.stop()


if __name__ == "__main__":
    main()
