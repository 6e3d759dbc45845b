"""Round-11 SECOND-WAVE operator scale probes:

1. grouped_ntile (`q_segment_lift` core) at 1x / 10x customers — the
   per-segment ranking is ONE range repartition on the composite
   (segment, spend, custkey) order + a |groups|-row broadcast: ~linear
   in rows, NEVER a single-task-per-segment sort (the plan Window
   formulation would put each segment's full sort in one task).
2. skyline_nd (`q_skyline3_lineitems` core) at 1x / 10x lineitems —
   phase 1 is an embarrassingly parallel per-partition sweep (zero
   exchanges), phase 2 a coalesce(1) over the LOCAL-FRONTIER union, so
   the curve is ~linear scan and the phase-2 input is reported
   (frontier-bounded, not data-bounded).
3. reservoir_per_key state boundedness — like the streaming skyline,
   the 100 TB claim is STATE SIZE: exactly k (prio, id) pairs per key
   no matter how many rows stream through. The probe drains 1x and
   10x streams and prints reservoir size vs rows consumed per key.

Methodology of scale_probe.py: steady-state second run per shape.
Run SOLO: `python scripts/scale_probe_r11b.py`.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import Window, functions as F

from buskafkasparkstreaming_spark import get_spark
from buskafkasparkstreaming_spark.operators.windows_fn import (
    grouped_ntile,
    skyline_nd,
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


def replicate(df, copies, id_col, id_stride):
    return df.crossJoin(
        F.broadcast(
            df.sparkSession.range(copies).select(F.col("id").alias("__copy"))
        )
    ).withColumn(id_col, F.col(id_col) + F.col("__copy") * F.lit(id_stride))


def main() -> None:
    spark = get_spark(shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")

    # --- 1. grouped_ntile over per-customer spend ---------------------
    orders = read_table(spark, SF_DIR, "orders")
    cust = read_table(spark, SF_DIR, "customer").select(
        F.col("c_custkey").alias("custkey"),
        F.col("c_mktsegment").alias("segment"),
    )

    def per_cust(o):
        return o.groupBy(F.col("o_custkey").alias("custkey")).agg(
            F.sum(F.round(F.col("o_totalprice") * 100).cast("long"))
            .cast("long")
            .alias("spend_cents")
        )

    base = per_cust(orders).join(cust, "custkey")
    big_orders = replicate(orders, COPIES, "o_custkey", 10_000_000)
    big_cust = replicate(cust, COPIES, "custkey", 10_000_000)
    big = per_cust(big_orders).join(big_cust, "custkey")

    def run_gn(df):
        return (
            grouped_ntile(
                df,
                ["segment"],
                [F.col("spend_cents").desc(), F.col("custkey").asc()],
                5,
                "quintile",
            )
            .groupBy("segment", "quintile")
            .count()
            .count()
        )

    t1 = timed("grouped_ntile 1x", lambda: run_gn(base))
    t10 = timed(f"grouped_ntile {COPIES}x", lambda: run_gn(big))
    print(f"grouped_ntile ratio: {t10 / t1:.1f}x for {COPIES}x rows")

    # --- 2. skyline_nd over lineitem dims ------------------------------
    li = read_table(spark, SF_DIR, "lineitem")
    pts = li.select(
        F.round(F.col("l_extendedprice") * 100).cast("long").alias("a"),
        F.datediff(F.col("l_shipdate"), F.lit("1970-01-01").cast("date"))
        .cast("long")
        .alias("b"),
        F.round(F.col("l_quantity") * 100).cast("long").alias("c"),
    )
    # replicate by jittering the price so copies aren't pure duplicates
    big_pts = pts.crossJoin(
        F.broadcast(spark.range(COPIES).select(F.col("id").alias("__copy")))
    ).withColumn("a", F.col("a") + F.col("__copy")).drop("__copy")

    def run_sky(df):
        out = skyline_nd(df, ["a", "b"], ["c"])
        n = out.count()
        return n

    t1 = timed("skyline_nd 1x", lambda: run_sky(pts))
    t10 = timed(f"skyline_nd {COPIES}x", lambda: run_sky(big_pts))
    print(f"skyline_nd ratio: {t10 / t1:.1f}x for {COPIES}x rows")
    print(f"skyline_nd frontier sizes: 1x={run_sky(pts)}, "
          f"{COPIES}x={run_sky(big_pts)}")

    # --- 3. reservoir state boundedness --------------------------------
    from buskafkasparkstreaming_spark.streaming.state import reservoir_per_key
    from buskafkasparkstreaming_spark.streaming.windows import run_to_memory
    import tempfile

    ev = read_table(spark, SF_DIR, "events").filter(
        F.col("event_type").isNotNull() & F.col("event_id").isNotNull()
    ).select("event_type", F.col("event_id").alias("id"))
    import shutil

    for tag, df in (("1x", ev), (f"{COPIES}x", replicate(ev, COPIES, "id", 10**12))):
        # per-invocation dir removed in a finally (the prmon pattern,
        # round-13 fleet conversion); both reads collect before cleanup
        d = tempfile.mkdtemp(prefix="bss_res_probe_")
        try:
            df.write.mode("overwrite").parquet(d)
            schema = spark.read.parquet(d).schema
            stream = spark.readStream.schema(schema).format("parquet").load(d)
            out = reservoir_per_key(stream, k=8, key_col="event_type", id_col="id")
            res = run_to_memory(out, spark, output_mode="update")
            agg = res.groupBy("event_type").agg(
                F.max("n_seen").alias("n"),
            ).collect()
            rows_per_key = {r["event_type"]: r["n"] for r in agg}
            state_rows = (
                res.withColumn(
                    "mx", F.max("n_seen").over(Window.partitionBy("event_type"))
                )
                .filter(F.col("n_seen") == F.col("mx"))
                .groupBy("event_type")
                .count()
                .collect()
            )
            sizes = {r["event_type"]: r["count"] for r in state_rows}
            print(f"reservoir {tag}: rows/key={rows_per_key} state/key={sizes}")
        finally:
            shutil.rmtree(d, ignore_errors=True)

    spark.stop()


if __name__ == "__main__":
    main()
