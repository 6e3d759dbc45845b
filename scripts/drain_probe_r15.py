"""Round-15 streaming-drain probe (VERDICT r14 item 3): ~25 bench rows
each pay a fixed availableNow drain cost (~0.8-1.0 s claimed: stream
planning + state-store lifecycle + memory sink). Measure WHERE it goes
(Spark's own durationMs breakdown per micro-batch) and whether the
RocksDB state-store provider or a state-partition change moves the
floor, on the MINIMAL stateful drain (the streaming_tumbling_counts
shape).

Run solo: python scripts/drain_probe_r15.py
"""

from __future__ import annotations

import os
import sys
import time
import uuid

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from buskafkasparkstreaming_spark import get_spark  # noqa: E402
from buskafkasparkstreaming_spark.streaming import windows as SW  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

ROCKSDB = (
    "org.apache.spark.sql.execution.streaming."
    "state.RocksDBStateStoreProvider"
)


def drain(spark, state_partitions, provider=None):
    """One availableNow drain of the minimal stateful aggregation;
    returns (wall_s, durationMs dict of the final batch)."""
    conf_sp = "spark.sql.shuffle.partitions"
    conf_prov = "spark.sql.streaming.stateStore.providerClass"
    prev_sp = spark.conf.get(conf_sp)
    prev_prov = spark.conf.get(conf_prov, None)
    agg = (
        SW.read_events_stream(spark, SF_DIR)
        .withWatermark("ts", "2 hours")
        .groupBy(F.window("ts", "1 hour"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    name = f"probe_{uuid.uuid4().hex[:8]}"
    t0 = time.perf_counter()
    try:
        spark.conf.set(conf_sp, str(state_partitions))
        if provider is not None:
            spark.conf.set(conf_prov, provider)
        q = (
            agg.writeStream.format("memory")
            .queryName(name)
            .outputMode("update")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        wall = time.perf_counter() - t0
        prog = q.recentProgress
        dur = prog[-1]["durationMs"] if prog else {}
        n_batches = len(prog)
    finally:
        spark.conf.set(conf_sp, prev_sp)
        if provider is not None:
            if prev_prov is None:
                spark.conf.unset(conf_prov)
            else:
                spark.conf.set(conf_prov, prev_prov)
    spark.catalog.dropTempView(name)
    return wall, dur, n_batches


def main() -> None:
    spark = get_spark(app_name="r15-drain-probe")
    spark.sparkContext.setLogLevel("ERROR")
    # warm-up: codegen + file-source listing + state-store classloading
    drain(spark, 8)
    for label, sp, prov in (
        ("hdfs sp=8 (current)", 8, None),
        ("hdfs sp=4", 4, None),
        ("hdfs sp=1", 1, None),
        ("rocksdb sp=8", 8, ROCKSDB),
        ("rocksdb sp=4", 4, ROCKSDB),
        ("hdfs sp=8 again", 8, None),
    ):
        walls, durs = [], None
        for _ in range(3):
            w, d, nb = drain(spark, sp, prov)
            walls.append(w)
            durs = d
        print(
            f"{label:22s} min {min(walls):.3f}s walls="
            f"{['%.2f' % w for w in walls]} batches={nb} durationMs={durs}",
            flush=True,
        )
    spark.stop()


if __name__ == "__main__":
    main()
