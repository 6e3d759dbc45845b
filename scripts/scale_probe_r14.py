"""Round-14 scale probe: the live grouped-statistics twins at 10x.

The two round-14 streaming entries claim DOMAIN-bounded state and a
drain contract strong enough that the post-drain statistic matches the
batch machinery exactly. Before the window rotation hands them to the
driver (round 15), measure both claims at sf0.1 (10x the parity SF):

  1. `streaming_group_mannwhitney` — the update-mode monotone cell fold:
     the drained componentwise-max cells must make the live U output
     EQUAL the batch q_group_mannwhitney output bit-for-bit (same rows,
     same floats — the oracle-verbatim contract, asserted directly
     engine-side here, no DuckDB in the loop), and the state row count
     (types x distinct cents) is recorded against the event row count.
  2. `streaming_group_spearman` — the append-mode emission rule: the
     hour-axis cells are a strict subset of (type, cents, hour) space;
     record cells vs rows and the per-type n against the batch trend's
     (the live n excludes only the final partial hour by construction —
     probe asserts n_live <= n_batch with equality iff max ts closes an
     hour).

Run solo:  python scripts/scale_probe_r14.py
Results land in SCALE.md's round-14 section (measured, not guessed).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

import __spark_entry__ as mod
from buskafkasparkstreaming_spark import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    spark = get_spark(app_name="r14-scale-probe")
    spark.sparkContext.setLogLevel("ERROR")

    events = spark.read.parquet(f"{SF_DIR}/events.parquet")
    n_rows = events.count()
    print(f"events rows at {SF_DIR}: {n_rows}")

    # --- 1. live U == batch U, bit-for-bit -----------------------------
    t0 = time.perf_counter()
    live = mod.streaming_group_mannwhitney(spark, SF_DIR)
    live_rows = sorted(map(tuple, live.collect()))
    t_live = time.perf_counter() - t0
    t0 = time.perf_counter()
    batch_rows = sorted(
        map(tuple, mod.q_group_mannwhitney(spark, SF_DIR).collect())
    )
    t_batch = time.perf_counter() - t0
    assert live_rows == batch_rows, (live_rows[:2], batch_rows[:2])
    print(
        f"U twin: live == batch EXACTLY ({len(live_rows)} types); "
        f"live {t_live:.2f}s vs batch {t_batch:.2f}s"
    )
    cells = (
        events.filter(
            F.col("value").isNotNull()
            & F.col("user_id").isNotNull()
            & F.col("event_type").isNotNull()
        )
        .select("event_type", F.round(F.col("value") * 100).alias("c"))
        .distinct()
        .count()
    )
    print(
        f"U twin state bound: {cells} (type, cents) cells for {n_rows} rows"
        f" = {cells / max(n_rows, 1):.3f} of row count"
    )

    # --- 2. spearman twin: emission-rule subset ------------------------
    t0 = time.perf_counter()
    live_tr = {
        r["event_type"]: r["n"]
        for r in mod.streaming_group_spearman(spark, SF_DIR).collect()
    }
    t_live_tr = time.perf_counter() - t0
    batch_tr = {
        r["event_type"]: r["n"]
        for r in mod.q_group_spearman_trend(spark, SF_DIR).collect()
    }
    assert set(live_tr) <= set(batch_tr), (live_tr, batch_tr)
    for g, n_live in live_tr.items():
        assert n_live <= batch_tr[g], (g, n_live, batch_tr[g])
    dropped = {g: batch_tr[g] - live_tr.get(g, 0) for g in batch_tr}
    print(
        f"spearman twin: live n <= batch n per type OK; rows outside "
        f"emitted hours per type: {dropped}; live drain+stat "
        f"{t_live_tr:.2f}s"
    )
    spark.stop()


if __name__ == "__main__":
    main()
