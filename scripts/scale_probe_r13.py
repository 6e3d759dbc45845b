"""Round-13 scale probe: the MANIFEST METADATA growth wall (VERDICT r12
"What's missing #2" / punch-list item 5).

The ManifestUpsertTable commit path is O(live objects) in metadata: every
commit re-serializes the FULL partitions/stats/num_rows maps into one
JSON object, and every read re-parses it. The compaction executor made
the manifest a real lakehouse, so before a future round meets it at 100x
objects, measure where the single-JSON design actually hurts:

  1. metadata-only costs at 1k / 10k / 100k objects — serialize, parse,
     the _carry_num_rows dict pass, and compaction_plan's inventory
     build (format 2 reads num_rows FROM the manifest: zero footer
     walks, so this is pure dict work);
  2. real end-to-end commit latency growth: merge #2 vs merge #20 on a
     live table whose object count grows each tick (the 30 s-ingest
     decay mode compact() exists for).

Run solo:  python scripts/scale_probe_r13.py
Results land in SCALE.md's round-13 section (measured, not guessed).

Sharding decision input: Iceberg splits exactly this metadata into
per-snapshot manifest FILES + a manifest LIST; our equivalent would be
per-partition manifests + a root pointer. The probe quantifies at what
object count that indirection pays locally.
"""

from __future__ import annotations

import json
import os
import shutil
import tempfile
import time


def synth_manifest(n_objects: int, keys_per_part: int = 100) -> dict:
    parts = {}
    num_rows = {}
    stats = {}
    for p in range(max(1, n_objects // keys_per_part)):
        keys = [
            f"data/{p:06d}tx/{i:016x}.parquet" for i in range(keys_per_part)
        ]
        parts[str(p)] = keys
        for i, k in enumerate(keys):
            num_rows[k] = 1000 + i
            stats[k] = {"value": [float(i), float(i + 50)]}
    return {
        "format": 2,
        "version": 7,
        "partitions": parts,
        "schema": {"type": "struct", "fields": []},
        "stats": stats,
        "num_rows": num_rows,
    }


def time_metadata(n: int) -> dict:
    m = synth_manifest(n)
    t0 = time.perf_counter()
    body = json.dumps(m)
    t_ser = time.perf_counter() - t0
    t0 = time.perf_counter()
    m2 = json.loads(body)
    t_par = time.perf_counter() - t0
    live = {k for keys in m2["partitions"].values() for k in keys}
    t0 = time.perf_counter()
    carried = {
        k: int(v) for k, v in m2["num_rows"].items() if k in live
    }
    t_carry = time.perf_counter() - t0
    nr = m2["num_rows"]
    t0 = time.perf_counter()
    inv = [
        (val, key, int(nr[key]))
        for val, keys in sorted(m2["partitions"].items())
        for key in keys
    ]
    t_inv = time.perf_counter() - t0
    assert len(carried) == len(live) == len(inv)
    return {
        "objects": n,
        "json_bytes": len(body),
        "serialize_s": round(t_ser, 4),
        "parse_s": round(t_par, 4),
        "carry_num_rows_s": round(t_carry, 4),
        "plan_inventory_s": round(t_inv, 4),
    }


def real_commit_growth() -> list[dict]:
    from pyspark.sql import functions as F

    from buskafkasparkstreaming_spark import get_spark
    from buskafkasparkstreaming_spark.cdc.manifest_table import (
        ManifestUpsertTable,
    )

    spark = get_spark(shuffle_partitions=8)
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    base = tempfile.mkdtemp(prefix="bss_r13_probe_")
    out = []
    try:
        t = ManifestUpsertTable(
            spark,
            os.path.join(base, "tbl"),
            key_cols="k",
            precombine_col="et",
            partition_col="p",
            stats_cols=["v"],
        )
        for i in range(20):
            # DISJOINT partition ranges per merge: objects ACCUMULATE
            # (merge rewrites only touched partitions — same-partition
            # re-merges would rewrite in place and plateau the count,
            # hiding exactly the growth this probe measures)
            df = spark.range(i * 500, (i + 1) * 500).select(
                F.col("id").alias("k"),
                (F.col("id") % 7).cast("double").alias("v"),
                (F.lit(i * 8) + F.col("id") % 8).cast("int").alias("p"),
                F.lit(i).alias("et"),
            )
            t0 = time.perf_counter()
            t.merge(df)
            dt = time.perf_counter() - t0
            m = t._current_manifest()
            n_obj = sum(len(v) for v in m["partitions"].values())
            if i in (1, 5, 10, 19):
                out.append(
                    {"merge_i": i, "objects": n_obj,
                     "commit_s": round(dt, 3)}
                )
    finally:
        shutil.rmtree(base, ignore_errors=True)
        spark.conf.set("spark.sql.adaptive.enabled", "true")
    return out


if __name__ == "__main__":
    for n in (1_000, 10_000, 100_000):
        print(json.dumps(time_metadata(n)))
    for row in real_commit_growth():
        print(json.dumps(row))
