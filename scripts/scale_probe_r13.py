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


def reservoir_scale() -> list[dict]:
    """weighted_reservoir_tiers at 1x vs 10x documents: output stays
    exactly k rows per stratum (the reservoir's whole claim), the
    phase-2 exact rank always runs on a k-bounded survivor set, and
    wall tracks the SCAN (phase-1 local ranks), not a per-stratum
    funnel."""
    import time as _t

    from pyspark.sql import functions as F

    from buskafkasparkstreaming_spark import get_spark
    from buskafkasparkstreaming_spark.operators.sampling import (
        weighted_reservoir_tiers,
    )
    from buskafkasparkstreaming_spark.sources.files import read_table

    spark = get_spark(shuffle_partitions=32)
    sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    docs = read_table(spark, sf, "documents").filter(
        F.col("doc_id").isNotNull() & F.col("lang").isNotNull()
    ).select(
        "lang",
        "doc_id",
        F.expr("least(8, 1 + coalesce(n_chars, 0) div 256)")
        .cast("long")
        .alias("w"),
    )
    big = docs.crossJoin(
        spark.range(10).select(F.col("id").alias("__c"))
    ).select(
        "lang",
        (F.col("doc_id") + F.col("__c") * F.lit(10**12)).alias("doc_id"),
        "w",
    )
    out = []
    for tag, df in (("1x", docs), ("10x", big)):
        t0 = _t.perf_counter()
        res = weighted_reservoir_tiers(
            df, id_col="doc_id", weight_col="w", stratum_col="lang",
            k=8, salt="probe", max_weight=8,
        )
        per = {
            r["lang"]: r["n"]
            for r in res.groupBy("lang")
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()
        }
        out.append(
            {"tag": tag, "wall_s": round(_t.perf_counter() - t0, 2),
             "rows_per_stratum": per}
        )
    return out


def grouped_entries_scale() -> list[dict]:
    """q_group_mannwhitney and q_cohort_retention_daily at 1x vs 10x
    events (id-offset replication): wall must track the scan + the
    range/hash exchanges, never a per-group funnel. The Mann-Whitney
    per-(type, cents) frame grows ~10x in rows but the per-type
    reduction stays type-cardinality-sized; the cohort matrix's
    user-keyed aggregate grows 10x map-side while cells stay
    calendar-bounded."""
    import time as _t

    from pyspark.sql import functions as F

    from buskafkasparkstreaming_spark import get_spark
    from buskafkasparkstreaming_spark.sources.files import read_table

    import __spark_entry__ as mod

    spark = get_spark(shuffle_partitions=32)
    sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    ev = read_table(spark, sf, "events")
    big = ev.crossJoin(
        spark.range(10).select(F.col("id").alias("__c"))
    ).select(
        (F.col("event_id") + F.col("__c") * F.lit(10**12)).alias(
            "event_id"
        ),
        "ts",
        (F.col("user_id") + F.col("__c") * F.lit(10**12)).alias(
            "user_id"
        ),
        "event_type",
        "value",
        "props",
    )
    big_dir = tempfile.mkdtemp(prefix="bss_r13_grp_")
    out = []
    try:
        big.write.mode("overwrite").parquet(
            os.path.join(big_dir, "events.parquet")
        )
        for t in (
            "region nation customer supplier part orders lineitem "
            "documents embeddings"
        ).split():
            os.symlink(
                os.path.join(sf, f"{t}.parquet"),
                os.path.join(big_dir, f"{t}.parquet"),
            )
        for name in ("q_group_mannwhitney", "q_cohort_retention_daily"):
            fn = mod.queries()[name]
            for tag, d in (("1x", sf), ("10x", big_dir)):
                fn(spark, d).count()  # warm
                t0 = _t.perf_counter()
                n = fn(spark, d).count()
                out.append(
                    {"entry": name, "tag": tag,
                     "wall_s": round(_t.perf_counter() - t0, 2),
                     "rows": n}
                )
    finally:
        shutil.rmtree(big_dir, ignore_errors=True)
    return out


if __name__ == "__main__":
    for n in (1_000, 10_000, 100_000):
        print(json.dumps(time_metadata(n)))
    for row in real_commit_growth():
        print(json.dumps(row))
    for row in reservoir_scale():
        print(json.dumps(row))
    for row in grouped_entries_scale():
        print(json.dumps(row))
