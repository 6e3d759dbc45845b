"""Object-store manifest-table protocol (SCALE.md S3 committer,
implemented locally): write-once objects, manifest-pointer reads,
crash = unreferenced keys, deferred GC."""

from __future__ import annotations

import glob
import os

from pyspark.sql import functions as F

from buskafkasparkstreaming_spark.cdc.manifest_table import ManifestUpsertTable


def _table(spark, tmp_path, **kw):
    return ManifestUpsertTable(
        spark,
        str(tmp_path / "tbl"),
        key_cols="k",
        precombine_col="et",
        partition_col=kw.pop("partition_col", "p"),
        **kw,
    )


def _state(t):
    return {(r.k, r.v, r.p) for r in t.read().select("k", "v", "p").collect()}


def test_manifest_merge_semantics(spark, tmp_path):
    """Insert, update (later precombine wins), late duplicate loses,
    delete tombstone, idempotent replay — Hudi semantics through the
    manifest protocol."""
    t = _table(spark, tmp_path)
    b1 = spark.createDataFrame(
        [(1, 10, 0, 100), (2, 10, 1, 100), (3, 10, 0, 100)],
        "k int, v int, p int, et int",
    )
    t.merge(b1)
    assert _state(t) == {(1, 10, 0), (2, 10, 1), (3, 10, 0)}
    assert t.version() == 0

    b2 = spark.createDataFrame(
        [
            (1, 99, 0, 200),   # update wins (later et)
            (2, 55, 1, 50),    # late duplicate must lose
            (3, 0, 0, 300),    # tombstone
        ],
        "k int, v int, p int, et int",
    ).withColumn("del", F.col("k") == 3)
    t.merge(b2, delete_col="del")
    assert _state(t) == {(1, 99, 0), (2, 10, 1)}
    assert t.version() == 1

    t.merge(b2, delete_col="del")  # replay: state unchanged
    assert _state(t) == {(1, 99, 0), (2, 10, 1)}


def test_manifest_crash_leaves_old_state(spark, tmp_path):
    """A writer that dies before the manifest PUT leaves only
    unreferenced objects: readers still resolve the previous state, and
    vacuum removes the orphans."""
    t = _table(spark, tmp_path)
    t.merge(
        spark.createDataFrame([(1, 10, 0, 100)], "k int, v int, p int, et int")
    )
    s1 = _state(t)
    t.merge(
        spark.createDataFrame([(1, 20, 0, 200)], "k int, v int, p int, et int")
    )
    # simulate: the v1 manifest PUT never happened
    mdir = str(tmp_path / "tbl" / "_manifests")
    newest = sorted(os.listdir(mdir))[-1]
    os.remove(os.path.join(mdir, newest))
    assert _state(t) == s1  # reader sees the old file set, never a mix
    orphans = t.vacuum()
    assert orphans  # the unreferenced v1 objects were collected
    assert _state(t) == s1


def test_manifest_vacuum_keeps_live_objects(spark, tmp_path):
    t = _table(spark, tmp_path)
    for et, v in ((100, 1), (200, 2), (300, 3)):
        t.merge(
            spark.createDataFrame(
                [(1, v, 0, et)], "k int, v int, p int, et int"
            )
        )
    n_before = len(glob.glob(str(tmp_path / "tbl" / "data" / "*" / "*.parquet")))
    removed = t.vacuum()
    assert removed  # superseded versions collected
    n_after = len(glob.glob(str(tmp_path / "tbl" / "data" / "*" / "*.parquet")))
    assert n_after < n_before
    assert _state(t) == {(1, 3, 0)}
    # only one manifest retained
    assert len(os.listdir(str(tmp_path / "tbl" / "_manifests"))) == 1


def test_manifest_unpartitioned_and_escaped_values(spark, tmp_path):
    t = ManifestUpsertTable(
        spark,
        str(tmp_path / "flat"),
        key_cols="k",
        precombine_col="et",
    )
    t.merge(spark.createDataFrame([(1, 5, 100)], "k int, v int, et int"))
    assert {(r.k, r.v) for r in t.read().collect()} == {(1, 5)}

    e = ManifestUpsertTable(
        spark,
        str(tmp_path / "esc"),
        key_cols="k",
        precombine_col="et",
        partition_col="route",
    )
    e.merge(
        spark.createDataFrame(
            [(1, 1, "bus:510", 100), (2, 2, None, 100)],
            "k int, v int, route string, et int",
        )
    )
    got = {(r.k, r.route) for r in e.read().collect()}
    assert got == {(1, "bus:510"), (2, None)}


def test_manifest_table_as_streaming_cdc_sink(spark, tmp_path):
    """The manifest table is a drop-in sink for the streaming CDC pipeline
    (duck-typed on merge): the golden envelope fixture lands with the same
    latest-state semantics as the rename-committer table."""
    from buskafkasparkstreaming_spark.schemas import BUS_STATUS_SCHEMA
    from buskafkasparkstreaming_spark.sources.files import stream_envelope_jsonl
    from buskafkasparkstreaming_spark.streaming.pipeline import run_cdc_pipeline
    from tests.test_cdc import FIXTURE, write_jsonl

    spool = tmp_path / "spool"
    spool.mkdir()
    write_jsonl(spool / "batch1.jsonl", FIXTURE)
    table = ManifestUpsertTable(
        spark,
        str(tmp_path / "tbl"),
        key_cols="record_id",
        precombine_col="event_time",
        partition_col="routeId",
    )
    q = run_cdc_pipeline(
        stream_envelope_jsonl(spark, str(spool)),
        table,
        str(tmp_path / "ckpt"),
        row_schema=BUS_STATUS_SCHEMA,
    )
    q.awaitTermination()
    state = {
        r["record_id"]: (r["kph"], r["event_time"], r["routeId"])
        for r in table.read().collect()
    }
    assert state == {1: (99, 2000, 7), 2: (20, 1000, 7)}
    assert 3 not in state  # tombstoned


def test_manifest_zone_map_file_skipping(spark, tmp_path):
    """stats_cols lifts per-object min/max from the parquet footers into
    the manifest; read_where skips objects whose range cannot match —
    verified by the (kept, skipped) split AND by result correctness."""
    t = ManifestUpsertTable(
        spark,
        str(tmp_path / "tbl"),
        key_cols="k",
        precombine_col="et",
        partition_col="p",
        stats_cols=["v"],
    )
    # two partitions with DISJOINT value ranges -> distinct objects
    lo_rows = [(i, i, 0, 100) for i in range(100)]          # v in [0, 99]
    hi_rows = [(i + 100, i + 1000, 1, 100) for i in range(100)]  # v in [1000, 1099]
    t.merge(
        spark.createDataFrame(lo_rows + hi_rows, "k int, v int, p int, et int")
    )
    kept, skipped = t.select_objects("v", 1000, 1099)
    assert skipped, "low-range object should be skipped"
    assert kept, "high-range object must be kept"
    got = {r.k for r in t.read_where("v", 1000, 1099).collect()}
    assert got == {i + 100 for i in range(100)}
    # stats are an optimization, not a gate: full read still exact
    assert t.read().count() == 200
    # range overlapping both keeps everything
    k2, s2 = t.select_objects("v", 50, 1050)
    assert not s2


def test_manifest_merge_new_partition_later(spark, tmp_path):
    """A merge introducing a partition value the manifest has never seen
    must land it without touching existing partitions' objects."""
    t = _table(spark, tmp_path)
    t.merge(spark.createDataFrame([(1, 10, 0, 100)], "k int, v int, p int, et int"))
    m0 = t._current_manifest()
    t.merge(spark.createDataFrame([(2, 20, 7, 100)], "k int, v int, p int, et int"))
    m1 = t._current_manifest()
    assert m1["partitions"]["0"] == m0["partitions"]["0"]  # untouched objects
    assert m1["partitions"]["7"]
    assert _state(t) == {(1, 10, 0), (2, 20, 7)}
