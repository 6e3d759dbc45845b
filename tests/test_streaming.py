"""Streaming-semantics tests (SURVEY §5.4): watermark late-data handling,
streaming dedup, custom stateful operator, and checkpoint restart."""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from buskafkasparkstreaming_spark.streaming.state import running_per_user
from buskafkasparkstreaming_spark.streaming.windows import run_to_memory, stream_dedup


def write_events_parquet(spark, path, rows):
    """Write ONE flat parquet file at `path` — the file stream source lists
    files non-recursively, so df.write's directory layout won't be seen."""
    import glob
    import os
    import shutil

    df = spark.createDataFrame(
        rows, "event_id bigint, ts timestamp, user_id bigint, value double"
    )
    staging = path + ".staging"
    df.coalesce(1).write.mode("overwrite").parquet(staging)
    part = glob.glob(os.path.join(staging, "part-*.parquet"))[0]
    os.makedirs(os.path.dirname(path), exist_ok=True)
    os.replace(part, path)
    shutil.rmtree(staging, ignore_errors=True)


def read_stream(spark, path, schema, max_files=1):
    return (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", str(max_files))
        .parquet(path)
    )


@pytest.fixture()
def event_rows():
    ts = lambda s: pd.Timestamp(f"2024-01-01 {s}").to_pydatetime()  # noqa: E731
    return [
        (1, ts("10:00:00"), 1, 1.0),
        (2, ts("10:10:00"), 1, 2.0),
        (3, ts("10:05:00"), 2, 3.0),
        (1, ts("10:00:00"), 1, 1.0),  # exact duplicate of event 1
        (4, ts("11:30:00"), 1, 4.0),
    ]


def test_watermark_drops_late_across_restart(spark, tmp_path, event_rows):
    """The watermark persists in the checkpoint: a row arriving behind it in
    a later run must be dropped from aggregation state."""
    ts = lambda s: pd.Timestamp(f"2024-01-01 {s}").to_pydatetime()  # noqa: E731
    in_dir = tmp_path / "in"
    ckpt = str(tmp_path / "ckpt")
    p1 = str(in_dir / "f1.parquet")
    write_events_parquet(spark, p1, [(1, ts("10:00:00"), 1, 1.0), (2, ts("10:20:00"), 1, 1.0)])
    schema = spark.read.parquet(p1).schema

    def agg_of(stream):
        return (
            stream.withWatermark("ts", "10 minutes")
            .groupBy(F.window("ts", "1 hour").alias("win"))
            .agg(F.count(F.lit(1)).alias("n"))
            .select(F.col("win.start").alias("ws"), "n")
        )

    def drain(name):
        # foreachBatch (not memory sink): the memory sink cannot recover
        # from a checkpoint, and this test restarts against one
        rows = []

        def sink(batch_df, batch_id):
            rows.extend(batch_df.collect())

        q = (
            agg_of(read_stream(spark, str(in_dir), schema))
            .writeStream.queryName(name)
            .outputMode("update")
            .option("checkpointLocation", ckpt)
            .foreachBatch(sink)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        return {str(r["ws"]): r["n"] for r in rows}

    run1 = drain("wm_run1")
    assert run1 == {"2024-01-01 10:00:00": 2}
    # after run1 the checkpointed watermark is 10:20 - 10min = 10:10.
    # run2 delivers one on-time row (15:00) and one late row (09:00, behind
    # the watermark) — only the on-time row may create/extend a window.
    write_events_parquet(
        spark,
        str(in_dir / "f2.parquet"),
        [(5, ts("15:00:00"), 1, 1.0), (6, ts("09:00:00"), 1, 9.0)],
    )
    run2 = drain("wm_run2")
    assert run2 == {"2024-01-01 15:00:00": 1}


def test_stream_dedup_exact(spark, tmp_path, event_rows):
    path = str(tmp_path / "in" / "f1.parquet")
    write_events_parquet(spark, path, event_rows)
    schema = spark.read.parquet(path).schema
    stream = read_stream(spark, str(tmp_path / "in"), schema)
    deduped = stream_dedup(stream, ["event_id"], within_watermark=False)
    out = run_to_memory(deduped, spark, output_mode="append")
    assert out.count() == 4  # 5 rows, one exact duplicate event_id


def test_stream_dedup_within_watermark(spark, tmp_path, event_rows):
    path = str(tmp_path / "in" / "f1.parquet")
    write_events_parquet(spark, path, event_rows)
    schema = spark.read.parquet(path).schema
    stream = read_stream(spark, str(tmp_path / "in"), schema)
    deduped = stream_dedup(stream, ["event_id"], within_watermark=True)
    out = run_to_memory(deduped, spark, output_mode="append")
    assert out.count() == 4


def test_stateful_running_per_user(spark, tmp_path, event_rows):
    """applyInPandasWithState accumulator: per-user count/sum survive across
    micro-batches."""
    p1 = str(tmp_path / "in" / "f1.parquet")
    p2 = str(tmp_path / "in" / "f2.parquet")
    ts = lambda s: pd.Timestamp(f"2024-01-01 {s}").to_pydatetime()  # noqa: E731
    write_events_parquet(spark, p1, [(1, ts("10:00:00"), 1, 1.0), (2, ts("10:01:00"), 1, 2.0)])
    write_events_parquet(spark, p2, [(3, ts("10:02:00"), 1, 4.0), (4, ts("10:02:00"), 2, 8.0)])
    schema = spark.read.parquet(p1).schema
    stream = read_stream(spark, str(tmp_path / "in"), schema, max_files=1)
    out = run_to_memory(running_per_user(stream), spark, output_mode="update")
    # update mode emits per batch; take the final row per user
    final = (
        out.withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy("user_id").orderBy(F.col("n_events").desc())
            ),
        )
        .filter("rn = 1")
        .collect()
    )
    state = {r["user_id"]: (r["n_events"], r["total_value"]) for r in final}
    assert state[1] == (3, 7.0)
    assert state[2] == (1, 8.0)


def test_console_debug_sink_runs(spark, tmp_path, capfd):
    """The untruncated console sink (reference S6, 01-setup-ec-vm.md:183)."""
    from buskafkasparkstreaming_spark.schemas import BUS_STATUS_SCHEMA
    from buskafkasparkstreaming_spark.sources.files import stream_envelope_jsonl
    from buskafkasparkstreaming_spark.streaming.pipeline import run_console_debug
    from tests.test_cdc import FIXTURE, write_jsonl

    spool = tmp_path / "spool"
    spool.mkdir()
    write_jsonl(spool / "b1.jsonl", FIXTURE[:2])
    q = run_console_debug(
        stream_envelope_jsonl(spark, str(spool)),
        str(tmp_path / "ckpt"),
        row_schema=BUS_STATUS_SCHEMA,
    )
    q.processAllAvailable()
    q.stop()


def test_append_sink_keeps_history(spark, tmp_path):
    """The append lake sink (reference S8, fixed) retains every change row
    rather than merging — history replay stays possible."""
    from buskafkasparkstreaming_spark.schemas import BUS_STATUS_SCHEMA
    from buskafkasparkstreaming_spark.sources.files import stream_envelope_jsonl
    from buskafkasparkstreaming_spark.streaming.pipeline import run_append_sink
    from tests.test_cdc import FIXTURE, write_jsonl

    spool = tmp_path / "spool"
    spool.mkdir()
    write_jsonl(spool / "b1.jsonl", FIXTURE)
    q = run_append_sink(
        stream_envelope_jsonl(spark, str(spool)),
        str(tmp_path / "lake"),
        str(tmp_path / "ckpt"),
        row_schema=BUS_STATUS_SCHEMA,
    )
    q.awaitTermination()
    lake = spark.read.parquet(str(tmp_path / "lake"))
    assert lake.count() == len(FIXTURE)  # all 6 change rows, incl. the delete
    assert lake.filter("_op = 'd'").count() == 1


def test_checkpoint_restart_no_reprocess(spark, tmp_path):
    """Exactly-once w.r.t. the checkpoint: a restarted query must not
    reprocess files already committed (SURVEY §5.4 kill/restart)."""
    from buskafkasparkstreaming_spark.cdc import UpsertTable
    from buskafkasparkstreaming_spark.schemas import BUS_STATUS_SCHEMA
    from buskafkasparkstreaming_spark.sources.files import stream_envelope_jsonl
    from buskafkasparkstreaming_spark.streaming.pipeline import run_cdc_pipeline
    from tests.test_cdc import FIXTURE, write_jsonl

    spool = tmp_path / "spool"
    spool.mkdir()
    write_jsonl(spool / "b1.jsonl", FIXTURE)
    table = UpsertTable(
        spark,
        str(tmp_path / "tbl"),
        key_cols="record_id",
        precombine_col="event_time",
        partition_col="routeId",
    )
    ckpt = str(tmp_path / "ckpt")
    q = run_cdc_pipeline(
        stream_envelope_jsonl(spark, str(spool)), table, ckpt,
        row_schema=BUS_STATUS_SCHEMA,
    )
    q.awaitTermination()
    first = sorted(
        (r["record_id"], r["kph"], r["event_time"]) for r in table.read().collect()
    )
    # restart against the same checkpoint with no new files: no-op
    q2 = run_cdc_pipeline(
        stream_envelope_jsonl(spark, str(spool)), table, ckpt,
        row_schema=BUS_STATUS_SCHEMA,
    )
    q2.awaitTermination()
    second = sorted(
        (r["record_id"], r["kph"], r["event_time"]) for r in table.read().collect()
    )
    assert first == second == [(1, 99, 2000), (2, 20, 1000)]


def test_enrich_static_matches_batch_join(spark, tmp_path, event_rows):
    """Stream-static broadcast enrichment: the availableNow drain must equal
    the batch left join (stateless pipeline — no watermark, no state)."""
    from buskafkasparkstreaming_spark.streaming.joins import enrich_with_dimension

    path = str(tmp_path / "ev" / "events.parquet")
    write_events_parquet(spark, path, event_rows)
    schema = spark.read.parquet(path).schema
    stream = read_stream(spark, str(tmp_path / "ev"), schema)
    dim = spark.createDataFrame(
        [(1, "gold"), (9, "unused")], "cust_id bigint, tier string"
    )
    enriched = enrich_with_dimension(
        stream, dim, left_on="user_id", right_on="cust_id"
    ).select("event_id", "user_id", "tier")
    out = run_to_memory(enriched, spark, output_mode="append", state_partitions=None)
    got = {(r.event_id, r.user_id, r.tier) for r in out.collect()}
    # user 1 matches "gold"; user 2 has no dim row -> null tier (left join)
    assert got == {(1, 1, "gold"), (2, 1, "gold"), (4, 1, "gold"), (3, 2, None)}
    assert out.count() == len(event_rows)  # one output row per input row


def test_enrich_static_rejects_ambiguous_columns(spark):
    from buskafkasparkstreaming_spark.streaming.joins import enrich_with_dimension

    fact = spark.createDataFrame([(1, "a")], "k bigint, name string")
    dim = spark.createDataFrame([(1, "b")], "k bigint, name string")
    with pytest.raises(ValueError, match="ambiguous"):
        enrich_with_dimension(fact, dim, left_on="k", right_on="k")


def test_rate_limited_drain_same_state(spark, tmp_path):
    """Backpressure: maxFilesPerTrigger=1 paces a 3-file backlog over
    MULTIPLE micro-batches (the restart-after-downtime scenario where an
    unbounded drain would swallow the backlog in one giant batch), and the
    checkpointed exactly-once offsets keep the final table state identical
    to the unpaced drain."""
    import os

    from buskafkasparkstreaming_spark.cdc import UpsertTable
    from buskafkasparkstreaming_spark.schemas import BUS_STATUS_SCHEMA
    from buskafkasparkstreaming_spark.sources.files import stream_envelope_jsonl
    from buskafkasparkstreaming_spark.streaming.pipeline import run_cdc_pipeline

    from .test_cdc import env, write_jsonl

    spool = tmp_path / "spool"
    spool.mkdir()
    # 3 files = a backlog; later files update earlier keys so batch ORDER
    # matters to the merge — pacing must not change the outcome
    write_jsonl(spool / "b1.jsonl", [env("c", 1, 7, 10, 1000), env("c", 2, 7, 20, 1000)])
    write_jsonl(spool / "b2.jsonl", [env("u", 1, 7, 99, 2000)])
    write_jsonl(spool / "b3.jsonl", [env("d", 2, 7, 0, 3000, before=True)])
    # the file source paces batches in mtime order; pin ascending mtimes so
    # the paced replay is deterministic (arrival order, like a topic)
    for i, name in enumerate(("b1.jsonl", "b2.jsonl", "b3.jsonl")):
        os.utime(spool / name, (1_700_000_000 + i, 1_700_000_000 + i))

    def drain(name, **stream_kw):
        table = UpsertTable(
            spark,
            str(tmp_path / name / "tbl"),
            key_cols="record_id",
            precombine_col="event_time",
        )
        ckpt = str(tmp_path / name / "ckpt")
        q = run_cdc_pipeline(
            stream_envelope_jsonl(spark, str(spool), **stream_kw),
            table,
            ckpt,
            row_schema=BUS_STATUS_SCHEMA,
        )
        q.awaitTermination()
        commits = [
            f
            for f in os.listdir(os.path.join(ckpt, "commits"))
            if not f.startswith(".")
        ]
        state = {
            r["record_id"]: (r["kph"], r["event_time"])
            for r in table.read().collect()
        }
        return len(commits), state

    n_paced, paced = drain("paced", max_files_per_trigger=1)
    n_free, free = drain("free")
    assert n_paced == 3, f"expected one micro-batch per file, got {n_paced}"
    assert n_free < n_paced  # the unpaced drain really was one gulp
    assert paced == free == {1: (99, 2000)}


def test_state_store_reader_accounts_for_unemitted_windows(spark, tmp_path):
    """State observability (streaming/state_inspect.py): after an
    append-mode windowed drain, the state store holds EXACTLY the windows
    the watermark has not closed — emitted output + live state = the full
    batch aggregate, and state_metrics sums to the open-window count."""
    import json
    import os

    from pyspark.sql import functions as F

    from buskafkasparkstreaming_spark.streaming.state_inspect import (
        read_state_store,
        state_metrics,
    )

    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    out = str(tmp_path / "out")
    os.makedirs(src)
    with open(os.path.join(src, "a.jsonl"), "w") as fh:
        for i in range(24):
            fh.write(
                json.dumps(
                    {"ts": f"2024-01-01T{i % 12:02d}:30:00", "k": i % 3}
                )
                + "\n"
            )
    stream = spark.readStream.schema("ts timestamp, k bigint").json(src)
    agg = (
        stream.withWatermark("ts", "2 hours")
        .groupBy(F.window("ts", "1 hour").alias("w"), "k")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )
    q = (
        agg.writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    emitted = spark.read.parquet(out).select(
        F.col("w.start").alias("ws"), "k", "n"
    )
    # state rows carry the AGG BUFFER field names (count), not the
    # output aliases — part of what this reader documents
    state = read_state_store(spark, ckpt).select(
        F.col("key.window.start").alias("ws"),
        F.col("key.k").alias("k"),
        F.col("value.count").cast("long").alias("n"),
    )
    batch = (
        spark.read.schema("ts timestamp, k bigint").json(src)
        .groupBy(F.date_trunc("hour", "ts").alias("ws"), "k")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )
    together = emitted.unionByName(state)
    assert together.count() == batch.count()
    assert together.exceptAll(batch).count() == 0
    assert emitted.count() > 0 and state.count() > 0  # both sides non-trivial
    # watermark rule: a window is evicted once its END (ws + 1h) passes
    # the watermark (max event ts - 2h delay) — so live windows satisfy
    # ws >= max_bucket - 2h
    max_ts = batch.agg(F.max("ws")).first()[0]
    late = state.filter(
        F.col("ws") < F.expr(f"timestamp'{max_ts}' - INTERVAL 2 HOURS")
    )
    assert late.count() == 0
    m = {r.partition_id: r.n_keys for r in state_metrics(spark, ckpt).collect()}
    assert sum(m.values()) == state.count()


def test_cap_per_key_tws_or_documented_gate(spark, tmp_path):
    """cap_events_per_key rides the Spark 4 transformWithStateInPandas
    API, whose Python state client requires protobuf. With protobuf
    present: first-N-per-key semantics match the batch window. Without
    (this container): the documented NotImplementedError fires BEFORE
    the query starts — never the opaque mid-query TWS worker crash."""
    import pytest

    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from buskafkasparkstreaming_spark.streaming import windows as SW
    from buskafkasparkstreaming_spark.streaming.state import cap_events_per_key

    stream = SW.read_events_stream(spark, "/root/testdata/sf0.001")
    try:
        import google.protobuf  # noqa: F401
    except ImportError:
        with pytest.raises(NotImplementedError, match="protobuf"):
            cap_events_per_key(stream, n=3)
        return

    capped = cap_events_per_key(stream, n=3)
    out = SW.run_to_memory(capped, spark, output_mode="append")
    batch = spark.read.parquet("/root/testdata/sf0.001/events.parquet").filter(
        F.col("user_id").isNotNull() & F.col("ts").isNotNull()
    )
    w = Window.partitionBy("user_id").orderBy(
        F.col("ts").asc(), F.col("event_id").asc()
    )
    expect = (
        batch.withColumn("rank_in_key", F.row_number().over(w))
        .filter(F.col("rank_in_key") <= 3)
        .select("user_id", "event_id", "ts", "value", "rank_in_key")
    )
    assert out.count() == expect.count()
    assert out.exceptAll(expect).count() == 0


def test_enrich_asof_static_semantics(spark):
    """As-of enrichment edges: a fact before the first dimension version
    enriches NULL; equal-ts dimension duplicates give the earlier row an
    empty interval (the later event_id wins from that instant); facts at
    exactly a version's start ts take that version (half-open
    intervals); the current version is open-ended."""
    from buskafkasparkstreaming_spark.streaming.joins import enrich_asof_static

    def ts(s):
        return f"2024-01-01 0{s}:00:00"

    dim = spark.createDataFrame(
        [
            (1, ts(2), 100, 10),
            (1, ts(4), 101, 20),
            # equal-ts pair: event_id 103 must shadow 102 entirely
            (2, ts(3), 102, 30),
            (2, ts(3), 103, 40),
        ],
        "user_id int, p_ts string, p_event_id int, p_val int",
    ).withColumn("p_ts", F.col("p_ts").cast("timestamp"))
    facts = spark.createDataFrame(
        [(10, 1, ts(1)), (11, 1, ts(2)), (12, 1, ts(5)), (13, 2, ts(3)), (14, 2, ts(6))],
        "event_id int, user_id int, ts string",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    out = enrich_asof_static(
        facts, dim, key_col="user_id", ts_col="ts",
        dim_ts_col="p_ts", tiebreak_col="p_event_id",
    )
    got = {r.event_id: (r.p_event_id, r.p_val) for r in out.collect()}
    assert got == {
        10: (None, None),   # before first version
        11: (100, 10),      # exactly at version start (half-open)
        12: (101, 20),      # open-ended current version
        13: (103, 40),      # equal-ts duplicate: later event_id wins
        14: (103, 40),
    }
    assert out.count() == 5  # exactly one row per fact


def test_enrich_asof_static_rejects_ambiguous_columns(spark):
    """Dim payload columns sharing a name with a stream column would make
    the joined output ambiguous — must fail loudly (ADVICE r8)."""
    import pytest as _pytest

    from buskafkasparkstreaming_spark.streaming.joins import enrich_asof_static

    dim = spark.createDataFrame(
        [(1, "2024-01-01 02:00:00", 1)],
        "user_id int, ts string, p_event_id int",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    facts = spark.createDataFrame(
        [(10, 1, "2024-01-01 03:00:00")],
        "event_id int, user_id int, ts string",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    with _pytest.raises(ValueError, match="ambiguous"):
        enrich_asof_static(
            facts, dim, key_col="user_id", ts_col="ts",
            dim_ts_col="ts", tiebreak_col="p_event_id",
        )


def test_streaming_funnel_timeout_batch_boundary_independent(spark, tmp_path):
    """funnel_timeout_per_user's capped-set state is a mergeable
    semilattice: a 2-file backlog paced one file per micro-batch — with a
    user's view arriving AFTER their click (out-of-order across batches)
    — must produce the same final funnel status as the unpaced drain, and
    both must match the declared semantics (stage within 1 h of the
    previous, fold over distinct kept millis)."""
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    from buskafkasparkstreaming_spark.streaming.state import (
        funnel_timeout_per_user,
    )
    from buskafkasparkstreaming_spark.streaming.windows import run_to_memory

    base = 1_700_000_000_000  # epoch ms
    minute = 60_000
    # user 1 converts (view +0, click +30m, purchase +80m — each stage
    # within 1 h of the previous) but its view arrives in the LATER file;
    # user 2 times out (click 130m after view); user 3 has no view
    b1 = [(1, "click", 30), (2, "view", 0), (3, "click", 5)]
    b2 = [(1, "view", 0), (1, "purchase", 80), (2, "click", 130)]
    d = tmp_path / "ev"
    d.mkdir()
    for i, rows in enumerate((b1, b2)):
        ms = [base + off * minute for (_, _, off) in rows]
        tbl = pa.table(
            {
                "user_id": pa.array([u for (u, _, _) in rows], pa.int64()),
                "event_type": pa.array([t for (_, t, _) in rows]),
                "ms": pa.array(ms, pa.int64()),
                "ts": pa.array([m * 1000 for m in ms], pa.timestamp("us")),
            }
        )
        path = str(d / f"b{i}.parquet")
        pq.write_table(tbl, path)
        os.utime(path, (1_700_000_000 + i, 1_700_000_000 + i))

    schema = spark.read.parquet(str(d)).schema

    def drain(paced: bool):
        reader = spark.readStream.schema(schema).format("parquet")
        if paced:
            reader = reader.option("maxFilesPerTrigger", "1")
        out = funnel_timeout_per_user(reader.load(str(d)))
        res = run_to_memory(out, spark, output_mode="update")
        rows = res.collect()
        final = {}
        for r in rows:
            if r["user_id"] not in final or r["n_seen"] > final[r["user_id"]]["n_seen"]:
                final[r["user_id"]] = r
        return {
            u: (r["t1_ms"], r["t2_ms"], r["t3_ms"], r["converted"])
            for u, r in final.items()
        }

    expected = {
        1: (base, base + 30 * minute, base + 80 * minute, True),
        2: (base, None, None, False),
        3: (None, None, None, False),
    }
    paced = drain(paced=True)
    unpaced = drain(paced=False)
    assert paced == expected, paced
    assert unpaced == expected, unpaced


def test_streaming_funnel_timeout_cap_overflow(spark, tmp_path):
    """Cap semantics: a user with more than `cap` distinct click millis
    keeps only the cap smallest — the declared (and oracle-replayed)
    overflow rule. With cap=4, clicks at +10..+17 m and a view at +0, the
    kept set is {+10..+13 m}, so t2 = +10 m regardless of arrival order;
    a conversion-qualifying purchase rides on the kept t2."""
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    from buskafkasparkstreaming_spark.streaming.state import (
        funnel_timeout_per_user,
    )
    from buskafkasparkstreaming_spark.streaming.windows import run_to_memory

    base = 1_700_000_000_000
    minute = 60_000
    rows = [(1, "view", 0)] + [(1, "click", 10 + i) for i in range(8)] + [
        (1, "purchase", 40)
    ]
    ms = [base + off * minute for (_, _, off) in rows]
    tbl = pa.table(
        {
            "user_id": pa.array([u for (u, _, _) in rows], pa.int64()),
            "event_type": pa.array([t for (_, t, _) in rows]),
            "ms": pa.array(ms, pa.int64()),
            "ts": pa.array([m * 1000 for m in ms], pa.timestamp("us")),
        }
    )
    d = tmp_path / "ev"
    d.mkdir()
    pq.write_table(tbl, str(d / "b0.parquet"))
    schema = spark.read.parquet(str(d)).schema
    stream = spark.readStream.schema(schema).format("parquet").load(str(d))
    out = funnel_timeout_per_user(stream, cap=4)
    res = run_to_memory(out, spark, output_mode="update").collect()
    final = max(res, key=lambda r: r["n_seen"])
    assert final["n_seen"] == 10
    assert final["t1_ms"] == base
    assert final["t2_ms"] == base + 10 * minute  # smallest kept click
    assert final["t3_ms"] == base + 40 * minute
    assert final["converted"] is True


def test_funnel_timeout_kill_restart_equivalence(spark, tmp_path):
    """The stateful funnel's capped state is commutative + idempotent
    across micro-batches, so a KILLED and RESTARTED query (same
    checkpoint, remaining files drained after resume) must land the
    exact same final per-user funnel state as one uninterrupted drain —
    the SURVEY §5.4 kill/restart property for applyInPandasWithState,
    previously pinned only for the CDC merge sink."""
    import os
    import shutil

    from buskafkasparkstreaming_spark.streaming.state import (
        funnel_timeout_per_user,
    )

    ts0 = pd.Timestamp("2024-01-01 10:00:00")

    def ev(eid, user, etype, minute):
        t = (ts0 + pd.Timedelta(minutes=minute)).to_pydatetime()
        return (eid, user, etype, int(t.timestamp() * 1000), t)

    # user 1 converts inside the 5-min stage timeout; user 2's click is
    # too late (timeout); user 3 never purchases. Events are spread over
    # four files so batch boundaries cut through every funnel.
    files = [
        [ev(1, 1, "view", 0), ev(2, 2, "view", 0), ev(3, 3, "view", 1)],
        [ev(4, 1, "click", 2), ev(5, 2, "click", 9)],
        [ev(6, 1, "purchase", 4), ev(7, 3, "click", 3)],
        [ev(8, 2, "purchase", 10), ev(9, 1, "view", 30)],
    ]
    schema = "event_id bigint, user_id bigint, event_type string, ms bigint, ts timestamp"

    def write_file(dirname, i, rows):
        path = str(tmp_path / dirname / f"f{i}.parquet")
        staging = path + ".staging"
        spark.createDataFrame(rows, schema).coalesce(1).write.mode(
            "overwrite"
        ).parquet(staging)
        import glob

        part = glob.glob(os.path.join(staging, "part-*.parquet"))[0]
        os.makedirs(os.path.dirname(path), exist_ok=True)
        shutil.move(part, path)
        shutil.rmtree(staging)
        os.utime(path, (1700000000 + i, 1700000000 + i))  # pin mtime order

    def drain(in_dir, ckpt, out_dir):
        stream = read_stream(
            spark, str(tmp_path / in_dir), spark.read.parquet(
                str(tmp_path / in_dir)
            ).schema, max_files=1,
        )
        # stage timeout 5 min (the funnel logic under test); STATE
        # timeout longer than the data span — GroupStateTimeout fires
        # only in a batch where the group has no input, so a timeout
        # crossed mid-stream is batch-layout-sensitive by engine design
        # (see test_running_and_cusum_kill_restart_equivalence)
        funnel = funnel_timeout_per_user(
            stream, timeout_ms=5 * 60_000, watermark="10 minutes",
            state_timeout_ms=12 * 3600_000,
        )

        def sink(batch_df, _bid):
            batch_df.write.mode("append").parquet(str(tmp_path / out_dir))

        q = (
            funnel.writeStream.foreachBatch(sink)
            .option("checkpointLocation", str(tmp_path / ckpt))
            .trigger(availableNow=True)
            .outputMode("update")
            .start()
        )
        q.awaitTermination()

    def final_state(out_dir):
        rows = spark.read.parquet(str(tmp_path / out_dir)).collect()
        best = {}
        for r in rows:
            k = r["user_id"]
            if k not in best or r["n_seen"] > best[k]["n_seen"]:
                best[k] = r
        return {
            k: (r["n_seen"], r["t1_ms"], r["t2_ms"], r["t3_ms"], r["converted"])
            for k, r in best.items()
        }

    # run A: uninterrupted drain over all four files
    for i, rows in enumerate(files):
        write_file("in_a", i, rows)
    drain("in_a", "ckpt_a", "out_a")

    # run B: drain files 0-1, KILL (query stopped), add files 2-3,
    # resume from the same checkpoint
    for i, rows in enumerate(files[:2]):
        write_file("in_b", i, rows)
    drain("in_b", "ckpt_b", "out_b")
    for i, rows in enumerate(files[2:], start=2):
        write_file("in_b", i, rows)
    drain("in_b", "ckpt_b", "out_b")

    a, b = final_state("out_a"), final_state("out_b")
    assert a == b, (a, b)
    # and the funnel itself folded correctly: 1 converted, 2 timed out
    # at the click stage (9 > 0+5), 3 never purchased
    assert a[1][4] is True and a[1][1] is not None
    assert a[2][4] is False
    assert a[3][4] is False and a[3][3] is None


def test_running_and_cusum_kill_restart_equivalence(spark, tmp_path):
    """The other two applyInPandasWithState trackers get the same
    kill/restart equivalence pin as the funnel: resuming a stopped
    query from its checkpoint over the remaining files must land the
    same final state as one uninterrupted drain — both merges are
    commutative and idempotent, so with state alive to the end the
    final fold is batch-layout-free. The state timeout here is LONGER
    than the data span on purpose: Spark's GroupStateTimeout fires only
    in a batch where the group has NO input, so a timeout crossed
    mid-stream expires a group in one layout but not another (the
    restart inserts an extra empty batch) — an ENGINE property of
    event-time timeouts, not an operator bug. The operators' contract
    is therefore: exact equivalence while state lives; watermark-driven
    expiry bounds state in production, where an expired group restarts
    its accumulator by design (n_seen marks it)."""
    import glob
    import os
    import shutil

    from buskafkasparkstreaming_spark.streaming.state import (
        cusum_hourly_per_type,
        running_per_user,
    )

    ts0 = pd.Timestamp("2024-01-01 10:00:00")

    def ev(eid, user, etype, minute, value):
        t = (ts0 + pd.Timedelta(minutes=minute)).to_pydatetime()
        return (eid, user, etype, int(t.timestamp() * 1000), t, float(value))

    files = [
        [ev(1, 1, "click", 0, 1.0), ev(2, 2, "view", 1, 2.0)],
        [ev(3, 1, "click", 70, 4.0), ev(4, 3, "error", 71, 8.0)],
        [ev(5, 2, "click", 140, 16.0), ev(6, 1, "view", 141, 32.0)],
        [ev(7, 3, "click", 300, 64.0), ev(8, 2, "click", 301, 128.0)],
    ]
    schema = (
        "event_id bigint, user_id bigint, event_type string, ms bigint, "
        "ts timestamp, value double"
    )

    def write_file(dirname, i, rows):
        path = str(tmp_path / dirname / f"f{i}.parquet")
        staging = path + ".staging"
        spark.createDataFrame(rows, schema).coalesce(1).write.mode(
            "overwrite"
        ).parquet(staging)
        part = glob.glob(os.path.join(staging, "part-*.parquet"))[0]
        os.makedirs(os.path.dirname(path), exist_ok=True)
        shutil.move(part, path)
        shutil.rmtree(staging)
        os.utime(path, (1700000000 + i, 1700000000 + i))

    def drain(op, in_dir, ckpt, out_dir):
        stream = read_stream(
            spark,
            str(tmp_path / in_dir),
            spark.read.parquet(str(tmp_path / in_dir)).schema,
            max_files=1,
        )

        def sink(batch_df, _bid):
            batch_df.write.mode("append").parquet(str(tmp_path / out_dir))

        q = (
            op(stream)
            .writeStream.foreachBatch(sink)
            .option("checkpointLocation", str(tmp_path / ckpt))
            .trigger(availableNow=True)
            .outputMode("update")
            .start()
        )
        q.awaitTermination()

    def final(out_dir, key, seen):
        rows = spark.read.parquet(str(tmp_path / out_dir)).collect()
        best = {}
        for r in rows:
            k = r[key]
            if k not in best or r[seen] > best[k][seen]:
                best[k] = r
        return {k: tuple(r.asDict().values()) for k, r in best.items()}

    half_day = 12 * 3600_000
    for case, op, key in (
        ("run", lambda s: running_per_user(s, watermark="30 minutes",
                                           timeout_ms=half_day), "user_id"),
        ("cus", lambda s: cusum_hourly_per_type(s, watermark="30 minutes",
                                                state_timeout_ms=half_day),
         "event_type"),
    ):
        for i, rows in enumerate(files):
            write_file(f"{case}_in_a", i, rows)
        drain(op, f"{case}_in_a", f"{case}_ckpt_a", f"{case}_out_a")
        for i, rows in enumerate(files[:2]):
            write_file(f"{case}_in_b", i, rows)
        drain(op, f"{case}_in_b", f"{case}_ckpt_b", f"{case}_out_b")
        for i, rows in enumerate(files[2:], start=2):
            write_file(f"{case}_in_b", i, rows)
        drain(op, f"{case}_in_b", f"{case}_ckpt_b", f"{case}_out_b")
        seen = "n_events" if case == "run" else "n_seen"
        a = final(f"{case}_out_a", key, seen)
        b = final(f"{case}_out_b", key, seen)
        assert a == b, (case, a, b)


def test_streaming_skyline_batch_layout_independent(spark, tmp_path):
    """skyline_per_key's FINAL frontier is batch-layout-independent: the
    frontier merge frontier(state ∪ batch) == frontier(all points) is
    associative in the input split, and every emission carries the
    monotone n_seen clock so max-n_seen rows per key ARE the final
    state. Two files arranged so batch 2 DOMINATES part of batch 1's
    frontier (the frontier must shrink, not only grow), drained paced
    (1 file/trigger) and unpaced — both must equal the brute-force
    frontier of the union."""
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    from buskafkasparkstreaming_spark.streaming.state import skyline_per_key
    from buskafkasparkstreaming_spark.streaming.windows import run_to_memory

    # minimize x, maximize y; key 'a': (5,50) survives b1, then (3,60)
    # in b2 dominates it; duplicates and an equal-x-lower-y point mixed
    b1 = [("a", 5, 50), ("a", 7, 40), ("a", 5, 45), ("b", 1, 10)]
    b2 = [("a", 3, 60), ("a", 9, 70), ("a", 3, 60), ("b", 2, 5)]
    d = tmp_path / "pts"
    d.mkdir()
    for i, rows in enumerate((b1, b2)):
        tbl = pa.table(
            {
                "event_type": pa.array([k for (k, _, _) in rows]),
                "x": pa.array([x for (_, x, _) in rows], pa.int64()),
                "y": pa.array([y for (_, _, y) in rows], pa.int64()),
            }
        )
        path = str(d / f"b{i}.parquet")
        pq.write_table(tbl, path)
        os.utime(path, (1_700_000_000 + i, 1_700_000_000 + i))

    def brute(points):
        out = set()
        for p in set(points):
            if not any(
                q[0] <= p[0] and q[1] >= p[1] and q != p
                for q in set(points)
                if (q[0] < p[0] or q[1] > p[1])
            ):
                out.add(p)
        return out

    expected = {
        k: brute([(x, y) for (kk, x, y) in b1 + b2 if kk == k])
        for k in ("a", "b")
    }

    schema = spark.read.parquet(str(d)).schema

    def drain(paced: bool):
        reader = spark.readStream.schema(schema).format("parquet")
        if paced:
            reader = reader.option("maxFilesPerTrigger", "1")
        out = skyline_per_key(reader.load(str(d)), key_col="event_type")
        res = run_to_memory(out, spark, output_mode="update").collect()
        best = {}
        for r in res:
            best.setdefault(r["event_type"], 0)
            best[r["event_type"]] = max(best[r["event_type"]], r["n_seen"])
        return {
            k: {
                (r["x"], r["y"])
                for r in res
                if r["event_type"] == k and r["n_seen"] == best[k]
            }
            for k in best
        }

    assert drain(paced=True) == expected
    assert drain(paced=False) == expected


def test_streaming_skyline_kill_restart_equivalence(spark, tmp_path):
    """skyline_per_key's frontier state is a join-semilattice fold
    (frontier(state ∪ batch) == frontier(all points)) with NO timeout,
    so a KILLED and RESTARTED query (same checkpoint, remaining files
    drained after resume) must land the exact same final frontier as an
    uninterrupted drain — the kill/restart pin every stateful tracker
    in streaming/state.py carries (round-10 discipline), unconditional
    here because nothing expires."""
    import glob as _glob
    import os
    import shutil

    from buskafkasparkstreaming_spark.streaming.state import skyline_per_key

    # key 'a': batch-2 points dominate part of the batch-0/1 frontier
    # (state must shrink across the kill boundary); 'b' is single-batch
    files = [
        [("a", 5, 50), ("a", 7, 40), ("b", 1, 10)],
        [("a", 5, 45), ("a", 4, 20)],
        [("a", 3, 60), ("a", 9, 70)],
        [("b", 0, 5), ("b", 2, 20)],
    ]
    schema = "event_type string, x bigint, y bigint"

    def write_file(dirname, i, rows):
        path = str(tmp_path / dirname / f"f{i}.parquet")
        staging = path + ".staging"
        spark.createDataFrame(rows, schema).coalesce(1).write.mode(
            "overwrite"
        ).parquet(staging)
        part = _glob.glob(os.path.join(staging, "part-*.parquet"))[0]
        os.makedirs(os.path.dirname(path), exist_ok=True)
        shutil.move(part, path)
        shutil.rmtree(staging)
        os.utime(path, (1700000000 + i, 1700000000 + i))

    def drain(in_dir, ckpt, out_dir):
        stream = read_stream(
            spark,
            str(tmp_path / in_dir),
            spark.read.parquet(str(tmp_path / in_dir)).schema,
            max_files=1,
        )
        out = skyline_per_key(stream, key_col="event_type")

        def sink(batch_df, _bid):
            batch_df.write.mode("append").parquet(str(tmp_path / out_dir))

        q = (
            out.writeStream.foreachBatch(sink)
            .option("checkpointLocation", str(tmp_path / ckpt))
            .trigger(availableNow=True)
            .outputMode("update")
            .start()
        )
        q.awaitTermination()

    def final_frontier(out_dir):
        rows = spark.read.parquet(str(tmp_path / out_dir)).collect()
        best = {}
        for r in rows:
            best[r["event_type"]] = max(
                best.get(r["event_type"], 0), r["n_seen"]
            )
        return {
            k: sorted(
                (r["x"], r["y"])
                for r in rows
                if r["event_type"] == k and r["n_seen"] == best[k]
            )
            for k in best
        }

    for i, rows in enumerate(files):
        write_file("sky_a", i, rows)
    drain("sky_a", "sky_ckpt_a", "sky_out_a")

    for i, rows in enumerate(files[:2]):
        write_file("sky_b", i, rows)
    drain("sky_b", "sky_ckpt_b", "sky_out_b")
    for i, rows in enumerate(files[2:], start=2):
        write_file("sky_b", i, rows)
    drain("sky_b", "sky_ckpt_b", "sky_out_b")

    a, b = final_frontier("sky_out_a"), final_frontier("sky_out_b")
    assert a == b, (a, b)
    # hand-derived ground truth: 'a' keeps (3,60) and (9,70) — every
    # other point is dominated by (3,60) (cheaper AND later); 'b' keeps
    # all three points: sorted by x they ascend in y, so no pair has
    # one cheaper-or-equal AND later-or-equal with a strict coordinate.
    assert a["a"] == [(3, 60), (9, 70)], a
    assert a["b"] == [(0, 5), (1, 10), (2, 20)], a


def test_allen_monitor_pacing_independent(spark, tmp_path):
    """allen_point_monitor's drained histogram (max(n) per key) equals
    the batch classification for ANY batch pacing: counts are monotone,
    so the max-n row per (label, relation) IS the final state. Two
    files split so the same (label, relation) cell receives points in
    BOTH batches (the count must accumulate across state, not reset),
    drained paced (1 file/trigger) and unpaced — both must equal the
    hand-computed histogram. Windows exercise during / starts /
    finishes / meets / met_by and the disjoint filter."""
    import os
    from collections import Counter

    import pyarrow as pa
    import pyarrow.parquet as pq

    from buskafkasparkstreaming_spark.streaming.windows import (
        allen_point_monitor,
        run_to_memory,
    )

    H = 100  # small bucket so one window spans several buckets
    # window W1 = [100, 399], W2 = [500, 500] (degenerate)
    win = spark.createDataFrame(
        [(1, 100, 399), (2, 500, 500)],
        "window_id long, s_b long, e_b long",
    )
    # batch 1: starts(100), during(250), disjoint-in-bucket(420 vs W1? no
    # -- 420 is past e_b=399 but bucket 4 isn't in W1's range 1..3; use
    # 95: same bucket 0 as nothing -- W1 starts at bucket 1. Use 400:
    # bucket 4, W2 is bucket 5 -> joins nothing. 99 precedes W1 in
    # bucket 0 -> never joins. So add 450 (bucket 4): joins NO window.
    b1 = [("a", 100), ("a", 250), ("a", 450), ("b", 399)]
    # batch 2: the SAME (a, during) cell gets another point (300), plus
    # equals/met_by on the degenerate W2 and a second label
    b2 = [("a", 300), ("a", 500), ("b", 100), ("b", 250)]
    d = tmp_path / "pts"
    d.mkdir()
    for i, rows in enumerate((b1, b2)):
        tbl = pa.table(
            {
                "label": pa.array([k for (k, _) in rows]),
                "ms": pa.array([m for (_, m) in rows], pa.int64()),
            }
        )
        path = str(d / f"b{i}.parquet")
        pq.write_table(tbl, path)
        os.utime(path, (1_700_000_000 + i, 1_700_000_000 + i))

    # hand-computed ground truth via the same relation semantics:
    # point p vs [s, e]: starts (p==s<e), during (s<p<e), finishes
    # (s<p==e), equals (p==s==e); disjoint points never classify
    def rel(p, s, e):
        if p < s or p > e:
            return None
        if s == e:
            return "equals"
        if p == s:
            return "starts"
        if p == e:
            return "finishes"
        return "during"

    expected = Counter()
    for label, p in b1 + b2:
        for s, e in ((100, 399), (500, 500)):
            r = rel(p, s, e)
            if r:
                expected[(label, r)] += 1

    schema = spark.read.parquet(str(d)).schema

    def drain(paced: bool):
        reader = spark.readStream.schema(schema).format("parquet")
        if paced:
            reader = reader.option("maxFilesPerTrigger", "1")
        out = allen_point_monitor(reader.load(str(d)), win, H)
        res = run_to_memory(out, spark, output_mode="update").collect()
        best = {}
        for r in res:
            key = (r["label"], r["relation"])
            best[key] = max(best.get(key, 0), r["n"])
        return best

    assert drain(paced=True) == dict(expected)
    assert drain(paced=False) == dict(expected)


def test_streaming_reservoir_kill_restart_and_pacing(spark, tmp_path):
    """reservoir_per_key's bottom-k state is a join-semilattice fold
    (bottom-k(state ∪ batch) == bottom-k(all rows)) with NO timeout, so
    a KILLED and RESTARTED drain (same checkpoint) and any batch pacing
    must land the exact same final sample — which must equal the pure
    batch formulation: the k smallest md5(id:salt) per key. Rows are
    split so keys receive ids in MULTIPLE batches (the reservoir must
    merge across state, and later batches must be able to EVICT earlier
    members)."""
    import glob as _glob
    import hashlib
    import os
    import shutil

    from buskafkasparkstreaming_spark.streaming.state import reservoir_per_key

    K, SALT = 3, "stream-res"
    files = [
        [("a", i) for i in range(0, 6)] + [("b", 100)],
        [("a", i) for i in range(6, 12)] + [("b", 101)],
        [("a", i) for i in range(12, 20)] + [("b", 102), ("b", 103)],
    ]
    schema = "event_type string, id bigint"

    def write_file(dirname, i, rows):
        path = str(tmp_path / dirname / f"f{i}.parquet")
        staging = path + ".staging"
        spark.createDataFrame(rows, schema).coalesce(1).write.mode(
            "overwrite"
        ).parquet(staging)
        part = _glob.glob(os.path.join(staging, "part-*.parquet"))[0]
        os.makedirs(os.path.dirname(path), exist_ok=True)
        shutil.move(part, path)
        shutil.rmtree(staging)
        os.utime(path, (1700000000 + i, 1700000000 + i))

    def drain(in_dir, ckpt, out_dir):
        stream = read_stream(
            spark,
            str(tmp_path / in_dir),
            spark.read.parquet(str(tmp_path / in_dir)).schema,
            max_files=1,
        )
        out = reservoir_per_key(stream, k=K, key_col="event_type", id_col="id")

        def sink(batch_df, _bid):
            batch_df.write.mode("append").parquet(str(tmp_path / out_dir))

        q = (
            out.writeStream.foreachBatch(sink)
            .option("checkpointLocation", str(tmp_path / ckpt))
            .trigger(availableNow=True)
            .outputMode("update")
            .start()
        )
        q.awaitTermination()

    def final_sample(out_dir):
        rows = spark.read.parquet(str(tmp_path / out_dir)).collect()
        best = {}
        for r in rows:
            best[r["event_type"]] = max(
                best.get(r["event_type"], 0), r["n_seen"]
            )
        return {
            k: sorted(
                (r["prio"], r["id"])
                for r in rows
                if r["event_type"] == k and r["n_seen"] == best[k]
            )
            for k in best
        }

    for i, rows in enumerate(files):
        write_file("res_a", i, rows)
    drain("res_a", "res_ckpt_a", "res_out_a")

    for i, rows in enumerate(files[:1]):
        write_file("res_b", i, rows)
    drain("res_b", "res_ckpt_b", "res_out_b")
    for i, rows in enumerate(files[1:], start=1):
        write_file("res_b", i, rows)
    drain("res_b", "res_ckpt_b", "res_out_b")

    a, b = final_sample("res_out_a"), final_sample("res_out_b")
    assert a == b, (a, b)
    # pure batch ground truth
    want = {}
    for key in ("a", "b"):
        ids = [i for batch in files for (k, i) in batch if k == key]
        pool = sorted(
            (hashlib.md5(f"{i}:{SALT}".encode()).hexdigest(), i) for i in ids
        )
        want[key] = pool[:K]
    assert a == want, (a, want)


def test_streaming_weighted_reservoir_kill_restart_and_pacing(spark, tmp_path):
    """weighted_reservoir_per_key (A-ES): top-k by max-of-w-md5 priority
    is a join-semilattice fold like the uniform reservoir, so a KILLED
    and RESTARTED drain (same checkpoint) and any pacing land the same
    final sample, which must equal the pure batch formulation: the k
    largest max_{j=1..w} md5(id:j:salt) per key under the
    (prio DESC, id, w) total order. Weights vary per id so heavy items
    genuinely carry more draws, and ids arrive in MULTIPLE batches so
    later heavy arrivals must EVICT earlier members."""
    import glob as _glob
    import hashlib
    import os
    import shutil

    from buskafkasparkstreaming_spark.streaming.state import (
        weighted_reservoir_per_key,
    )

    K, SALT = 3, "stream-wres"
    wt = lambda i: 1 + (i % 5)  # noqa: E731  weights 1..5
    files = [
        [("a", i, wt(i)) for i in range(0, 6)] + [("b", 100, 4)],
        [("a", i, wt(i)) for i in range(6, 12)] + [("b", 101, 1)],
        [("a", i, wt(i)) for i in range(12, 20)]
        + [("b", 102, 2), ("b", 103, 5)],
    ]
    schema = "event_type string, id bigint, w bigint"

    def write_file(dirname, i, rows):
        path = str(tmp_path / dirname / f"f{i}.parquet")
        staging = path + ".staging"
        spark.createDataFrame(rows, schema).coalesce(1).write.mode(
            "overwrite"
        ).parquet(staging)
        part = _glob.glob(os.path.join(staging, "part-*.parquet"))[0]
        os.makedirs(os.path.dirname(path), exist_ok=True)
        shutil.move(part, path)
        shutil.rmtree(staging)
        os.utime(path, (1700000000 + i, 1700000000 + i))

    def drain(in_dir, ckpt, out_dir):
        stream = read_stream(
            spark,
            str(tmp_path / in_dir),
            spark.read.parquet(str(tmp_path / in_dir)).schema,
            max_files=1,
        )
        out = weighted_reservoir_per_key(
            stream, k=K, key_col="event_type", id_col="id", weight_col="w"
        )

        def sink(batch_df, _bid):
            batch_df.write.mode("append").parquet(str(tmp_path / out_dir))

        q = (
            out.writeStream.foreachBatch(sink)
            .option("checkpointLocation", str(tmp_path / ckpt))
            .trigger(availableNow=True)
            .outputMode("update")
            .start()
        )
        q.awaitTermination()

    def final_sample(out_dir):
        rows = spark.read.parquet(str(tmp_path / out_dir)).collect()
        best = {}
        for r in rows:
            best[r["event_type"]] = max(
                best.get(r["event_type"], 0), r["n_seen"]
            )
        return {
            k: sorted(
                (r["prio"], r["id"], r["w"])
                for r in rows
                if r["event_type"] == k and r["n_seen"] == best[k]
            )
            for k in best
        }

    for i, rows in enumerate(files):
        write_file("wres_a", i, rows)
    drain("wres_a", "wres_ckpt_a", "wres_out_a")

    for i, rows in enumerate(files[:1]):
        write_file("wres_b", i, rows)
    drain("wres_b", "wres_ckpt_b", "wres_out_b")
    for i, rows in enumerate(files[1:], start=1):
        write_file("wres_b", i, rows)
    drain("wres_b", "wres_ckpt_b", "wres_out_b")

    a, b = final_sample("wres_out_a"), final_sample("wres_out_b")
    assert a == b, (a, b)
    # pure batch ground truth: (prio DESC, id, w) top-k per key
    want = {}
    for key in ("a", "b"):
        triples = [
            (k, i, w) for batch in files for (k, i, w) in batch if k == key
        ]
        pool = []
        for _, i, w in triples:
            m = max(
                hashlib.md5(f"{i}:{j}:{SALT}".encode()).hexdigest()
                for j in range(1, w + 1)
            )
            pool.append((m, i, w))
        pool = sorted(set(pool), key=lambda t: (t[1], t[2]))
        pool.sort(key=lambda t: t[0], reverse=True)
        want[key] = sorted(pool[:K])
    assert a == want, (a, want)


def test_streaming_span_kill_restart_and_pacing(spark, tmp_path):
    """span_per_key: (min, max) is the simplest join-semilattice fold,
    so kill/restart (same checkpoint) and any pacing land the same
    final spans, equal to the pure batch min/max GROUP BY — including
    a later batch WIDENING both ends of an existing span."""
    import glob as _glob
    import os
    import shutil

    from buskafkasparkstreaming_spark.streaming.state import span_per_key

    files = [
        [(1, 5000), (1, 7000), (2, 100)],
        [(1, 2000), (2, 9000)],          # widens user 1 left, user 2 right
        [(1, 11000), (3, 4000)],         # widens user 1 right; new key
    ]
    schema = "user_id bigint, ms bigint"

    def write_file(dirname, i, rows):
        path = str(tmp_path / dirname / f"f{i}.parquet")
        staging = path + ".staging"
        spark.createDataFrame(rows, schema).coalesce(1).write.mode(
            "overwrite"
        ).parquet(staging)
        part = _glob.glob(os.path.join(staging, "part-*.parquet"))[0]
        os.makedirs(os.path.dirname(path), exist_ok=True)
        shutil.move(part, path)
        shutil.rmtree(staging)
        os.utime(path, (1700000000 + i, 1700000000 + i))

    def drain(in_dir, ckpt, out_dir):
        stream = read_stream(
            spark,
            str(tmp_path / in_dir),
            spark.read.parquet(str(tmp_path / in_dir)).schema,
            max_files=1,
        )
        out = span_per_key(stream, key_col="user_id", ms_col="ms")

        def sink(batch_df, _bid):
            batch_df.write.mode("append").parquet(str(tmp_path / out_dir))

        q = (
            out.writeStream.foreachBatch(sink)
            .option("checkpointLocation", str(tmp_path / ckpt))
            .trigger(availableNow=True)
            .outputMode("update")
            .start()
        )
        q.awaitTermination()

    def final_spans(out_dir):
        rows = spark.read.parquet(str(tmp_path / out_dir)).collect()
        best = {}
        for r in rows:
            best[r["user_id"]] = max(best.get(r["user_id"], 0), r["n_seen"])
        return {
            r["user_id"]: (r["s_ms"], r["e_ms"])
            for r in rows
            if r["n_seen"] == best[r["user_id"]]
        }

    for i, rows in enumerate(files):
        write_file("span_a", i, rows)
    drain("span_a", "span_ckpt_a", "span_out_a")

    for i, rows in enumerate(files[:2]):
        write_file("span_b", i, rows)
    drain("span_b", "span_ckpt_b", "span_out_b")
    for i, rows in enumerate(files[2:], start=2):
        write_file("span_b", i, rows)
    drain("span_b", "span_ckpt_b", "span_out_b")

    a, b = final_spans("span_out_a"), final_spans("span_out_b")
    assert a == b, (a, b)
    want = {1: (2000, 11000), 2: (100, 9000), 3: (4000, 4000)}
    assert a == want, (a, want)


def test_pagerank_monitor_ticks_and_kill_restart(spark, tmp_path):
    """run_pagerank_monitor: every tick's snapshot equals the pure batch
    pagerank_fixed_point of the PREFIX edge set (the monitor is the
    periodic-recompute pattern — each tick is a full exact recompute
    over accumulated DISTINCT edges), and a killed/restarted drain
    (same checkpoint; re-delivered rows double-append and must be
    neutralized by the DISTINCT read) lands the same final ranks as an
    uninterrupted one."""
    import glob as _glob
    import os
    import shutil

    from buskafkasparkstreaming_spark.operators.graph import (
        pagerank_fixed_point,
    )
    from buskafkasparkstreaming_spark.streaming.pipeline import (
        run_pagerank_monitor,
    )
    from pyspark.sql import functions as F

    files = [
        [(1, -10), (-10, 1), (2, -10), (-10, 2)],
        [(2, -20), (-20, 2), (3, -20), (-20, 3), (1, -10), (-10, 1)],
        [(3, -10), (-10, 3)],
    ]
    schema = "src bigint, dst bigint"

    def write_file(dirname, i, rows):
        path = str(tmp_path / dirname / f"f{i}.parquet")
        staging = path + ".staging"
        spark.createDataFrame(rows, schema).coalesce(1).write.mode(
            "overwrite"
        ).parquet(staging)
        part = _glob.glob(os.path.join(staging, "part-*.parquet"))[0]
        os.makedirs(os.path.dirname(path), exist_ok=True)
        shutil.move(part, path)
        shutil.rmtree(staging)
        os.utime(path, (1700000000 + i, 1700000000 + i))

    def batch_pr(rows):
        edges = spark.createDataFrame(sorted(set(rows)), schema)
        nodes = (
            edges.select(F.col("src").alias("id"))
            .unionByName(edges.select(F.col("dst").alias("id")))
            .distinct()
        )
        return {
            r["id"]: r["rank_fp"]
            for r in pagerank_fixed_point(edges, nodes, iters=3).collect()
        }

    def drain(in_dir, work, ckpt):
        stream = read_stream(
            spark,
            str(tmp_path / in_dir),
            spark.read.parquet(str(tmp_path / in_dir)).schema,
            max_files=1,
        )
        return run_pagerank_monitor(
            stream, str(tmp_path / work), str(tmp_path / ckpt)
        )

    for i, rows in enumerate(files):
        write_file("pr_a", i, rows)
    final_a = {
        r["id"]: r["rank_fp"] for r in drain("pr_a", "pr_wa", "pr_ca").collect()
    }

    # every tick snapshot == batch PR of the prefix (ticks keyed by the
    # monotone accumulated-row count)
    snaps = spark.read.parquet(str(tmp_path / "pr_wa" / "snapshots"))
    seen = 0
    for i in range(len(files)):
        seen += len(files[i])
        tick = {
            r["id"]: r["rank_fp"]
            for r in snaps.filter(F.col("n_edges") == seen).collect()
        }
        want = batch_pr([e for b in files[: i + 1] for e in b])
        assert tick == want, (i, tick, want)

    # kill/restart: drain one file, then resume with all files present
    write_file("pr_b", 0, files[0])
    drain("pr_b", "pr_wb", "pr_cb")
    for i, rows in enumerate(files[1:], start=1):
        write_file("pr_b", i, rows)
    final_b = {
        r["id"]: r["rank_fp"] for r in drain("pr_b", "pr_wb", "pr_cb").collect()
    }
    assert final_a == final_b
    assert final_a == batch_pr([e for b in files for e in b])

    # tick decimation (r12: the VERDICT watch-item knob): with
    # recompute_every=3 only batch 0 ranks during the stream, the
    # final post-drain pass ranks the full set — the RETURNED snapshot
    # must be identical to the undecimated monitor's, and intermediate
    # snapshots must be FEWER (that is the knob's whole point) while
    # each still equals the batch PR of its prefix
    stream_c = read_stream(
        spark,
        str(tmp_path / "pr_a"),
        spark.read.parquet(str(tmp_path / "pr_a")).schema,
        max_files=1,
    )
    final_c = {
        r["id"]: r["rank_fp"]
        for r in run_pagerank_monitor(
            stream_c,
            str(tmp_path / "pr_wc"),
            str(tmp_path / "pr_cc"),
            recompute_every=3,
        ).collect()
    }
    assert final_c == final_a
    snaps_c = spark.read.parquet(str(tmp_path / "pr_wc" / "snapshots"))
    ticks_c = sorted(
        r["n_edges"]
        for r in snaps_c.select("n_edges").distinct().collect()
    )
    ticks_a = sorted(
        r["n_edges"] for r in snaps.select("n_edges").distinct().collect()
    )
    assert len(ticks_c) < len(ticks_a), (ticks_c, ticks_a)
    for n in ticks_c:
        tick = {
            r["id"]: r["rank_fp"]
            for r in snaps_c.filter(F.col("n_edges") == n).collect()
        }
        prefix, seen = [], 0
        for b in files:
            if seen >= n:
                break
            prefix.extend(b)
            seen += len(b)
        assert tick == batch_pr(prefix), (n, tick)


def test_streaming_skyline3_kill_restart_equivalence(spark, tmp_path):
    """skyline3_per_key: same join-semilattice contract as the 2-D
    tracker, now with the skyline_nd sweep — a killed/restarted paced
    drain equals the uninterrupted one AND the brute-force 3-D frontier
    of the union; batch 2 dominates part of batch 0/1's frontier (state
    must SHRINK across the kill boundary)."""
    import glob as _glob
    import os
    import shutil

    from buskafkasparkstreaming_spark.streaming.state import skyline3_per_key

    # min x, max y, max z
    files = [
        [("a", 5, 50, 5), ("a", 7, 40, 9), ("b", 1, 10, 1)],
        [("a", 5, 45, 7), ("a", 4, 20, 2)],
        [("a", 3, 60, 9), ("a", 9, 70, 1)],
        [("b", 0, 5, 2), ("b", 2, 20, 0)],
    ]
    schema = "event_type string, x bigint, y bigint, z bigint"

    def write_file(dirname, i, rows):
        path = str(tmp_path / dirname / f"f{i}.parquet")
        staging = path + ".staging"
        spark.createDataFrame(rows, schema).coalesce(1).write.mode(
            "overwrite"
        ).parquet(staging)
        part = _glob.glob(os.path.join(staging, "part-*.parquet"))[0]
        os.makedirs(os.path.dirname(path), exist_ok=True)
        shutil.move(part, path)
        shutil.rmtree(staging)
        os.utime(path, (1700000000 + i, 1700000000 + i))

    def drain(in_dir, ckpt, out_dir):
        stream = read_stream(
            spark,
            str(tmp_path / in_dir),
            spark.read.parquet(str(tmp_path / in_dir)).schema,
            max_files=1,
        )
        out = skyline3_per_key(stream, key_col="event_type")

        def sink(batch_df, _bid):
            batch_df.write.mode("append").parquet(str(tmp_path / out_dir))

        q = (
            out.writeStream.foreachBatch(sink)
            .option("checkpointLocation", str(tmp_path / ckpt))
            .trigger(availableNow=True)
            .outputMode("update")
            .start()
        )
        q.awaitTermination()

    def final_frontier(out_dir):
        rows = spark.read.parquet(str(tmp_path / out_dir)).collect()
        best = {}
        for r in rows:
            best[r["event_type"]] = max(
                best.get(r["event_type"], 0), r["n_seen"]
            )
        return {
            k: sorted(
                (r["x"], r["y"], r["z"])
                for r in rows
                if r["event_type"] == k and r["n_seen"] == best[k]
            )
            for k in best
        }

    for i, rows in enumerate(files):
        write_file("sk3_a", i, rows)
    drain("sk3_a", "sk3_ckpt_a", "sk3_out_a")

    for i, rows in enumerate(files[:2]):
        write_file("sk3_b", i, rows)
    drain("sk3_b", "sk3_ckpt_b", "sk3_out_b")
    for i, rows in enumerate(files[2:], start=2):
        write_file("sk3_b", i, rows)
    drain("sk3_b", "sk3_ckpt_b", "sk3_out_b")

    a, b = final_frontier("sk3_out_a"), final_frontier("sk3_out_b")
    assert a == b, (a, b)
    # brute-force ground truth per key
    want = {}
    for key in ("a", "b"):
        pts = {(x, y, z) for batch in files for (k, x, y, z) in batch if k == key}
        want[key] = sorted(
            p
            for p in pts
            if not any(
                q[0] <= p[0]
                and q[1] >= p[1]
                and q[2] >= p[2]
                and (q[0] < p[0] or q[1] > p[1] or q[2] > p[2])
                for q in pts
            )
        )
    assert a == want, (a, want)


def test_streaming_presence_dedup_kill_restart_and_pacing(spark, tmp_path):
    """The cohort twin's stateful piece: per-(user, day) PRESENCE via
    Spark's native streaming dropDuplicates. Presence is the idempotent
    set-union semilattice, and the BUILT-IN dedup operator carries the
    same contract the Python folds pin: kill/restart on one checkpoint
    and any pacing land the same emitted key set, equal to the pure
    batch DISTINCT — duplicates within a batch, across batches, and
    re-delivered after a restart all collapse to one emission (replay
    re-emits, if any, are absorbed by the batch-side DISTINCT exactly
    as the entry does)."""
    import glob as _glob
    import os
    import shutil

    files = [
        [(1, 100), (1, 100), (2, 100)],   # in-batch duplicate
        [(1, 100), (2, 101)],             # cross-batch duplicate
        [(3, 100), (1, 101)],             # new key; new day for user 1
    ]
    schema = "user_id bigint, day bigint"

    def write_file(dirname, i, rows):
        path = str(tmp_path / dirname / f"f{i}.parquet")
        staging = path + ".staging"
        spark.createDataFrame(rows, schema).coalesce(1).write.mode(
            "overwrite"
        ).parquet(staging)
        part = _glob.glob(os.path.join(staging, "part-*.parquet"))[0]
        os.makedirs(os.path.dirname(path), exist_ok=True)
        shutil.move(part, path)
        shutil.rmtree(staging)
        os.utime(path, (1700000000 + i, 1700000000 + i))

    def drain(in_dir, ckpt, out_dir, max_files):
        stream = read_stream(
            spark,
            str(tmp_path / in_dir),
            spark.read.parquet(str(tmp_path / in_dir)).schema,
            max_files=max_files,
        )
        out = stream.dropDuplicates(["user_id", "day"])

        def sink(batch_df, _bid):
            batch_df.write.mode("append").parquet(str(tmp_path / out_dir))

        q = (
            out.writeStream.foreachBatch(sink)
            .option("checkpointLocation", str(tmp_path / ckpt))
            .trigger(availableNow=True)
            .outputMode("append")
            .start()
        )
        q.awaitTermination()

    def presence(out_dir):
        return {
            (r["user_id"], r["day"])
            for r in spark.read.parquet(str(tmp_path / out_dir)).collect()
        }

    want = {(1, 100), (1, 101), (2, 100), (2, 101), (3, 100)}

    # one drain, file-at-a-time pacing
    for i, rows in enumerate(files):
        write_file("pres_a", i, rows)
    drain("pres_a", "pres_ckpt_a", "pres_out_a", max_files=1)
    assert presence("pres_out_a") == want

    # kill/restart: drain 2 files, stop, add the third, resume on the
    # SAME checkpoint — state survives, the cross-batch duplicate in
    # the resumed portion must not re-emit
    for i, rows in enumerate(files[:2]):
        write_file("pres_b", i, rows)
    drain("pres_b", "pres_ckpt_b", "pres_out_b", max_files=1)
    for i, rows in enumerate(files[2:], start=2):
        write_file("pres_b", i, rows)
    drain("pres_b", "pres_ckpt_b", "pres_out_b", max_files=1)
    assert presence("pres_out_b") == want

    # coarse pacing (all files in one batch) — same set
    for i, rows in enumerate(files):
        write_file("pres_c", i, rows)
    drain("pres_c", "pres_ckpt_c", "pres_out_c", max_files=3)
    assert presence("pres_out_c") == want


def test_streaming_ucell_fold_kill_restart_and_pacing(spark, tmp_path):
    """streaming_group_mannwhitney's stateful piece: an UPDATE-mode
    streaming groupBy summing the per-(type, value) split indicators.
    Both components are monotone nondecreasing, so the drained update
    log's componentwise max per cell must equal the pure batch GROUP BY
    under ANY pacing AND across a kill/restart on one checkpoint —
    re-emitted updates after a restart are absorbed by the max fold
    exactly as the entry absorbs them."""
    import glob as _glob
    import os
    import shutil

    files = [
        [("a", 100, 1, 0), ("a", 100, 0, 1), ("a", 200, 1, 0)],
        [("a", 100, 1, 0), ("b", 100, 0, 1)],
        [("a", 200, 0, 1), ("b", 100, 0, 1), ("a", 100, 1, 0)],
    ]
    schema = "g string, cents bigint, g1 int, g2 int"
    all_rows = [r for f in files for r in f]

    def write_file(dirname, i, rows):
        path = str(tmp_path / dirname / f"f{i}.parquet")
        staging = path + ".staging"
        spark.createDataFrame(rows, schema).coalesce(1).write.mode(
            "overwrite"
        ).parquet(staging)
        part = _glob.glob(os.path.join(staging, "part-*.parquet"))[0]
        os.makedirs(os.path.dirname(path), exist_ok=True)
        shutil.move(part, path)
        shutil.rmtree(staging, ignore_errors=True)
        os.utime(path, (1700000000 + i, 1700000000 + i))

    def drain(in_dir, ckpt, out_dir, max_files):
        stream = read_stream(
            spark,
            str(tmp_path / in_dir),
            spark.read.parquet(str(tmp_path / in_dir)).schema,
            max_files=max_files,
        )
        cells = stream.groupBy("g", "cents").agg(
            F.sum("g1").cast("long").alias("d1"),
            F.sum("g2").cast("long").alias("d2"),
        )

        def sink(batch_df, _bid):
            batch_df.write.mode("append").parquet(str(tmp_path / out_dir))

        q = (
            cells.writeStream.foreachBatch(sink)
            .option("checkpointLocation", str(tmp_path / ckpt))
            .trigger(availableNow=True)
            .outputMode("update")
            .start()
        )
        q.awaitTermination()

    def folded(out_dir):
        return {
            (r["g"], r["cents"]): (r["d1"], r["d2"])
            for r in spark.read.parquet(str(tmp_path / out_dir))
            .groupBy("g", "cents")
            .agg(
                F.max("d1").cast("long").alias("d1"),
                F.max("d2").cast("long").alias("d2"),
            )
            .collect()
        }

    want = {}
    for g, cents, g1, g2 in all_rows:
        d1, d2 = want.get((g, cents), (0, 0))
        want[(g, cents)] = (d1 + g1, d2 + g2)

    # one drain, file-at-a-time pacing
    for i, rows in enumerate(files):
        write_file("ucell_a", i, rows)
    drain("ucell_a", "ucell_ckpt_a", "ucell_out_a", max_files=1)
    assert folded("ucell_out_a") == want

    # kill/restart: drain 2 files, stop, add the third, resume on the
    # SAME checkpoint — the resumed update must carry the full cell
    # value (state survives), and the max fold absorbs the re-emission
    for i, rows in enumerate(files[:2]):
        write_file("ucell_b", i, rows)
    drain("ucell_b", "ucell_ckpt_b", "ucell_out_b", max_files=1)
    for i, rows in enumerate(files[2:], start=2):
        write_file("ucell_b", i, rows)
    drain("ucell_b", "ucell_ckpt_b", "ucell_out_b", max_files=1)
    assert folded("ucell_out_b") == want

    # coarse pacing (all files in one batch) — same cells
    for i, rows in enumerate(files):
        write_file("ucell_c", i, rows)
    drain("ucell_c", "ucell_ckpt_c", "ucell_out_c", max_files=3)
    assert folded("ucell_out_c") == want
