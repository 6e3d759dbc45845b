"""Custom stateful streaming operators via applyInPandasWithState
(SURVEY §2.3 "Streaming" row, "stateful" entry).

The example operator is a per-key running tracker (count / sum / max
event-time) with timeout-based state expiry — the building block for
session-style accumulators Spark's built-ins can't express. State is
per-key, Arrow-batched, and expires on event-time timeout, so total state is
bounded by live-key cardinality × state size, independent of stream length —
the property that matters at 100 TB.

The state function is built as a closure (not a module-level function) so
it pickles by value: executor Python workers never need this package on
their own import path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupStateTimeout

RUNNING_STATE_SCHEMA = "n bigint, total double, max_ts timestamp"
RUNNING_OUTPUT_SCHEMA = (
    "user_id bigint, n_events bigint, total_value double, last_ts timestamp"
)


def running_per_user(
    events: DataFrame, watermark: str = "1 hour", timeout_ms: int = 3_600_000
) -> DataFrame:
    """Per-user running (count, sum(value), max(ts)) with event-time state
    expiry. Emits the updated accumulator every batch."""

    def tracker(key, pdfs, state):
        import pandas as pd

        (user_id,) = key
        if state.hasTimedOut:
            n, total, max_ts = state.get
            state.remove()
            yield pd.DataFrame(
                [{"user_id": user_id, "n_events": n, "total_value": total, "last_ts": max_ts}]
            )
            return
        n, total, max_ts = state.get if state.exists else (0, 0.0, None)
        batch_ms = 0
        for pdf in pdfs:
            n += len(pdf)
            total += float(pdf["value"].sum())
            batch_max = pdf["ts"].max()
            # Series.max() on an empty/all-NaT ts column returns NaT,
            # never None — pd.notna is the guard that actually holds,
            # and it keeps NaT out of BOTH the persisted max_ts and the
            # timeout anchor (r10 advisor)
            if pd.notna(batch_max):
                max_ts = batch_max if max_ts is None else max(max_ts, batch_max)
                batch_ms = max(batch_ms, int(batch_max.value // 1_000_000))
        state.update((n, total, max_ts))
        # anchor the timeout at max(watermark, batch event time): the
        # watermark alone is 0 on the first batch, which would expire
        # EVERY group the first time it sits out a batch — resetting its
        # accumulator and making the final state depend on batch
        # boundaries (caught by the funnel kill/restart equivalence
        # test, round 10)
        state.setTimeoutTimestamp(
            max(state.getCurrentWatermarkMs(), batch_ms) + timeout_ms
        )
        yield pd.DataFrame(
            [{"user_id": user_id, "n_events": n, "total_value": total, "last_ts": max_ts}]
        )

    return (
        events.withWatermark("ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            tracker,
            outputStructType=RUNNING_OUTPUT_SCHEMA,
            stateStructType=RUNNING_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )


def _cap_output_schema(key_col: str) -> str:
    # built from key_col so cap_events_per_key works for any bigint key,
    # not just user_id (the yielded projection uses the same list)
    return (
        f"{key_col} bigint, event_id bigint, ts timestamp, "
        "value double, rank_in_key bigint"
    )


CAP_OUTPUT_SCHEMA = _cap_output_schema("user_id")


def cap_events_per_key(
    events: DataFrame, n: int = 3, key_col: str = "user_id"
) -> DataFrame:
    """First-N-per-key pass-through on the NEW API: Spark 4
    transformWithStateInPandas (StatefulProcessor + typed ValueState).
    Emits each key's first `n` events (ordered by (ts, event_id) within
    each Arrow batch) and silently drops the rest — the streaming
    domain-cap / rate-limit a training-data firehose needs so one hot key
    cannot flood a micro-batch.

    State is ONE bigint per live key (the admitted count), typed and
    engine-managed (RocksDB-capable at scale) — versus the pickled-tuple
    blobs of applyInPandasWithState. Rows with NULL key or NULL ts are
    dropped (no event-time / no key identity, same contract as the
    windowed operators).

    The per-batch sort makes output deterministic for a single-batch
    drain (the harness path); across batches arrival order governs, as
    any streaming rate limiter does.

    DEPENDENCY GATE: the transformWithState Python state client speaks
    protobuf to the JVM state server; without the `protobuf` package the
    dedicated TWS driver worker crashes opaquely mid-query. Absent in
    this build container (no pip), so the operator raises a clear
    NotImplementedError up front instead — the same documented gating as
    the PIL/ffmpeg multimodal tiers. applyInPandasWithState
    (running_per_user above) covers custom state without the dependency."""
    try:  # noqa: SIM105 — the gate IS the point
        import google.protobuf  # noqa: F401
    except ImportError as e:
        raise NotImplementedError(
            "transformWithStateInPandas requires the protobuf package "
            "(state-server protocol); not available in this environment. "
            "Use running_per_user (applyInPandasWithState) instead."
        ) from e
    from pyspark.sql.streaming import StatefulProcessor, StatefulProcessorHandle

    cap = int(n)

    class _CapProcessor(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._count = handle.getValueState("admitted", "n bigint")

        def handleInputRows(self, key, rows, timerValues):
            import pandas as pd

            taken = self._count.get()[0] if self._count.exists() else 0
            if taken >= cap:
                return
            out = []
            for pdf in rows:
                if taken >= cap:
                    break
                pdf = pdf.sort_values(["ts", "event_id"], kind="mergesort")
                room = cap - taken
                got = pdf.head(room)
                taken += len(got)
                out.append(got)
            if out:
                allg = pd.concat(out)
                allg = allg.assign(
                    rank_in_key=range(
                        taken - len(allg) + 1, taken + 1
                    )
                )
                yield allg[
                    [key_col, "event_id", "ts", "value", "rank_in_key"]
                ]
            self._count.update((taken,))

        def close(self) -> None:
            pass

    clean = events.filter(
        events[key_col].isNotNull() & events["ts"].isNotNull()
    ).select(key_col, "event_id", "ts", "value")
    return (
        clean.withWatermark("ts", "1 hour")
        .groupBy(key_col)
        .transformWithStateInPandas(
            _CapProcessor(),
            outputStructType=_cap_output_schema(key_col),
            outputMode="append",
            timeMode="eventTime",
        )
    )


FUNNEL_STATE_SCHEMA = (
    "views array<bigint>, clicks array<bigint>, purchases array<bigint>, "
    "n_seen bigint"
)
FUNNEL_OUTPUT_SCHEMA = (
    "user_id bigint, n_seen bigint, t1_ms bigint, t2_ms bigint, "
    "t3_ms bigint, converted boolean"
)


def funnel_timeout_per_user(
    events: DataFrame,
    timeout_ms: int = 3_600_000,
    cap: int = 64,
    watermark: str = "1 hour",
    state_timeout_ms: int = 3_600_000,
) -> DataFrame:
    """Streaming funnel WITH TIMEOUT (view → click → purchase, each stage
    within `timeout_ms` of the previous) as a custom stateful operator —
    the streaming twin of the batch `q_funnel_timeout`.

    ORDER-INSENSITIVE capped state: per user, the DISTINCT `cap` smallest
    event-time millis per stage. Merging a batch is set-union + sort +
    truncate — commutative and idempotent across micro-batches, so the
    final emission is independent of batch boundaries AND exactly
    replayable by a batch engine (keep the cap smallest distinct
    timestamps per stage, then fold the funnel). State is bounded at
    3·cap longs per live user and expires `state_timeout_ms` past the
    watermark — stream-length-independent, the 100 TB property.

    The funnel fold over the kept sets: t1 = min view; t2 = min click in
    (t1, t1+timeout]; t3 = min purchase in (t2, t2+timeout]. Exact
    integer millis throughout. Emits the updated status every batch
    (update mode) with a monotone `n_seen` so the final state is the row
    with max n_seen per user.

    Input columns: user_id (bigint), event_type (string), ms (bigint
    epoch millis event time), ts (timestamp, for the watermark).
    """

    def _fold(views, clicks, purchases):
        t1 = views[0] if views else None
        t2 = None
        if t1 is not None:
            for c in clicks:
                if t1 < c <= t1 + timeout_ms:
                    t2 = c
                    break
        t3 = None
        if t2 is not None:
            for p in purchases:
                if t2 < p <= t2 + timeout_ms:
                    t3 = p
                    break
        return t1, t2, t3

    def tracker(key, pdfs, state):
        import pandas as pd

        (user_id,) = key
        if state.hasTimedOut:
            views, clicks, purchases, n_seen = state.get
            state.remove()
            t1, t2, t3 = _fold(views, clicks, purchases)
            yield pd.DataFrame(
                [
                    {
                        "user_id": user_id,
                        "n_seen": n_seen,
                        "t1_ms": t1,
                        "t2_ms": t2,
                        "t3_ms": t3,
                        "converted": t3 is not None,
                    }
                ]
            )
            return
        views, clicks, purchases, n_seen = (
            state.get if state.exists else ([], [], [], 0)
        )
        views, clicks, purchases = list(views), list(clicks), list(purchases)
        batch_ms = 0
        for pdf in pdfs:
            n_seen += len(pdf)
            ms_all = pdf["ms"].dropna()
            if len(ms_all):
                batch_ms = max(batch_ms, int(ms_all.max()))
            for stage, bucket in (
                ("view", views),
                ("click", clicks),
                ("purchase", purchases),
            ):
                ms = pdf.loc[pdf["event_type"] == stage, "ms"]
                bucket.extend(int(m) for m in ms.dropna())
        views = sorted(set(views))[:cap]
        clicks = sorted(set(clicks))[:cap]
        purchases = sorted(set(purchases))[:cap]
        state.update((views, clicks, purchases, n_seen))
        # max(watermark, batch event time): the bare watermark is 0 on
        # the first batch, so every group expired (and lost n_seen) the
        # first time it sat out a batch — batch-boundary-dependent final
        # state, caught by the kill/restart equivalence test
        state.setTimeoutTimestamp(
            max(state.getCurrentWatermarkMs(), batch_ms) + state_timeout_ms
        )
        t1, t2, t3 = _fold(views, clicks, purchases)
        yield pd.DataFrame(
            [
                {
                    "user_id": user_id,
                    "n_seen": n_seen,
                    "t1_ms": t1,
                    "t2_ms": t2,
                    "t3_ms": t3,
                    "converted": t3 is not None,
                }
            ]
        )

    return (
        events.withWatermark("ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            tracker,
            outputStructType=FUNNEL_OUTPUT_SCHEMA,
            stateStructType=FUNNEL_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )


CUSUM_STATE_SCHEMA = "hours array<bigint>, counts array<bigint>, n_seen bigint"
CUSUM_OUTPUT_SCHEMA = (
    "event_type string, n_seen bigint, n_hours bigint, total bigint, "
    "max_s bigint, cp_hour_ms bigint, n_alarms bigint"
)


def cusum_hourly_per_type(
    events: DataFrame,
    watermark: str = "1 hour",
    state_timeout_ms: int = 3_600_000,
    cap_hours: int = 4096,
    alarm_mult: int = 2,
) -> DataFrame:
    """STREAMING one-sided CUSUM drift detector per event type — the
    sequential form of `q_cusum_changepoint` (Page 1954), run as a
    custom applyInPandasWithState operator: the batch entry finds the
    historical change point; this one maintains the detector the way a
    monitoring pipeline actually runs it, per ingest tick.

    ORDER-INSENSITIVE capped state: per type, the (hour → count)
    histogram of event arrivals — batch merge is per-hour ADDITION
    (commutative/associative, so the final state is independent of
    micro-batch boundaries), bounded at `cap_hours` entries (the hour
    axis is bounded by the time domain, the ACF/CCF discipline; a
    monitoring deployment also ages out hours past the watermark).

    Each emission folds the one-sided recursion over the sorted hours
    in EXACT integers, scaled by the per-type hour count to avoid a
    float mean: with m hours and total t,

        S_i = max(0, S_{i-1} + x_i·m − t)        (S_0 = 0)

    and reports max S, the EARLIEST argmax hour, and the number of
    alarm hours (S_i > alarm_mult·t). Emissions carry a monotone
    n_seen, so the final detector state is the max-n_seen row per type
    (the funnel_timeout_per_user protocol). Exactly replayable by SQL:
    the oracle runs the same recursion with WITH RECURSIVE over the
    same hourly histogram.

    Input columns: event_type (string), ms (bigint epoch millis event
    time), ts (timestamp, for the watermark).
    """

    def _fold(hours: list, counts: list):
        m = len(hours)
        t = sum(counts)
        s = 0
        max_s, cp_ms, n_alarms = 0, None, 0
        for h, x in sorted(zip(hours, counts)):
            s = max(0, s + x * m - t)
            if s > max_s:
                max_s, cp_ms = s, h
            if s > alarm_mult * t:
                n_alarms += 1
        if cp_ms is None and hours:
            cp_ms = min(hours)  # all-zero S: earliest hour by convention
        return m, t, max_s, cp_ms, n_alarms

    def tracker(key, pdfs, state):
        import pandas as pd

        (etype,) = key
        if state.hasTimedOut:
            hours, counts, n_seen = state.get
            state.remove()
            m, t, max_s, cp_ms, n_alarms = _fold(list(hours), list(counts))
            yield pd.DataFrame(
                [
                    {
                        "event_type": etype,
                        "n_seen": n_seen,
                        "n_hours": m,
                        "total": t,
                        "max_s": max_s,
                        "cp_hour_ms": cp_ms,
                        "n_alarms": n_alarms,
                    }
                ]
            )
            return
        hours, counts, n_seen = (
            state.get if state.exists else ([], [], 0)
        )
        hist = dict(zip(hours, counts))
        batch_ms = 0
        for pdf in pdfs:
            n_seen += len(pdf)
            ms_all = pdf["ms"].dropna().astype("int64")
            if len(ms_all):
                batch_ms = max(batch_ms, int(ms_all.max()))
            hr = (ms_all // 3_600_000) * 3_600_000
            for h, c in hr.value_counts().items():
                hist[int(h)] = hist.get(int(h), 0) + int(c)
        if len(hist) > cap_hours:  # age out the OLDEST hours first
            for h in sorted(hist)[: len(hist) - cap_hours]:
                del hist[h]
        hours = sorted(hist)
        counts = [hist[h] for h in hours]
        state.update((hours, counts, n_seen))
        # max(watermark, batch event time) — see funnel_timeout_per_user
        state.setTimeoutTimestamp(
            max(state.getCurrentWatermarkMs(), batch_ms) + state_timeout_ms
        )
        m, t, max_s, cp_ms, n_alarms = _fold(hours, counts)
        yield pd.DataFrame(
            [
                {
                    "event_type": etype,
                    "n_seen": n_seen,
                    "n_hours": m,
                    "total": t,
                    "max_s": max_s,
                    "cp_hour_ms": cp_ms,
                    "n_alarms": n_alarms,
                }
            ]
        )

    return (
        events.withWatermark("ts", watermark)
        .groupBy("event_type")
        .applyInPandasWithState(
            tracker,
            outputStructType=CUSUM_OUTPUT_SCHEMA,
            stateStructType=CUSUM_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )


SKYLINE_STATE_SCHEMA = "xs array<bigint>, ys array<bigint>, n_seen bigint"


def _skyline_output_schema(key_col: str) -> str:
    return f"{key_col} string, x bigint, y bigint, n_seen bigint"


def skyline_per_key(
    points: DataFrame, key_col: str = "event_type"
) -> DataFrame:
    """STREAMING 2-D skyline (Pareto frontier — minimize x, maximize y)
    per key, maintained incrementally in applyInPandasWithState (the
    round-10 batch `skyline_2d`'s streaming sibling, SURVEY round-11
    candidate list). Input: (key_col string, x bigint, y bigint), NULLs
    pre-filtered by the caller.

    State is ONLY the current frontier: once a point is dominated it can
    never rejoin (points only accumulate, so its dominator persists) —
    the merge `frontier(state ∪ batch) == frontier(all points seen)` is
    associative in the input split, making the FINAL emission
    batch-layout-independent. Frontier size for exchangeable random
    points is O(log n) expected — bounded state without a cap.

    Every batch re-emits the full current frontier (update mode) tagged
    with n_seen, the total points consumed for the key — a monotone
    batch clock, so a drained memory sink recovers the FINAL frontier as
    the rows with max(n_seen) per key, regardless of how the source
    paced its batches. No timeout: the frontier never expires (a skyline
    has no event-time horizon), so there is no timeout-anchoring
    sensitivity here (the round-10 lesson stays confined to the
    expiring trackers).

    Frontier walk: sort points by (x asc, y desc), keep a point iff its
    y strictly exceeds the best y so far — equal-x lower-y and equal-y
    higher-x points are dominated (one strict coordinate), duplicate
    (x, y) points collapse via the set. The SQL twin is the NOT-EXISTS
    dominance anti-join over DISTINCT points.
    """

    def tracker(key, pdfs, state):
        import pandas as pd

        (k,) = key
        xs, ys, n_seen = state.get if state.exists else ([], [], 0)
        pts = set(zip(xs, ys))
        for pdf in pdfs:
            n_seen += len(pdf)
            for x, y in zip(pdf["x"].tolist(), pdf["y"].tolist()):
                pts.add((int(x), int(y)))
        frontier = []
        best_y = None
        for x, y in sorted(pts, key=lambda p: (p[0], -p[1])):
            if best_y is None or y > best_y:
                frontier.append((x, y))
                best_y = y
        state.update(
            (
                [p[0] for p in frontier],
                [p[1] for p in frontier],
                n_seen,
            )
        )
        yield pd.DataFrame(
            [
                {key_col: k, "x": x, "y": y, "n_seen": n_seen}
                for x, y in frontier
            ]
        )

    return points.groupBy(key_col).applyInPandasWithState(
        tracker,
        outputStructType=_skyline_output_schema(key_col),
        stateStructType=SKYLINE_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


RESERVOIR_STATE_SCHEMA = (
    "prios array<string>, ids array<bigint>, n_seen bigint"
)


def _reservoir_output_schema(key_col: str) -> str:
    return f"{key_col} string, id bigint, prio string, n_seen bigint"


def reservoir_per_key(
    rows: DataFrame,
    k: int,
    key_col: str = "event_type",
    id_col: str = "id",
    salt: str = "stream-res",
) -> DataFrame:
    """STREAMING uniform reservoir sample per key — the ONLINE form of
    the batch md5-threshold samplers in operators/sampling.py, actually
    maintained in state: keep the k rows with the SMALLEST
    md5(id:salt) priority seen so far (bottom-k sketch). Input:
    (key_col string, id_col bigint), NULL ids pre-filtered by the
    caller.

    Determinism is the whole design: the priority is a pure row
    function (md5 hex, lowercase in Spark AND DuckDB, compared as
    strings with (prio, id) tiebreak), so bottom-k(state ∪ batch) ==
    bottom-k(all rows seen) — an associative, commutative, IDEMPOTENT
    fold (a join-semilattice, like the skyline frontier), making the
    FINAL emission batch-layout-independent AND kill/restart-safe, and
    the whole stream result replayable by ONE batch SQL window
    (row_number over (key ORDER BY md5, id) <= k) — the full oracle.

    Every batch re-emits the key's current reservoir tagged with the
    monotone n_seen clock; a drained memory sink recovers the FINAL
    sample as the max-n_seen rows per key. State is exactly k
    (prio, id) pairs per key — constant, no timeout (a reservoir never
    expires).
    """
    import hashlib

    def tracker(key, pdfs, state):
        import pandas as pd

        (kv,) = key
        prios, ids, n_seen = state.get if state.exists else ([], [], 0)
        pool = set(zip(prios, (int(i) for i in ids)))
        for pdf in pdfs:
            n_seen += len(pdf)
            for i in pdf[id_col].tolist():
                i = int(i)
                h = hashlib.md5(f"{i}:{salt}".encode()).hexdigest()
                pool.add((h, i))
        best = sorted(pool)[:k]
        state.update(
            ([p for p, _ in best], [i for _, i in best], n_seen)
        )
        yield pd.DataFrame(
            [
                {key_col: kv, "id": i, "prio": p, "n_seen": n_seen}
                for p, i in best
            ]
        )

    return rows.groupBy(key_col).applyInPandasWithState(
        tracker,
        outputStructType=_reservoir_output_schema(key_col),
        stateStructType=RESERVOIR_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


SPAN_STATE_SCHEMA = "mn bigint, mx bigint, n_seen bigint"


def _span_output_schema(key_col: str) -> str:
    return f"{key_col} bigint, s_ms bigint, e_ms bigint, n_seen bigint"


def span_per_key(
    rows: DataFrame,
    key_col: str = "user_id",
    ms_col: str = "ms",
) -> DataFrame:
    """STREAMING activity-span maintenance per key: the [min ms, max ms]
    interval of everything seen so far (SURVEY round-12 candidate list —
    the live side of the Allen monitor family: these spans feed
    interval-algebra classification against static incident windows).

    (min, max) is the simplest join-semilattice fold of the fleet —
    associative, commutative, idempotent in each component — so the
    drained FINAL span per key is batch-layout-independent and
    kill/restart-safe (the reservoir/skyline contract), and ONE batch
    min/max GROUP BY replays the whole stream: the full oracle. Every
    batch re-emits the key's current span under the monotone n_seen
    clock; state is two BIGINTs per key, no timeout (a lifetime span
    never expires).

    Input: (key_col bigint, ms_col bigint), NULLs pre-filtered by the
    caller.
    """

    def tracker(key, pdfs, state):
        import pandas as pd

        (kv,) = key
        mn, mx, n_seen = state.get if state.exists else (None, None, 0)
        for pdf in pdfs:
            if not len(pdf):
                continue
            n_seen += len(pdf)
            vals = pdf[ms_col]
            bmn, bmx = int(vals.min()), int(vals.max())
            mn = bmn if mn is None else min(int(mn), bmn)
            mx = bmx if mx is None else max(int(mx), bmx)
        if mn is None:
            return
        state.update((int(mn), int(mx), n_seen))
        yield pd.DataFrame(
            [{key_col: int(kv), "s_ms": int(mn), "e_ms": int(mx),
              "n_seen": n_seen}]
        )

    return rows.groupBy(key_col).applyInPandasWithState(
        tracker,
        outputStructType=_span_output_schema(key_col),
        stateStructType=SPAN_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def span_per_keys(
    rows: DataFrame,
    key_schema: str,
    key_cols: list[str],
    ms_col: str = "ms",
) -> DataFrame:
    """span_per_key's COMPOSITE-key generalization (SURVEY round-13
    candidate "Allen relations BETWEEN live spans"): maintain the
    [min ms, max ms] activity span per key TUPLE — e.g. (user_id,
    event_type), so BOTH sides of a keyed Allen join can be live
    stateful folds. `key_schema` is the DDL for the key columns in
    `key_cols` order (applyInPandasWithState needs explicit types for
    a composite key). Same semilattice contract as span_per_key:
    associative/commutative/idempotent, drained max-n_seen state is
    batch-layout- and restart-independent, ONE batch min/max GROUP BY
    replays the stream. NULLs pre-filtered by the caller.
    """

    def tracker(key, pdfs, state):
        import pandas as pd

        mn, mx, n_seen = state.get if state.exists else (None, None, 0)
        for pdf in pdfs:
            if not len(pdf):
                continue
            n_seen += len(pdf)
            vals = pdf[ms_col]
            bmn, bmx = int(vals.min()), int(vals.max())
            mn = bmn if mn is None else min(int(mn), bmn)
            mx = bmx if mx is None else max(int(mx), bmx)
        if mn is None:
            return
        state.update((int(mn), int(mx), n_seen))
        row = dict(zip(key_cols, key))
        row.update({"s_ms": int(mn), "e_ms": int(mx), "n_seen": n_seen})
        yield pd.DataFrame([row])

    return rows.groupBy(*key_cols).applyInPandasWithState(
        tracker,
        outputStructType=(
            f"{key_schema}, s_ms bigint, e_ms bigint, n_seen bigint"
        ),
        stateStructType=SPAN_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


WEIGHTED_RESERVOIR_STATE_SCHEMA = (
    "prios array<string>, ids array<bigint>, ws array<bigint>, n_seen bigint"
)


def _weighted_reservoir_output_schema(key_col: str) -> str:
    return (
        f"{key_col} string, id bigint, w bigint, prio string, n_seen bigint"
    )


def weighted_reservoir_per_key(
    rows: DataFrame,
    k: int,
    key_col: str = "event_type",
    id_col: str = "id",
    weight_col: str = "w",
    max_weight: int = 8,
    salt: str = "stream-wres",
) -> DataFrame:
    """STREAMING WEIGHTED reservoir sample per key (A-ES, Efraimidis &
    Spirakis 2006) — reservoir_per_key's weighted generalization from
    the SURVEY round-12 candidate list, WITHOUT the float-ordering
    seam the handoff flagged.

    The exactness trick: A-ES keeps the k items with the LARGEST key
    u_i^(1/w_i). For u ~ U(0,1), P(u^(1/w) <= t) = P(u <= t^w) = t^w —
    which is EXACTLY the law of max(u_1..u_w) of w iid uniforms. So
    for INTEGER weights the A-ES key can be drawn as
    max_{j=1..w} md5(f"{id}:{j}:{salt}") — pure hash arithmetic, no
    pow/ln, no float ordering at all: priorities are lowercase-hex md5
    strings compared lexicographically, identical in Spark, Python and
    DuckDB (the ln(u)/w formulation the handoff contemplated would have
    hung the sample membership on last-ulp libm agreement; this is the
    "(u_52bit, id) exact integer transform" resolved by replication).

    Everything else is reservoir_per_key's contract: top-k by
    (prio DESC, id ASC, w ASC) is an associative, commutative,
    IDEMPOTENT fold over (prio, id, w) triples (a join-semilattice), so
    the final emission is batch-layout-independent AND
    kill/restart-safe, and ONE batch SQL window replays the stream —
    the full oracle joins a literal 1..max_weight series (j <= w),
    takes max(md5) per item, and row_numbers per key. State is exactly
    k triples per key; per-row cost is O(w) md5s, w <= `max_weight`
    by contract (weights are size/importance TIERS — doc-length
    classes, quality bands — not unbounded counts; the caller clamps).

    Input: (key_col string, id_col bigint, weight_col bigint in
    [1, max_weight]), NULL ids/weights pre-filtered by the caller.
    """
    import hashlib

    def tracker(key, pdfs, state):
        import pandas as pd

        (kv,) = key
        prios, ids, ws, n_seen = (
            state.get if state.exists else ([], [], [], 0)
        )
        pool = set(
            zip(prios, (int(i) for i in ids), (int(w) for w in ws))
        )
        for pdf in pdfs:
            n_seen += len(pdf)
            for i, w in zip(pdf[id_col].tolist(), pdf[weight_col].tolist()):
                # clamp to [1, max_weight]: a w < 1 (contract violation
                # upstream) must degrade to tier 1 — matching a
                # defensive oracle whose 1..w series join just emits
                # nothing — instead of max() over an empty range
                # killing the streaming query (ADVICE r12)
                i, w = int(i), min(max(int(w), 1), max_weight)
                m = max(
                    hashlib.md5(f"{i}:{j}:{salt}".encode()).hexdigest()
                    for j in range(1, w + 1)
                )
                pool.add((m, i, w))
        # (prio DESC, id ASC, w ASC): two stable sorts, asc keys first
        ordered = sorted(pool, key=lambda t: (t[1], t[2]))
        ordered.sort(key=lambda t: t[0], reverse=True)
        best = ordered[:k]
        state.update(
            (
                [p for p, _, _ in best],
                [i for _, i, _ in best],
                [w for _, _, w in best],
                n_seen,
            )
        )
        yield pd.DataFrame(
            [
                {key_col: kv, "id": i, "w": w, "prio": p, "n_seen": n_seen}
                for p, i, w in best
            ]
        )

    return rows.groupBy(key_col).applyInPandasWithState(
        tracker,
        outputStructType=_weighted_reservoir_output_schema(key_col),
        stateStructType=WEIGHTED_RESERVOIR_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


SKYLINE3_STATE_SCHEMA = (
    "xs array<bigint>, ys array<bigint>, zs array<bigint>, n_seen bigint"
)


def _skyline3_output_schema(key_col: str) -> str:
    return f"{key_col} string, x bigint, y bigint, z bigint, n_seen bigint"


def skyline3_per_key(
    points: DataFrame, key_col: str = "event_type"
) -> DataFrame:
    """STREAMING 3-D skyline per key (minimize x, maximize y, maximize
    z) — skyline_per_key's dimensional generalization, using the batch
    skyline_nd sweep (round-12 seed shipped early): a 3-D frontier is
    not a staircase walk, so the tracker runs the lexicographic-min
    extraction + vectorized dominance-removal passes over
    state ∪ batch. Input: (key_col string, x, y, z bigint), NULLs
    pre-filtered by the caller.

    Same contract as the 2-D tracker: state is ONLY the frontier
    (dominated points never rejoin — points accumulate, so a dominator
    persists), the merge is associative in the input split, every batch
    re-emits the frontier under the monotone n_seen clock, no timeout.
    Expected 3-D frontier size for exchangeable points is
    O(log² n) — still bounded state, one power of log more than 2-D.
    """

    def tracker(key, pdfs, state):
        import numpy as np
        import pandas as pd

        (k,) = key
        xs, ys, zs, n_seen = state.get if state.exists else ([], [], [], 0)
        pts = {(int(a), int(b), int(c)) for a, b, c in zip(xs, ys, zs)}
        for pdf in pdfs:
            n_seen += len(pdf)
            pts.update(
                (int(a), int(b), int(c))
                for a, b, c in zip(
                    pdf["x"].tolist(), pdf["y"].tolist(), pdf["z"].tolist()
                )
            )
        m = np.array(sorted(pts), dtype="int64")
        # all-minimize normalization: negate the maximize dims
        m[:, 1] = -m[:, 1]
        m[:, 2] = -m[:, 2]
        order = np.lexsort((m[:, 2], m[:, 1], m[:, 0]))
        m = m[order]
        frontier = []
        while m.shape[0]:
            p = m[0]  # lexicographic minimum: provably undominated
            frontier.append((int(p[0]), int(-p[1]), int(-p[2])))
            m = m[~(m >= p).all(axis=1)]
        frontier.sort()
        state.update(
            (
                [p[0] for p in frontier],
                [p[1] for p in frontier],
                [p[2] for p in frontier],
                n_seen,
            )
        )
        yield pd.DataFrame(
            [
                {key_col: k, "x": x, "y": y, "z": z, "n_seen": n_seen}
                for x, y, z in frontier
            ]
        )

    return points.groupBy(key_col).applyInPandasWithState(
        tracker,
        outputStructType=_skyline3_output_schema(key_col),
        stateStructType=SKYLINE3_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
