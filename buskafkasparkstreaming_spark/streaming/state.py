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
        for pdf in pdfs:
            n += len(pdf)
            total += float(pdf["value"].sum())
            batch_max = pdf["ts"].max()
            max_ts = batch_max if max_ts is None else max(max_ts, batch_max)
        state.update((n, total, max_ts))
        state.setTimeoutTimestamp(state.getCurrentWatermarkMs() + timeout_ms)
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
