"""Custom stateful streaming operator: incremental sessionization.

Batch sessionization (q_events_sessionize) needs the whole history; a
stream cannot re-scan it. This operator keeps per-user state (current
session start / last-seen / count) via ``applyInPandasWithState`` and
EMITS a session row when the inactivity gap closes it (processing-time
timeout), i.e. the same session semantics as the batch query but with
O(active users) state instead of O(history) input.

State shape per user: (session_start_us, last_ts_us, n_events).
Output: one row per CLOSED session. At 100 TB-scale event volumes the
state store only holds active users within the gap window -- the
watermark + EVENT-TIME timeout is what makes infinite streams finite
(processing-time timeouts would also make testing non-deterministic:
they trigger perpetual empty batches, so processAllAvailable never
settles -- observed empirically).
"""

from __future__ import annotations

from typing import Any, Iterator, Tuple

import pandas as pd
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

SESSION_GAP_US = 1800 * 1_000_000  # 30 min, matching the batch query

OUTPUT_SCHEMA = (
    "user_id bigint, session_start timestamp, session_end timestamp, "
    "n_events bigint"
)
STATE_SCHEMA = "start_us bigint, last_us bigint, n bigint"


def sessionize_with_state(
    key: Tuple[Any, ...],
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    """applyInPandasWithState function: emits closed sessions.

    Events inside a micro-batch are sorted by ts; a gap > SESSION_GAP_US
    closes the running session (emitting it) and opens a new one. On
    processing-time timeout the pending session is flushed.
    """
    (user_id,) = key

    if state.hasTimedOut:
        start_us, last_us, n = state.get
        state.remove()
        yield pd.DataFrame({
            "user_id": [user_id],
            "session_start": [pd.Timestamp(start_us, unit="us")],
            "session_end": [pd.Timestamp(last_us, unit="us")],
            "n_events": [n],
        })
        return  # timed-out invocations carry no new data

    ts_list: list[int] = []
    for pdf in pdfs:
        ts_list.extend(
            int(t.value // 1000) for t in pd.to_datetime(pdf["ts"])
        )
    ts_list.sort()

    if state.exists:
        start_us, last_us, n = state.get
    elif ts_list:
        start_us = last_us = ts_list[0]
        n = 0
    else:
        return

    closed = []
    for t in ts_list:
        if t - last_us > SESSION_GAP_US:
            closed.append((start_us, last_us, n))
            start_us, n = t, 0
        last_us = max(last_us, t)
        n += 1

    state.update((start_us, last_us, n))
    # Close the pending session once the event-time watermark passes
    # last_event + gap (the streaming analog of "no later event exists").
    state.setTimeoutTimestamp(last_us // 1000 + SESSION_GAP_US // 1000)

    if closed:
        yield pd.DataFrame({
            "user_id": [user_id] * len(closed),
            "session_start": [pd.Timestamp(s, unit="us") for s, _, _ in closed],
            "session_end": [pd.Timestamp(e, unit="us") for _, e, _ in closed],
            "n_events": [c for _, _, c in closed],
        })


def sessionized(events_stream):
    """The stateful-sessionizer transformation alone (watermark +
    applyInPandasWithState), sink-agnostic -- shared by the memory-sink
    helper below and the fault-tolerant parquet-sink variant the
    checkpoint-restart gates drive."""
    return (
        events_stream.withWatermark("ts", "30 minutes")
        .groupBy("user_id")
        .applyInPandasWithState(
            sessionize_with_state,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )


def stream_sessionize(events_stream, checkpoint_dir: str, query_name: str):
    """Wire the stateful sessionizer onto an events stream
    (schema: user_id bigint, ts timestamp, ...); returns the started
    StreamingQuery writing closed sessions to a memory sink."""
    return (
        sessionized(events_stream)
        .writeStream.outputMode("append")
        .format("memory")
        .queryName(query_name)
        .option("checkpointLocation", checkpoint_dir)
        .start()
    )


def stream_sessionize_to_parquet(
    events_stream, out_dir: str, checkpoint_dir: str
):
    """Same sessionizer, fault-tolerant parquet sink: the restartable
    production shape (memory sinks cannot recover across query
    lifetimes; parquet + checkpoint can, which is what
    tests/test_streaming_recovery.py proves for the per-user state)."""
    return (
        sessionized(events_stream)
        .writeStream.outputMode("append")
        .format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .start()
    )
