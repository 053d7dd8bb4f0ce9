"""Custom stateful streaming sessionizer (applyInPandasWithState)."""

from datetime import datetime, timedelta

from rag_vertex_ai_vector_search_spark.streaming.stateful import stream_sessionize

import pytest

# Slow tier: excluded from the per-commit fast gate (pytest -m "not full");
# the full suite still runs before a round is declared done.
pytestmark = pytest.mark.full



def test_stateful_sessionizer_emits_closed_sessions(spark, tmp_path):
    src = str(tmp_path / "src")
    schema = "user_id bigint, ts timestamp"
    t0 = datetime(2024, 1, 1, 10, 0, 0)

    # user 1: burst of 3 events, then (next batch) an event 2h later ->
    # first session closes with 3 events. user 2: single event.
    spark.createDataFrame(
        [
            (1, t0),
            (1, t0 + timedelta(minutes=5)),
            (1, t0 + timedelta(minutes=10)),
            (2, t0),
        ],
        schema,
    ).write.mode("append").parquet(src)

    stream = spark.readStream.schema(schema).parquet(src)
    q = stream_sessionize(stream, str(tmp_path / "ckpt"), "sessions_out")
    try:
        q.processAllAvailable()
        # gap of 2h closes user 1's first session
        spark.createDataFrame(
            [(1, t0 + timedelta(hours=2))], schema
        ).write.mode("append").parquet(src)
        q.processAllAvailable()
        rows = spark.sql("SELECT * FROM sessions_out").collect()
    finally:
        q.stop()

    closed = {(r.user_id, r.n_events, r.session_start, r.session_end) for r in rows}
    # user 1's first session closes inline when the 2h-later event arrives
    assert (1, 3, t0, t0 + timedelta(minutes=10)) in closed
    # user 2 may also close via event-time timeout (watermark passed
    # t0+30min); if emitted it must be the single-event session
    u2 = [c for c in closed if c[0] == 2]
    assert all(c == (2, 1, t0, t0) for c in u2)
