"""Structured Streaming event-time windows + watermark (late-data
handling) over the events schema -- the streaming face of
q_events_hourly."""

from datetime import datetime

from pyspark.sql import functions as F

import pytest

# Slow tier: excluded from the per-commit fast gate (pytest -m "not full");
# the full suite still runs before a round is declared done.
pytestmark = pytest.mark.full



def _ts(s):
    return datetime.fromisoformat(s)


def test_windowed_agg_with_watermark(spark, tmp_path):
    src = str(tmp_path / "stream_src")
    schema = "event_id long, ts timestamp, event_type string, value double"

    rows1 = [
        (1, _ts("2024-01-01 10:01:00"), "a", 1.0),
        (2, _ts("2024-01-01 10:04:00"), "a", 2.0),
        (3, _ts("2024-01-01 10:07:00"), "b", 3.0),
    ]
    spark.createDataFrame(rows1, schema).write.mode("append").parquet(src)

    stream = spark.readStream.schema(schema).parquet(src)
    agg = (
        stream.withWatermark("ts", "10 minutes")
        .groupBy(F.window("ts", "5 minutes"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("v"))
    )
    q = (
        agg.writeStream.outputMode("update")
        .format("memory")
        .queryName("win_out")
        .start()
    )
    try:
        q.processAllAvailable()

        # a late-but-within-watermark row lands in its original window
        spark.createDataFrame(
            [(4, _ts("2024-01-01 10:03:00"), "a", 10.0)], schema
        ).write.mode("append").parquet(src)
        q.processAllAvailable()

        out = spark.sql(
            "SELECT window.start AS ws, event_type, n, v FROM win_out"
        ).collect()
    finally:
        q.stop()

    latest = {}
    for r in out:  # update mode re-emits; keep the last state per key
        latest[(str(r.ws), r.event_type)] = (r.n, r.v)
    # events 1 (10:01) + 2 (10:04) + late 4 (10:03) all in [10:00,10:05)
    assert latest[("2024-01-01 10:00:00", "a")] == (3, 13.0)
    assert latest[("2024-01-01 10:05:00", "b")] == (1, 3.0)


def test_builtin_session_window_equals_manual_sessionize(spark):
    """Spark's built-in session_window aggregate reproduces the manual
    lag+cumsum sessionization (q_events_sessionize) on the fixture --
    same session count, bounds and event counts per user -- INCLUDING
    the exactly-one-gap boundary: an event exactly `gap` after its
    predecessor MERGES under both rules (session_window extends to
    ts+gap inclusive, matching the manual strict `> gap` split test);
    the boundary case is pinned explicitly below."""
    from tests.conftest import SF_SMOKE

    from rag_vertex_ai_vector_search_spark.sources import load_table

    ev = load_table(spark, SF_SMOKE, "events")
    builtin = (
        ev.groupBy(F.session_window("ts", "30 minutes"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"),
             F.min("ts").alias("session_start"),
             F.max("ts").alias("session_end"))
        .select("user_id", "n_events", "session_start", "session_end")
    )
    import __spark_entry__ as entrymod

    manual = entrymod.q_events_sessionize(spark, SF_SMOKE).select(
        "user_id", "n_events", "session_start", "session_end"
    )
    b = sorted(map(tuple, builtin.collect()))
    m = sorted(map(tuple, manual.collect()))
    assert b == m and len(b) > 0

    # the boundary: a second event at EXACTLY the 30-minute gap
    rows = [
        (1, _ts("2024-01-01 10:00:00"), 7, "view", 0.0),
        (2, _ts("2024-01-01 10:30:00"), 7, "view", 0.0),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long,"
        " event_type string, value double",
    )
    n_builtin = (
        df.groupBy(F.session_window("ts", "30 minutes"), "user_id")
        .count().count()
    )
    assert n_builtin == 1  # exact-gap event merges, same as manual > gap


def test_session_window_streaming_matches_batch(spark, tmp_path):
    """The same session_window aggregate run as a STREAM (append mode,
    watermark-closed sessions) emits the batch sessions exactly."""
    src = str(tmp_path / "sess_src")
    schema = "event_id long, ts timestamp, user_id long, value double"
    rows = [
        (1, _ts("2024-01-01 10:00:00"), 7, 1.0),
        (2, _ts("2024-01-01 10:10:00"), 7, 2.0),   # merges with 1
        (3, _ts("2024-01-01 11:30:00"), 7, 3.0),   # new session
        (4, _ts("2024-01-01 10:05:00"), 8, 4.0),
        # late-horizon closer: advances the watermark past everything
        (5, _ts("2024-01-02 09:00:00"), 9, 0.0),
    ]
    import pyspark.sql.functions as SF

    spark.createDataFrame(rows, schema).write.parquet(src)
    stream = spark.readStream.schema(schema).parquet(src)
    agg = (
        stream.withWatermark("ts", "10 minutes")
        .groupBy(SF.session_window("ts", "30 minutes"), "user_id")
        .agg(SF.count(SF.lit(1)).alias("n"), SF.sum("value").alias("v"))
    )
    q = (
        agg.writeStream.outputMode("append")
        .format("memory").queryName("sess_out").start()
    )
    try:
        q.processAllAvailable()
        got = {
            (r.user_id, r.n, r.v)
            for r in spark.sql("SELECT user_id, n, v FROM sess_out").collect()
        }
    finally:
        q.stop()
    # sessions strictly before the watermark horizon have emitted
    assert {(7, 2, 3.0), (7, 1, 3.0), (8, 1, 4.0)} <= got
