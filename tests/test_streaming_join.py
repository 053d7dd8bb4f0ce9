"""Stream-stream watermarked interval join (streaming/join.py):
stream == batch on complete input, interval bounds honored, fixture
composition (view -> click attribution over the events table)."""

from datetime import datetime

from pyspark.sql import functions as F

from rag_vertex_ai_vector_search_spark.sources import load_table
from rag_vertex_ai_vector_search_spark.streaming.join import (
    stream_interval_join,
)

import pytest

# Slow tier: excluded from the per-commit fast gate (pytest -m "not full");
# the full suite still runs before a round is declared done.
pytestmark = pytest.mark.full


SCHEMA = "event_id long, ts timestamp, user_id long, event_type string"


def _ts(s):
    return datetime.fromisoformat(s)


def _rows():
    views = [
        (1, _ts("2024-01-01 10:00:00"), 7, "view"),
        (2, _ts("2024-01-01 10:05:00"), 8, "view"),
        (3, _ts("2024-01-01 12:00:00"), 7, "view"),
    ]
    clicks = [
        (10, _ts("2024-01-01 10:10:00"), 7, "click"),   # in window of v1
        (11, _ts("2024-01-01 10:31:00"), 7, "click"),   # OUT (31 min after)
        (12, _ts("2024-01-01 10:06:00"), 8, "click"),   # in window of v2
        (13, _ts("2024-01-01 09:59:00"), 7, "click"),   # before any view
        (14, _ts("2024-01-01 12:20:00"), 7, "click"),   # in window of v3
    ]
    return views, clicks


def test_interval_join_stream_equals_batch(spark, tmp_path):
    views, clicks = _rows()
    vsrc, csrc = str(tmp_path / "v"), str(tmp_path / "c")
    spark.createDataFrame(views, SCHEMA).repartition(2).write.parquet(vsrc)
    spark.createDataFrame(clicks, SCHEMA).repartition(2).write.parquet(csrc)

    vb, cb = spark.read.parquet(vsrc), spark.read.parquet(csrc)
    batch = stream_interval_join(vb, cb).select(
        "l_event_id", "r_event_id"
    ).collect()
    expected = sorted((r.l_event_id, r.r_event_id) for r in batch)
    # the hand-derived attribution set
    assert expected == [(1, 10), (2, 12), (3, 14)]

    vs = spark.readStream.schema(vb.schema).option(
        "maxFilesPerTrigger", 1
    ).parquet(vsrc)
    cs = spark.readStream.schema(cb.schema).option(
        "maxFilesPerTrigger", 1
    ).parquet(csrc)
    out = stream_interval_join(vs, cs)
    q = (
        out.writeStream.outputMode("append")
        .format("memory")
        .queryName("attrib_out")
        .start()
    )
    try:
        q.processAllAvailable()
        got = sorted(
            (r.l_event_id, r.r_event_id)
            for r in spark.sql(
                "SELECT l_event_id, r_event_id FROM attrib_out"
            ).collect()
        )
    finally:
        q.stop()
    assert got == expected


def test_interval_join_on_fixture_events(spark, sf_smoke):
    """view -> click attribution over the real events fixture: the
    streaming-capable definition run in batch mode must equal a plain
    SQL interval join."""
    ev = load_table(spark, sf_smoke, "events").select(
        "event_id", "ts", "user_id", "event_type"
    )
    views = ev.filter(F.col("event_type") == "view")
    clicks = ev.filter(F.col("event_type") == "click")
    out = stream_interval_join(views, clicks, horizon="30 minutes")
    got = out.select("l_event_id", "r_event_id").collect()

    views.createOrReplaceTempView("_v")
    clicks.createOrReplaceTempView("_c")
    ref = spark.sql("""
        SELECT v.event_id AS a, c.event_id AS b
        FROM _v v JOIN _c c
          ON v.user_id = c.user_id
         AND c.ts >= v.ts AND c.ts <= v.ts + INTERVAL 30 MINUTES
    """).collect()
    assert sorted((r.l_event_id, r.r_event_id) for r in got) == sorted(
        (r.a, r.b) for r in ref
    )
    assert len(got) > 0  # the fixture actually exercises the window
