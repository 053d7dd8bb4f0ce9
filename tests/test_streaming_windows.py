"""Structured Streaming event-time windows + watermark (late-data
handling) over the events schema -- the streaming face of
q_events_hourly."""

from datetime import datetime

from pyspark.sql import functions as F


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
