"""stream_dedup_exact: duplicate suppression with bounded state."""

from datetime import datetime

from rag_vertex_ai_vector_search_spark.streaming import stream_dedup_exact

import pytest

# Slow tier: excluded from the per-commit fast gate (pytest -m "not full");
# the full suite still runs before a round is declared done.
pytestmark = pytest.mark.full



def _ts(s):
    return datetime.fromisoformat(s)


def test_duplicates_within_horizon_suppressed(spark, tmp_path):
    src = str(tmp_path / "stream_src")
    schema = "doc_id long, ts timestamp, text string"

    batch1 = [
        (1, _ts("2024-01-01 10:00:00"), "alpha beta gamma"),
        (2, _ts("2024-01-01 10:00:30"), "Alpha  Beta   GAMMA"),  # same normalized
        (3, _ts("2024-01-01 10:01:00"), "something else"),
    ]
    spark.createDataFrame(batch1, schema).write.mode("append").parquet(src)

    stream = spark.readStream.schema(schema).parquet(src)
    deduped = stream_dedup_exact(stream, horizon="10 minutes")
    q = (
        deduped.writeStream.outputMode("append")
        .format("memory")
        .queryName("dedup_out")
        .start()
    )
    try:
        q.processAllAvailable()
        # a later micro-batch re-sends the same content within horizon
        spark.createDataFrame(
            [(4, _ts("2024-01-01 10:02:00"), "alpha beta gamma")], schema
        ).write.mode("append").parquet(src)
        q.processAllAvailable()
        out = spark.sql("SELECT doc_id, fingerprint FROM dedup_out").collect()
    finally:
        q.stop()

    ids = sorted(r.doc_id for r in out)
    # one of {1,2} survives (micro-batch order is not defined between
    # equal-content rows), 3 survives, 4 (same content, within horizon)
    # is suppressed
    assert len(ids) == 2 and ids[1] == 3 and ids[0] in (1, 2)
    # fingerprints are distinct by construction
    assert len({r.fingerprint for r in out}) == 2


def test_state_is_per_fingerprint_not_per_row(spark, tmp_path):
    """100 duplicate rows collapse to one output row -- the state the
    query carries is one fingerprint, not 100 rows."""
    src = str(tmp_path / "stream_src2")
    schema = "doc_id long, ts timestamp, text string"
    rows = [
        (i, _ts("2024-01-01 10:00:00"), "same text every time")
        for i in range(100)
    ]
    spark.createDataFrame(rows, schema).write.mode("append").parquet(src)
    stream = spark.readStream.schema(schema).parquet(src)
    q = (
        stream_dedup_exact(stream)
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("dedup_out2")
        .start()
    )
    try:
        q.processAllAvailable()
        n = spark.sql("SELECT count(*) AS n FROM dedup_out2").first().n
    finally:
        q.stop()
    assert n == 1
