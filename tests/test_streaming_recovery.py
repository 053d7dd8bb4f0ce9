"""Checkpoint-restart recovery for the streaming family (VERDICT r10 #1).

Every maintenance gate so far ran its micro-batches in ONE query
lifetime; these tests exercise the actual production restart path of a
STREAM_UPDATE ingest (reference vector_store/utils/index_manager.py:53
-- a long-lived, restartable process): stop a query after a committed
batch (and separately: kill it mid-epoch after the sink wrote but
before the checkpoint committed), restart from the SAME
checkpointLocation, drain, and assert the maintained table / emitted
set bit-equals an uninterrupted run.

Two representative queries, per the two streaming execution styles:

- foreachBatch maintenance sink (streaming/vocab.py): recovery comes
  from epoch-partitioned dynamic overwrite -- a replayed epoch
  overwrites only its own partition, so at-least-once delivery still
  yields exactly-once table contents.
- state-store query (streaming/dedup.py::stream_dedup_exact): recovery
  comes from the HDFS-backed state store -- dedup state committed
  before the stop must survive the restart and keep suppressing
  duplicates that arrive after it.
"""

from datetime import datetime

import pytest

from rag_vertex_ai_vector_search_spark.streaming import vocab as vocab_mod
from rag_vertex_ai_vector_search_spark.streaming.dedup import (
    stream_dedup_exact,
)
from rag_vertex_ai_vector_search_spark.streaming.vocab import (
    read_vocab,
    stream_vocab_counts,
)

# Slow tier: real micro-batched lifecycles with restarts.
pytestmark = pytest.mark.full

DOC_SCHEMA = "doc_id long, text string"
TS_SCHEMA = "doc_id long, ts timestamp, text string"


def _ts(s):
    return datetime.fromisoformat(s)


_VOCAB_BATCHES = [
    [(1, "alpha beta gamma"), (2, "beta gamma delta")],
    [(3, "gamma delta epsilon"), (4, "alpha alpha beta")],
    [(5, "zeta eta theta alpha"), (6, "beta beta gamma gamma")],
]


def _write_batch(spark, rows, schema, src):
    # coalesce(1): mid-run appends to a running file-source stream must
    # be single-file atomic (CLAUDE.md streaming-append rule).
    spark.createDataFrame(rows, schema).coalesce(1).write.mode(
        "append"
    ).parquet(src)


def _vocab_uninterrupted(spark, tmp_path, tag):
    """Reference run: all three batches in one query lifetime."""
    src = str(tmp_path / f"src_{tag}")
    table = str(tmp_path / f"table_{tag}")
    ckpt = str(tmp_path / f"ckpt_{tag}")
    _write_batch(spark, _VOCAB_BATCHES[0], DOC_SCHEMA, src)
    stream = spark.readStream.schema(DOC_SCHEMA).parquet(src)
    q = stream_vocab_counts(stream, table, checkpoint_dir=ckpt)
    try:
        q.processAllAvailable()
        for rows in _VOCAB_BATCHES[1:]:
            _write_batch(spark, rows, DOC_SCHEMA, src)
            q.processAllAvailable()
    finally:
        q.stop()
    return sorted(
        (r.word, r.n) for r in read_vocab(spark, table).collect()
    )


def test_vocab_restart_after_committed_batch_equals_uninterrupted(
    spark, tmp_path
):
    """Stop after each committed batch; restart from the same
    checkpointLocation; the maintained table bit-equals one lifetime."""
    src = str(tmp_path / "src_r")
    table = str(tmp_path / "table_r")
    ckpt = str(tmp_path / "ckpt_r")

    _write_batch(spark, _VOCAB_BATCHES[0], DOC_SCHEMA, src)
    for i in range(3):  # three separate query lifetimes, one per batch
        stream = spark.readStream.schema(DOC_SCHEMA).parquet(src)
        q = stream_vocab_counts(stream, table, checkpoint_dir=ckpt)
        try:
            q.processAllAvailable()
        finally:
            q.stop()
        if i < 2:
            _write_batch(spark, _VOCAB_BATCHES[i + 1], DOC_SCHEMA, src)

    got = sorted((r.word, r.n) for r in read_vocab(spark, table).collect())
    want = _vocab_uninterrupted(spark, tmp_path, "uvocab")
    assert got == want
    # each batch committed as its own epoch partition across restarts
    epochs = {
        r._epoch for r in spark.read.parquet(table).select("_epoch").collect()
    }
    assert len(epochs) == 3


def test_vocab_killed_epoch_is_replayed_and_overwritten(
    spark, tmp_path, monkeypatch
):
    """Kill the query mid-epoch AFTER the sink wrote its partition but
    BEFORE the checkpoint committed: the restart must replay the epoch
    and dynamic-overwrite must wholesale-replace the poisoned partial,
    so the final table still bit-equals an uninterrupted run."""
    src = str(tmp_path / "src_k")
    table = str(tmp_path / "table_k")
    ckpt = str(tmp_path / "ckpt_k")

    _write_batch(spark, _VOCAB_BATCHES[0], DOC_SCHEMA, src)
    q = stream_vocab_counts(
        spark.readStream.schema(DOC_SCHEMA).parquet(src),
        table,
        checkpoint_dir=ckpt,
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    # Lifetime 2 crashes mid-epoch: the wrapper writes a POISONED
    # partial (counts x100) under the epoch partition, then dies before
    # foreachBatch returns -- data files landed, checkpoint did not
    # commit. This is the worst-ordered crash for the maintenance sink.
    real_apply = vocab_mod.apply_vocab_batch

    def _poison_then_crash(batch_df, epoch_id, table_path, **kw):
        from pyspark.sql import functions as F

        partial = vocab_mod.vocab_partial(batch_df, **kw).withColumn(
            "n", F.col("n") * 100
        )
        (
            partial.withColumn("_epoch", F.lit(int(epoch_id)))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("_epoch")
            .parquet(table_path)
        )
        raise RuntimeError("simulated crash after sink write")

    monkeypatch.setattr(vocab_mod, "apply_vocab_batch", _poison_then_crash)
    _write_batch(spark, _VOCAB_BATCHES[1], DOC_SCHEMA, src)
    q = stream_vocab_counts(
        spark.readStream.schema(DOC_SCHEMA).parquet(src),
        table,
        checkpoint_dir=ckpt,
    )
    with pytest.raises(Exception, match="simulated crash"):
        try:
            q.processAllAvailable()
        finally:
            q.stop()
    monkeypatch.undo()

    # the poisoned partial IS on disk at this point (the crash window)
    poisoned = {
        r.word: r.n for r in read_vocab(spark, table).collect()
    }
    assert any(n >= 100 for n in poisoned.values())

    # Lifetime 3: restart with the real sink; Spark replays the
    # uncommitted epoch; dynamic overwrite replaces the poisoned
    # partition; then the final batch streams through normally.
    q = stream_vocab_counts(
        spark.readStream.schema(DOC_SCHEMA).parquet(src),
        table,
        checkpoint_dir=ckpt,
    )
    try:
        q.processAllAvailable()
        _write_batch(spark, _VOCAB_BATCHES[2], DOC_SCHEMA, src)
        q.processAllAvailable()
    finally:
        q.stop()

    got = sorted((r.word, r.n) for r in read_vocab(spark, table).collect())
    want = _vocab_uninterrupted(spark, tmp_path, "uvocab_k")
    assert got == want


_DEDUP_BATCHES = [
    # batch contents are internally unique; duplicates only occur
    # ACROSS batches, so the surviving doc_id per fingerprint is
    # deterministic (first arrival) and the emitted set is comparable
    # bit-for-bit between the restarted and uninterrupted runs.
    [
        (1, _ts("2024-01-01 10:00:00"), "alpha beta gamma"),
        (2, _ts("2024-01-01 10:00:30"), "something else"),
    ],
    [
        (3, _ts("2024-01-01 10:01:00"), "alpha beta gamma"),  # dup of 1
        (4, _ts("2024-01-01 10:01:30"), "fresh content one"),
    ],
    [
        (5, _ts("2024-01-01 10:02:00"), "Something   ELSE"),  # dup of 2
        (6, _ts("2024-01-01 10:02:30"), "fresh content two"),
    ],
]


def _start_dedup(spark, src, out, ckpt):
    stream = spark.readStream.schema(TS_SCHEMA).parquet(src)
    return (
        stream_dedup_exact(stream, horizon="10 minutes")
        .writeStream.outputMode("append")
        .format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .start()
    )


def _dedup_emitted(spark, out):
    return sorted(
        (r.doc_id, r.fingerprint)
        for r in spark.read.parquet(out)
        .select("doc_id", "fingerprint")
        .collect()
    )


def test_dedup_state_survives_restart(spark, tmp_path):
    """The dedup state store must be restored across restarts: a
    duplicate arriving AFTER the stop, within the watermark horizon,
    is still suppressed, and the emitted set bit-equals an
    uninterrupted run (no duplicates, no losses)."""
    src = str(tmp_path / "dsrc")
    out = str(tmp_path / "dout")
    ckpt = str(tmp_path / "dckpt")

    _write_batch(spark, _DEDUP_BATCHES[0], TS_SCHEMA, src)
    for i in range(3):  # one query lifetime per batch
        q = _start_dedup(spark, src, out, ckpt)
        try:
            q.processAllAvailable()
        finally:
            q.stop()
        if i < 2:
            _write_batch(spark, _DEDUP_BATCHES[i + 1], TS_SCHEMA, src)

    # uninterrupted reference run
    usrc = str(tmp_path / "usrc")
    uout = str(tmp_path / "uout")
    uckpt = str(tmp_path / "uckpt")
    _write_batch(spark, _DEDUP_BATCHES[0], TS_SCHEMA, usrc)
    q = _start_dedup(spark, usrc, uout, uckpt)
    try:
        q.processAllAvailable()
        for rows in _DEDUP_BATCHES[1:]:
            _write_batch(spark, rows, TS_SCHEMA, usrc)
            q.processAllAvailable()
    finally:
        q.stop()

    got = _dedup_emitted(spark, out)
    want = _dedup_emitted(spark, uout)
    assert got == want
    # and the semantics themselves: 3 and 5 (cross-lifetime duplicates
    # of 1 and 2) were suppressed BY RESTORED STATE; 4 and 6 passed.
    ids = [d for d, _ in got]
    assert sorted(ids) == [1, 2, 4, 6]
