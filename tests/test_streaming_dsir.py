"""Streaming DSIR model maintenance == batch bucket counts,
replay-idempotent, compaction-stable; the importance scorer reads the
maintained model bit-equal to batch self-modeling
(streaming/dsir_stream.py)."""

import glob

from pyspark.sql import functions as F

from rag_vertex_ai_vector_search_spark.operators.importance import (
    dsir_log_importance,
    hashed_gram_bucket_counts,
)
from rag_vertex_ai_vector_search_spark.sources import load_table
from rag_vertex_ai_vector_search_spark.streaming.dsir_stream import (
    apply_dsir_batch,
    compact_dsir_model,
    read_dsir_model,
    stream_dsir_model,
)

import pytest

# Slow tier: excluded from the per-commit fast gate (pytest -m "not full");
# the full suite still runs before a round is declared done.
pytestmark = pytest.mark.full


B = 512  # small bucket space keeps the fixture tables tiny


def _assert_same(a, b):
    assert a.exceptAll(b).isEmpty() and b.exceptAll(a).isEmpty()


def _batch_model(docs):
    return hashed_gram_bucket_counts(docs, n_buckets=B).withColumn(
        "n", F.col("n").cast("long")
    )


def test_stream_dsir_model_matches_batch(spark, sf_smoke, tmp_path):
    docs = load_table(spark, sf_smoke, "documents").select("doc_id", "text")
    src = str(tmp_path / "src")
    table = str(tmp_path / "model")
    ckpt = str(tmp_path / "ckpt")
    docs.repartition(3).write.parquet(src)

    stream = spark.readStream.schema(docs.schema).option(
        "maxFilesPerTrigger", 1
    ).parquet(src)
    q = stream_dsir_model(stream, table, checkpoint_dir=ckpt, n_buckets=B)
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    epochs = spark.read.parquet(table).select("_epoch").distinct().count()
    assert epochs >= 2, "stream must have produced multiple micro-batches"
    _assert_same(read_dsir_model(spark, table), _batch_model(docs))


def test_dsir_replay_idempotent_and_scorer_parity(spark, sf_smoke, tmp_path):
    """Replaying an epoch changes nothing, and scoring under the
    maintained raw model is BIT-equal to batch self-scoring (the
    additive-counts argument: each doc arrives in exactly one batch)."""
    docs = load_table(spark, sf_smoke, "documents").select(
        "doc_id", "text", "lang"
    )
    table = str(tmp_path / "model")
    apply_dsir_batch(
        docs.filter(F.col("doc_id") % 2 == 0), 0, table, n_buckets=B
    )
    apply_dsir_batch(
        docs.filter(F.col("doc_id") % 2 == 1), 1, table, n_buckets=B
    )
    apply_dsir_batch(
        docs.filter(F.col("doc_id") % 2 == 1), 1, table, n_buckets=B
    )  # at-least-once replay
    maintained = read_dsir_model(spark, table)
    _assert_same(maintained, _batch_model(docs))

    target = docs.filter(F.col("lang") == "en")
    scored_stream = dsir_log_importance(
        docs, target, n_buckets=B, raw_counts=maintained
    )
    scored_batch = dsir_log_importance(docs, target, n_buckets=B)
    _assert_same(scored_stream, scored_batch)


def test_dsir_compaction_folds_epochs(spark, sf_smoke, tmp_path):
    docs = load_table(spark, sf_smoke, "documents").select("doc_id", "text")
    table = str(tmp_path / "model")
    for i in range(4):
        apply_dsir_batch(
            docs.filter(F.col("doc_id") % 4 == i), i, table, n_buckets=B
        )
    expected = read_dsir_model(spark, table).collect()

    compact_dsir_model(spark, table)
    dirs = sorted(glob.glob(table + "/_epoch=*"))
    assert dirs == [table + "/_epoch=-1"]
    after = read_dsir_model(spark, table)
    _assert_same(after, spark.createDataFrame(expected, after.schema))
