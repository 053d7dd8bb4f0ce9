"""Bloom-decontamination streaming filter: no false negatives, bounded
false positives, batch/stream equivalence."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from rag_vertex_ai_vector_search_spark.streaming.filter import (
    GramBloom,
    build_gram_bloom,
    contaminated_expr,
    stream_training_filter,
)

# Slow tier: excluded from the per-commit fast gate (pytest -m "not full");
# the full suite still runs before a round is declared done.
pytestmark = pytest.mark.full



def test_bloom_no_false_negatives_bounded_false_positives():
    rng = np.random.RandomState(7)
    members = rng.randint(0, 2**60, size=20_000).astype(np.uint64)
    others = rng.randint(0, 2**60, size=20_000).astype(np.uint64)
    others = np.setdiff1d(others, members)
    bloom = GramBloom(np.zeros(20_000 * 10 // 8, dtype=np.uint8), 20_000 * 10)
    bloom.add(members)
    assert bloom.maybe_contains(members).all()           # zero false negatives
    fp = bloom.maybe_contains(others).mean()
    assert fp < 0.03                                     # ~1% design point


def test_contaminated_expr_flags_overlap(spark):
    ev = spark.createDataFrame(
        [(100, "the quick brown fox jumps over the lazy dog")],
        "doc_id long, text string",
    )
    bloom = build_gram_bloom(ev, n=5)
    docs = spark.createDataFrame(
        [(1, "prefix the quick brown fox jumps over the lazy dog suffix"),
         (2, "completely different material on query planning in spark")],
        "doc_id long, text string",
    )
    out = docs.withColumn("bad", contaminated_expr(docs, bloom, n=5)).collect()
    flags = {r.doc_id: r.bad for r in out}
    assert flags == {1: True, 2: False}


def test_stream_filter_matches_batch_filter(spark, tmp_path):
    """The same filter applied via readStream equals the batch result:
    stateless narrow ops are batch/stream invariant."""
    docs = [
        (i, "en", f"document number {i} with some unique words here "
                  f"plus filler content segment {i * 7} and more text "
                  f"about topic {i % 13} expanding the quality length")
        for i in range(60)
    ]
    # plant benchmark overlap in docs 10..14
    bench_text = "benchmark answer alpha beta gamma delta epsilon zeta eta"
    docs = [
        (i, lang, t + " " + bench_text) if 10 <= i < 15 else (i, lang, t)
        for (i, lang, t) in docs
    ]
    schema = "doc_id long, lang string, text string"
    df = spark.createDataFrame(docs, schema)
    ev = spark.createDataFrame([(999, bench_text)], "doc_id long, text string")
    bloom = build_gram_bloom(ev, n=5)

    batch = stream_training_filter(
        df, bloom, quality_threshold=0.2, rates={"en": 0.8}
    )
    batch_ids = sorted(r.doc_id for r in batch.collect())
    assert set(range(10, 15)).isdisjoint(batch_ids)  # contaminated gone
    assert len(batch_ids) > 20                        # most clean docs kept

    src = str(tmp_path / "src")
    out_path = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    df.write.mode("overwrite").parquet(src)
    stream = spark.readStream.schema(schema).parquet(src)
    q = (
        stream_training_filter(
            stream, bloom, quality_threshold=0.2, rates={"en": 0.8}
        )
        .writeStream.format("parquet")
        .option("path", out_path)
        .option("checkpointLocation", ckpt)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    stream_ids = sorted(
        r.doc_id for r in spark.read.parquet(out_path).collect()
    )
    assert stream_ids == batch_ids
