"""STREAM_UPDATE analog: streaming micro-batches merge into the index
(index_manager.py:53; upsert setup_vector_search.py:147-153)."""

import time

from pyspark.sql import functions as F

import pytest

# Slow tier: excluded from the per-commit fast gate (pytest -m "not full");
# the full suite still runs before a round is declared done.
pytestmark = pytest.mark.full



def test_stream_merge_into_index(spark, tmp_path):
    from rag_vertex_ai_vector_search_spark.streaming import stream_merge_into_index

    src = str(tmp_path / "incoming")
    index_path = str(tmp_path / "index")
    ckpt = str(tmp_path / "ckpt")

    schema = "doc_id long, text string"
    # batch 1: 5 docs
    spark.createDataFrame(
        [(i, f"first version of doc {i}") for i in range(5)], schema
    ).write.mode("append").parquet(src)

    stream = spark.readStream.schema(schema).parquet(src)
    q = stream_merge_into_index(
        stream, index_path, checkpoint_dir=ckpt, dim=8
    )
    try:
        q.processAllAvailable()
        first = spark.read.parquet(index_path).collect()
        assert len(first) == 5

        # batch 2: 3 updated docs (same ids -> same sha256 keys) + 2 new
        spark.createDataFrame(
            [(i, f"updated doc {i}") for i in range(3)]
            + [(i, f"new doc {i}") for i in (10, 11)],
            schema,
        ).write.mode("append").parquet(src)
        q.processAllAvailable()
    finally:
        q.stop()

    final = spark.read.parquet(index_path)
    assert final.count() == 7  # 5 + 2 new; 3 replaced in place
    assert final.select("data_point_id").distinct().count() == 7

    # replaced rows carry the new content's embedding: compare against a
    # fresh batch ingest of the same final corpus (streaming == batch).
    from rag_vertex_ai_vector_search_spark.operators import ingest_documents

    batch_docs = spark.createDataFrame(
        [(i, f"updated doc {i}") for i in range(3)]
        + [(i, f"first version of doc {i}") for i in (3, 4)]
        + [(i, f"new doc {i}") for i in (10, 11)],
        schema,
    )
    expected = ingest_documents(batch_docs, dim=8).datapoints
    diff_a = final.select("data_point_id", "feature_vector").exceptAll(
        expected.select("data_point_id", "feature_vector")
    )
    assert diff_a.isEmpty()


def test_stream_merge_rewrites_only_touched_buckets(spark, tmp_path):
    """The scale contract of the bucketed merge: a micro-batch must leave
    every bucket directory it didn't touch byte-for-byte identical, and
    per-batch work is O(touched buckets), not O(index)."""
    import hashlib
    import os

    from rag_vertex_ai_vector_search_spark.streaming import stream_merge_into_index

    src = str(tmp_path / "incoming")
    index_path = str(tmp_path / "index")
    ckpt = str(tmp_path / "ckpt")
    schema = "doc_id long, text string"

    spark.createDataFrame(
        [(i, f"doc {i}") for i in range(40)], schema
    ).write.mode("append").parquet(src)

    stream = spark.readStream.schema(schema).parquet(src)
    q = stream_merge_into_index(
        stream, index_path, checkpoint_dir=ckpt, dim=8, n_buckets=16
    )

    def snapshot():
        out = {}
        for root, _, files in os.walk(index_path):
            for f in files:
                if f.startswith(("_", ".")):
                    continue
                p = os.path.join(root, f)
                with open(p, "rb") as fh:
                    out[os.path.relpath(p, index_path)] = hashlib.md5(
                        fh.read()
                    ).hexdigest()
        return out

    try:
        q.processAllAvailable()
        before = snapshot()
        assert before, "first batch wrote no files"

        # update exactly one doc -> exactly one bucket touched
        spark.createDataFrame(
            [(7, "doc 7 v2")], schema
        ).write.mode("append").parquet(src)
        q.processAllAvailable()
    finally:
        q.stop()

    touched = spark.sql(
        "SELECT pmod(xxhash64(sha2(concat_ws('||', CAST(7 AS STRING)), 256)), 16)"
    ).first()[0]
    after = snapshot()
    changed_buckets = {
        p.split("/")[0]
        for p in set(before) ^ set(after)
        | {p for p in set(before) & set(after) if before[p] != after[p]}
    }
    assert changed_buckets == {f"_bucket={touched}"}, changed_buckets
    untouched_before = {p: h for p, h in before.items()
                        if not p.startswith(f"_bucket={touched}")}
    untouched_after = {p: h for p, h in after.items()
                       if not p.startswith(f"_bucket={touched}")}
    assert untouched_before == untouched_after

    final = spark.read.parquet(index_path)
    assert final.count() == 40
    assert final.select("data_point_id").distinct().count() == 40
