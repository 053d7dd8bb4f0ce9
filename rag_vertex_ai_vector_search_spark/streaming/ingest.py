"""Continuous ingest: the STREAM_UPDATE analog.

The reference declares its index STREAM_UPDATE (index_manager.py:53)
and mutates it live via upsert_datapoints (setup_vector_search.py:
147-153). Structured Streaming gives the same contract: a stream of
document rows, each micro-batch embedded and MERGEd into the index
table by key via ``foreachBatch`` -- exactly-once per batch under the
checkpoint + idempotent-merge combination (merge is keyed, so replays
converge).

Without Delta in this image, the merge is copy-on-write parquet
(operators/upsert.merge_by_key + full rewrite). That is O(index) per
batch -- fine for tests, unacceptable at 100 TB, where the same
``foreachBatch`` body targets Delta/Iceberg MERGE INTO instead; the
operator seam (a DataFrame-in, DataFrame-out merge) is storage-agnostic
by design.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..operators.ingest import ingest_documents
from ..operators.upsert import merge_by_key


def stream_merge_into_index(
    stream_df: DataFrame,
    index_path: str,
    *,
    checkpoint_dir: str,
    dim: int = 64,
    id_source_col: str = "doc_id",
    text_col: str = "text",
    trigger_seconds: int | None = None,
):
    """Start a streaming query that upserts each micro-batch of documents
    into the datapoints table at ``index_path``.

    Returns the StreamingQuery; callers drive it with
    ``processAllAvailable()`` in tests or ``awaitTermination()`` in prod
    (the reference's LRO wait, index_manager.py:117-138, becomes this).
    """

    def _merge_batch(batch_df: DataFrame, epoch_id: int) -> None:
        if batch_df.isEmpty():
            return
        spark = batch_df.sparkSession
        result = ingest_documents(
            batch_df, id_source_col=id_source_col, text_col=text_col, dim=dim
        )
        updates = result.datapoints
        try:
            base = spark.read.parquet(index_path)
            merged = merge_by_key(base, updates, key="data_point_id")
        except Exception:
            merged = updates  # first batch: nothing to merge into
        # Copy-on-write: cut lineage (materialize) before overwriting the
        # path the plan reads from, else the overwrite invalidates its
        # own input.
        merged.localCheckpoint(eager=True).write.mode("overwrite").parquet(index_path)

    writer = stream_df.writeStream.foreachBatch(_merge_batch).option(
        "checkpointLocation", checkpoint_dir
    )
    if trigger_seconds:
        writer = writer.trigger(processingTime=f"{trigger_seconds} seconds")
    return writer.start()
