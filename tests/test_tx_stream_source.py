"""The `txtable` Structured Streaming source (r17,
sources/stream_source.py): offsets are commit versions, micro-batches
read append deltas from the immutable manifests. Pins: full-table
initial snapshot + incremental appends == read_table; schema pinned at
start with evolution null-backfill; partition-dir values re-typed;
change commits fail loudly unless skipChangeCommits; data-preserving
rewrites emit nothing; the batch `spark.read.format("txtable")` path
round-trips a snapshot. Reference anchor: index_manager.py:53's
STREAM_UPDATE index has no observable stream; this is the source half
of the tx layer's exactly-once story (sink half:
streaming_tx_merge_maintained)."""

import pytest
from pyspark.sql import functions as F

from rag_vertex_ai_vector_search_spark.sources.stream_source import (
    register_tx_stream_source,
)
from rag_vertex_ai_vector_search_spark.sources.txlog import (
    read_table,
    tx_append,
    tx_compact,
    tx_merge,
)


def _df(spark, lo, hi, mul=2):
    return spark.range(lo, hi).select(
        "id", (F.col("id") * mul).alias("v")
    )


def _drain_df(spark, path, tmp_path, name, **options):
    """Run the stream over the current backlog into a parquet file sink
    (recoverable, unlike the memory sink) and return the sink as a
    DataFrame. Same (sink, checkpoint) pair resumes exactly-once."""
    register_tx_stream_source(spark)
    reader = spark.readStream.format("txtable")
    for k, v in options.items():
        reader = reader.option(k, v)
    out = str(tmp_path / f"out_{name}")
    q = (
        reader.load(path)
        .writeStream.format("parquet")
        .option("path", out)
        .option(
            "checkpointLocation", str(tmp_path / f"ckpt_{name}")
        )
        .trigger(availableNow=True)
        .start()
    )
    try:
        q.awaitTermination(120)
    finally:
        if q.isActive:
            q.stop()
    spark.catalog.refreshByPath(out)
    return spark.read.parquet(out)


def _drain(spark, path, tmp_path, name, **options):
    return _drain_df(spark, path, tmp_path, name, **options).collect()


def test_stream_equals_snapshot_after_appends(spark, tmp_path):
    path = str(tmp_path / "t")
    tx_append(spark, path, _df(spark, 0, 10).repartition(2))
    tx_append(spark, path, _df(spark, 10, 15))
    got = sorted((r["id"], r["v"]) for r in _drain(
        spark, path, tmp_path, "tx_src_appends"
    ))
    want = sorted(
        (r["id"], r["v"])
        for r in read_table(spark, path).collect()
    )
    assert got == want and len(got) == 15


@pytest.mark.full
def test_stream_resumes_from_checkpoint_exactly_once(spark, tmp_path):
    path = str(tmp_path / "t")
    tx_append(spark, path, _df(spark, 0, 5))
    first = _drain(spark, path, tmp_path, "tx_src_resume")
    assert len(first) == 5
    tx_append(spark, path, _df(spark, 5, 8))
    # same (sink, checkpoint) pair: only the NEW version lands -- the
    # full sink holds each row exactly once after the resume
    got = sorted(
        r["id"]
        for r in _drain(spark, path, tmp_path, "tx_src_resume")
    )
    assert got == list(range(8))


@pytest.mark.full
def test_partition_dir_values_are_retyped(spark, tmp_path):
    path = str(tmp_path / "t")
    df = spark.range(0, 12).select(
        "id", (F.col("id") % 3).alias("part"), (F.col("id") * 2).alias("v")
    )
    tx_append(spark, path, df, partition_cols=("part",))
    sdf = _drain_df(spark, path, tmp_path, "tx_src_parts")
    want_schema = dict(
        (f.name, f.dataType.simpleString())
        for f in read_table(spark, path).schema.fields
    )
    got = {r["id"]: r["part"] for r in sdf.collect()}
    assert got == {i: i % 3 for i in range(12)}
    assert {
        f.name: f.dataType.simpleString() for f in sdf.schema.fields
    } == want_schema


@pytest.mark.full
def test_data_preserving_rewrites_emit_nothing(spark, tmp_path):
    path = str(tmp_path / "t")
    tx_append(spark, path, _df(spark, 0, 10).repartition(4))
    tx_compact(spark, path, target_file_bytes=1 << 30)
    rows = _drain(spark, path, tmp_path, "tx_src_compact")
    assert sorted(r["id"] for r in rows) == list(range(10))


def test_change_commit_fails_loudly_unless_skipped(spark, tmp_path):
    path = str(tmp_path / "t")
    tx_append(spark, path, _df(spark, 0, 10))
    tx_merge(
        spark, path, _df(spark, 0, 3, mul=9), key="id", n_buckets=4
    )
    with pytest.raises(Exception, match="skipChangeCommits"):
        _drain(spark, path, tmp_path, "tx_src_fail")
    tx_append(spark, path, _df(spark, 100, 103))
    rows = _drain(
        spark, path, tmp_path, "tx_src_skip", skipChangeCommits="true"
    )
    # v1's appended rows + the post-merge append; the merge's rewrite
    # (full-table re-bucket) is skipped entirely
    assert sorted(r["id"] for r in rows) == list(range(10)) + [
        100, 101, 102,
    ]


@pytest.mark.full
def test_schema_evolution_null_backfills_old_files(spark, tmp_path):
    path = str(tmp_path / "t")
    tx_append(spark, path, _df(spark, 0, 4))
    tx_append(
        spark,
        path,
        spark.range(4, 6).select(
            "id", (F.col("id") * 2).alias("v"), F.lit("en").alias("lang")
        ),
        merge_schema=True,
    )
    rows = _drain(spark, path, tmp_path, "tx_src_evolve")
    by_id = {r["id"]: r for r in rows}
    assert len(rows) == 6
    assert by_id[0]["lang"] is None and by_id[5]["lang"] == "en"


@pytest.mark.full
def test_source_to_tx_sink_end_to_end_exactly_once(spark, tmp_path):
    """The composability capstone: a txtable STREAM feeding a tx-table
    SINK through foreachBatch with (txn_app, txn_batch) replay meta --
    source offsets are upstream commit versions, sink epochs are
    guarded by the txn index, so the chain is exactly-once end to end:
    a re-run with the same checkpoint moves only the upstream delta,
    and a replayed epoch lands zero extra rows."""
    from rag_vertex_ai_vector_search_spark.sources.txlog import (
        TxIdempotentReplay,
        TxLog,
    )

    up = str(tmp_path / "up")
    down = str(tmp_path / "down")
    ck = str(tmp_path / "ck")
    tx_append(spark, up, _df(spark, 0, 6))
    tx_append(spark, up, _df(spark, 6, 10))

    def _run():
        register_tx_stream_source(spark)

        def _sink(batch_df, epoch_id):
            out = batch_df.filter(F.col("id") % 2 == 0).withColumn(
                "v2", F.col("v") * 10
            )
            if out.isEmpty():
                return None
            try:
                tx_append(
                    spark, down, out,
                    meta={"txn_app": ck, "txn_batch": int(epoch_id)},
                )
            except TxIdempotentReplay:
                pass
            return None

        q = (
            spark.readStream.format("txtable")
            .load(up)
            .writeStream.foreachBatch(_sink)
            .option("checkpointLocation", ck)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    _run()
    got1 = sorted(
        r["id"] for r in read_table(spark, down).collect()
    )
    assert got1 == [0, 2, 4, 6, 8]
    # upstream delta + re-run on the same checkpoint: only ids 10..13
    # flow; nothing from versions 1-2 re-lands
    tx_append(spark, up, _df(spark, 10, 14))
    _run()
    got2 = sorted(
        (r["id"], r["v2"]) for r in read_table(spark, down).collect()
    )
    assert got2 == [(i, i * 20) for i in (0, 2, 4, 6, 8, 10, 12)]
    # and a third run with NO upstream change is a no-op commit-wise
    v_before = TxLog(spark, down).current_version()
    _run()
    assert TxLog(spark, down).current_version() == v_before
    assert read_table(spark, down).count() == 7


def test_batch_format_round_trips_snapshot(spark, tmp_path):
    path = str(tmp_path / "t")
    df = spark.range(0, 20).select(
        "id", (F.col("id") % 2).alias("part"), (F.col("id") * 3).alias("v")
    )
    tx_append(spark, path, df, partition_cols=("part",))
    tx_append(spark, path, spark.range(20, 25).select(
        "id", (F.col("id") % 2).alias("part"), (F.col("id") * 3).alias("v")
    ), partition_cols=("part",))
    register_tx_stream_source(spark)
    got = spark.read.format("txtable").load(path)
    want = read_table(spark, path)
    assert got.schema == want.schema
    assert sorted(map(tuple, got.collect())) == sorted(
        map(tuple, want.collect())
    )
    # time travel through the format option
    old = spark.read.format("txtable").option("version", "1").load(path)
    assert old.count() == 20
