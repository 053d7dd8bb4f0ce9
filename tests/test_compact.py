"""Small-file compaction (sources/compact.py): fewer files, identical
contents, partition layout preserved."""

import glob

from pyspark.sql import functions as F

from rag_vertex_ai_vector_search_spark.sources import (
    compact_parquet,
    table_file_stats,
)


def _assert_same(a, b):
    assert a.exceptAll(b).isEmpty() and b.exceptAll(a).isEmpty()


def test_compact_reduces_files_keeps_rows(spark, tmp_path):
    path = str(tmp_path / "t")
    df = spark.range(0, 10_000).withColumn("v", F.col("id") * 2)
    df.repartition(40).write.parquet(path)
    before_files, before_bytes = table_file_stats(spark, path)
    assert before_files == 40

    after = compact_parquet(spark, path, target_file_bytes=before_bytes)
    assert after <= 2
    assert table_file_stats(spark, path)[0] == after
    _assert_same(spark.read.parquet(path), df)


def test_compact_noop_below_threshold(spark, tmp_path):
    path = str(tmp_path / "t")
    spark.range(0, 10).coalesce(1).write.parquet(path)
    assert compact_parquet(spark, path) == 1
    assert spark.read.parquet(path).count() == 10


def test_compact_partitioned_table(spark, tmp_path):
    path = str(tmp_path / "t")
    df = spark.range(0, 3_000).select(
        F.col("id"), (F.col("id") % 3).alias("part")
    )
    # 10 fragment files per partition dir, as a streaming sink leaves
    df.repartition(10).write.partitionBy("part").parquet(path)
    before, total = table_file_stats(spark, path)
    assert before == 30

    compact_parquet(
        spark, path, target_file_bytes=total, partition_cols=("part",)
    )
    after, _ = table_file_stats(spark, path)
    assert after < before
    # partition dirs survive (partition pruning still works)
    assert sorted(
        p.rsplit("part=", 1)[1] for p in glob.glob(path + "/part=*")
    ) == ["0", "1", "2"]
    got = spark.read.parquet(path).select("id", F.col("part").cast("long"))
    _assert_same(got, df)
