"""Schema evolution on tx tables (r17, VERDICT r16 #3): mergeSchema-
style add-column on tx_append / tx_merge / merge_into_table. New
columns are null-backfilled on snapshot reads, the evolved schema is
recorded in the commit meta (surviving log pruning via the __schema__
floor), shared-column type mismatches abort loudly, and time travel
below the evolution commit resolves the OLD schema. Reference anchor:
the schemaless Firestore metadata side (firestore_ops.py:78-79) absorbs
new keys silently; this is the explicit, validated version."""

import pytest
from pyspark.sql import functions as F

from rag_vertex_ai_vector_search_spark.operators.upsert import (
    merge_into_table,
)
from rag_vertex_ai_vector_search_spark.sources import txlog as tx
from rag_vertex_ai_vector_search_spark.sources.txlog import (
    CHECKPOINT_INTERVAL,
    TxLog,
    read_table,
    tx_append,
    tx_merge,
    tx_vacuum,
)


def test_append_merge_schema_lifecycle(spark, tmp_path):
    path = str(tmp_path / "t")
    tx_append(spark, path, spark.range(0, 20).select(
        "id", (F.col("id") * 2).alias("v")
    ))
    v2 = tx_append(
        spark, path,
        spark.range(20, 30).select(
            "id", (F.col("id") * 2).alias("v"), F.lit("en").alias("lang")
        ),
        merge_schema=True,
    )
    got = read_table(spark, path)
    assert got.columns == ["id", "v", "lang"]
    assert got.count() == 30
    assert got.filter(F.col("lang").isNull()).count() == 20  # backfill
    assert got.filter(F.col("lang") == "en").count() == 10
    # time travel BELOW the evolution resolves the old schema
    old = read_table(spark, path, version=v2 - 1)
    assert old.columns == ["id", "v"]
    assert old.count() == 20


def test_type_mismatch_aborts_loudly(spark, tmp_path):
    path = str(tmp_path / "t")
    tx_append(spark, path, spark.range(0, 10).select(
        "id", (F.col("id") * 2).alias("v")
    ))
    with pytest.raises(ValueError, match="type mismatch on column 'v'"):
        tx_append(
            spark, path,
            spark.range(10, 20).select(
                "id", F.col("id").cast("string").alias("v")
            ),
            merge_schema=True,
        )
    assert TxLog(spark, path).current_version() == 1  # nothing committed
    assert read_table(spark, path).count() == 10


def test_tx_merge_adds_column_and_backfills(spark, tmp_path):
    path = str(tmp_path / "t")
    base = spark.range(0, 200).select(
        F.col("id").alias("data_point_id"), F.lit("old").alias("payload")
    )
    tx_merge(spark, path, base, n_buckets=8)
    updates = spark.range(150, 260).select(
        F.col("id").alias("data_point_id"),
        F.lit("new").alias("payload"),
        (F.col("id") * 0.5).alias("score"),
    )
    tx_merge(spark, path, updates, n_buckets=8, merge_schema=True)
    got = read_table(spark, path)
    assert set(got.columns) == {"data_point_id", "payload", "score", "_bucket"}
    assert got.count() == 260
    # untouched base rows (incl. whole untouched buckets) null-backfill
    assert got.filter(F.col("score").isNull()).count() == 150
    assert got.filter(
        (F.col("data_point_id") >= 150) & F.col("score").isNotNull()
    ).count() == 110
    # a LATER merge carrying the full evolved column set works plain
    more = spark.range(0, 10).select(
        F.col("id").alias("data_point_id"), F.lit("newer").alias("payload"),
        F.lit(1.0).alias("score"),
    )
    tx_merge(spark, path, more, n_buckets=8)
    got = read_table(spark, path)
    assert got.count() == 260
    assert got.filter(F.col("payload") == "newer").count() == 10


def test_merge_schema_updates_must_carry_every_base_column(spark, tmp_path):
    path = str(tmp_path / "t")
    tx_merge(spark, path, spark.range(0, 50).select(
        F.col("id").alias("data_point_id"), F.lit("x").alias("payload")
    ), n_buckets=4)
    bad = spark.range(0, 10).select(
        F.col("id").alias("data_point_id"), F.lit(1.0).alias("score")
    )
    with pytest.raises(ValueError, match="every existing column"):
        tx_merge(spark, path, bad, n_buckets=4, merge_schema=True)


def test_without_merge_schema_new_column_is_strict(spark, tmp_path):
    path = str(tmp_path / "t")
    tx_merge(spark, path, spark.range(0, 50).select(
        F.col("id").alias("data_point_id"), F.lit("x").alias("payload")
    ), n_buckets=4)
    extra = spark.range(0, 10).select(
        F.col("id").alias("data_point_id"), F.lit("y").alias("payload"),
        F.lit(1.0).alias("score"),
    )
    with pytest.raises(Exception, match="(?i)union|resolve|column"):
        tx_merge(spark, path, extra, n_buckets=4)


def test_schema_record_survives_log_pruning(spark, tmp_path):
    path = str(tmp_path / "t")
    tx_append(spark, path, spark.range(0, 10).select(
        "id", (F.col("id") * 2).alias("v")
    ))
    tx_append(
        spark, path,
        spark.range(10, 15).select(
            "id", (F.col("id") * 2).alias("v"), F.lit("en").alias("lang")
        ),
        merge_schema=True,
    )  # schema recorded at v2
    for b in range(CHECKPOINT_INTERVAL + 3):
        tx_append(spark, path, spark.range(100 + b, 101 + b).select(
            "id", (F.col("id") * 2).alias("v"), F.lit("fr").alias("lang")
        ))
    rep = tx_vacuum(
        spark, path, retain_versions=1, min_age_seconds=0, prune_log=True
    )
    assert rep["pruned_commits"] > 0
    # the v2 schema record was pruned; the __schema__ floor answers
    tx._txn_scan_cache.pop(TxLog(spark, path).table, None)  # fresh process sim
    got = read_table(spark, path)
    assert got.columns == ["id", "v", "lang"]
    assert got.filter(F.col("lang").isNull()).count() == 10


def test_concurrent_column_additions_union(spark, tmp_path, monkeypatch):
    """Two writers introducing DIFFERENT columns concurrently: the
    loser's conflict rebase unions the winner's recorded schema instead
    of hiding it (the commit-loop _rebase_schema_meta)."""
    path = str(tmp_path / "t")
    tx_append(spark, path, spark.range(0, 10).select(
        "id", (F.col("id") * 2).alias("v")
    ))
    with_a = spark.range(10, 15).select(
        "id", (F.col("id") * 2).alias("v"), F.lit(1).alias("col_a")
    )
    with_b = spark.range(15, 20).select(
        "id", (F.col("id") * 2).alias("v"), F.lit("b").alias("col_b")
    )
    real_stage = tx._stage_and_move_in
    state = {"fired": False}

    def stage_then_winner_commits(spark_, table, df, *a, **k):
        moved = real_stage(spark_, table, df, *a, **k)
        if not state["fired"]:
            state["fired"] = True
            tx_append(spark, path, with_a, merge_schema=True)
        return moved

    monkeypatch.setattr(tx, "_stage_and_move_in", stage_then_winner_commits)
    tx_append(spark, path, with_b, merge_schema=True)
    monkeypatch.undo()
    got = read_table(spark, path)
    assert set(got.columns) == {"id", "v", "col_a", "col_b"}
    assert got.count() == 20
    assert got.filter(F.col("col_a").isNotNull()).count() == 5
    assert got.filter(F.col("col_b").isNotNull()).count() == 5


def test_merge_into_table_passthrough_and_plain_refusal(spark, tmp_path):
    path = str(tmp_path / "t")
    merge_into_table(
        spark, path,
        spark.range(0, 30).select(
            F.col("id").alias("data_point_id"), F.lit("x").alias("payload")
        ),
        fmt="txlog", n_buckets=4,
    )
    merge_into_table(
        spark, path,
        spark.range(0, 10).select(
            F.col("id").alias("data_point_id"), F.lit("y").alias("payload"),
            F.lit(2).alias("rank"),
        ),
        fmt="txlog", n_buckets=4, merge_schema=True,
    )
    got = read_table(spark, path)
    assert "rank" in got.columns and got.count() == 30
    plain = str(tmp_path / "plain")
    with pytest.raises(ValueError, match="transactional route"):
        merge_into_table(
            spark, plain,
            spark.range(0, 5).select(
                F.col("id").alias("data_point_id"), F.lit(1).alias("rank")
            ),
            fmt="parquet", merge_schema=True,
        )
