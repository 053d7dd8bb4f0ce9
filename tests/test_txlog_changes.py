"""Change-data feed over the tx log (r17): read_table_changes turns
per-version manifest file deltas into row changes. Correctness is
action-agnostic (the file delta determines the row-multiset transition);
these tests pin the per-action classification, the multiset
cancellation of rewrite-carried rows, the _bucket exclusion, the
schema-evolution alignment, and the loud failure on pruned history.
Reference anchor: the reference mutates a live STREAM_UPDATE index
(index_manager.py:53) with no way to observe the change stream."""

import pytest
from pyspark.sql import functions as F

from rag_vertex_ai_vector_search_spark.sources.changes import (
    read_table_changes,
)
from rag_vertex_ai_vector_search_spark.sources.txlog import (
    TxLog,
    read_table,
    tx_append,
    tx_compact,
    tx_merge,
    tx_overwrite,
    tx_vacuum,
)


def _df(spark, lo, hi, mul=2):
    return spark.range(lo, hi).select(
        "id", (F.col("id") * mul).alias("v")
    )


def _feed(spark, path, since, end=None):
    rows = read_table_changes(spark, path, since, end).collect()
    return sorted(
        (r["_commit_version"], r["_change_type"], r["id"], r["v"])
        for r in rows
    )


def test_append_only_feed(spark, tmp_path):
    path = str(tmp_path / "t")
    v1 = tx_append(spark, path, _df(spark, 0, 5))
    v2 = tx_append(spark, path, _df(spark, 5, 8))
    got = _feed(spark, path, -1)
    assert got == sorted(
        [(v1, "insert", i, 2 * i) for i in range(5)]
        + [(v2, "insert", i, 2 * i) for i in range(5, 8)]
    )
    # incremental consumer: only the second batch since v1
    assert _feed(spark, path, v1) == sorted(
        (v2, "insert", i, 2 * i) for i in range(5, 8)
    )


def test_since_minus_one_includes_adopted_v0(spark, tmp_path):
    path = str(tmp_path / "t")
    _df(spark, 0, 4).write.parquet(path)
    log = TxLog(spark, path)
    log.ensure()  # v0 adopts the plain listing
    assert _feed(spark, path, -1) == sorted(
        (0, "insert", i, 2 * i) for i in range(4)
    )


def test_merge_classifies_and_cancels(spark, tmp_path):
    path = str(tmp_path / "t")
    tx_append(spark, path, _df(spark, 0, 20))
    updates = (
        _df(spark, 0, 5)                      # identical rows: cancel
        .unionByName(_df(spark, 5, 10, mul=7))   # changed: update
        .unionByName(_df(spark, 100, 103))       # new keys: insert
    )
    vm = tx_merge(spark, path, updates, key="id", n_buckets=4)
    got = _feed(spark, path, vm - 1, vm)
    assert got == sorted(
        [(vm, "update_preimage", i, 2 * i) for i in range(5, 10)]
        + [(vm, "update_postimage", i, 7 * i) for i in range(5, 10)]
        + [(vm, "insert", i, 2 * i) for i in range(100, 103)]
    )
    # the physical layout column never leaks into the feed
    cols = read_table_changes(spark, path, vm - 1, vm).columns
    assert "_bucket" not in cols
    assert cols[-2:] == ["_change_type", "_commit_version"]


def test_overwrite_is_delete_plus_insert_with_cancellation(
    spark, tmp_path
):
    path = str(tmp_path / "t")
    tx_append(spark, path, _df(spark, 0, 10))
    vo = tx_overwrite(spark, path, _df(spark, 5, 15))
    got = _feed(spark, path, vo - 1, vo)
    assert got == sorted(
        [(vo, "delete", i, 2 * i) for i in range(5)]
        + [(vo, "insert", i, 2 * i) for i in range(10, 15)]
    )


def test_data_preserving_rewrites_emit_nothing(spark, tmp_path):
    path = str(tmp_path / "t")
    tx_append(spark, path, _df(spark, 0, 10).repartition(4))
    tx_append(spark, path, _df(spark, 10, 20).repartition(4))
    tx_compact(spark, path, target_file_bytes=1 << 30)
    vc = TxLog(spark, path).current_version()
    assert read_table_changes(spark, path, vc - 1, vc).count() == 0
    # and the full feed across the compaction is exactly the appends
    assert _feed(spark, path, -1) == sorted(
        [(1, "insert", i, 2 * i) for i in range(10)]
        + [(2, "insert", i, 2 * i) for i in range(10, 20)]
    )


def test_feed_across_schema_evolution_null_backfills(spark, tmp_path):
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
    rows = read_table_changes(spark, path, -1).collect()
    by_id = {r["id"]: r for r in rows}
    assert len(rows) == 6
    assert by_id[0]["lang"] is None        # pre-evolution insert
    assert by_id[5]["lang"] == "en"
    assert all(r["_change_type"] == "insert" for r in rows)


def test_empty_range_and_bounds(spark, tmp_path):
    path = str(tmp_path / "t")
    v1 = tx_append(spark, path, _df(spark, 0, 5))
    empty = read_table_changes(spark, path, v1, v1)
    assert empty.count() == 0
    assert empty.columns == ["id", "v", "_change_type", "_commit_version"]
    with pytest.raises(ValueError, match="above the current version"):
        read_table_changes(spark, path, 0, v1 + 5)
    with pytest.raises(ValueError, match="above end_version"):
        read_table_changes(spark, path, v1, 0)


def test_pruned_history_fails_loudly(spark, tmp_path):
    from rag_vertex_ai_vector_search_spark.sources.txlog import (
        CHECKPOINT_INTERVAL,
    )

    path = str(tmp_path / "t")
    for i in range(CHECKPOINT_INTERVAL + 2):
        tx_append(spark, path, _df(spark, i, i + 1))
    tx_vacuum(
        spark, path, retain_versions=1, min_age_seconds=0, prune_log=True
    )
    head = TxLog(spark, path).current_version()
    with pytest.raises(Exception):
        read_table_changes(spark, path, 0, head).collect()
    # the retained head still feeds
    assert _feed(spark, path, head - 1) == [
        (head, "insert", head - 1, 2 * (head - 1))
    ]
