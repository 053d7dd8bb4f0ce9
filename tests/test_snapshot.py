"""Snapshot diffing (operators/snapshot.py): status semantics and the
normalization property (formatting churn is not a change)."""

from pyspark.sql import functions as F  # noqa: F401

from rag_vertex_ai_vector_search_spark.operators.snapshot import (
    snapshot_diff,
)


def test_snapshot_diff_statuses(spark):
    old = spark.createDataFrame(
        [(1, "alpha beta"), (2, "gamma delta"), (3, "keep me")],
        "doc_id long, text string",
    )
    new = spark.createDataFrame(
        [(2, "gamma CHANGED"), (3, "  Keep   ME "), (4, "brand new")],
        "doc_id long, text string",
    )
    got = {r.doc_id: r.status for r in snapshot_diff(old, new).collect()}
    assert got == {
        1: "removed",
        2: "changed",
        3: "unchanged",  # case/whitespace churn normalizes away
        4: "added",
    }
    rows = {r.doc_id: r for r in snapshot_diff(old, new).collect()}
    assert rows[1].new_fingerprint is None
    assert rows[4].old_fingerprint is None
    assert rows[3].old_fingerprint == rows[3].new_fingerprint
