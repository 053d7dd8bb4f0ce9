"""Upsert/merge property tests (reference: upsert_datapoints
setup_vector_search.py:147-153, update firestore_ops.py:109-122)."""

from pyspark.sql import functions as F

from rag_vertex_ai_vector_search_spark.sources import load_table
from rag_vertex_ai_vector_search_spark.operators import (
    merge_by_key,
    point_lookup,
    point_update,
)


def _orders(spark, sf):
    return load_table(spark, sf, "orders")


def test_merge_idempotent(spark, sf_smoke):
    """merge(merge(base, u), u) == merge(base, u) -- FIXTURES.md invariant."""
    base = _orders(spark, sf_smoke)
    updates = base.filter(F.col("o_orderkey") % 7 == 0).withColumn(
        "o_totalprice", F.col("o_totalprice") * 2
    )
    once = merge_by_key(base, updates, key="o_orderkey")
    twice = merge_by_key(once, updates, key="o_orderkey")
    assert once.count() == twice.count() == base.count()
    assert once.exceptAll(twice).isEmpty() and twice.exceptAll(once).isEmpty()


def test_merge_update_wins_and_inserts(spark, sf_smoke):
    base = _orders(spark, sf_smoke)
    update = base.filter(F.col("o_orderkey") == 42).withColumn(
        "o_orderstatus", F.lit("Z")
    )
    insert = base.limit(1).withColumn("o_orderkey", F.lit(-1))
    merged = merge_by_key(base, update.unionByName(insert), key="o_orderkey")
    assert merged.count() == base.count() + 1
    assert merged.filter(F.col("o_orderkey") == 42).first().o_orderstatus == "Z"
    assert merged.filter(F.col("o_orderkey") == -1).count() == 1


def test_point_lookup_and_update(spark, sf_smoke):
    base = _orders(spark, sf_smoke)
    row = point_lookup(base, 42, key="o_orderkey").collect()
    assert len(row) <= 1
    if row:
        assert row[0].o_orderkey == 42

    updated = point_update(
        base, 42, {"o_orderpriority": F.lit("0-TEST")}, key="o_orderkey",
        stamp_col=None,
    )
    assert updated.count() == base.count()
    got = point_lookup(updated, 42, key="o_orderkey").collect()
    if got:
        assert got[0].o_orderpriority == "0-TEST"
    # untouched rows stay identical
    assert (
        updated.filter(F.col("o_orderkey") != 42)
        .exceptAll(base.filter(F.col("o_orderkey") != 42))
        .isEmpty()
    )
