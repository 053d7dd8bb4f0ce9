"""Upsert/merge property tests (reference: upsert_datapoints
setup_vector_search.py:147-153, update firestore_ops.py:109-122)."""

import pytest
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


@pytest.mark.full
def test_merge_into_table_parquet_cow(spark, tmp_path):
    """Storage-level MERGE (parquet copy-on-write): first write lays
    out hash buckets; a second merge replaces matched keys, inserts
    new ones, leaves everything else intact -- and rewrites ONLY the
    touched bucket directories."""
    import os

    from rag_vertex_ai_vector_search_spark.operators.upsert import (
        merge_into_table,
    )

    path = str(tmp_path / "idx")
    base = spark.createDataFrame(
        [(i, f"v{i}") for i in range(100)], "data_point_id long, val string"
    )
    merge_into_table(spark, path, base, n_buckets=8)
    before = {
        d: sorted(os.listdir(os.path.join(path, d)))
        for d in os.listdir(path) if d.startswith("_bucket=")
    }

    updates = spark.createDataFrame(
        [(7, "NEW7"), (100, "NEW100")], "data_point_id long, val string"
    )
    merge_into_table(spark, path, updates, n_buckets=8)

    got = {r.data_point_id: r.val for r in spark.read.parquet(path).collect()}
    assert len(got) == 101
    assert got[7] == "NEW7" and got[100] == "NEW100"
    assert got[6] == "v6" and got[99] == "v99"

    # untouched bucket dirs keep their files byte-for-byte (same names)
    from pyspark.sql import functions as F2
    touched = {
        r[0] for r in updates.select(
            F2.pmod(F2.xxhash64("data_point_id"), F2.lit(8)).cast("int")
        ).collect()
    }
    after = {
        d: sorted(os.listdir(os.path.join(path, d)))
        for d in os.listdir(path) if d.startswith("_bucket=")
    }
    for d, files in before.items():
        if int(d.split("=")[1]) not in touched:
            assert after[d] == files, d


def test_merge_into_table_precedence_and_idempotence(spark, tmp_path):
    from rag_vertex_ai_vector_search_spark.operators.upsert import (
        merge_into_table,
    )

    path = str(tmp_path / "idx2")
    base = spark.createDataFrame(
        [(1, "a", 10), (2, "b", 10)], "data_point_id long, val string, ts long"
    )
    merge_into_table(spark, path, base, n_buckets=4)
    # conflicting update rows for one key: higher ts wins
    ups = spark.createDataFrame(
        [(1, "old", 5), (1, "new", 20)],
        "data_point_id long, val string, ts long",
    )
    merge_into_table(spark, path, ups, n_buckets=4, precedence_col="ts")
    merge_into_table(spark, path, ups, n_buckets=4, precedence_col="ts")
    got = {r.data_point_id: r.val for r in spark.read.parquet(path).collect()}
    assert got == {1: "new", 2: "b"}


def test_merge_into_table_delta_seam(spark, tmp_path):
    """Same MERGE semantics through delta-spark when available; in
    images without it the ImportError contract is the test."""
    from rag_vertex_ai_vector_search_spark.operators.upsert import (
        merge_into_table,
    )

    base = spark.createDataFrame(
        [(1, "a")], "data_point_id long, val string"
    )
    try:
        import delta  # noqa: F401
    except ImportError:
        with pytest.raises(ImportError, match="delta-spark"):
            merge_into_table(spark, str(tmp_path / "d"), base, fmt="delta")
        return
    path = str(tmp_path / "d")
    merge_into_table(spark, path, base, fmt="delta")
    ups = spark.createDataFrame(
        [(1, "A"), (2, "b")], "data_point_id long, val string"
    )
    merge_into_table(spark, path, ups, fmt="delta")
    got = {
        r.data_point_id: r.val
        for r in spark.read.format("delta").load(path).collect()
    }
    assert got == {1: "A", 2: "b"}

def test_merge_into_table_n_buckets_pinned(spark, tmp_path):
    """A later merge with a different n_buckets (or key) must RAISE,
    not silently scatter updated keys into different _bucket dirs than
    their base rows (which keep-latest would never reconcile). The
    layout is pinned by the _merge_meta.json sidecar; legacy tables
    without one get a one-time verification scan."""
    import os

    from pyspark.sql import functions as F

    from rag_vertex_ai_vector_search_spark.operators.upsert import (
        META_FILE, merge_into_table,
    )

    path = str(tmp_path / "pinned")
    base = spark.createDataFrame(
        [(i, f"v{i}") for i in range(50)], "data_point_id long, val string"
    )
    merge_into_table(spark, path, base, n_buckets=8)
    assert os.path.exists(os.path.join(path, META_FILE))

    ups = spark.createDataFrame([(7, "X")], "data_point_id long, val string")
    with pytest.raises(ValueError, match="n_buckets"):
        merge_into_table(spark, path, ups, n_buckets=16)
    with pytest.raises(ValueError, match="key"):
        merge_into_table(spark, path, ups, key="val", n_buckets=8)
    # matching layout still merges; no duplicates ever appear
    merge_into_table(spark, path, ups, n_buckets=8)
    got = spark.read.parquet(path)
    assert got.count() == 50
    assert got.groupBy("data_point_id").count().filter(
        F.col("count") > 1
    ).isEmpty()

    # legacy table (sidecar removed): wrong n_buckets is caught by the
    # verification scan; the right one passes and re-pins the layout
    os.remove(os.path.join(path, META_FILE))
    with pytest.raises(ValueError, match="different n_buckets"):
        merge_into_table(spark, path, ups, n_buckets=16)
    merge_into_table(spark, path, ups, n_buckets=8)
    assert os.path.exists(os.path.join(path, META_FILE))
