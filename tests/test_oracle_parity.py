"""Local replica of the driver's correctness gate.

For every queries() entry with an oracle_sql() entry: run the Spark
query and the DuckDB SQL on the same parquet tables and require EXACT
equality of the multiset of rows (columns sorted by name, values
compared bit-for-bit -- floats included). If this passes, the driver's
order-insensitive value-hash must match too.
"""

import datetime
import math
import os
import sys

import duckdb
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod  # noqa: E402
from rag_vertex_ai_vector_search_spark.sources import TABLE_NAMES  # noqa: E402

# Declared contract + archived rotation (VERDICT r2 #1): the driver
# gates only the first 50 queries() entries, so stable siblings rotate
# into queries_archive() but keep the SAME bit-exact gate here.
# Tiering (r6): parity for DECLARED queries (the driver-gated surface)
# runs in the per-commit fast gate; parity for ARCHIVED queries --
# local insurance for rotated-out stalwarts the driver no longer
# checks -- rides the full tier.
ALL_QUERIES = {**entrymod.queries(), **entrymod.queries_archive()}
ALL_ORACLES = {**entrymod.oracle_sql(), **entrymod.oracle_sql_archive()}
ORACLED = sorted(entrymod.oracle_sql().keys()) + [
    pytest.param(name, marks=pytest.mark.full)
    for name in sorted(entrymod.oracle_sql_archive().keys())
]


def _duck_con(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for name in TABLE_NAMES:
        con.execute(
            f"CREATE VIEW {name} AS SELECT * "
            f"FROM read_parquet('{sf_dir}/{name}.parquet')"
        )
    return con


def _norm(v):
    if isinstance(v, float):
        # exact float identity; nan canonicalized
        return ("f", math.isnan(v), v if not math.isnan(v) else 0.0)
    if isinstance(v, datetime.datetime):
        return ("t", v.replace(tzinfo=None).isoformat())
    return (type(v).__name__, v)


def _rows_to_multiset(columns, rows):
    order = sorted(range(len(columns)), key=lambda i: columns[i])
    return sorted(tuple(_norm(r[i]) for i in order) for r in rows)


@pytest.mark.parametrize("name", ORACLED)
def test_query_matches_oracle(spark, sf_smoke, name):
    qfn = ALL_QUERIES[name]
    sdf = qfn(spark, sf_smoke)
    spark_cols = sdf.columns
    spark_rows = [tuple(r) for r in sdf.collect()]

    con = _duck_con(sf_smoke)
    res = con.execute(ALL_ORACLES[name])
    duck_cols = [d[0] for d in res.description]
    duck_rows = res.fetchall()

    assert sorted(spark_cols) == sorted(duck_cols), (
        f"{name}: column names differ: {spark_cols} vs {duck_cols}"
    )
    assert len(spark_rows) == len(duck_rows), (
        f"{name}: row counts differ: {len(spark_rows)} vs {len(duck_rows)}"
    )
    ms_spark = _rows_to_multiset(spark_cols, spark_rows)
    ms_duck = _rows_to_multiset(duck_cols, duck_rows)
    if ms_spark != ms_duck:
        diffs = [
            (a, b) for a, b in zip(ms_spark, ms_duck) if a != b
        ][:3]
        raise AssertionError(f"{name}: value mismatch, first diffs: {diffs}")


@pytest.mark.full
def test_all_queries_run_and_nonempty(spark, sf_smoke):
    """Every declared+archived query (oracled or not) runs with a schema."""
    for name, qfn in ALL_QUERIES.items():
        df = qfn(spark, sf_smoke)
        n = df.count()
        assert n >= 0, name
        assert df.columns, name


def test_declared_surface_fits_driver_window():
    """The driver gates exactly the first 50 queries() entries; a 51st
    would silently never get a CORRECTNESS row (VERDICT r2 #1). Adding a
    new query means rotating a stable green sibling into
    queries_archive() first."""
    assert len(entrymod.queries()) == 50
    # every rows-only or oracled declared query is distinct from archive
    assert not set(entrymod.queries()) & set(entrymod.queries_archive())
    # every oracle key refers to a real query in its own dict
    assert set(entrymod.oracle_sql()) <= set(entrymod.queries())
    assert set(entrymod.oracle_sql_archive()) <= set(entrymod.queries_archive())


def test_entry_runs(spark):
    df = entrymod.entry(spark)
    assert df.count() > 0


def test_duckdb_ln_matches_python_libm():
    """dataset_temperature_mix (r14): the per-source micronat weight is
    computed with CPython math.log and mirrored with DuckDB ln -- both
    must be the SAME double for every integer source count the fixtures
    can produce (bounded by row count; 200k covers sf0.1 with margin).
    JVM Math.log never participates (the r6 cross-engine log rule)."""
    import struct

    con = duckdb.connect()
    rows = con.execute(
        "SELECT i, ln(CAST(i AS DOUBLE)) FROM range(1, 200001) t(i)"
    ).fetchall()
    assert len(rows) == 200000
    for i, v in rows:
        assert struct.pack("<d", v) == struct.pack(
            "<d", math.log(float(i))
        ), f"ln({i}) differs: duckdb {v!r} vs libm {math.log(float(i))!r}"
