"""Column profiling (operators/profile.py): hand-computed metrics,
null/cardinality handling, single-aggregate plan shape."""

from pyspark.sql import functions as F  # noqa: F401

from rag_vertex_ai_vector_search_spark.operators.profile import (
    profile_columns,
)


def test_profile_values(spark):
    rows = [
        (1.0, 10, "a"),
        (2.5, 10, None),
        (None, 20, "b"),
        (2.5, None, "b"),
    ]
    df = spark.createDataFrame(rows, "x double, y long, s string")
    out = {r.column: r for r in profile_columns(df, ["x", "y"]).collect()}
    assert set(out) == {"x", "y"}
    x = out["x"]
    assert (x.n_rows, x.n_nulls, x.n_distinct) == (4, 1, 2)
    assert (x.min_value, x.max_value) == (1.0, 2.5)
    y = out["y"]
    assert (y.n_rows, y.n_nulls, y.n_distinct) == (4, 1, 2)
    assert (y.min_value, y.max_value) == (10.0, 20.0)


def test_profile_single_aggregate_job(spark):
    """All columns profile in ONE aggregate pass: exactly one scan of
    the source in the plan, no per-column subplans."""
    df = spark.range(100).select(
        F.col("id").alias("a"), (F.col("id") % 7).alias("b")
    )
    plan = (
        profile_columns(df, ["a", "b"])
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert plan.count("Range (0, 100") == 1


def test_profile_approx_mode_runs(spark):
    df = spark.range(1000).select((F.col("id") % 37).alias("v"))
    row = profile_columns(df, ["v"], approx=True).collect()[0]
    # HLL at this cardinality is exact-ish; allow slack
    assert abs(row.n_distinct - 37) <= 2
    assert (row.min_value, row.max_value) == (0.0, 36.0)
