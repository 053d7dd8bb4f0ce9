"""Column profiling: the data-quality report a pipeline runs before
trusting a new table (the Deequ/TFDV-style profile, as one aggregate).

For each requested column: row count, null count, distinct count, min
and max -- every metric ORDER-INDEPENDENT (no float sums), so the
whole report is exact and engine-portable. Means/quantiles belong to
the existing aggregate surface (`pricing_summary`,
`price_percentiles`); this operator is the schema-level sanity gate
(nulls creeping in, cardinality collapse, range drift) that runs
cheaply on every ingest.

Scale shape: ONE aggregate pass computes every column's metrics
map-side (a single job over the table, no per-column scans), then the
one-row result explodes to long format -- driver-friendly output
whatever the table size. Distinct counts are exact
(``count_distinct``: one extra shuffle keyed per column inside the
same aggregate); swap ``approx=True`` for HyperLogLog
``approx_count_distinct`` when exactness is not worth the shuffle at
100 TB (approx mode has no bit-exact oracle, by nature).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def profile_columns(
    df: DataFrame,
    cols: list[str],
    *,
    approx: bool = False,
) -> DataFrame:
    """(column, n_rows, n_nulls, n_distinct, min_value, max_value) per
    requested column; min/max are cast to double (numeric columns --
    profile string/timestamp ranges via the relational surface)."""
    distinct_fn = (
        F.approx_count_distinct if approx else F.count_distinct
    )
    aggs = [F.count(F.lit(1)).alias("__n")]
    for c in cols:
        aggs += [
            F.sum(
                F.when(F.col(c).isNull(), F.lit(1)).otherwise(F.lit(0))
            ).alias(f"__nulls_{c}"),
            distinct_fn(F.col(c)).alias(f"__nd_{c}"),
            F.min(F.col(c)).cast("double").alias(f"__min_{c}"),
            F.max(F.col(c)).cast("double").alias(f"__max_{c}"),
        ]
    one = df.agg(*aggs)
    per_col = F.explode(
        F.array(*[
            F.struct(
                F.lit(c).alias("column"),
                F.col("__n").cast("long").alias("n_rows"),
                F.col(f"__nulls_{c}").cast("long").alias("n_nulls"),
                F.col(f"__nd_{c}").cast("long").alias("n_distinct"),
                F.col(f"__min_{c}").alias("min_value"),
                F.col(f"__max_{c}").alias("max_value"),
            )
            for c in cols
        ])
    ).alias("_p")
    return one.select(per_col).select("_p.*")
