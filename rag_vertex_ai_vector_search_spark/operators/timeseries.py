"""Time-series regularization: gap-fill a keyed series onto a fixed
grid and carry observations forward (LOCF) -- the hypertable-style
downsampling companion to the tumbling-window aggregates.

A metrics/event table aggregated per (key, bucket) has holes wherever
nothing happened; consumers (dashboards, joins against other series,
training-feature frames) want one row per key per bucket. The engine
shape:

- **spine**: per key, ``sequence(min(t), max(t), step)`` exploded --
  rows generated = span/step per key, bounded and independent of the
  fact-table size; no driver state, no cross join against a global
  calendar (a global spine would manufacture rows for keys outside
  their lifetime).
- **join**: left equi-join spine -> observations on (key, bucket);
  AQE-planned shuffled hash join.
- **LOCF**: ``last(value, ignorenulls=True)`` over a per-key ordered
  window, rows unbounded-preceding..current -- one shuffle shared with
  the join key, skew bounded by the longest single key span (a key's
  series is processed by one task; at 100 TB keys are many and spans
  are bounded by retention, so parallelism is wide).

Fully SQL-expressible (DuckDB: generate_series + last_value IGNORE
NULLS) -> bit-exact oracle in the driver gate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def gapfill_locf(
    df: DataFrame,
    *,
    time_col: str,
    key_cols: list[str],
    value_cols: list[str],
    step: str = "1 hour",
    fill_marker: str = "is_filled",
) -> DataFrame:
    """Regularize ``df`` (one row per (key, bucket) with holes) onto the
    ``step`` grid between each key's first and last observation, mark
    manufactured rows, and carry every value column forward.

    Leading values are non-null by construction (each key's spine
    starts at its first observation). ``fill_marker`` is True on
    manufactured rows -- detected by an explicit observation indicator
    carried through the left join, NOT by a value column being null, so
    an observed row whose values are legitimately NULL is still marked
    as observed (and its nulls are NOT confused with spine holes).
    """
    tmin, tmax, obs = "_gf_tmin", "_gf_tmax", "_gf_obs"
    spine = (
        df.groupBy(*key_cols)
        .agg(
            F.min(time_col).alias(tmin),
            F.max(time_col).alias(tmax),
        )
        .select(
            *key_cols,
            F.explode(
                F.expr(f"sequence({tmin}, {tmax}, interval {step})")
            ).alias(time_col),
        )
    )
    joined = spine.join(
        df.withColumn(obs, F.lit(1)), [*key_cols, time_col], "left"
    )
    w = (
        Window.partitionBy(*key_cols)
        .orderBy(time_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    out = joined.withColumn(fill_marker, F.col(obs).isNull()).drop(obs)
    for v in value_cols:
        out = out.withColumn(v, F.last(v, ignorenulls=True).over(w))
    return out
