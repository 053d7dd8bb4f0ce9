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


def ewma(
    df: DataFrame,
    *,
    key_cols: tuple[str, ...] = ("user_id",),
    ts_col: str = "ts",
    value_col: str = "value",
    alpha_num: int = 1,
    alpha_den: int = 4,
    tie_col: str | None = None,
) -> DataFrame:
    """Exponentially weighted moving average per key:
    ``s_t = (a_num/a_den) * x_t + (1 - a_num/a_den) * s_{t-1}``,
    seeded with the first observation -- the standard smoothing for
    rate/latency/score series (and the detrending step before
    threshold-based anomaly flags). Adds ``ewma`` next to each row.

    Determinism: EWMA is inherently SEQUENTIAL -- a distributed
    running-window sum cannot express it, and a float reduction over
    an unordered shuffle would be garbage. The implementation
    collects each key's series as a sort_array'd struct list and runs
    ONE F.aggregate fold (rational alpha evaluated in a fixed
    operation order), then posexplodes back to rows -- bit-equal to
    DuckDB's list_reduce over the same sorted list, so the operator
    is oracle-gateable. Ordering ties break on ``tie_col`` (default:
    none -- provide one when timestamps can collide, e.g. event_id,
    or cross-engine sort stability is not guaranteed).

    Scale shape: one shuffle on the key; each key's series must fit
    executor memory (the same per-key contract as sessionize /
    collect-based windows -- at 100 TB, window the series by day
    first if a single key's history is unbounded).
    """
    a = float(alpha_num) / float(alpha_den)
    order = [F.col(ts_col)] + ([F.col(tie_col)] if tie_col else [])
    packed = df.groupBy(*key_cols).agg(
        F.sort_array(
            F.collect_list(
                F.struct(
                    F.col(ts_col).alias("_ts"),
                    *([F.col(tie_col).alias("_tie")] if tie_col else []),
                    F.col(value_col).cast("double").alias("_v"),
                )
            )
        ).alias("_series")
    )
    # fold to an ARRAY of running ewma values (same length), then zip
    # back: acc is (array, last); expressed with aggregate over structs
    fold = F.aggregate(
        F.col("_series"),
        F.struct(
            F.lit(None).cast("array<double>").alias("acc"),
            F.lit(None).cast("double").alias("last"),
        ),
        lambda acc, x: F.struct(
            F.when(
                acc["acc"].isNull(), F.array(x["_v"])
            ).otherwise(
                F.concat(
                    acc["acc"],
                    F.array(
                        F.lit(a) * x["_v"]
                        + F.lit(1.0 - a) * acc["last"]
                    ),
                )
            ).alias("acc"),
            F.when(acc["acc"].isNull(), x["_v"]).otherwise(
                F.lit(a) * x["_v"] + F.lit(1.0 - a) * acc["last"]
            ).alias("last"),
        ),
    )["acc"]
    exploded = packed.select(
        *key_cols,
        F.posexplode(F.arrays_zip(F.col("_series"), fold.alias("_e"))).alias(
            "_i", "_z"
        ),
    )
    out_cols = [
        F.col("_z._series._ts").alias(ts_col),
        F.col("_z._series._v").alias(value_col),
        F.col("_z._e").alias("ewma"),
    ]
    if tie_col:
        out_cols.insert(1, F.col("_z._series._tie").alias(tie_col))
    return exploded.select(*key_cols, *out_cols)
