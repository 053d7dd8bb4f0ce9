"""Interval (range) join: left points against right intervals.

Spark plans ``l.point BETWEEN r.start AND r.end`` as a broadcast
nested-loop join -- quadratic and broadcast-bound. This operator turns
it into an EQUI-join: bucketize the range dimension, explode each right
interval into the buckets it covers, join point-bucket to
interval-bucket, then apply the exact range filter. Cost becomes
O(points + intervals x avg_buckets + true matches) with an ordinary
shuffled hash join -- the standard scalable range-join recipe.

Bucket width tuning: ~ the median interval length; much smaller wastes
explode fan-out, much larger degrades to the nested-loop behavior
inside buckets.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def interval_join(
    left: DataFrame,
    right: DataFrame,
    left_point: str,
    right_start: str,
    right_end: str,
    bucket_width: int | float,
    how: str = "inner",
    extra_key: str | None = None,
) -> DataFrame:
    """Rows (l, r) with r.start <= l.point <= r.end (+ optional equal
    ``extra_key``). Columns: all left + all right (caller disambiguates
    names beforehand)."""
    lb = F.floor(F.col(left_point) / F.lit(bucket_width)).cast("long")
    l_tagged = left.withColumn("_bucket", lb)

    r_tagged = right.withColumn(
        "_bucket",
        F.explode(
            F.sequence(
                F.floor(F.col(right_start) / F.lit(bucket_width)).cast("long"),
                F.floor(F.col(right_end) / F.lit(bucket_width)).cast("long"),
            )
        ),
    )

    on = [l_tagged["_bucket"] == r_tagged["_bucket"]]
    if extra_key is not None:
        on.append(l_tagged[extra_key] == r_tagged[extra_key])
    # The exact range predicate is part of the JOIN CONDITION, not a
    # post-join filter: for outer joins a post-filter would drop the
    # null-extended unmatched rows (point >= NULL is never true),
    # silently degrading every non-inner mode to inner.
    on.append(l_tagged[left_point] >= r_tagged[right_start])
    on.append(l_tagged[left_point] <= r_tagged[right_end])

    # Outer modes are sound because each LEFT row has exactly ONE bucket
    # (points bucketize to one value; only intervals explode), so a left
    # row either matches via its single bucket or null-extends once --
    # no per-bucket duplicate null rows, and a given (point, interval)
    # pair can only meet in one bucket, so no duplicate matches either.
    joined = l_tagged.join(r_tagged, on, how)
    drop_cols = [l_tagged["_bucket"], r_tagged["_bucket"]]
    out = joined.drop(*drop_cols)
    if extra_key is not None:
        out = out.drop(r_tagged[extra_key])
    return out
