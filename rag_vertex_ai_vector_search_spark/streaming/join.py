"""Stream-stream watermarked interval join: the attribution shape
(every click joined to the views that preceded it within a horizon)
as a genuine two-sided streaming join -- both inputs unbounded, state
bounded by the watermark + interval condition.

This is the one streaming join class that needs BOTH sides buffered:
broadcast enrichment (stream-static) is just a join against a table,
but view<->click attribution needs each side to wait for the other.
Spark keeps per-key state for rows younger than
``watermark + horizon`` and drops older state automatically BECAUSE
the join condition bounds event-time distance -- without the interval
bound the state would grow forever, which is why this helper bakes it
into the condition rather than trusting callers to remember.

The SAME function runs on batch DataFrames (withWatermark is a no-op
there), which is what the stream==batch equivalence test leans on --
one definition, two execution modes, identical results.

Scale shape: state is hash-partitioned on the join key across the
cluster; per-key state is bounded by one horizon's worth of events
per side. At 100 TB/day event volumes the knobs are the watermark
(lateness tolerance vs state size) and the horizon (attribution
window) -- both explicit parameters here.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def stream_interval_join(
    left: DataFrame,
    right: DataFrame,
    *,
    key_col: str = "user_id",
    ts_col: str = "ts",
    horizon: str = "30 minutes",
    watermark: str = "10 minutes",
    how: str = "inner",
    left_prefix: str = "l",
    right_prefix: str = "r",
) -> DataFrame:
    """Join ``right`` rows to ``left`` rows with the same key where
    ``right.ts`` falls in ``[left.ts, left.ts + horizon]``.

    Output columns are prefixed (``l_``/``r_`` by default) so both
    sides' full schemas survive. ``how`` supports 'inner' and
    'leftOuter' (outer results emit once the watermark passes the
    window end -- streaming semantics; identical rows to a batch left
    join on complete input)."""
    lw = left.withWatermark(ts_col, watermark)
    rw = right.withWatermark(ts_col, watermark)
    lsel = lw.select(
        *[F.col(c).alias(f"{left_prefix}_{c}") for c in left.columns]
    )
    rsel = rw.select(
        *[F.col(c).alias(f"{right_prefix}_{c}") for c in right.columns]
    )
    lk, rk = f"{left_prefix}_{key_col}", f"{right_prefix}_{key_col}"
    lt, rt = f"{left_prefix}_{ts_col}", f"{right_prefix}_{ts_col}"
    cond = (
        (F.col(lk) == F.col(rk))
        & (F.col(rt) >= F.col(lt))
        & (F.col(rt) <= F.col(lt) + F.expr(f"INTERVAL {horizon}"))
    )
    return lsel.join(rsel, cond, how)
