"""Z-order (Morton-curve) clustered layout: multi-column file pruning.

Partitioning prunes on ONE column hierarchy; sorting prunes on a
prefix. When queries filter on several independent columns (user AND
time; part AND date), neither helps the second column. Interleaving
the bits of the filter columns into one Morton key and range-sorting
files by it keeps every file's bounding box TIGHT in all interleaved
dimensions at once, so parquet min/max stats skip most files for any
small box predicate — the same layout trick as Delta/Iceberg
OPTIMIZE ZORDER, built here from Spark primitives:

- rank-normalize each column to a bounded integer tile via SAMPLED
  quantile boundaries (`approxQuantile`, driver-held list of 2^bits
  cut points) + MLlib `Bucketizer` (JVM binary search per row) — a
  global `ntile` window would be exact but single-partition, a
  non-starter at scale; quantile tiles spread skewed columns evenly
  across the curve and cost one sampled pass at write time,
- interleave bits with shift/or expressions (codegen'd, no Python),
- `repartitionByRange(zkey)` + `sortWithinPartitions(zkey)` then
  write parquet: each output file covers one compact z-range.

Query-time pruning is then ordinary parquet row-group/file skipping on
the ORIGINAL columns' min/max — no reader-side knowledge of z-order is
needed, which is what makes the trick deployable: writers optimize,
every reader (Spark, DuckDB, anything) benefits.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def zorder_key(
    df: DataFrame, cols: list[str], *, bits: int = 10
) -> DataFrame:
    """Append ``_zkey``: the Morton interleave of quantile-tiled
    ``cols`` (each mapped to [0, 2^bits) by its own sampled quantile
    boundaries). Columns must be numeric or timestamp (tiled on epoch
    seconds). ``bits * len(cols)`` must fit a long (<= 62)."""
    from pyspark.ml.feature import Bucketizer
    from pyspark.sql.types import TimestampType, TimestampNTZType

    if bits * len(cols) > 62:
        raise ValueError("bits * len(cols) must be <= 62")
    n_tiles = 1 << bits
    out = df
    tile_cols = []
    probs = [i / n_tiles for i in range(1, n_tiles)]
    for c in cols:
        t = f"_zt_{c}"
        num = f"_zn_{c}"
        col = F.col(c)
        if isinstance(df.schema[c].dataType, (TimestampType, TimestampNTZType)):
            col = F.unix_timestamp(col)
        out = out.withColumn(num, col.cast("double"))
        cuts = out.approxQuantile(num, probs, 0.001)
        splits = [float("-inf")] + sorted(set(cuts)) + [float("inf")]
        out = (
            Bucketizer(splits=splits, inputCol=num, outputCol=t)
            .transform(out)
            .withColumn(t, F.col(t).cast("long"))
            .drop(num)
        )
        tile_cols.append(t)
    z: Column = F.lit(0).cast("long")
    # bit j of column i lands at position j * n_cols + i
    for j in range(bits):
        for i, t in enumerate(tile_cols):
            bit = F.shiftright(F.col(t), j).bitwiseAND(F.lit(1))
            z = z.bitwiseOR(
                F.shiftleft(bit, j * len(tile_cols) + i)
            )
    return out.withColumn("_zkey", z).drop(*tile_cols)


def write_zordered(
    df: DataFrame,
    path: str,
    cols: list[str],
    *,
    n_files: int = 16,
    bits: int = 10,
) -> None:
    """Cluster ``df`` on the Morton key of ``cols`` and write ``n_files``
    parquet files, each covering a compact z-range (tight min/max boxes
    on every clustered column)."""
    keyed = zorder_key(df, cols, bits=bits)
    (
        keyed.repartitionByRange(n_files, "_zkey")
        .sortWithinPartitions("_zkey")
        .drop("_zkey")
        .write.mode("overwrite")
        .parquet(path)
    )


def file_minmax(path: str, cols: list[str]) -> list[dict]:
    """Per-file min/max of ``cols`` from parquet footers (pyarrow) --
    the pruning-quality metric: the fraction of files whose box
    intersects a predicate box is what a reader must scan."""
    import pyarrow.parquet as pq
    import os

    out = []
    for name in sorted(os.listdir(path)):
        if not name.endswith(".parquet"):
            continue
        md = pq.ParquetFile(os.path.join(path, name)).metadata
        box = {}
        for c in cols:
            lo, hi = None, None
            for rg in range(md.num_row_groups):
                row_group = md.row_group(rg)
                for ci in range(row_group.num_columns):
                    col = row_group.column(ci)
                    if col.path_in_schema == c and col.statistics:
                        s = col.statistics
                        lo = s.min if lo is None else min(lo, s.min)
                        hi = s.max if hi is None else max(hi, s.max)
            box[c] = (lo, hi)
        out.append(box)
    return out
