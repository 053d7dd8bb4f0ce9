"""Z-order (Morton-curve) data layout: multi-dimensional data
skipping for 100 TB scans.

A table sorted on ONE column gets tight parquet row-group min/max
stats on that column alone; a conjunctive range query over two or
more columns still reads almost everything. Interleaving the bits of
the filter columns into one Morton key and sorting by IT gives every
row group a small bounding BOX in all keyed dimensions at once, so
ordinary parquet row-group stats (and, on a lakehouse, file-level
stats) prune multi-column range queries -- the same mechanism behind
Delta OPTIMIZE ZORDER BY / Iceberg's sort orders, built here from
plain Spark primitives:

- ``z_value``: per-row bit interleave, pure JVM integer expressions
  (2 * bits * n_cols shift/and/or terms inside whole-stage codegen --
  no UDF), after min-max scaling each column into ``bits``-bit
  integer space with exact integer arithmetic (engine-portable, so
  the key is SQL-oracle-able: the ``zorder_curve`` archive row).
- ``write_zordered``: repartitionByRange + sortWithinPartitions on
  the key, then a plain parquet write -- range partitioning makes
  FILES disjoint in z (file-level pruning), the within-file sort
  makes ROW GROUPS tight (row-group pruning).

The effectiveness claim is tested quantitatively, not argued:
tests/test_layout.py reads the written footers with pyarrow and
asserts the mean per-row-group span FRACTION of every keyed dimension
is far below a single-column sort's (which is tight in one dimension
and ~1.0 in the others).

At 100 TB: the scaling min/max come from one cheap aggregate (or the
catalog), the key is one narrow projection, and the sort is the one
shuffle a layout rewrite pays anyway -- the same cost envelope as
``compact_parquet`` with a sort key attached.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

DEFAULT_Z_BITS = 16


def _check_z_width(k: int, bits: int) -> None:
    """The interleaved key lives in a signed BIGINT: k * bits must
    stay <= 63 or the top term lands on the sign bit and the sort
    order (hence the whole data-skipping benefit) silently inverts
    for half the keyspace -- the same bit-63 rule the BIGINT bit
    tables follow (CLAUDE.md r7). Bijectivity would still hold, so
    nothing downstream fails loudly; fail here instead."""
    if k * bits > 63:
        raise ValueError(
            f"z-order key would need {k * bits} bits but a signed "
            f"BIGINT holds 63: reduce bits to <= {63 // k} for "
            f"{k} columns (got bits={bits})"
        )


def z_value_sql(cols: list[str], bits: int = DEFAULT_Z_BITS) -> str:
    """The Morton interleave as one SQL expression over pre-scaled
    integer expressions -- shared by the SQL front end
    (engine_zorder2) and the DuckDB oracle mirror (shift/and/add are
    identical syntax in both dialects)."""
    k = len(cols)
    _check_z_width(k, bits)
    return " + ".join(
        f"((({c} >> {i}) & 1) << {i * k + j})"
        for i in range(bits)
        for j, c in enumerate(cols)
    )


def z_decode(z: int, k: int, bits: int = DEFAULT_Z_BITS) -> tuple:
    """Driver-side inverse of ``z_value`` on pre-scaled ints: split a
    Morton key back into its ``k`` interleaved components (debugging /
    layout-inspection aid; the interleave is a bijection on
    [0, 2^bits)^k, property-tested in tests/test_properties.py)."""
    out = [0] * k
    for i in range(bits):
        for j in range(k):
            out[j] |= ((z >> (i * k + j)) & 1) << i
    return tuple(out)


def z_value(cols: list[Column], bits: int = DEFAULT_Z_BITS) -> Column:
    """Morton interleave of pre-scaled ``bits``-bit non-negative
    integer columns: bit i of column j lands at position
    i * len(cols) + j. Disjoint target bits, so the combine is a plain
    sum of shift/and terms -- identical in SQL."""
    k = len(cols)
    _check_z_width(k, bits)
    z = F.lit(0).cast("long")
    for j, c in enumerate(cols):
        for i in range(bits):
            z = z + F.shiftleft(
                F.shiftright(c, i).bitwiseAND(F.lit(1).cast("long")),
                i * k + j,
            )
    return z.cast("long")


def zorder_key(
    df: DataFrame,
    cols: list[str],
    *,
    bits: int = DEFAULT_Z_BITS,
    bounds: dict[str, tuple[int, int]] | None = None,
    key_col: str = "_z",
) -> DataFrame:
    """Attach the Morton key: min-max scale each (integer) column
    into ``bits``-bit space, interleave. ``bounds`` pins {col: (lo,
    hi)} explicitly (the catalog-stats path); otherwise one bounded
    min/max aggregate computes them (broadcast one-row join, no
    collect in the row path)."""
    _check_z_width(len(cols), bits)
    if bounds is None:
        row = df.agg(
            *[F.min(c).alias(f"_lo_{c}") for c in cols],
            *[F.max(c).alias(f"_hi_{c}") for c in cols],
        ).first()
        bounds = {
            c: (int(row[f"_lo_{c}"]), int(row[f"_hi_{c}"])) for c in cols
        }
    scaled_names = []
    out = df
    for c in cols:
        lo, hi = bounds[c]
        top = (1 << bits) - 1
        name = f"_zs_{c}"
        if hi <= lo:
            expr = F.lit(0).cast("long")
        else:
            # floor() division on BOTH engines (the proven bucket-
            # division parity rule; a bare CAST rounds in DuckDB).
            # Operands stay well under 2^53, so the double division
            # is exact enough for floor to agree bit-for-bit.
            expr = F.floor(
                (
                    (F.col(c).cast("long") - F.lit(lo))
                    * F.lit(top).cast("long")
                )
                / F.lit(hi - lo).cast("long")
            ).cast("long")
        # materialize each scaled column ONCE in its own projection:
        # the interleave references it 2*bits times, and inlining the
        # floor-scale into every shift term bloats the plan text
        # 32-fold (codegen would CSE it, but the clean projection
        # costs nothing and keeps plans auditable)
        out = out.withColumn(name, expr)
        scaled_names.append(name)
    return out.withColumn(
        key_col,
        z_value([F.col(n) for n in scaled_names], bits=bits),
    ).drop(*scaled_names)


def write_zordered(
    df: DataFrame,
    path: str,
    cols: list[str],
    *,
    bits: int = DEFAULT_Z_BITS,
    n_files: int | None = None,
    key_col: str = "_z",
    write_options: dict | None = None,
) -> None:
    """Rewrite ``df`` z-ordered on ``cols``: range-partition by the
    Morton key (files disjoint in z -> file-level pruning), sort
    within partitions (tight row-group stats -> row-group pruning),
    drop the key, write parquet. ``write_options`` pass through to the
    writer (e.g. a small ``parquet.block.size`` so tests get several
    row groups per file)."""
    keyed = zorder_key(df, cols, bits=bits, key_col=key_col)
    spark = df.sparkSession
    n = n_files or spark.sparkContext.defaultParallelism
    writer = (
        keyed.repartitionByRange(n, key_col)
        .sortWithinPartitions(key_col)
        .drop(key_col)
        .write.mode("overwrite")
    )
    for k, v in (write_options or {}).items():
        writer = writer.option(k, v)
    writer.parquet(path)


def zorder_table(
    spark,
    path: str,
    cols: list[str],
    *,
    bits: int = DEFAULT_Z_BITS,
    n_files: int | None = None,
    write_options: dict | None = None,
) -> bool:
    """IN-PLACE z-order rewrite of an existing table (the OPTIMIZE
    ZORDER BY usage), crash-safe via the compaction marker protocol
    (VERDICT r12 #4): ``write_zordered`` targets a NEW path and may
    overwrite freely, but a direct overwrite of a live table path has
    the delete-then-write crash window ``compact_parquet`` closed in
    r10 -- a mid-job kill between the delete and the commit loses the
    table. Here the sorted rewrite lands in ``<path>__compact_tmp__``
    first, then ``commit_staged_rewrite`` does the pending-marker +
    two-rename swap, so every crash point is healable by
    ``resume_pending_compact`` (same marker, same resume states --
    compaction and layout rewrites share one recovery protocol and one
    GC). Returns True when the swap landed.

    Concurrency (r14, VERDICT-r13 high advice): the data-file listing
    is snapshotted BEFORE the rewrite reads the table and passed to
    ``commit_staged_rewrite`` as the abort baseline -- if any writer
    commits between the read and the swap (or has an attempt dir in
    flight), the swap is ABANDONED (tmp discarded, source untouched,
    returns False) instead of silently deleting the late commit with
    the old dir. Without this, commit-time ``_pre_swap_check`` would
    have put the late files in the rescue baseline even though their
    rows are absent from the rewritten tmp, and the exposure was the
    whole rewrite-job duration, not the documented sub-ms window.
    Re-run the rewrite (or pause writers) when it returns False.

    Cost envelope at 100 TB: identical to ``compact_parquet`` with a
    sort key attached -- the range-partition shuffle IS the one shuffle
    any layout rewrite pays; the marker swap adds two metadata renames.

    Note: the rewrite emits an UNPARTITIONED layout (z-order replaces
    directory partitioning as the pruning mechanism); rewriting a
    hive-partitioned table folds the partition column back into the
    data files. Keep directory partitioning instead where a consumer
    requires it (e.g. the streaming index's cluster_id layout) and
    z-order within partitions via ``write_zordered`` per partition
    path.
    """
    from ..sources.compact import (
        TMP_SUFFIX,
        _fs_and_path,
        _listing_snapshot,
        commit_staged_rewrite,
        resume_pending_compact,
    )
    from ..sources.txlog import TxLog, tx_zorder

    base = path.rstrip("/")
    # tx tables: the manifest commit replaces the marker protocol, and
    # a concurrent append SURVIVES the rewrite (rebase) instead of
    # aborting it -- strictly better than the listing-snapshot abort
    if TxLog(spark, base).exists():
        return tx_zorder(
            spark, base, cols,
            bits=bits, n_files=n_files, write_options=write_options,
        )
    resume_pending_compact(spark, base)
    # abort baseline taken BEFORE the read: the rewrite's rows are
    # frozen at read time, so any commit after this listing is NOT in
    # tmp and must abort the swap rather than ride the rescue baseline
    before = _listing_snapshot(spark, base)
    # defensive listing refresh (see compact_parquet): the rewrite's
    # input must be the current file set, whatever listing caches the
    # session's configuration carries
    spark.catalog.refreshByPath(base)
    df = spark.read.parquet(base)
    keyed = zorder_key(df, cols, bits=bits)
    n = n_files or spark.sparkContext.defaultParallelism
    tmp = base + TMP_SUFFIX
    writer = (
        keyed.repartitionByRange(n, "_z")
        .sortWithinPartitions("_z")
        .drop("_z")
        .write.mode("overwrite")
    )
    for k, v in (write_options or {}).items():
        writer = writer.option(k, v)
    try:
        writer.parquet(tmp)
    except Exception:
        # pre-marker tmp is invisible to the resume protocol: reap it
        # rather than orphaning a table-sized dir until age-gated GC
        fs, jtmp = _fs_and_path(spark, tmp)
        if fs.exists(jtmp):
            fs.delete(jtmp, True)
        raise
    return commit_staged_rewrite(spark, base, before=before)
