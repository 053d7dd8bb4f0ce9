"""Z-order layout (operators/layout.py): key correctness by hand,
lossless rewrite, and the data-skipping claim measured from REAL
parquet footers -- per-row-group bounding boxes must be tight in BOTH
keyed dimensions, where a single-column sort is tight in one and ~1.0
in the other."""

import glob
import os

import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from rag_vertex_ai_vector_search_spark.operators.layout import (
    write_zordered,
    z_value,
    zorder_key,
)
from rag_vertex_ai_vector_search_spark.sources import load_table


def test_z_value_hand_interleave(spark):
    df = spark.createDataFrame(
        [(0b101, 0b011), (0, 0), (7, 7)], "x long, y long"
    )
    out = df.select(
        "x", "y",
        z_value([F.col("x"), F.col("y")], bits=3).alias("z"),
    ).collect()
    got = {(r.x, r.y): r.z for r in out}
    # x bits land at even positions, y at odd:
    # x=101, y=011 -> z bits (y2 x2 y1 x1 y0 x0) = 0 1 1 0 1 1 = 0b011011
    assert got[(0b101, 0b011)] == 0b011011
    assert got[(0, 0)] == 0
    assert got[(7, 7)] == 0b111111


def test_zorder_key_scaling_endpoints(spark):
    df = spark.createDataFrame(
        [(0, 100), (50, 150), (100, 200)], "a long, b long"
    )
    out = zorder_key(df, ["a", "b"], bits=4).collect()
    z = {(r.a, r.b): r._z for r in out}
    # endpoints scale to 0 and 15; midpoint floors to 7
    assert z[(0, 100)] == 0
    assert z[(100, 200)] == 0b11111111  # both dims all-ones interleaved
    # a=50 -> floor(50*15/100)=7 (0111), b=150 -> 7: interleave(7,7)
    assert z[(50, 150)] == 0b111111  # interleave(7, 7)


def _rowgroup_span_fractions(path: str, col: str, lo, hi):
    """Mean per-row-group (max-min)/(global span) for ``col`` across
    every file under ``path``."""
    spans = []
    for f in sorted(glob.glob(f"{path}/*.parquet")):
        md = pq.ParquetFile(f).metadata
        idx = md.schema.names.index(col)
        for g in range(md.num_row_groups):
            st = md.row_group(g).column(idx).statistics
            spans.append(st.max - st.min)
    return sum(s / (hi - lo) for s in spans) / len(spans), len(spans)


@pytest.mark.full
def test_zorder_rowgroup_boxes_tight_in_both_dims(
    spark, sf_correct, tmp_path
):
    """The whole point of the layout, measured: z-ordered row groups
    carry SMALL min/max spans on BOTH keyed columns; a date-sorted
    layout is tight on date but spans ~everything on custkey."""
    # Timestamps are avoided in the measured layouts: Spark's default
    # INT96 timestamp encoding writes NO min/max stats, so the date
    # dimension rides its epoch-seconds long twin.
    orders = load_table(spark, sf_correct, "orders").select(
        "o_orderkey", "o_custkey",
        F.col("o_orderdate").cast("long").alias("o_epoch"),
    )
    lo_c, hi_c, lo_d, hi_d = orders.agg(
        F.min("o_custkey"), F.max("o_custkey"),
        F.min("o_epoch"), F.max("o_epoch"),
    ).first()
    opts = {"parquet.block.size": 32 * 1024}  # several row groups/file

    zpath = str(tmp_path / "z")
    write_zordered(
        orders, zpath, ["o_custkey", "o_epoch"], bits=16, n_files=8,
        write_options=opts,
    )
    dpath = str(tmp_path / "d")
    (
        orders.repartitionByRange(8, "o_epoch")
        .sortWithinPartitions("o_epoch")
        .write.mode("overwrite")
        .options(**opts)
        .parquet(dpath)
    )

    z_cust, nz = _rowgroup_span_fractions(zpath, "o_custkey", lo_c, hi_c)
    z_date, _ = _rowgroup_span_fractions(zpath, "o_epoch", lo_d, hi_d)
    d_cust, nd = _rowgroup_span_fractions(dpath, "o_custkey", lo_c, hi_c)
    d_date, _ = _rowgroup_span_fractions(dpath, "o_epoch", lo_d, hi_d)

    assert nz >= 8 and nd >= 8  # the block-size knob actually worked
    # date-sorted: tight on date, blind on custkey
    assert d_date < 0.2 and d_cust > 0.8
    # z-ordered: a contiguous z range fixes the top interleaved bits,
    # so every row group is a bounding BOX -- bounded in BOTH
    # dimensions (a one-column sort is ~1.0 in the other), and at
    # least 2x tighter on custkey than the date sort
    assert z_cust < 0.5 and z_date < 0.5
    assert z_cust < d_cust / 2

    # the rewrite is lossless
    a = sorted(
        tuple(r) for r in spark.read.parquet(zpath)
        .select("o_orderkey", "o_custkey", "o_epoch").collect()
    )
    b = sorted(
        tuple(r) for r in orders
        .select("o_orderkey", "o_custkey", "o_epoch").collect()
    )
    assert a == b


def test_z_value_three_columns(spark):
    """k=3 interleave: bit i of column j lands at 3i + j (the curve
    generalizes past pairs; 21 bits x 3 cols fits a BIGINT)."""
    from rag_vertex_ai_vector_search_spark.operators.layout import z_decode

    df = spark.createDataFrame(
        [(5, 3, 6), (0, 0, 0), (7, 7, 7)], "x long, y long, w long"
    )
    rows = df.select(
        "x", "y", "w",
        z_value([F.col("x"), F.col("y"), F.col("w")], bits=3).alias("z"),
    ).collect()
    for r in rows:
        assert z_decode(r.z, 3, bits=3) == (r.x, r.y, r.w)
    got = {(r.x, r.y, r.w): r.z for r in rows}
    assert got[(7, 7, 7)] == 0b111111111


def test_z_width_guard_rejects_sign_bit(spark):
    """4 cols x default 16 bits = 64 > 63: the top term would land on
    the BIGINT sign bit and silently invert the sort order for half
    the keyspace. All three entry points must refuse loudly
    (ADVICE r12)."""
    import pytest as _pytest

    from rag_vertex_ai_vector_search_spark.operators.layout import (
        z_value_sql,
    )

    cols4 = ["a", "b", "c", "d"]
    with _pytest.raises(ValueError, match="63"):
        z_value_sql(cols4, bits=16)
    with _pytest.raises(ValueError, match="63"):
        z_value([F.col(c) for c in cols4], bits=16)
    df = spark.createDataFrame(
        [(1, 2, 3, 4)], "a long, b long, c long, d long"
    )
    with _pytest.raises(ValueError, match="63"):
        zorder_key(df, cols4, bits=16)
    # the documented remedy fits: 15 bits x 4 cols = 60 <= 63
    assert len(z_value_sql(cols4, bits=15)) > 0


def test_zorder_table_in_place_swap(spark, tmp_path):
    """zorder_table (r13, VERDICT r12 #4): an in-place OPTIMIZE-style
    rewrite of a LIVE table path must go through the pending-marker
    swap (not a direct overwrite), be lossless, and leave tighter
    footer stats on both keyed dims than the incoming random layout."""
    from rag_vertex_ai_vector_search_spark.operators.layout import (
        zorder_table,
    )
    from rag_vertex_ai_vector_search_spark.sources import compact as cm

    path = str(tmp_path / "t")
    df = spark.range(0, 20000).select(
        F.col("id").alias("k"),
        F.pmod(F.xxhash64("id"), F.lit(1000)).alias("a"),
        F.pmod(F.xxhash64("id", F.lit(1)), F.lit(1000)).alias("b"),
    )
    df.repartition(8).write.parquet(path)
    before = sorted(tuple(r) for r in spark.read.parquet(path).collect())

    assert zorder_table(
        spark, path, ["a", "b"], bits=10, n_files=4,
        write_options={"parquet.block.size": 32 * 1024},
    )
    after = sorted(tuple(r) for r in spark.read.parquet(path).collect())
    assert after == before
    for suffix in (cm.TMP_SUFFIX, cm.OLD_SUFFIX, cm.PENDING_MARKER_SUFFIX):
        assert not os.path.exists(path + suffix)
    # footer gate re-asserted post-swap: bounded boxes in BOTH dims
    fa, n = _rowgroup_span_fractions(path, "a", 0, 999)
    fb, _ = _rowgroup_span_fractions(path, "b", 0, 999)
    assert n >= 4
    # measured ~0.45 / ~0.30 at this size; the incoming random layout
    # is ~1.0 in both dims
    assert fa < 0.7 and fb < 0.7


def test_zorder_table_aborts_on_concurrent_commit(
    spark, tmp_path, monkeypatch
):
    """r14 (VERDICT-r13 high advice): a file another session commits
    DURING the z-order rewrite job is not in the rewritten tmp -- the
    swap must ABORT (source untouched, late commit intact), not put
    the late file in the rescue baseline and delete its rows. The
    late commit is injected inside _pre_swap_check, i.e. after
    zorder_table's read-time snapshot and before the swap decision."""
    from rag_vertex_ai_vector_search_spark.operators.layout import (
        zorder_table,
    )
    from rag_vertex_ai_vector_search_spark.sources import compact as cm

    path = str(tmp_path / "t")
    df = spark.range(0, 2000).select(
        F.col("id").alias("k"),
        F.pmod(F.xxhash64("id"), F.lit(100)).alias("a"),
        F.pmod(F.xxhash64("id", F.lit(1)), F.lit(100)).alias("b"),
    )
    df.repartition(4).write.parquet(path)

    real_check = cm._pre_swap_check

    def _inject_then_check(s, p):
        late = s.range(90000, 90010).select(
            F.col("id").alias("k"),
            F.lit(1).cast("long").alias("a"),
            F.lit(2).cast("long").alias("b"),
        )
        late.coalesce(1).write.mode("append").parquet(path)
        return real_check(s, p)

    monkeypatch.setattr(cm, "_pre_swap_check", _inject_then_check)
    assert not zorder_table(spark, path, ["a", "b"], bits=10, n_files=2)
    monkeypatch.undo()

    spark.catalog.refreshByPath(path)
    got = sorted(r.k for r in spark.read.parquet(path).collect())
    assert got == sorted([*range(0, 2000), *range(90000, 90010)])
    for suffix in (cm.TMP_SUFFIX, cm.OLD_SUFFIX, cm.PENDING_MARKER_SUFFIX):
        assert not os.path.exists(path + suffix)


@pytest.mark.full
@pytest.mark.parametrize(
    "crash_at,outcome", [(1, "discarded"), (2, "completed")]
)
def test_zorder_table_crash_mid_swap_is_healed(
    spark, tmp_path, monkeypatch, crash_at, outcome
):
    """Kill the z-order swap before the first rename and between the
    two renames (the test_compact.py FS-proxy pattern): the shared
    resume protocol must recover the FULL row set either way -- the
    exact crash window the old direct-overwrite write_zordered-on-a-
    live-path usage left open."""
    from tests.test_compact import _patch_crash

    from rag_vertex_ai_vector_search_spark.operators.layout import (
        zorder_table,
    )
    from rag_vertex_ai_vector_search_spark.sources import compact as cm
    from rag_vertex_ai_vector_search_spark.sources import (
        resume_pending_compact,
    )

    path = str(tmp_path / "t")
    df = spark.range(0, 2000).select(
        F.col("id").alias("k"),
        F.pmod(F.xxhash64("id"), F.lit(100)).alias("a"),
        F.pmod(F.xxhash64("id", F.lit(1)), F.lit(100)).alias("b"),
    )
    df.repartition(6).write.parquet(path)
    before = sorted(tuple(r) for r in spark.read.parquet(path).collect())

    _patch_crash(monkeypatch, crash_at)
    with pytest.raises(RuntimeError, match="simulated crash"):
        zorder_table(spark, path, ["a", "b"], bits=10, n_files=2)
    monkeypatch.undo()

    assert resume_pending_compact(spark, path) == outcome
    assert resume_pending_compact(spark, path) == "none"
    after = sorted(tuple(r) for r in spark.read.parquet(path).collect())
    assert after == before
    for suffix in (cm.TMP_SUFFIX, cm.OLD_SUFFIX, cm.PENDING_MARKER_SUFFIX):
        assert not os.path.exists(path + suffix)


_ZORDER_WRITER_SCRIPT = """
import sys, time
from pyspark.sql import SparkSession

path, n_batches, rows_per = sys.argv[1], int(sys.argv[2]), int(sys.argv[3])
spark = (
    SparkSession.builder.master("local[2]")
    .config("spark.ui.enabled", "false")
    .appName("zorder-foreign-writer").getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")
for b in range(n_batches):
    rows = [
        (9000 + b * rows_per + i, (b * 31 + i) % 100, (b * 17 + i) % 100)
        for i in range(rows_per)
    ]
    spark.createDataFrame(rows, "k long, a long, b long").coalesce(
        1
    ).write.mode("append").parquet(path)
    time.sleep(0.05)
print("WRITER_DONE")
spark.stop()
"""


@pytest.mark.full
def test_zorder_table_second_session_writer(spark, tmp_path):
    """The r14 fix under a REAL foreign writer (the r13 two-session
    contract applied to layout rewrites): a second JVM appends batches
    while this session loops zorder_table. Every rewrite either lands
    on a quiet window or ABORTS (returns False) -- never deletes a
    foreign commit. Final row set: zero lost, zero duplicated."""
    import subprocess
    import sys as _sys
    import time as _time

    from rag_vertex_ai_vector_search_spark.operators.layout import (
        zorder_table,
    )

    path = str(tmp_path / "t")
    spark.range(0, 2000).select(
        F.col("id").alias("k"),
        F.pmod(F.xxhash64("id"), F.lit(100)).alias("a"),
        F.pmod(F.xxhash64("id", F.lit(1)), F.lit(100)).alias("b"),
    ).repartition(6).write.parquet(path)

    script = str(tmp_path / "writer.py")
    with open(script, "w") as fh:
        fh.write(_ZORDER_WRITER_SCRIPT)
    n_batches, rows_per = 20, 5
    proc = subprocess.Popen(
        [_sys.executable, script, path, str(n_batches), str(rows_per)],
        stdout=subprocess.PIPE, stderr=subprocess.DEVNULL, text=True,
    )
    outcomes = []
    try:
        deadline = _time.time() + 180
        while proc.poll() is None and _time.time() < deadline:
            outcomes.append(
                zorder_table(spark, path, ["a", "b"], bits=10, n_files=2)
            )
        out, _ = proc.communicate(timeout=120)
    finally:
        if proc.poll() is None:
            proc.kill()
    assert "WRITER_DONE" in out
    assert outcomes  # rewrites genuinely overlapped the writer
    # quiet filesystem: the final rewrite must LAND
    assert zorder_table(spark, path, ["a", "b"], bits=10, n_files=2)

    spark.catalog.refreshByPath(path)
    ids = sorted(r.k for r in spark.read.parquet(path).collect())
    want = sorted(
        list(range(0, 2000))
        + [9000 + b * rows_per + i
           for b in range(n_batches) for i in range(rows_per)]
    )
    assert ids == want
