"""Z-order layout: file bounding boxes must prune multi-column box
predicates far better than a single-column sort."""

import pytest
from pyspark.sql import functions as F

from rag_vertex_ai_vector_search_spark.sources.zorder import (
    file_minmax,
    write_zordered,
    zorder_key,
)


def _box_files(boxes, pred):
    """Files a min/max-pruning reader must scan for {col: (lo, hi)}."""
    n = 0
    for box in boxes:
        hit = True
        for c, (lo, hi) in pred.items():
            fmin, fmax = box[c]
            if fmax < lo or fmin > hi:
                hit = False
                break
        if hit:
            n += 1
    return n


@pytest.mark.full
def test_zorder_prunes_boxes_better_than_linear_sort(spark, tmp_path):
    df = (
        spark.range(40_000)
        .withColumn("x", F.pmod(F.xxhash64("id"), F.lit(1000)).cast("long"))
        .withColumn("y", F.pmod(F.xxhash64("id", "x"), F.lit(1000)).cast("long"))
    )
    zpath = str(tmp_path / "zordered")
    lpath = str(tmp_path / "linear")
    write_zordered(df, zpath, ["x", "y"], n_files=16)
    (
        df.repartitionByRange(16, "x")
        .sortWithinPartitions("x")
        .write.mode("overwrite").parquet(lpath)
    )

    zboxes = file_minmax(zpath, ["x", "y"])
    lboxes = file_minmax(lpath, ["x", "y"])
    assert len(zboxes) == 16 and len(lboxes) == 16

    # x+y box: the x-sorted layout prunes on x alone, which at 16 files
    # already isolates a 10% x-slice -- z-order must be no worse.
    pred = {"x": (100, 200), "y": (100, 200)}
    z_hits = _box_files(zboxes, pred)
    l_hits = _box_files(lboxes, pred)
    assert z_hits <= l_hits
    assert z_hits <= 6  # a 10%x10% box touches a small corner of files

    # The discriminator: a y-only predicate. The x-sorted layout has
    # ~full-range y bounds in EVERY file (prunes nothing); z-order
    # keeps y tight too and skips at least half the files.
    pred_y = {"y": (0, 99)}
    assert _box_files(lboxes, pred_y) == 16
    assert _box_files(zboxes, pred_y) <= 8
    # ...while still pruning x-only predicates (the hierarchical-sort
    # layout can do one or the other, never both).
    pred_x = {"x": (0, 99)}
    assert _box_files(zboxes, pred_x) <= 8


def test_zorder_values_and_rowcount_survive(spark, tmp_path):
    df = (
        spark.range(5_000)
        .withColumn("x", (F.col("id") * 7 % 100).cast("long"))
        .withColumn("y", (F.col("id") * 13 % 100).cast("long"))
    )
    path = str(tmp_path / "z")
    write_zordered(df, path, ["x", "y"], n_files=4)
    back = spark.read.parquet(path)
    assert back.count() == 5_000
    assert sorted(r.id for r in back.select("id").collect()) == list(range(5_000))
    assert "_zkey" not in back.columns


def test_zorder_key_locality(spark):
    """Rows close in both dimensions get close z-keys: the average key
    distance of (x,y)-neighbors is far below random pairs'."""
    df = (
        spark.range(0, 1024)
        .withColumn("x", (F.col("id") % 32).cast("long"))
        .withColumn("y", (F.col("id") / 32).cast("long"))
    )
    keyed = {(r.x, r.y): r._zkey for r in zorder_key(df, ["x", "y"], bits=5).collect()}
    import random

    rng = random.Random(0)
    neighbor = []
    randpair = []
    pts = list(keyed)
    for _ in range(300):
        x, y = rng.choice(pts)
        if (x + 1, y) in keyed:
            neighbor.append(abs(keyed[(x + 1, y)] - keyed[(x, y)]))
        a, b = rng.choice(pts), rng.choice(pts)
        randpair.append(abs(keyed[a] - keyed[b]))
    assert sum(neighbor) / len(neighbor) < sum(randpair) / len(randpair) / 4
