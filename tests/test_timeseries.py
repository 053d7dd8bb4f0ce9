"""gapfill_locf: spine coverage, LOCF carry, fill markers."""

import datetime

from pyspark.sql import functions as F

from rag_vertex_ai_vector_search_spark.operators.timeseries import gapfill_locf


def _ts(h):
    return datetime.datetime(2024, 1, 1, h)


def test_gapfill_fills_holes_and_carries_values(spark):
    rows = [
        ("a", _ts(0), 10, 1.5),
        ("a", _ts(1), 20, 2.5),
        # hours 2-3 missing
        ("a", _ts(4), 40, 4.5),
        ("b", _ts(2), 7, 0.5),  # single observation: no gaps
    ]
    df = spark.createDataFrame(
        rows, "k string, hour timestamp, n long, v double"
    )
    out = gapfill_locf(
        df, time_col="hour", key_cols=["k"], value_cols=["n", "v"]
    ).orderBy("k", "hour").collect()

    a = [r for r in out if r.k == "a"]
    assert [r.hour.hour for r in a] == [0, 1, 2, 3, 4]  # full grid
    assert [r.n for r in a] == [10, 20, 20, 20, 40]     # LOCF carry
    assert [r.v for r in a] == [1.5, 2.5, 2.5, 2.5, 4.5]
    assert [r.is_filled for r in a] == [False, False, True, True, False]

    b = [r for r in out if r.k == "b"]
    assert len(b) == 1 and b[0].n == 7 and not b[0].is_filled


def test_gapfill_no_rows_outside_key_lifetime(spark):
    """Each key's spine spans ITS OWN min..max, not the global range --
    no manufactured rows before a key first appears or after it ends."""
    rows = [
        ("early", _ts(0), 1, 0.0),
        ("early", _ts(1), 2, 0.0),
        ("late", _ts(10), 3, 0.0),
        ("late", _ts(12), 4, 0.0),
    ]
    df = spark.createDataFrame(
        rows, "k string, hour timestamp, n long, v double"
    )
    out = gapfill_locf(
        df, time_col="hour", key_cols=["k"], value_cols=["n"]
    )
    assert out.filter(F.col("k") == "early").count() == 2
    late = out.filter(F.col("k") == "late").orderBy("hour").collect()
    assert [r.hour.hour for r in late] == [10, 11, 12]
    assert [r.n for r in late] == [3, 3, 4]


def test_gapfill_custom_step(spark):
    rows = [("a", _ts(0), 1, 0.0), ("a", _ts(1), 2, 0.0)]
    df = spark.createDataFrame(
        rows, "k string, hour timestamp, n long, v double"
    )
    out = gapfill_locf(
        df, time_col="hour", key_cols=["k"], value_cols=["n"],
        step="15 minutes",
    )
    assert out.count() == 5  # 0:00 0:15 0:30 0:45 1:00
    assert out.filter(F.col("is_filled")).count() == 3


def test_gapfill_observed_null_not_marked_filled(spark):
    """An observed row whose value column is legitimately NULL must NOT
    be classified as a manufactured spine row (round-3 ADVICE item: the
    marker used value-is-null, now an explicit join indicator)."""
    from pyspark.sql import Row

    df = spark.createDataFrame(
        [
            Row(k="a", t=datetime.datetime(2024, 1, 1, 0), v=10.0),
            Row(k="a", t=datetime.datetime(2024, 1, 1, 1), v=None),
            # hour 2 missing -> manufactured
            Row(k="a", t=datetime.datetime(2024, 1, 1, 3), v=30.0),
        ],
        "k string, t timestamp, v double",
    )
    out = {
        r.t.hour: r
        for r in gapfill_locf(
            df, time_col="t", key_cols=["k"], value_cols=["v"]
        ).collect()
    }
    assert out[0].is_filled is False
    assert out[1].is_filled is False     # observed, value NULL
    assert out[2].is_filled is True      # manufactured
    assert out[3].is_filled is False
    # LOCF still carries through the observed-null row
    assert out[1].v == 10.0 and out[2].v == 10.0 and out[3].v == 30.0


def test_ewma_hand_values_and_partition_invariance(spark):
    """s_t = 0.25 x_t + 0.75 s_{t-1}, seeded with the first value --
    hand-checked, and identical under any input partitioning (the
    sequential fold admits no reassociation)."""
    import datetime as _dt

    from rag_vertex_ai_vector_search_spark.operators.timeseries import ewma

    rows = [
        (1, _dt.datetime(2024, 1, 1, 0, 0, i), i, float(v))
        for i, v in enumerate([10.0, 20.0, 10.0, 0.0])
    ] + [(2, _dt.datetime(2024, 1, 1), 0, 100.0)]
    df = spark.createDataFrame(
        rows, "user_id long, ts timestamp, event_id long, value double"
    )
    got = {
        (r.user_id, r.event_id): r.ewma
        for r in ewma(df, tie_col="event_id").collect()
    }
    assert got[(1, 0)] == 10.0
    assert got[(1, 1)] == 12.5
    assert got[(1, 2)] == 11.875
    assert got[(1, 3)] == 8.90625
    assert got[(2, 0)] == 100.0  # singleton series = its own seed

    got2 = {
        (r.user_id, r.event_id): r.ewma
        for r in ewma(df.repartition(16), tie_col="event_id").collect()
    }
    assert got == got2


def test_ewma_ties_break_on_tie_col(spark):
    """Two events at the SAME timestamp: the tie column fixes the fold
    order, so the result is deterministic (and order-sensitive: the
    higher event_id is smoothed against the lower's output)."""
    import datetime as _dt

    from rag_vertex_ai_vector_search_spark.operators.timeseries import ewma

    t = _dt.datetime(2024, 1, 1)
    df = spark.createDataFrame(
        [(1, t, 0, 0.0), (1, t, 1, 100.0)],
        "user_id long, ts timestamp, event_id long, value double",
    )
    got = {
        r.event_id: r.ewma for r in ewma(df, tie_col="event_id").collect()
    }
    assert got[0] == 0.0 and got[1] == 25.0  # 0.25*100 + 0.75*0
