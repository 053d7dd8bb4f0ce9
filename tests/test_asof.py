"""As-of join correctness vs an independent pandas merge_asof oracle."""

import pandas as pd
from pyspark.sql import functions as F

from rag_vertex_ai_vector_search_spark.operators import asof_join
import pytest


@pytest.mark.full
def test_asof_matches_pandas(spark):
    left_rows = [
        (1, "u1", 100), (2, "u1", 205), (3, "u1", 50),
        (4, "u2", 10), (5, "u2", 400), (6, "u3", 999),
    ]
    right_rows = [
        ("u1", 100, 7.0), ("u1", 200, 8.0),   # ts=100 tests inclusivity
        ("u2", 300, 9.0),
        # u3 has no right rows at all -> nulls
    ]
    left = spark.createDataFrame(left_rows, "event_id long, user_id string, ts long")
    right = spark.createDataFrame(right_rows, "user_id string, rts long, val double")

    out = asof_join(
        left, right, key="user_id", left_ts="ts", right_ts="rts",
        right_value_cols=["val"], right_prefix="m_",
    ).collect()
    got = {r.event_id: (r.m_rts, r.m_val) for r in out}

    lp = pd.DataFrame(left_rows, columns=["event_id", "user_id", "ts"]).sort_values("ts")
    rp = pd.DataFrame(right_rows, columns=["user_id", "rts", "val"]).sort_values("rts")
    merged = pd.merge_asof(
        lp, rp, left_on="ts", right_on="rts", by="user_id", direction="backward"
    )
    for _, row in merged.iterrows():
        exp = (
            None if pd.isna(row.rts) else int(row.rts),
            None if pd.isna(row.val) else float(row.val),
        )
        assert got[row.event_id] == exp, (row.event_id, got[row.event_id], exp)
    assert len(got) == len(left_rows)


@pytest.mark.full
def test_asof_right_ties_deterministic(spark):
    """Two right rows at the same (key, ts): tiebreak picks the max."""
    left = spark.createDataFrame([(1, "u", 10)], "id long, k string, ts long")
    right = spark.createDataFrame(
        [("u", 5, 1), ("u", 5, 2)], "k string, rts long, rid int"
    )
    out = asof_join(
        left, right, key="k", left_ts="ts", right_ts="rts",
        right_value_cols=["rid"], right_prefix="", right_tiebreak="rid",
    ).first()
    assert out.rid == 2
