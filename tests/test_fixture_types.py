"""Fixture-drift guard: the driver has regenerated the parquet fixtures
between rounds once already (events.ts TIMESTAMP(NANOS) -> timestamp[us]
NTZ), which silently broke type-strict consumers. These tests pin the
contract `load_table` must provide regardless of the parquet physical
type, so the next regeneration fails loudly here instead of in the
driver's correctness gate.
"""

import os

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from rag_vertex_ai_vector_search_spark.sources.tables import load_table


def test_events_ts_is_session_timestamp(spark, sf_smoke):
    df = load_table(spark, sf_smoke, "events")
    ts_field = df.schema["ts"]
    assert isinstance(ts_field.dataType, T.TimestampType), (
        f"events.ts must load as TimestampType (session tz), got "
        f"{ts_field.dataType} -- fixture vintage not normalized by load_table"
    )
    # unix_micros is the type-strict consumer that broke in round 3:
    # it must analyze and return non-null values.
    row = df.select(F.unix_micros("ts").alias("us")).first()
    assert row is not None and row["us"] is not None


def test_events_ts_normalization_covers_all_vintages(spark, sf_smoke, tmp_path):
    """Write each known physical vintage and assert load_table normalizes."""
    base = load_table(spark, sf_smoke, "events").limit(10)
    micros = base.select(
        "*", F.unix_micros("ts").alias("_us")
    ).drop("ts")

    vintages = {
        # nanos-as-long vintage (original fixture, read via legacy conf
        # as LongType) -- emulate with a plain long nanos column.
        "nanos": micros.withColumn("ts", (F.col("_us") * F.lit(1000))),
        # timestamp[us] no-tz vintage (current fixture).
        "ntz": micros.withColumn(
            "ts", F.timestamp_micros("_us").cast(T.TimestampNTZType())
        ),
        # a sane future vintage: proper tz-aware timestamp.
        "tz": micros.withColumn("ts", F.timestamp_micros("_us")),
    }
    for vintage, df in vintages.items():
        out_dir = os.path.join(str(tmp_path), vintage, "events.parquet")
        df.drop("_us").write.mode("overwrite").parquet(out_dir)
        loaded = load_table(spark, os.path.join(str(tmp_path), vintage), "events")
        assert isinstance(loaded.schema["ts"].dataType, T.TimestampType), (
            f"vintage={vintage}: expected TimestampType, got "
            f"{loaded.schema['ts'].dataType}"
        )
        got = {
            r["us"]
            for r in loaded.select(F.unix_micros("ts").alias("us")).collect()
        }
        want = {r["_us"] for r in micros.select("_us").collect()}
        assert got == want, f"vintage={vintage}: micros drifted"


@pytest.mark.parametrize("name", ["events", "orders", "lineitem", "documents"])
def test_no_unexpected_ntz_columns(spark, sf_smoke, name):
    """No fixture table should surface TIMESTAMP_NTZ after load_table."""
    df = load_table(spark, sf_smoke, name)
    ntz = [
        f.name
        for f in df.schema.fields
        if isinstance(f.dataType, T.TimestampNTZType)
    ]
    assert not ntz, f"{name}: NTZ columns leaked through load_table: {ntz}"
