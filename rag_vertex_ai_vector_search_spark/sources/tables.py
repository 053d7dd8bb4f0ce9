"""Parquet table loaders for the driver fixture tables (TESTDATA.md).

Parquet scans get predicate pushdown + column pruning from Catalyst for
free; loaders deliberately add nothing on top so filters written by
operators reach the scan (check with ``df.explain`` -> PushedFilters).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

TABLE_NAMES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    # The fixture `events.ts` column has shipped as two parquet vintages:
    # TIMESTAMP(NANOS) (readable only via the nanos-as-long escape hatch)
    # and timestamp[us] without a timezone (read as TIMESTAMP_NTZ).
    # Normalize both to session-timezone TIMESTAMP so type-strict
    # consumers (unix_micros, rangeBetween on epoch seconds) work
    # regardless of fixture vintage. Session tz is pinned to UTC
    # (session.py), so the NTZ cast preserves wall-clock time and DuckDB
    # epoch_us parity holds.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    for field in df.schema.fields:
        if name == "events" and field.name == "ts" and isinstance(
            field.dataType, T.LongType
        ):
            # integer division: float division of ~1e18 nanos loses
            # microseconds to double rounding (and DuckDB truncates).
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        elif isinstance(field.dataType, T.TimestampNTZType):
            df = df.withColumn(field.name, F.col(field.name).cast("timestamp"))
    return df


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TABLE_NAMES}


def fan_out(df: DataFrame, min_partitions: int | None = None) -> DataFrame:
    """Repartition when the source delivered fewer partitions than cores.

    A single local parquet file arrives as ONE input split, which
    serializes every downstream CPU-heavy expression (regex passes,
    sha256, pandas UDFs) onto one core. At warehouse scale the input is
    hundreds of splits and this is a no-op -- the guard keeps the extra
    round-robin shuffle out of plans that don't need it, so the helper
    is safe to put on any compute-bound scan."""
    par = min_partitions or df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < par:
        return df.repartition(par)
    return df


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every fixture table as a temp view for the SQL API."""
    for name in TABLE_NAMES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)


def write_bucketed(
    df: DataFrame,
    table_name: str,
    key: str,
    num_buckets: int = 32,
    sort: bool = True,
    mode: str = "overwrite",
) -> None:
    """Persist hash-bucketed (and bucket-sorted) by ``key``.

    Joins and aggregations on ``key`` between tables bucketed the same
    way run WITHOUT a shuffle -- at 100 TB this converts the dominant
    repeated cost (re-shuffling a fact table for every keyed join or
    MERGE) into a one-time layout cost. The upsert path
    (operators/upsert.merge_by_key) and point lookups (bucket pruning)
    are the main beneficiaries. Verified shuffle-free in
    tests/test_bucketed.py via plan inspection.
    """
    writer = df.write.mode(mode).format("parquet").bucketBy(num_buckets, key)
    if sort:
        writer = writer.sortBy(key)
    writer.saveAsTable(table_name)
