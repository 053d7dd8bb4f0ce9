"""Streaming DoReMi maintenance: the Group-DRO mixture's sufficient
statistics kept fresh per micro-batch, so domain weights re-derive
from an incrementally-maintained table instead of rescanning the
corpus (the streaming/vocab.py design applied to operators/doremi.py).

The batch operator reduces the corpus to ONE bounded table --
(domain, round, word) -> count -- and derives everything (reference
model, per-domain models, per-round excess, log-weights) from it.
That table is purely ADDITIVE, so the streaming form is exactly the
vocab/rollup recipe: each micro-batch writes its PARTIAL counts under
``_epoch=<epoch_id>`` with writer-scoped dynamic partition overwrite
(a replayed epoch overwrites its own partition wholesale ->
exactly-once table contents under at-least-once foreachBatch), the
read-time fold is one sum per key, and ``compact_doremi`` folds
accumulated epochs into a base partition to bound read amplification.

``doremi_weights_from_stream`` then routes the folded table through
the SAME ``doremi_weights_from_base`` math the batch operator uses --
maintained == batch is structural, and the driver gate
(streaming_doremi_maintained) hash-checks it against the batch SQL
mirror.

At 100 TB: the per-batch partial is (domains x rounds x batch vocab)
sized with map-side combine, the maintained table is vocabulary-sized,
and weight refresh is a read of THAT table -- never the corpus.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.text import normalized_text, sha60_hash


def doremi_partial(
    batch_df: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    domain_col: str = "source",
    n_rounds: int = 4,
    salt: str = "doremi",
) -> DataFrame:
    """One micro-batch -> (_domain, _round, word, _c) partial counts:
    the same sufficient statistic the batch operator's one corpus pass
    produces (round assignment is per-DOCUMENT hash, so a document's
    words land in the same round whichever micro-batch carries it)."""
    return (
        batch_df.select(
            F.col(domain_col).alias("_domain"),
            F.pmod(
                sha60_hash(
                    F.concat(
                        F.lit(salt), F.lit(":"),
                        F.col(id_col).cast("string"),
                    )
                ),
                F.lit(n_rounds),
            ).cast("int").alias("_round"),
            F.explode(
                F.split(normalized_text(F.col(text_col)), " ")
            ).alias("word"),
        )
        .groupBy("_domain", "_round", "word")
        .agg(F.count(F.lit(1)).alias("_c"))
    )


def apply_doremi_batch(
    batch_df: DataFrame, epoch_id: int, table_path: str, **kwargs
) -> None:
    """foreachBatch body: the batch's partial under its epoch
    partition (writer-scoped dynamic overwrite -> replay-idempotent)."""
    (
        doremi_partial(batch_df, **kwargs)
        .withColumn("_epoch", F.lit(int(epoch_id)))
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("_epoch")
        .parquet(table_path)
    )


def stream_doremi_counts(
    stream_df: DataFrame, table_path: str, *,
    checkpoint_dir: str, **kwargs
):
    """Attach the DoReMi statistic maintenance to a document stream."""
    return (
        stream_df.writeStream.outputMode("append")
        .option("checkpointLocation", checkpoint_dir)
        .foreachBatch(
            lambda df, eid: apply_doremi_batch(
                df, eid, table_path, **kwargs
            )
        )
        .start()
    )


def read_doremi_base(spark: SparkSession, table_path: str) -> DataFrame:
    """Fold all epoch partials to the current sufficient-statistic
    table (counts are additive; one sum per key)."""
    return (
        spark.read.parquet(table_path)
        .groupBy("_domain", "_round", "word")
        .agg(F.sum("_c").cast("long").alias("_c"))
    )


def doremi_weights_from_stream(
    spark: SparkSession, table_path: str, **kwargs
) -> DataFrame:
    """The maintained table through the BATCH weight math
    (operators/doremi.py::doremi_weights_from_base)."""
    from ..operators.doremi import doremi_weights_from_base

    return doremi_weights_from_base(
        read_doremi_base(spark, table_path).localCheckpoint(eager=True),
        **kwargs,
    )


def compact_doremi(spark: SparkSession, table_path: str) -> None:
    """Fold accumulated epoch partitions into one base partition
    (``_epoch=-1``), bounding read amplification; run with the stream
    paused (the vocab/rollup caveat, Delta/Iceberg the closing seam)."""
    folded = (
        read_doremi_base(spark, table_path)
        .withColumn("_epoch", F.lit(-1))
        .localCheckpoint(eager=True)  # cut lineage off replaced files
    )
    folded.write.mode("overwrite").partitionBy("_epoch").parquet(
        table_path
    )
