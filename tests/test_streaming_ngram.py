"""Streaming n-gram maintenance == batch trigram-position counts,
replay-idempotent, compaction-stable; the trigram scorer reads the
maintained table bit-exactly (streaming/ngram.py)."""

import glob

from pyspark.sql import functions as F

from rag_vertex_ai_vector_search_spark.operators.lm_quality import (
    trigram_position_counts,
    trigram_surprisal,
)
from rag_vertex_ai_vector_search_spark.sources import load_table
from rag_vertex_ai_vector_search_spark.streaming.ngram import (
    apply_ngram_batch,
    compact_ngrams,
    read_ngram_counts,
    stream_ngram_counts,
)

import pytest

# Slow tier: excluded from the per-commit fast gate (pytest -m "not full");
# the full suite still runs before a round is declared done.
pytestmark = pytest.mark.full



def _assert_same(a, b):
    assert a.exceptAll(b).isEmpty() and b.exceptAll(a).isEmpty()


def _batch_counts(docs):
    return trigram_position_counts(docs).withColumn(
        "n", F.col("n").cast("long")
    )


def test_stream_ngrams_match_batch(spark, sf_smoke, tmp_path):
    docs = load_table(spark, sf_smoke, "documents").select("doc_id", "text")
    src = str(tmp_path / "src")
    table = str(tmp_path / "ngrams")
    ckpt = str(tmp_path / "ckpt")
    docs.repartition(3).write.parquet(src)

    stream = spark.readStream.schema(docs.schema).option(
        "maxFilesPerTrigger", 1
    ).parquet(src)
    q = stream_ngram_counts(stream, table, checkpoint_dir=ckpt)
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    epochs = spark.read.parquet(table).select("_epoch").distinct().count()
    assert epochs >= 2, "stream must have produced multiple micro-batches"
    _assert_same(read_ngram_counts(spark, table), _batch_counts(docs))


def test_ngram_replay_idempotent_and_scorer_parity(spark, sf_smoke, tmp_path):
    """Replaying an epoch changes nothing, and trigram surprisal scored
    under the maintained counts is BIT-EQUAL to batch self-scoring
    (the derived lower-order tables are exact integer sums)."""
    docs = load_table(spark, sf_smoke, "documents").select("doc_id", "text")
    table = str(tmp_path / "ngrams")
    first = docs.filter(F.col("doc_id") % 2 == 0)
    second = docs.filter(F.col("doc_id") % 2 == 1)
    apply_ngram_batch(first, 0, table)
    apply_ngram_batch(second, 1, table)
    apply_ngram_batch(second, 1, table)  # at-least-once replay
    counts = read_ngram_counts(spark, table)
    _assert_same(counts, _batch_counts(docs))

    scored_stream = trigram_surprisal(docs, counts=counts)
    scored_batch = trigram_surprisal(docs)
    _assert_same(scored_stream, scored_batch)


def test_ngram_external_model_scores_unseen(spark):
    """The CCNet setup: scoring NEW text under a maintained model built
    from a reference corpus -- unseen n-grams coalesce to zero counts
    and the novel doc scores strictly more surprising."""
    ref = spark.createDataFrame(
        [(i, "the cat sat on the mat") for i in range(20)],
        "doc_id long, text string",
    )
    counts = trigram_position_counts(ref).withColumn(
        "n", F.col("n").cast("long")
    )
    probe = spark.createDataFrame(
        [(100, "the cat sat on the mat"), (101, "zyx wvu tsr qpo nml kji")],
        "doc_id long, text string",
    )
    got = {r.doc_id: r.avg_surprisal_nats
           for r in trigram_surprisal(probe, counts=counts).collect()}
    assert got[101] > got[100] + 1.0


def test_ngram_compaction_folds_epochs(spark, sf_smoke, tmp_path):
    docs = load_table(spark, sf_smoke, "documents").select("doc_id", "text")
    table = str(tmp_path / "ngrams")
    for i in range(4):
        apply_ngram_batch(docs.filter(F.col("doc_id") % 4 == i), i, table)
    expected = sorted(map(tuple, read_ngram_counts(spark, table).collect()))

    compact_ngrams(spark, table)
    files_after = glob.glob(f"{table}/_epoch=*")
    assert [f.rsplit("=", 1)[-1] for f in files_after] == ["-1"]
    assert sorted(map(tuple, read_ngram_counts(spark, table).collect())) \
        == expected


# -- line document-frequency maintenance (streaming/linestats.py) ----------

def test_stream_line_df_matches_batch_and_cleaner_parity(
    spark, sf_smoke, tmp_path
):
    """Maintained line frequencies == batch distinct-doc counts, and
    boilerplate cleaning under the maintained table is bit-equal to
    batch self-counting."""
    from rag_vertex_ai_vector_search_spark.operators.dedup import (
        dedup_boilerplate_lines,
    )
    from rag_vertex_ai_vector_search_spark.streaming.linestats import (
        apply_line_df_batch,
        read_line_df,
    )

    footer = "shared footer line"
    rows = [
        (i, f"unique line {i} alpha\n{footer}\nunique line {i} beta")
        for i in range(20)
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    table = str(tmp_path / "linedf")
    apply_line_df_batch(docs.filter(F.col("doc_id") % 2 == 0), 0, table)
    apply_line_df_batch(docs.filter(F.col("doc_id") % 2 == 1), 1, table)
    apply_line_df_batch(docs.filter(F.col("doc_id") % 2 == 1), 1, table)

    counts = read_line_df(spark, table)
    batch = (
        docs.select(
            "doc_id", F.explode(F.split("text", "\n")).alias("line")
        )
        .groupBy("line")
        .agg(F.countDistinct("doc_id").cast("long").alias("n_docs"))
    )
    assert counts.exceptAll(batch).isEmpty() \
        and batch.exceptAll(counts).isEmpty()

    maintained = dedup_boilerplate_lines(docs, line_counts=counts)
    selfcount = dedup_boilerplate_lines(docs)
    assert maintained.exceptAll(selfcount).isEmpty() \
        and selfcount.exceptAll(maintained).isEmpty()

    # cleaning a SLICE against corpus-global frequencies: the shared
    # footer is removed even though the slice holds only one copy...
    one = dedup_boilerplate_lines(
        docs.filter(F.col("doc_id") == 3), line_counts=counts
    ).collect()[0]
    assert one.n_removed == 1 and footer not in one.text
    # ...while self-counting the slice alone would keep it
    solo = dedup_boilerplate_lines(
        docs.filter(F.col("doc_id") == 3)
    ).collect()[0]
    assert solo.n_removed == 0
