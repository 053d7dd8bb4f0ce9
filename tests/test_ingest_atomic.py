"""Atomic dual-sink ingest (r17, VERDICT r16 #2): one parent-scope
commit over the datapoints + metadata tables. The reference's two
independent RPCs (setup_vector_search.py:147-153 + firestore_ops.py
:60-88) can crash between the sides and strand the joined model;
``write_ingest`` now publishes both sides in ONE manifest commit, so a
reader sees either both sides of an ingest or neither -- proven here by
killing the writer at every protocol step."""

import pytest
from pyspark.sql import functions as F

from rag_vertex_ai_vector_search_spark.operators.ingest import (
    ingest_documents,
    read_ingest_table,
    write_ingest,
)
from rag_vertex_ai_vector_search_spark.sources import txlog as tx
from rag_vertex_ai_vector_search_spark.sources.txlog import TxLog, tx_vacuum


def _docs(spark, lo, hi):
    return spark.range(lo, hi).select(
        F.concat(F.lit("doc-"), F.col("id")).alias("doc_id"),
        F.concat(F.lit("text body number "), F.col("id")).alias("text"),
    )


def _ingest(spark, lo, hi):
    return ingest_documents(_docs(spark, lo, hi), dim=8)


def _pair_counts(spark, out):
    dp = read_ingest_table(spark, out, "datapoints")
    md = read_ingest_table(spark, out, "metadata")
    joined = dp.join(md, "data_point_id").count()
    return dp.count(), md.count(), joined


def test_roundtrip_both_sides_one_commit(spark, tmp_path):
    out = str(tmp_path / "ing")
    v = write_ingest(_ingest(spark, 0, 40), out)
    assert v == 1  # ONE commit for both tables
    dp_n, md_n, joined = _pair_counts(spark, out)
    assert dp_n == md_n == joined == 40
    assert "feature_vector" in read_ingest_table(spark, out, "datapoints").columns
    assert "content" in read_ingest_table(spark, out, "metadata").columns


def test_overwrite_replaces_both_sides_atomically(spark, tmp_path):
    out = str(tmp_path / "ing")
    write_ingest(_ingest(spark, 0, 40), out)
    v2 = write_ingest(_ingest(spark, 100, 130), out)
    dp_n, md_n, joined = _pair_counts(spark, out)
    assert dp_n == md_n == joined == 30
    # time travel still pairs the OLD ingest
    old_dp = read_ingest_table(spark, out, "datapoints", version=1)
    old_md = read_ingest_table(spark, out, "metadata", version=1)
    assert old_dp.count() == old_md.count() == 40
    assert old_dp.join(old_md, "data_point_id").count() == 40
    assert v2 == 2


def test_append_adds_both_sides_atomically(spark, tmp_path):
    out = str(tmp_path / "ing")
    write_ingest(_ingest(spark, 0, 40), out)
    write_ingest(_ingest(spark, 40, 55), out, mode="append")
    dp_n, md_n, joined = _pair_counts(spark, out)
    assert dp_n == md_n == joined == 55


def test_crash_between_sides_readers_see_old_pair(spark, tmp_path, monkeypatch):
    """Kill the writer after the datapoints side is staged, before the
    metadata side -- the exact inter-RPC crash window of the reference.
    Readers must still see the PREVIOUS complete pair."""
    out = str(tmp_path / "ing")
    write_ingest(_ingest(spark, 0, 40), out)

    real_stage = tx._stage_and_move_in

    def die_on_metadata(spark_, table, df, *a, **k):
        if k.get("dest_prefix") == "metadata":
            raise RuntimeError("killed between the two sides")
        return real_stage(spark_, table, df, *a, **k)

    monkeypatch.setattr(tx, "_stage_and_move_in", die_on_metadata)
    with pytest.raises(RuntimeError, match="between the two sides"):
        write_ingest(_ingest(spark, 100, 130), out)
    monkeypatch.undo()

    dp_n, md_n, joined = _pair_counts(spark, out)
    assert dp_n == md_n == joined == 40  # the OLD pair, complete
    # no half-ingest version was committed
    assert TxLog(spark, out).current_version() == 1


def test_crash_after_staging_before_commit(spark, tmp_path, monkeypatch):
    out = str(tmp_path / "ing")
    write_ingest(_ingest(spark, 0, 40), out)

    def boom_replace(self, inputs, outputs, **k):
        raise RuntimeError("killed before the commit")

    monkeypatch.setattr(TxLog, "replace_files", boom_replace)
    with pytest.raises(RuntimeError, match="before the commit"):
        write_ingest(_ingest(spark, 100, 130), out)
    monkeypatch.undo()

    dp_n, md_n, joined = _pair_counts(spark, out)
    assert dp_n == md_n == joined == 40
    # the crashed attempt's staged files are reaped garbage, and a
    # clean re-ingest lands on the intact base
    tx_vacuum(spark, out, retain_versions=10, min_age_seconds=0)
    v = write_ingest(_ingest(spark, 100, 130), out)
    assert v == 2
    assert _pair_counts(spark, out) == (30, 30, 30)


def test_crash_on_fresh_dir_readers_see_neither(spark, tmp_path, monkeypatch):
    out = str(tmp_path / "ing")

    def boom_replace(self, inputs, outputs, **k):
        raise RuntimeError("killed before the commit")

    monkeypatch.setattr(TxLog, "replace_files", boom_replace)
    with pytest.raises(RuntimeError, match="before the commit"):
        write_ingest(_ingest(spark, 0, 40), out)
    monkeypatch.undo()
    # NEITHER side is visible (v0 is empty; the staged files are
    # uncommitted garbage)
    for side in ("datapoints", "metadata"):
        with pytest.raises(ValueError, match="no committed"):
            read_ingest_table(spark, out, side)


def test_legacy_nontransactional_path(spark, tmp_path):
    out = str(tmp_path / "ing")
    assert write_ingest(_ingest(spark, 0, 20), out, transactional=False) is None
    dp_n, md_n, joined = _pair_counts(spark, out)  # plain-dir fallback
    assert dp_n == md_n == joined == 20
