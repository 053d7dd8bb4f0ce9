"""Corpus snapshot diffing: what changed between two crawls/builds.

Every recurring pipeline (weekly crawl, nightly corpus build) needs
the added/removed/changed/unchanged breakdown before deciding how much
downstream work to re-run -- incremental embedding only the changed
docs is the difference between re-embedding 100 TB and re-embedding
1%. The diff keys on the document id and compares CONTENT by the
normalized-text sha256 fingerprint (functions/text.py::doc_fingerprint,
the exact-dedup key), so formatting-only churn that normalization
collapses does not count as a change.

Scale shape: two fingerprint projections (narrow, codegen'd sha256)
and ONE full outer join on the id -- with both snapshots written
bucketed by id (sources/tables.write_bucketed) the join is
shuffle-free. Output is one row per id in either snapshot; aggregate
``status`` for the summary counts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import doc_fingerprint


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(id, status, old_fingerprint, new_fingerprint) with status in
    added / removed / changed / unchanged."""
    of = old.select(
        F.col(id_col).alias("_id"),
        doc_fingerprint(F.col(text_col)).alias("old_fingerprint"),
    )
    nf = new.select(
        F.col(id_col).alias("_id"),
        doc_fingerprint(F.col(text_col)).alias("new_fingerprint"),
    )
    j = of.join(nf, "_id", "full")
    status = (
        F.when(F.col("old_fingerprint").isNull(), F.lit("added"))
        .when(F.col("new_fingerprint").isNull(), F.lit("removed"))
        .when(
            F.col("old_fingerprint") != F.col("new_fingerprint"),
            F.lit("changed"),
        )
        .otherwise(F.lit("unchanged"))
    )
    return j.select(
        F.col("_id").alias(id_col),
        status.alias("status"),
        "old_fingerprint",
        "new_fingerprint",
    )
