"""Streaming exact dedup: bounded-state duplicate suppression.

Batch `dedup_exact` (operators/dedup.py) keeps one row per content
fingerprint with a group-by -- unusable on an unbounded stream, where
"group by fingerprint" means unbounded state. This is the streaming
face of the same operator: `dropDuplicatesWithinWatermark` keeps a
fingerprint's state only until the event-time watermark passes it, so

- a re-ingested document (same normalized text) arriving within the
  watermark horizon is suppressed exactly once per horizon;
- state is O(distinct fingerprints per horizon), NOT O(stream history)
  -- the property that lets this run forever on a 100 TB/day feed;
- duplicates farther apart than the horizon deliberately pass through
  and are reconciled by the idempotent batch merge downstream
  (streaming/ingest.py keep-latest upsert), the standard
  lambda-architecture split of cheap-online vs exact-offline dedup.

`dropDuplicatesWithinWatermark` (Spark 3.5+) rather than
`dropDuplicates`: the latter on a streaming DataFrame also keys state
by the watermark column value itself, so the SAME text at different
timestamps would not dedup at all.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from ..functions.text import doc_fingerprint


def stream_dedup_exact(
    stream_df: DataFrame,
    text_col: str = "text",
    ts_col: str = "ts",
    *,
    horizon: str = "10 minutes",
) -> DataFrame:
    """First occurrence per content fingerprint within the watermark
    horizon; later copies inside the horizon are dropped. Adds the
    `fingerprint` column (kept -- downstream batch reconciliation keys
    on it)."""
    return (
        stream_df.withColumn("fingerprint", doc_fingerprint(text_col))
        .withWatermark(ts_col, horizon)
        .dropDuplicatesWithinWatermark(["fingerprint"])
    )
