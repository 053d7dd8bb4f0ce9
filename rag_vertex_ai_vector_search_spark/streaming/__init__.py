from .ingest import stream_merge_into_index
from .dedup import stream_dedup_exact
from .rollup import (
    apply_rollup_batch,
    compact_rollup,
    read_rollup,
    stream_rollup_events,
)

__all__ = [
    "stream_merge_into_index",
    "stream_dedup_exact",
    "stream_rollup_events",
    "apply_rollup_batch",
    "read_rollup",
    "compact_rollup",
]
