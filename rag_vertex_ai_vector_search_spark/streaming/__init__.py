from .ingest import stream_merge_into_index
from .dedup import stream_dedup_exact

__all__ = ["stream_merge_into_index", "stream_dedup_exact"]
