from .ingest import stream_merge_into_index

__all__ = ["stream_merge_into_index"]
