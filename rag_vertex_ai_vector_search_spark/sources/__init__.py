from .tables import (
    TABLE_NAMES,
    fan_out,
    load_table,
    load_tables,
    register_views,
    write_bucketed,
)
from .documents import scan_document_dir
from .compact import (
    compact_parquet,
    gc_table_path,
    resume_pending_compact,
    table_file_stats,
)
from .txlog import (
    TxConflict,
    TxIdempotentReplay,
    TxLog,
    TxRewriteAborted,
    read_table_any,
    tx_append,
    tx_compact,
    tx_merge,
    tx_overwrite,
    tx_vacuum,
    tx_zorder,
)
from .webdataset import (
    encode_webdataset_shard,
    group_webdataset_samples,
    parse_webdataset_shard,
    read_webdataset,
)
from .warc import (
    encode_warc,
    http_payload_body,
    parse_warc_records,
    read_warc,
)

__all__ = [
    "TABLE_NAMES",
    "fan_out",
    "load_table",
    "load_tables",
    "register_views",
    "write_bucketed",
    "scan_document_dir",
    "compact_parquet",
    "gc_table_path",
    "TxConflict",
    "TxLog",
    "TxRewriteAborted",
    "read_table_any",
    "tx_append",
    "tx_compact",
    "tx_merge",
    "tx_overwrite",
    "tx_vacuum",
    "tx_zorder",
    "resume_pending_compact",
    "table_file_stats",
    "encode_warc",
    "encode_webdataset_shard",
    "group_webdataset_samples",
    "parse_webdataset_shard",
    "read_webdataset",
    "http_payload_body",
    "parse_warc_records",
    "read_warc",
]
