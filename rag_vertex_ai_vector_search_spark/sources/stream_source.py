"""`spark.readStream.format("txtable")` -- a Structured Streaming
source over the transactional commit log (PySpark Python DataSource
API, the Delta streaming-source analog).

Offsets ARE commit versions: ``initialOffset`` starts at
``startingVersion`` (default -1 = the full table as the initial
snapshot, Delta's semantics), ``latestOffset`` is the table's current
version, and a micro-batch reads the versions in ``(start, end]``
straight from the immutable manifests. Because a manifest commit is ATOMIC, a version is
either entirely visible to ``latestOffset`` or not yet -- there is no
partially-listed epoch, so the file-source append race (CLAUDE.md r10:
multi-file appends racing the directory listing) CANNOT happen here;
writers need no ``coalesce(1)`` discipline. Replays re-read the same
version range from the same immutable manifests, so a restart is
deterministic and the source composes with the tx sink's
``(txn_app, txn_batch)`` replay guard into end-to-end exactly-once.

Semantics per commit (Delta-source parity):

- append-like commits (``added`` only): their files' rows are the
  micro-batch -- the steady-state cost is O(new data);
- data-preserving rewrites (compact / compact-fragmented / zorder):
  skipped -- no rows, by the rewrites' own contract;
- replace commits (merge, overwrite, recluster): the stream FAILS
  loudly, exactly like Delta's source on a change commit, unless
  ``skipChangeCommits=true`` (then the commit is skipped; consumers
  that need the row-level diff use ``read_table_changes`` in a
  ``foreachBatch`` instead -- the stream source emits INSERTS only).

Schema is pinned at query start, resolved Spark-free (every Python
DataSource hook runs in a worker with no JVM): the RECORDED evolution
schema when one exists -- exactly what ``read_table`` applies -- else
the first live file's parquet footer plus hive partition columns
type-inferred from the live paths. Files with missing columns
null-backfill (pre-evolution files); hive partition-dir values
(``part=0/``) are re-attached as constant columns cast to the pinned
schema's types.
Rows cross a Python worker as Arrow RecordBatches (the Python
DataSource transport); the per-batch volume is the APPEND delta, never
the table, so the Arrow hop prices O(new rows) -- the native scan
(`read_table`) remains the batch-read path.

Vacuum interplay: a stream lagging past ``tx_vacuum`` retention fails
loudly at manifest resolve or file read -- never a silent gap, same
contract as time travel and the change feed.

Reference anchor: the reference's STREAM_UPDATE index
(index_manager.py:53) accepts live upserts but exposes no stream OF
the table; this source completes that loop for Spark consumers.
"""

from __future__ import annotations

import posixpath
from typing import TYPE_CHECKING

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    InputPartition,
)

if TYPE_CHECKING:  # pragma: no cover
    from pyspark.sql.types import StructType

_DATA_PRESERVING = frozenset({"compact", "compact-fragmented", "zorder"})
FORMAT_NAME = "txtable"


def _local_log(path: str):
    """A TxLog over ``path`` WITHOUT a SparkSession: every Python
    DataSource hook (schema / offsets / partitions / read) runs in a
    dedicated Python worker where no session -- and no JVM gateway --
    exists, so the format drives the log's direct-POSIX branch.
    ``file:`` URIs are stripped to their local path; other schemes
    need the Hadoop FS and therefore cannot be served from the
    DataSource worker -- the loud error names the pyarrow.fs adapter
    seam a remote deployment would plug in."""
    from .txlog import TxLog, _scheme_of, _strip_file_scheme

    scheme = _scheme_of(path)
    if scheme == "file":
        path = _strip_file_scheme(path)
    elif scheme is not None:
        raise NotImplementedError(
            f"txtable runs in a Python DataSource worker with no JVM, "
            f"so only local / file: paths are supported (got scheme "
            f"{scheme!r}). Remote schemes need a pyarrow.fs-backed tx "
            "adapter (register_tx_fs seam)."
        )
    return TxLog(None, path)


def _infer_partition_type(values: list[str]):
    """Spark's partition-column type inference, minimally: all-int ->
    Integer/Long by int32 range, all-float -> Double, else String.
    (Date/timestamp dir values fall back to String here -- pass an
    explicit ``.schema(...)`` for those.)"""
    from pyspark.sql.types import (
        DoubleType,
        IntegerType,
        LongType,
        StringType,
    )

    try:
        ints = [int(v) for v in values]
        if all(-(2 ** 31) <= i < 2 ** 31 for i in ints):
            return IntegerType()
        return LongType()
    except ValueError:
        pass
    try:
        [float(v) for v in values]
        return DoubleType()
    except ValueError:
        return StringType()


def _resolve_schema(path: str, version: int | None):
    """The table schema at ``version``, Spark-free: the recorded
    evolution schema when one exists (exactly what ``read_table``
    applies), else the first live file's parquet footer via pyarrow
    plus hive partition columns inferred from the live paths."""
    from pyspark.sql.pandas.types import from_arrow_schema
    from pyspark.sql.types import StructField, StructType

    log = _local_log(path)
    v = log.current_version() if version is None else int(version)
    recorded = log.schema_at(v)
    rels = log.live_files(v)
    if not rels:
        if recorded is not None:
            return recorded
        raise ValueError(f"tx table at {path} is empty at version {v}")
    pvals: dict[str, list[str]] = {}
    for rel in rels:
        for k, val in _partition_values(rel).items():
            pvals.setdefault(k, []).append(val)
    if recorded is not None:
        base = recorded
    else:
        import pyarrow.parquet as pq

        # relax footer required-ness: Spark's parquet scan reports
        # every data column nullable, and read_table must agree
        base = StructType([
            StructField(f.name, f.dataType, True)
            for f in from_arrow_schema(
                pq.read_schema(posixpath.join(log.table, rels[0]))
            ).fields
        ])
    fields = list(base.fields)
    have = {f.name for f in fields}
    for k, vals in pvals.items():
        if k not in have:
            fields.append(
                StructField(k, _infer_partition_type(vals), True)
            )
    return StructType(fields)


class _FilePartition(InputPartition):
    """One added data file of one commit: everything read() needs,
    serialized to the executor (absolute path, the table-relative path
    whose hive segments carry partition values, and the pinned schema
    as JSON)."""

    def __init__(self, abs_path: str, rel_path: str, schema_json: str):
        self.abs_path = abs_path
        self.rel_path = rel_path
        self.schema_json = schema_json


def _partition_values(rel_path: str) -> dict[str, str]:
    out: dict[str, str] = {}
    for seg in posixpath.dirname(rel_path).split("/"):
        if "=" in seg:
            k, _, v = seg.partition("=")
            out[k] = v
    return out


def _read_file_batches(part: _FilePartition):
    """Arrow batches of one data file aligned to the pinned schema:
    schema columns the file lacks are null-backfilled (pre-evolution
    files) or re-attached from hive partition-dir values cast to the
    pinned type; extra file columns are dropped. Runs on executors --
    pyarrow only, no Spark."""
    import json

    import pyarrow as pa
    import pyarrow.parquet as pq
    from pyspark.sql.types import StructType
    from pyspark.sql.pandas.types import to_arrow_schema

    spark_schema = StructType.fromJson(json.loads(part.schema_json))
    target = to_arrow_schema(spark_schema)
    pvals = _partition_values(part.rel_path)
    pf = pq.ParquetFile(part.abs_path)
    present = [
        f.name for f in target if f.name in set(pf.schema_arrow.names)
    ]
    for batch in pf.iter_batches(columns=present):  # column-pruned scan
        n = batch.num_rows
        idx = {name: i for i, name in enumerate(batch.schema.names)}
        cols = []
        for field in target:
            if field.name in idx:
                col = batch.column(idx[field.name]).cast(field.type)
            elif field.name in pvals:
                col = pa.array([pvals[field.name]] * n).cast(field.type)
            else:
                col = pa.nulls(n, field.type)
            cols.append(col)
        yield pa.RecordBatch.from_arrays(cols, schema=target)


class _TxTableStreamReader(DataSourceStreamReader):
    def __init__(self, schema: "StructType", options: dict):
        self._path = options.get("path")
        if not self._path:
            raise ValueError(
                "txtable requires a path: "
                "spark.readStream.format('txtable').load('<table path>') "
                "or .option('path', ...)"
            )
        self._schema_json = schema.json()
        self._starting = int(options.get("startingversion", -1))
        self._skip_change = str(
            options.get("skipchangecommits", "false")
        ).lower() in ("true", "1")

    def _log(self):
        return _local_log(self._path)

    def initialOffset(self) -> dict:
        return {"version": self._starting}

    def latestOffset(self) -> dict:
        # No maxVersionsPerTrigger rate limit ON PURPOSE: the Python
        # DataSource API exposes no ReadLimit, so a limit implemented
        # by holding latestOffset back cannot see the checkpointed
        # start after a restart and could return an offset BELOW it --
        # Spark would log that regressed end and re-plan versions
        # already committed (duplicates). Backlog bounding arrives
        # with ReadLimit support; until then a catch-up batch is big
        # but exactly-once.
        return {"version": self._log().current_version()}

    def commit(self, end: dict) -> None:
        pass  # the checkpoint log is Spark's; manifests are immutable

    def partitions(self, start: dict, end: dict):
        log = self._log()
        parts: list[_FilePartition] = []
        for v in range(int(start["version"]) + 1, int(end["version"]) + 1):
            if v == 0:
                doc = log.snapshot(0)
                added = [f["path"] for f in doc["files"]]
                removed: list[str] = []
            else:
                doc = log._read_commit(v)
                added = [f["path"] for f in doc.get("added") or []]
                removed = list(doc.get("removed") or [])
            action = doc.get("action", "")
            if action in _DATA_PRESERVING:
                continue
            if removed:
                if self._skip_change:
                    continue
                raise ValueError(
                    f"txtable stream at {self._path} hit a change commit "
                    f"(v{v}, action={action!r}): the source emits inserts "
                    "only. Set .option('skipChangeCommits', 'true') to "
                    "skip it, or consume read_table_changes in a "
                    "foreachBatch for the row-level diff."
                )
            for rel in added:
                parts.append(
                    _FilePartition(
                        posixpath.join(log.table, rel),
                        rel,
                        self._schema_json,
                    )
                )
        # an all-skipped range still needs one (empty) partition: Spark
        # requires partitions() to be non-empty for a planned batch
        if not parts:
            parts.append(_FilePartition("", "", self._schema_json))
        return parts

    def read(self, partition: _FilePartition):
        if not partition.abs_path:
            return iter(())
        return _read_file_batches(partition)


class _TxTableBatchReader(DataSourceReader):
    """Batch symmetry (`spark.read.format("txtable")`): the snapshot's
    live files at ``version`` (default current). The NATIVE path
    (`read_table`) is preferred for batch -- it scans JVM-side with
    pushdown; this reader exists so the format round-trips and remote
    tools that only speak formats can read a snapshot."""

    def __init__(self, schema: "StructType", options: dict):
        self._schema_json = schema.json()
        log = _local_log(options.get("path"))
        v = options.get("version")
        self._files = [
            (posixpath.join(log.table, rel), rel)
            for rel in log.live_files(
                int(v) if v is not None else None
            )
        ]

    def partitions(self):
        return [
            _FilePartition(a, r, self._schema_json) for a, r in self._files
        ] or [_FilePartition("", "", self._schema_json)]

    def read(self, partition: _FilePartition):
        if not partition.abs_path:
            return iter(())
        return _read_file_batches(partition)


class TxTableDataSource(DataSource):
    """``spark.dataSource.register(TxTableDataSource)`` then
    ``spark.readStream.format("txtable").load(path)`` (streaming) or
    ``spark.read.format("txtable").load(path)`` (batch snapshot)."""

    @classmethod
    def name(cls) -> str:
        return FORMAT_NAME

    def schema(self):
        path = self.options.get("path")
        if not path:
            raise ValueError("txtable requires a path")
        version = self.options.get("version")
        return _resolve_schema(
            path, int(version) if version is not None else None
        )

    def reader(self, schema: "StructType"):
        return _TxTableBatchReader(schema, self.options)

    def streamReader(self, schema: "StructType"):
        return _TxTableStreamReader(schema, self.options)


def register_tx_stream_source(spark) -> None:
    """Idempotent per-session registration of the ``txtable`` format."""
    spark.dataSource.register(TxTableDataSource)
