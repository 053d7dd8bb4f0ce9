"""Minimal transactional commit log for parquet table paths.

The r10-r14 staged-swap protocol (``sources/compact.py``) made in-place
rewrites crash-safe and append-safe, but its commit point is a pair of
directory renames guarded by LISTINGS -- a foreign writer landing a
file inside the marker-write-plus-two-renames window (milliseconds) is
rescued after the fact rather than excluded by construction, and the
residual window was documented, not closed. This module closes it BY
PROTOCOL, the same way Delta Lake / Iceberg do (delta-spark is not
installed in this environment, so the seam is built from first
principles on primitives the repo already owns):

- **Versioned manifest.** ``<table>/_txlog/v{N:020d}.json`` -- one JSON
  commit file per table version, carrying the FULL list of live data
  files (relative path + size) plus the delta (``added`` / ``removed``)
  and the writer's ``base_version``. The underscore dir is invisible to
  plain ``spark.read.parquet`` scans, so a tx table still reads as a
  (possibly stale/superset) plain directory for legacy consumers.
- **Atomic commit = publish-if-absent of the next version file.** On a
  local filesystem this is ``os.link(tmp, v{N}.json)`` -- a POSIX hard
  link fails with EEXIST atomically, so exactly ONE writer wins each
  version slot (rename(2) would silently overwrite). On HDFS the
  fallback is ``fs.rename`` (atomic, fails when the destination
  exists). Object stores without atomic put-if-absent need a LogStore
  coordinator (DynamoDB for S3 in Delta's design) -- that is the one
  deployment seam, and it is the SAME seam every transactional format
  has on S3.
- **Snapshot-isolation readers.** ``read_table`` resolves the highest
  committed version and reads the explicit file list
  (``option("basePath", table)`` keeps hive partition columns), never
  listing data dirs: uncommitted, mid-move, or logically-deleted files
  are invisible no matter when they physically appear, so readers need
  zero coordination with writers and a crashed writer can never
  corrupt a read.
- **Optimistic writers.** Appends stage files under a dot-prefixed
  scratch dir, move them in under commit-unique names, then retry the
  publish loop rebasing on the latest snapshot (appends always
  commute). Rewrites (compaction, z-order, bucket merge) record the
  exact input files they read and re-validate at commit time that ALL
  of them are still live -- a concurrent append rides through (the
  rebase keeps every file the rewrite didn't read), while two rewrites
  of overlapping files conflict and the loser aborts with its outputs
  reaped. Lost updates are impossible by construction: the version
  slot is claimed atomically AFTER validation, and a loser re-validates
  against the winner's snapshot.

Scale notes (100 TB): a full file list per commit is O(files) JSON --
fine to ~10^5 files; past that the production refinement is Delta's
add/remove action log + periodic checkpoints so a commit is O(delta).
The snapshot read hands Spark an explicit file list, which is exactly
what Delta/Iceberg readers do (no listing; the driver holds the
manifest). ``vacuum`` bounds physical garbage: files referenced by no
retained version are deleted age-gated, so an in-flight writer's
just-moved-in (not yet committed) files are never raced.

Reference anchor: the engine's mutation surface is an atomic batch
commit (firestore_ops.py:65-83) over a live STREAM_UPDATE index
(index_manager.py:53) -- this log is the storage-level analog for a
parquet layout.
"""

from __future__ import annotations

import json
import os
import posixpath
import shutil
import time
import uuid

from pyspark.sql import DataFrame, SparkSession

TXLOG_DIR = "_txlog"
_STAGE_PREFIX = ".tx-stage-"
_MAX_COMMIT_ATTEMPTS = 100
# Every Nth commit is a CHECKPOINT carrying the full live-file list;
# the commits between carry only their add/remove delta (O(delta)
# JSON, the Delta-Lake economics). Readers resolve a snapshot by
# walking back to the nearest checkpoint and replaying deltas forward
# -- at most N-1 small files, independent of table size.
CHECKPOINT_INTERVAL = 10


class TxConflict(Exception):
    """Another writer claimed the version slot (retryable)."""


class TxRewriteAborted(Exception):
    """A concurrent commit removed one of this rewrite's input files:
    the rewrite's outputs are stale and must not be published."""


def _local_path(path: str) -> str:
    """Strip a ``file:`` scheme; raise for remote schemes (the HDFS /
    object-store branch goes through the Hadoop FS seam documented in
    the module docstring -- not exercised in this sandbox)."""
    if path.startswith("file://"):
        return path[len("file://"):]
    if path.startswith("file:"):
        return path[len("file:"):]
    if "://" in path:
        raise NotImplementedError(
            f"txlog on remote scheme {path!r}: route the publish through "
            "fs.rename (HDFS) or a LogStore coordinator (object stores)"
        )
    return path


class TxLog:
    """The per-table commit log. Cheap to construct; all state on disk."""

    def __init__(self, spark: SparkSession, table_path: str):
        self.spark = spark
        self.table = _local_path(table_path.rstrip("/"))
        self.log_dir = os.path.join(self.table, TXLOG_DIR)

    # ---- log inspection -------------------------------------------------

    def exists(self) -> bool:
        return self.current_version() >= 0

    def _version_files(self) -> list[tuple[int, str]]:
        if not os.path.isdir(self.log_dir):
            return []
        out = []
        for name in os.listdir(self.log_dir):
            if name.startswith("v") and name.endswith(".json"):
                try:
                    out.append((int(name[1:-5]), name))
                except ValueError:
                    continue
        return sorted(out)

    def current_version(self) -> int:
        versions = self._version_files()
        return versions[-1][0] if versions else -1

    def _read_commit(self, v: int) -> dict:
        with open(os.path.join(self.log_dir, f"v{v:020d}.json")) as f:
            return json.load(f)

    def snapshot(self, version: int | None = None) -> dict:
        """The commit doc at ``version`` with its ``files`` list
        RESOLVED: checkpoint commits carry it verbatim; delta commits
        are reconstructed by replaying add/remove deltas forward from
        the nearest earlier checkpoint (<= CHECKPOINT_INTERVAL - 1
        delta reads, independent of table size)."""
        v = self.current_version() if version is None else int(version)
        if v < 0:
            raise ValueError(f"no committed version at {self.table}")
        doc = self._read_commit(v)
        if doc.get("files") is not None:
            return doc
        base = v - 1
        chain = [doc]
        while base >= 0:
            d = self._read_commit(base)
            chain.append(d)
            if d.get("files") is not None:
                break
            base -= 1
        else:
            raise ValueError(
                f"no checkpoint commit at or below v{v} at {self.table}"
            )
        files = {f["path"]: f for f in chain[-1]["files"]}
        for d in reversed(chain[:-1]):
            for rel in d.get("removed") or []:
                files.pop(rel, None)
            for f in d.get("added") or []:
                files[f["path"]] = f
        return {**doc, "files": sorted(
            files.values(), key=lambda f: f["path"]
        )}

    def live_files(self, version: int | None = None) -> list[str]:
        """Relative paths of the data files live at ``version``."""
        return [f["path"] for f in self.snapshot(version)["files"]]

    def table_stats(self, version: int | None = None) -> tuple[int, int]:
        """(file_count, total_bytes) FROM THE MANIFEST -- no directory
        listing, the observability win of a log at object-store scale."""
        files = self.snapshot(version)["files"]
        return len(files), sum(int(f.get("size", 0)) for f in files)

    # ---- commit ----------------------------------------------------------

    def _publish(self, version: int, doc: dict) -> None:
        """Atomically claim version slot ``version`` with ``doc``.
        Write-tmp + fsync + hard-link: the link either creates the
        commit file (win) or fails EEXIST (lose, TxConflict). The tmp
        is fully durable before the link, so a reader can never open a
        half-written commit."""
        os.makedirs(self.log_dir, exist_ok=True)
        final = os.path.join(self.log_dir, f"v{version:020d}.json")
        tmp = os.path.join(self.log_dir, f".tmp-{uuid.uuid4().hex}")
        payload = json.dumps(doc, sort_keys=True).encode("utf-8")
        fd = os.open(tmp, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
        try:
            os.write(fd, payload)
            os.fsync(fd)
        finally:
            os.close(fd)
        try:
            os.link(tmp, final)
        except FileExistsError:
            raise TxConflict(
                f"version {version} already committed at {self.table}"
            ) from None
        finally:
            os.unlink(tmp)
        # durability of the directory entry itself
        dfd = os.open(self.log_dir, os.O_RDONLY)
        try:
            os.fsync(dfd)
        finally:
            os.close(dfd)

    def commit(
        self,
        *,
        files: list[dict],
        base_version: int,
        action: str,
        added: list[dict] | None = None,
        removed: list[str] | None = None,
        meta: dict | None = None,
    ) -> int:
        """Publish ``base_version + 1``; raises ``TxConflict`` when the
        slot is taken (caller re-reads and retries). Checkpoint
        versions (every ``CHECKPOINT_INTERVAL``-th, plus v0) persist
        the full ``files`` list; the rest persist only their
        add/remove delta -- ``snapshot()`` reconstructs. The delta is
        exact by construction: every writer derives ``files`` as
        (previous snapshot - removed + added)."""
        version = int(base_version) + 1
        doc = {
            "version": version,
            "base_version": int(base_version),
            "action": action,
            "added": sorted(
                (added or []), key=lambda f: f["path"]
            ),
            "removed": sorted(removed or []),
            "meta": meta or {},
        }
        doc["files"] = (
            sorted(files, key=lambda f: f["path"])
            if version % CHECKPOINT_INTERVAL == 0
            else None
        )
        self._publish(version, doc)
        return version

    def init(self, *, adopt_listing: bool = True) -> int:
        """Bootstrap v0. ``adopt_listing=True`` snapshots the current
        plain-directory data files (hidden-entry rules identical to
        ``table_file_stats``) so an existing table becomes transactional
        in place; False starts an empty table. Concurrent double-init
        resolves through the same atomic publish (one v0 wins)."""
        files: list[dict] = []
        if adopt_listing and os.path.isdir(self.table):
            for root, dirs, names in os.walk(self.table):
                dirs[:] = [
                    d for d in dirs
                    if ("=" in d) or not (
                        d.startswith("_") or d.startswith(".")
                    )
                ]
                for name in names:
                    if name.startswith("_") or name.startswith("."):
                        continue
                    full = os.path.join(root, name)
                    rel = os.path.relpath(full, self.table)
                    files.append(
                        {
                            "path": rel.replace(os.sep, "/"),
                            "size": os.path.getsize(full),
                        }
                    )
        return self.commit(
            files=files, base_version=-1, action="init"
        )

    def ensure(self) -> int:
        """Current version, initializing (adopting any existing plain
        layout) when the log doesn't exist yet."""
        v = self.current_version()
        if v >= 0:
            return v
        try:
            return self.init()
        except TxConflict:
            return self.current_version()

    # ---- optimistic write loops -------------------------------------------

    def append_files(
        self, new: list[dict], *, action: str = "append",
        meta: dict | None = None,
    ) -> int:
        """Commit already-moved-in files as an append. Appends always
        commute, so conflicts just rebase on the winner's snapshot.

        Idempotent replay (the streaming-sink contract): when ``meta``
        carries ``txn_app`` + ``txn_batch`` and some committed version
        already recorded the same pair, the commit is SKIPPED (returns
        that version) -- a foreachBatch retry after a sink crash lands
        its rows exactly once, the same replay guard Delta sinks use."""
        if meta and "txn_app" in meta and "txn_batch" in meta:
            done = self.find_txn(meta["txn_app"], meta["txn_batch"])
            if done is not None:
                return done
        for _ in range(_MAX_COMMIT_ATTEMPTS):
            v = self.ensure()
            live = self.snapshot(v)["files"]
            try:
                return self.commit(
                    files=live + list(new),
                    base_version=v,
                    action=action,
                    added=list(new),
                    meta=meta,
                )
            except TxConflict:
                continue
        raise TxConflict(
            f"append at {self.table} lost {_MAX_COMMIT_ATTEMPTS} races"
        )

    def replace_files(
        self,
        inputs: list[str],
        outputs: list[dict],
        *,
        action: str = "rewrite",
        meta: dict | None = None,
    ) -> int:
        """Commit a rewrite that replaces exactly ``inputs`` (relative
        paths, as read) with ``outputs``. Re-validates at every attempt
        that all inputs are STILL live: a concurrent append rebases
        through (its files are kept -- it did not touch the inputs),
        while a concurrent rewrite that removed any input aborts this
        one with ``TxRewriteAborted`` (the caller reaps the outputs)."""
        inputs_set = set(inputs)
        for _ in range(_MAX_COMMIT_ATTEMPTS):
            v = self.current_version()
            live = self.snapshot(v)["files"]
            live_paths = {f["path"] for f in live}
            missing = inputs_set - live_paths
            if missing:
                raise TxRewriteAborted(
                    f"rewrite inputs no longer live at {self.table} "
                    f"(v{v}): {sorted(missing)[:3]}..."
                )
            kept = [f for f in live if f["path"] not in inputs_set]
            try:
                return self.commit(
                    files=kept + list(outputs),
                    base_version=v,
                    action=action,
                    added=list(outputs),
                    removed=sorted(inputs_set),
                    meta=meta,
                )
            except TxConflict:
                continue
        raise TxConflict(
            f"rewrite at {self.table} lost {_MAX_COMMIT_ATTEMPTS} races"
        )

    def find_txn(self, app: str, batch) -> int | None:
        """Highest version whose meta recorded (txn_app, txn_batch) --
        the idempotent-replay probe."""
        for v, name in reversed(self._version_files()):
            with open(os.path.join(self.log_dir, name)) as f:
                m = json.load(f).get("meta") or {}
            if m.get("txn_app") == app and m.get("txn_batch") == batch:
                return v
        return None


# ---- data-file staging ------------------------------------------------------


def _stage_and_move_in(
    spark: SparkSession,
    table: str,
    df: DataFrame,
    partition_cols: tuple[str, ...] = (),
    write_options: dict | None = None,
) -> list[dict]:
    """Write ``df`` to a dot-prefixed scratch dir under the table, then
    rename every data file into its final (partition-preserving)
    location under a commit-unique ``tx-<uuid>-`` name. The renames are
    same-filesystem metadata ops; until the manifest commit lands, the
    moved-in files are INVISIBLE to snapshot readers (they are not in
    any committed file list), so this whole function is crash-safe by
    default -- a kill at any point leaves garbage for vacuum, never a
    wrong read. Returns the moved files as manifest entries."""
    table = _local_path(table.rstrip("/"))
    u = uuid.uuid4().hex[:12]
    stage = os.path.join(table, f"{_STAGE_PREFIX}{u}")
    writer = df.write.mode("overwrite")
    if partition_cols:
        writer = writer.partitionBy(*partition_cols)
    for k, v in (write_options or {}).items():
        writer = writer.option(k, v)
    try:
        writer.parquet(stage)
        moved: list[dict] = []
        for root, dirs, names in os.walk(stage):
            for name in names:
                if name.startswith("_") or name.startswith("."):
                    continue
                src = os.path.join(root, name)
                rel_dir = os.path.relpath(root, stage)
                dest_dir = (
                    table if rel_dir == "." else os.path.join(table, rel_dir)
                )
                os.makedirs(dest_dir, exist_ok=True)
                dest_name = f"tx-{u}-{name}"
                dest = os.path.join(dest_dir, dest_name)
                size = os.path.getsize(src)
                os.rename(src, dest)
                rel = os.path.relpath(dest, table).replace(os.sep, "/")
                moved.append({"path": rel, "size": size})
        return moved
    finally:
        shutil.rmtree(stage, ignore_errors=True)


def _delete_files(table: str, entries: list[dict]) -> None:
    table = _local_path(table.rstrip("/"))
    for e in entries:
        try:
            os.unlink(os.path.join(table, e["path"]))
        except FileNotFoundError:
            pass


# ---- public operations --------------------------------------------------


def read_table(
    spark: SparkSession, path: str, version: int | None = None
) -> DataFrame:
    """Snapshot read: the highest (or pinned) committed version's
    explicit file list, never a directory listing. ``basePath`` keeps
    hive partition columns. The returned plan is PINNED to the
    snapshot's files -- later commits never shift it mid-query, and a
    time-travel read is just ``version=N``."""
    log = TxLog(spark, path)
    v = log.current_version() if version is None else int(version)
    rels = log.live_files(v)
    if not rels:
        raise ValueError(
            f"tx table at {path} is empty at version {v} (no schema "
            "to synthesize an empty DataFrame from)"
        )
    files = [posixpath.join(log.table, r) for r in rels]
    return (
        spark.read.option("basePath", log.table).parquet(*files)
    )


def read_table_any(spark: SparkSession, path: str) -> DataFrame:
    """Tx-aware table read: the committed snapshot when the path
    carries a commit log, a plain (listing-refreshed) parquet read
    otherwise. Every consumer of a MUTABLE table path should read
    through this -- on a tx table the data dir legitimately holds
    not-yet-vacuumed replaced files and not-yet-committed staged
    files, so a listing read would double-count rows."""
    try:
        log = TxLog(spark, path)
        if log.exists():
            return read_table(spark, path)
    except NotImplementedError:
        pass
    spark.catalog.refreshByPath(path)
    return spark.read.parquet(path)


def tx_append(
    spark: SparkSession,
    path: str,
    df: DataFrame,
    *,
    partition_cols: tuple[str, ...] = (),
    meta: dict | None = None,
) -> int:
    """Transactional append: stage, move in, commit (rebasing through
    any concurrent commit). Returns the committed version. With
    ``meta={"txn_app": ..., "txn_batch": ...}`` the append is
    idempotent under replay (see ``TxLog.append_files``)."""
    log = TxLog(spark, path)
    log.ensure()
    if meta and "txn_app" in meta and "txn_batch" in meta:
        done = log.find_txn(meta["txn_app"], meta["txn_batch"])
        if done is not None:
            return done
    new = _stage_and_move_in(spark, path, df, partition_cols)
    try:
        return log.append_files(new, meta=meta)
    except BaseException:
        _delete_files(path, new)
        raise


def tx_overwrite(
    spark: SparkSession,
    path: str,
    df: DataFrame,
    *,
    partition_cols: tuple[str, ...] = (),
    meta: dict | None = None,
) -> int:
    """Replace the WHOLE table content in one commit (the tx analog of
    mode("overwrite")): inputs = every file live at the read version."""
    log = TxLog(spark, path)
    base = log.ensure()
    inputs = log.live_files(base)
    new = _stage_and_move_in(spark, path, df, partition_cols)
    try:
        return log.replace_files(
            inputs, new, action="overwrite", meta=meta
        )
    except BaseException:
        _delete_files(path, new)
        raise


def tx_compact(
    spark: SparkSession,
    path: str,
    *,
    target_file_bytes: int = 128 * 1024 * 1024,
    partition_cols: tuple[str, ...] = (),
    min_files_to_compact: int = 2,
    meta: dict | None = None,
) -> int:
    """Small-file compaction under the log: read the snapshot's file
    list, coalesce, move in, replace exactly the files that were read.
    A concurrent append LANDS SAFELY (the rebase keeps its files); a
    concurrent rewrite aborts this one (outputs reaped, TxRewriteAborted
    surfaces as a report-level retry in maintenance). Returns the live
    file count after the pass -- the same contract as
    ``compact_parquet``, with the listing race closed by protocol."""
    import math

    log = TxLog(spark, path)
    v = log.ensure()
    snap = log.snapshot(v)
    inputs = [f["path"] for f in snap["files"]]
    total = sum(int(f.get("size", 0)) for f in snap["files"])
    if len(inputs) < min_files_to_compact:
        return len(inputs)
    n_out = max(1, math.ceil(total / target_file_bytes))
    if n_out >= len(inputs):
        return len(inputs)
    df = read_table(spark, path, version=v).coalesce(n_out)
    new = _stage_and_move_in(spark, path, df, partition_cols)
    try:
        log.replace_files(inputs, new, action="compact", meta=meta)
    except BaseException:
        _delete_files(path, new)
        raise
    return log.table_stats()[0]


def tx_zorder(
    spark: SparkSession,
    path: str,
    cols: list[str],
    *,
    bits: int | None = None,
    n_files: int | None = None,
    write_options: dict | None = None,
    meta: dict | None = None,
) -> bool:
    """OPTIMIZE ZORDER BY under the log: same rewrite body as
    ``zorder_table``, but the commit is the manifest swap -- no marker
    protocol, no listing snapshot, no rescue pass. A concurrent append
    survives BY CONSTRUCTION (kept by the rebase, visible to the next
    snapshot read) instead of aborting the whole rewrite; only a
    concurrent REWRITE of the same files aborts. Returns True when the
    layout swap landed."""
    from ..operators.layout import DEFAULT_Z_BITS, zorder_key

    log = TxLog(spark, path)
    v = log.ensure()
    inputs = log.live_files(v)
    keyed = zorder_key(
        read_table(spark, path, version=v),
        cols,
        bits=bits or DEFAULT_Z_BITS,
    )
    n = n_files or spark.sparkContext.defaultParallelism
    sorted_df = (
        keyed.repartitionByRange(n, "_z")
        .sortWithinPartitions("_z")
        .drop("_z")
    )
    new = _stage_and_move_in(
        spark, path, sorted_df, write_options=write_options
    )
    try:
        log.replace_files(inputs, new, action="zorder", meta=meta)
    except TxRewriteAborted:
        _delete_files(path, new)
        return False
    except BaseException:
        _delete_files(path, new)
        raise
    return True


def tx_merge(
    spark: SparkSession,
    path: str,
    updates: DataFrame,
    *,
    key: str = "data_point_id",
    n_buckets: int = 64,
    meta: dict | None = None,
) -> int:
    """Bucket-pruned keyed MERGE under the log (the tx analog of
    ``merge_into_table(fmt="parquet")``): only the ``_bucket=`` files
    holding updated keys are read, keep-latest-merged and replaced; all
    other buckets' files ride the manifest untouched. The dynamic
    partition overwrite this replaces was job-atomic but lost to any
    concurrent writer; here a concurrent append to an UNTOUCHED bucket
    commutes, and one to a touched bucket aborts the merge (retry on
    the fresh snapshot). Returns the committed version."""
    from pyspark.sql import functions as F

    from ..operators.upsert import merge_by_key

    log = TxLog(spark, path)
    # idempotent replay guard for streaming foreachBatch sinks: a
    # retried epoch whose commit already landed is a no-op
    if meta and "txn_app" in meta and "txn_batch" in meta:
        done = log.find_txn(meta["txn_app"], meta["txn_batch"])
        if done is not None:
            return done
    bucketed = updates.withColumn(
        "_bucket",
        F.pmod(F.xxhash64(F.col(key)), F.lit(n_buckets)).cast("int"),
    )
    # ensure the log exists BEFORE staging: ensure() adopts the current
    # plain-directory listing, and staging first would make the adopt
    # snapshot include the not-yet-committed moved-in files (they'd
    # count once at v0 and again at the append -- double rows)
    v = log.ensure()
    if not log.live_files(v):
        new = _stage_and_move_in(
            spark, path, bucketed, partition_cols=("_bucket",)
        )
        try:
            return log.append_files(new, action="merge-init", meta=meta)
        except BaseException:
            _delete_files(path, new)
            raise
    touched = sorted(
        r[0] for r in bucketed.select("_bucket").distinct().collect()
    )
    prefixes = tuple(f"_bucket={b}/" for b in touched)
    inputs = [
        rel for rel in log.live_files(v) if rel.startswith(prefixes)
    ]
    base_touched = None
    if inputs:
        files = [posixpath.join(log.table, r) for r in inputs]
        base_touched = spark.read.option(
            "basePath", log.table
        ).parquet(*files)
    merged = (
        merge_by_key(base_touched, bucketed, key=key)
        if base_touched is not None
        else bucketed
    )
    new = _stage_and_move_in(
        spark, path, merged.localCheckpoint(eager=True),
        partition_cols=("_bucket",),
    )
    try:
        return log.replace_files(inputs, new, action="merge", meta=meta)
    except BaseException:
        _delete_files(path, new)
        raise


def tx_vacuum(
    spark: SparkSession,
    path: str,
    *,
    retain_versions: int = 2,
    min_age_seconds: float = 3600.0,
    prune_log: bool = False,
) -> dict:
    """Physical GC: delete data files referenced by NONE of the last
    ``retain_versions`` manifests, plus aged scratch dirs. Both deletes
    are age-gated on mtime so an in-flight writer's moved-in-but-not-
    yet-committed files are never raced (its commit would reference
    them); pass ``min_age_seconds=0`` only with writers stopped.

    ``prune_log=True`` additionally deletes commit JSONs the retained
    window can no longer need: everything below the newest CHECKPOINT
    at or below the oldest retained version (so every retained
    version's delta-replay chain stays intact). A per-epoch streaming
    sink commits ~10^5 versions/day -- without pruning the log dir
    listing (``current_version``) and the ``find_txn`` replay probe
    degrade linearly with table AGE instead of table size. Readers
    pinned to a pruned version fail loudly on open, the standard
    time-travel-retention contract; with ``prune_log=False`` (default)
    the full history stays as the table's time-travel index."""
    log = TxLog(spark, path)
    current = log.current_version()
    if current < 0:
        return {"deleted_files": 0, "deleted_dirs": 0, "reclaimed_bytes": 0}
    keep: set[str] = set()
    for v in range(max(0, current - retain_versions + 1), current + 1):
        try:
            keep.update(log.live_files(v))
        except FileNotFoundError:
            continue
    cutoff = time.time() - min_age_seconds
    deleted = reclaimed = dirs = 0
    for root, dnames, names in os.walk(log.table):
        dnames[:] = [
            d for d in dnames
            if ("=" in d) or not (d.startswith("_") or d.startswith("."))
        ]
        for name in names:
            if name.startswith("_") or name.startswith("."):
                continue
            full = os.path.join(root, name)
            rel = os.path.relpath(full, log.table).replace(os.sep, "/")
            if rel in keep:
                continue
            st = os.stat(full)
            if st.st_mtime > cutoff:
                continue
            os.unlink(full)
            deleted += 1
            reclaimed += st.st_size
    for name in os.listdir(log.table):
        if not name.startswith(_STAGE_PREFIX):
            continue
        full = os.path.join(log.table, name)
        newest = max(
            (
                os.stat(os.path.join(r, f)).st_mtime
                for r, _, fs_ in os.walk(full)
                for f in fs_
            ),
            default=os.stat(full).st_mtime,
        )
        if newest > cutoff:
            continue
        shutil.rmtree(full, ignore_errors=True)
        dirs += 1
    pruned = 0
    if prune_log:
        oldest_retained = max(0, current - retain_versions + 1)
        cutoff = (
            oldest_retained // CHECKPOINT_INTERVAL
        ) * CHECKPOINT_INTERVAL
        for v, name in log._version_files():
            if v < cutoff:
                os.unlink(os.path.join(log.log_dir, name))
                pruned += 1
    return {
        "deleted_files": deleted,
        "deleted_dirs": dirs,
        "reclaimed_bytes": reclaimed,
        "pruned_commits": pruned,
    }
