"""Pluggable put-if-absent commit claims for object-store tx tables.

The commit log's one non-portable primitive is the atomic CLAIM of the
next version slot (``sources/txlog.py``): POSIX has the hard link,
HDFS-family namenodes have rename-fails-if-exists, but S3-class object
stores have NEITHER -- a rename is copy+delete and silently OVERWRITES,
so two writers publishing ``v{N}.json`` would both "succeed" and one
commit would vanish. Delta Lake solves this with the LogStore pattern
(its S3 design): the claim is delegated to a coordinator that CAN
provide put-if-absent. This module is that seam, built from first
principles on the repo's own filesystem adapters.

The interface is ONE primitive::

    put_if_absent(fs, log_dir, final, payload) -> bool

True = this writer created ``final`` (the slot is won); False = the
destination already existed (the caller raises ``TxConflict`` and
rebases). Everything else in the protocol -- manifest reads, snapshot
resolution, staging moves, vacuum walks -- already runs on any scheme
and needs no coordinator.

Shipped implementation: ``SingleDriverLogStore`` -- a process-local
mutex around check-exists + write-tmp + rename. These are exactly the
semantics of Delta's ``S3SingleDriverLogStore``: **correct whenever
every writer to the table runs inside this one driver process**
(streaming foreachBatch sinks, single-driver batch maintenance -- the
dominant deployment for a maintained index). Two *separate processes*
writing the same table can still race the overwriting rename; that
needs a distributed mutex, which is the documented subclass seam:
override ``acquire``/``release`` with a DynamoDB / ZooKeeper / etcd
lock (Delta's ``S3DynamoDBLogStore`` analog) and the claim body is
unchanged.

Configuration is per-scheme::

    from rag_vertex_ai_vector_search_spark.sources import (
        SingleDriverLogStore, configure_log_store,
    )
    configure_log_store("s3a", SingleDriverLogStore())

An UNCONFIGURED object-store scheme keeps the r16 contract: reads,
snapshot resolution and staging work; the commit claim raises a loud
``NotImplementedError`` pointing here.
"""

from __future__ import annotations

import threading
import uuid


class LogStore:
    """The put-if-absent contract. Implementations must guarantee that
    for a given ``final`` path, at most one concurrent call returns
    True -- within whatever writer topology they document."""

    def put_if_absent(self, fs, log_dir: str, final: str, payload: bytes) -> bool:
        raise NotImplementedError


class SingleDriverLogStore(LogStore):
    """Process-local-mutex claim (Delta ``S3SingleDriverLogStore``
    semantics): correct when all writers to a table share this driver
    process. The mutex is per-table (``log_dir``); under it the claim
    is check-exists -> write-tmp -> rename, which is race-free in-
    process even though the store's rename OVERWRITES. Subclass and
    override ``acquire``/``release`` with a distributed lock for
    multi-driver deployments -- the claim body needs no change."""

    def __init__(self) -> None:
        self._locks: dict[str, threading.Lock] = {}
        self._guard = threading.Lock()

    def acquire(self, log_dir: str):
        """Take the claim mutex for ``log_dir``. The coordinator seam:
        a distributed implementation blocks here until it owns the
        table-level lease."""
        with self._guard:
            lock = self._locks.setdefault(log_dir, threading.Lock())
        lock.acquire()
        return lock

    def release(self, token) -> None:
        token.release()

    def put_if_absent(self, fs, log_dir: str, final: str, payload: bytes) -> bool:
        token = self.acquire(log_dir)
        try:
            if fs.exists(final):
                return False
            fs.makedirs(log_dir)
            tmp = fs.join(log_dir, f".tmp-{uuid.uuid4().hex}")
            fs.write_replace(tmp, payload)
            try:
                # the store's rename may overwrite -- safe here because
                # the existence check and the rename sit under the
                # same mutex, and every competing writer goes through
                # this store (the configuration contract)
                fs.rename(tmp, final)
            except BaseException:
                fs.unlink(tmp)
                raise
            return True
        finally:
            self.release(token)


_registry: dict[str, LogStore] = {}


def configure_log_store(scheme: str, store: LogStore) -> None:
    """Install ``store`` as the commit-claim coordinator for every tx
    table on ``scheme`` in this process."""
    if not isinstance(store, LogStore):
        raise TypeError(f"expected a LogStore, got {type(store)!r}")
    _registry[scheme] = store


def unconfigure_log_store(scheme: str) -> None:
    _registry.pop(scheme, None)


def log_store_for(scheme: str | None) -> LogStore | None:
    if scheme is None:
        return None
    return _registry.get(scheme)
