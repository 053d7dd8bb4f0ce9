"""Change-data feed over the transactional commit log (Delta CDF analog).

``read_table_changes`` turns the commit log's per-version file deltas
into a DataFrame of ROW changes -- the pull-based incremental
consumption primitive a 100 TB pipeline builds everything downstream
on (incremental re-embedding, index maintenance, derived-table
refresh): a consumer remembers the last version it processed and asks
for everything since.

Correctness is ACTION-AGNOSTIC by construction: a commit's
``added``/``removed`` file lists fully determine the row-multiset
transition from version N-1 to N, so the feed is exact for every
writer that goes through the log -- including future ones. The commit
``action`` strings are used only as a COST optimization: actions known
to be data-preserving rewrites (compaction, z-order) are skipped
without reading a byte, because their row diff is empty by the
rewrite's own contract (and ``tests/test_txlog_changes.py`` pins that
contract).

Per-commit semantics:

- pure-add commits (appends, merge-init, v0 adoption): every row in
  the added files is an ``insert`` -- a manifest-driven file read, no
  diff, no shuffle beyond the scan;
- replace commits (keyed merge, overwrite, recluster, transactional
  ingest): rows are diffed multiset-wise -- ``post.exceptAll(pre)``
  and ``pre.exceptAll(post)`` cancel every row the rewrite carried
  through unchanged, so a bucket rewrite that physically rewrote 10^9
  rows to update 10^3 emits exactly the 10^3. When the table carries a
  pinned merge key (``_merge_meta.json``) and the commit is a keyed
  merge, surviving rows are further classified ``update_preimage`` /
  ``update_postimage`` (key on both sides) vs ``insert`` / ``delete``
  (key on one side) with ONE key-partitioned window -- otherwise they
  stay ``insert`` / ``delete``, which is the honest file-level truth.

The physical ``_bucket=`` layout column is excluded from diffs and
output: a full-table re-bucket moves rows between buckets without
changing data, and CDC reports DATA changes.

Scale notes (100 TB): the per-version loop is driver-side over O(delta)
manifest JSONs; the data-side cost of an append version is one pruned
file scan, and of a merge version two scans of the TOUCHED buckets
only (tx_merge's scoped rewrite bounds ``removed``+``added`` to dirty
buckets) plus hash-aggregate shuffles for ``exceptAll`` sized to the
touched rows, never the table. The feed's range is bounded below by
``tx_vacuum`` retention exactly like time travel: a version whose
commit file or replaced data files are already reaped fails LOUDLY at
resolve/scan time, never returns partial changes.

Reference anchor: the reference mutates a live STREAM_UPDATE index
through batch upserts (index_manager.py:53, firestore_ops.py:65-83)
but offers no way to OBSERVE the change stream; this module is the
storage-level completion of that loop for incremental consumers.
"""

from __future__ import annotations

import json
import posixpath

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .txlog import TxLog

CHANGE_TYPE_COL = "_change_type"
COMMIT_VERSION_COL = "_commit_version"

# Rewrites whose row diff is empty by their own contract -- skipped
# without reading data. Correctness does not depend on this set (a
# missing entry only costs a diff that returns zero rows).
_DATA_PRESERVING_ACTIONS = frozenset(
    {"compact", "compact-fragmented", "zorder"}
)
# Replace commits carrying a keyed keep-latest merge: survivors of the
# multiset diff classify as updates when the key appears on both sides.
_KEYED_MERGE_ACTIONS = frozenset({"merge"})


def _read_version_files(
    spark: SparkSession, log: TxLog, rels: list[str], version: int
) -> DataFrame:
    """Rows of ``rels`` read through the schema recorded at
    ``version`` (evolution-aware: pre-evolution files null-backfill),
    with the physical ``_bucket`` layout column dropped."""
    files = [posixpath.join(log.table, r) for r in rels]
    reader = spark.read.option("basePath", log.table)
    schema = log.schema_at(version)
    if schema is not None:
        reader = reader.schema(schema)
    df = reader.parquet(*files)
    if "_bucket" in df.columns:
        df = df.drop("_bucket")
    return df


def _merge_key(log: TxLog) -> str | None:
    """The pinned merge key, through the table's own fs adapter (the
    r17 sidecar rule -- a custom-registered scheme must see this IO)."""
    from ..operators.upsert import META_FILE

    try:
        payload = log.fs.read_bytes(log.fs.join(log.table, META_FILE))
    except FileNotFoundError:
        return None
    return json.loads(payload)["key"]


def _stamp(df: DataFrame, change_type, version: int) -> DataFrame:
    ct = (
        change_type
        if not isinstance(change_type, str)
        else F.lit(change_type)
    )
    return df.withColumn(CHANGE_TYPE_COL, ct).withColumn(
        COMMIT_VERSION_COL, F.lit(int(version)).cast("long")
    )


def _align_to(df: DataFrame, target: DataFrame) -> DataFrame:
    """Project ``df`` onto ``target``'s columns in ``target``'s order,
    null-filling columns ``df`` lacks (schema-evolution alignment for
    the positional ``exceptAll``)."""
    fields = {f.name: f.dataType for f in target.schema.fields}
    cols = [
        F.col(c) if c in df.columns else F.lit(None).cast(t).alias(c)
        for c, t in ((f, fields[f]) for f in target.columns)
    ]
    return df.select(*cols)


def _diff_replace(
    pre: DataFrame, post: DataFrame, key: str | None, version: int
) -> DataFrame:
    """Row changes of a replace commit: multiset-cancel unchanged rows,
    then classify survivors -- update pre/post when ``key`` is given
    and present on both sides, insert/delete otherwise. One
    key-partitioned window instead of two joins."""
    target = post if len(post.columns) >= len(pre.columns) else pre
    pre, post = _align_to(pre, target), _align_to(post, target)
    changed_post = post.exceptAll(pre)
    changed_pre = pre.exceptAll(post)
    if key is None or key not in post.columns:
        return _stamp(changed_post, "insert", version).unionByName(
            _stamp(changed_pre, "delete", version)
        )
    u = changed_post.withColumn("_side", F.lit("post")).unionByName(
        changed_pre.withColumn("_side", F.lit("pre"))
    )
    n_sides = F.size(
        F.collect_set("_side").over(Window.partitionBy(key))
    )
    ct = (
        F.when(
            F.col("_side") == "post",
            F.when(n_sides == 2, F.lit("update_postimage")).otherwise(
                F.lit("insert")
            ),
        )
        .otherwise(
            F.when(n_sides == 2, F.lit("update_preimage")).otherwise(
                F.lit("delete")
            )
        )
    )
    return _stamp(u, ct, version).drop("_side")


def read_table_changes(
    spark: SparkSession,
    path: str,
    since_version: int,
    end_version: int | None = None,
) -> DataFrame:
    """Every row change committed by versions in
    ``(since_version, end_version]`` -- the table's columns (at the
    range's newest schema) plus ``_change_type`` in
    ``{'insert', 'delete', 'update_preimage', 'update_postimage'}``
    and ``_commit_version``. ``since_version=-1`` starts from the
    beginning (v0's adopted files feed as inserts); ``end_version``
    defaults to the current version. The incremental-consumer idiom::

        last = restore_checkpoint()            # version already applied
        log = TxLog(spark, path)
        head = log.current_version()
        if head > last:
            apply(read_table_changes(spark, path, last, head))
            save_checkpoint(head)

    Versions whose commit files were pruned (``tx_vacuum(prune_log=
    True)``) or whose replaced data files were vacuumed fail loudly,
    exactly like time travel -- the feed never silently returns a
    partial range."""
    log = TxLog(spark, path)
    head = log.current_version()
    end = head if end_version is None else int(end_version)
    since = int(since_version)
    if end > head:
        raise ValueError(
            f"end_version {end} is above the current version {head} "
            f"at {path}"
        )
    if since > end:
        raise ValueError(
            f"since_version {since} is above end_version {end} at {path}"
        )
    key = _merge_key(log)
    parts: list[DataFrame] = []
    for v in range(max(since + 1, 0), end + 1):
        doc = log.snapshot(v) if v == 0 else log._read_commit(v)
        action = doc.get("action", "")
        if action in _DATA_PRESERVING_ACTIONS:
            continue
        if v == 0:
            added = [f["path"] for f in doc["files"]]
            removed: list[str] = []
        else:
            added = [f["path"] for f in doc.get("added") or []]
            removed = list(doc.get("removed") or [])
        if not added and not removed:
            continue
        if not removed:
            parts.append(
                _stamp(
                    _read_version_files(spark, log, added, v), "insert", v
                )
            )
        elif not added:
            parts.append(
                _stamp(
                    _read_version_files(spark, log, removed, v - 1),
                    "delete",
                    v,
                )
            )
        else:
            pre = _read_version_files(spark, log, removed, v - 1)
            post = _read_version_files(spark, log, added, v)
            parts.append(
                _diff_replace(
                    pre,
                    post,
                    key if action in _KEYED_MERGE_ACTIONS else None,
                    v,
                )
            )
    if not parts:
        from .txlog import read_table

        return _stamp(
            read_table(spark, path, version=end).limit(0), "insert", end
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p, allowMissingColumns=True)
    return out
