"""WebDataset-style tar-shard source + sink: the container convention
large multimodal training runs read (a dataset is a set of POSIX tar
shards; a SAMPLE is the group of member files sharing one key prefix,
e.g. ``000017.jpg`` + ``000017.cls`` + ``000017.json``).

The convention (public: the webdataset project / "High Performance I/O
For Large Scale Deep Learning", Aizman et al.) exists because object
stores and spinning disks both love large sequential reads: thousands
of small files become a few thousand ~1 GB tar shards, and the shard
is the unit of parallelism -- exactly the Common Crawl/WARC economics,
so this module mirrors ``sources/warc.py``: ``binaryFile`` scan, one
``mapInPandas`` member explode, rows leave WITHOUT the shard bytes.

``encode_webdataset_shard`` writes deterministic ustar bytes (fixed
mtime/uid/mode, members emitted key-sorted) -- the hermetic round-trip
companion that lets the driver gate prove write -> read -> regroup is
lossless against a SQL oracle that never touches a tar.
"""

from __future__ import annotations

import io
import tarfile
from typing import Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def encode_webdataset_shard(samples: dict[str, dict[str, bytes]]) -> bytes:
    """{key: {ext: payload}} -> deterministic POSIX tar bytes. Members
    are written as ``key.ext`` in (key, ext) sorted order with zeroed
    metadata, so identical samples always produce identical shards."""
    buf = io.BytesIO()
    with tarfile.open(fileobj=buf, mode="w", format=tarfile.USTAR_FORMAT) as tf:
        for key in sorted(samples):
            for ext in sorted(samples[key]):
                payload = bytes(samples[key][ext])
                info = tarfile.TarInfo(name=f"{key}.{ext}")
                info.size = len(payload)
                info.mtime = 0
                info.uid = info.gid = 0
                info.uname = info.gname = ""
                info.mode = 0o644
                tf.addfile(info, io.BytesIO(payload))
    return buf.getvalue()


def parse_webdataset_shard(content: bytes) -> Iterator[tuple[str, str, bytes]]:
    """Tar bytes -> (key, ext, payload) per member file. The key is the
    member name up to the FIRST dot past the last '/' (WebDataset's
    grouping rule: ``a/b/0001.seg.png`` -> key ``a/b/0001``, ext
    ``seg.png``)."""
    try:
        tf = tarfile.open(fileobj=io.BytesIO(bytes(content or b"")), mode="r:*")
    except tarfile.TarError as e:
        raise NotImplementedError(f"not a tar stream: {e}") from e
    with tf:
        for member in tf:
            if not member.isfile():
                continue
            name = member.name
            slash = name.rfind("/")
            dot = name.find(".", slash + 1)
            if dot < 0:
                key, ext = name, ""
            else:
                key, ext = name[:dot], name[dot + 1:]
            fobj = tf.extractfile(member)
            yield key, ext, fobj.read() if fobj else b""


def read_webdataset(spark: SparkSession, path: str) -> DataFrame:
    """Scan tar shards -> one row per member file:
    (shard, key, ext, content). Shard-level parallelism (the
    WebDataset grain); downstream rows never carry the shard bytes."""
    import pandas as pd

    files = spark.read.format("binaryFile").load(path).select(
        "path", "content"
    )

    def _explode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for fpath, content in zip(pdf["path"], pdf["content"]):
                for key, ext, payload in parse_webdataset_shard(
                    bytes(content)
                ):
                    rows.append({
                        "shard": fpath, "key": key, "ext": ext,
                        "content": payload,
                    })
            yield pd.DataFrame(
                rows, columns=["shard", "key", "ext", "content"]
            )

    return files.mapInPandas(
        _explode, "shard string, key string, ext string, content binary"
    )


def group_webdataset_samples(df: DataFrame) -> DataFrame:
    """Member rows -> one row per SAMPLE: (shard, key,
    parts map<ext, binary>) -- the unit a training loader consumes.
    One shuffle keyed on (shard, key); per-sample state is one
    sample's files."""
    return df.groupBy("shard", "key").agg(
        F.map_from_entries(
            F.array_sort(
                F.collect_list(F.struct(F.col("ext"), F.col("content")))
            )
        ).alias("parts")
    )
