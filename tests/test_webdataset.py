"""WebDataset tar-shard source/sink (sources/webdataset.py):
deterministic round-trips, key grouping rules, Spark scan + sample
regrouping, error contract."""

import pytest

from rag_vertex_ai_vector_search_spark.sources.webdataset import (
    encode_webdataset_shard,
    group_webdataset_samples,
    parse_webdataset_shard,
    read_webdataset,
)

SAMPLES = {
    "000000": {"txt": b"alpha doc", "json": b'{"id": 0}'},
    "000001": {"txt": b"bravo doc", "json": b'{"id": 1}', "cls": b"3"},
}


def test_shard_roundtrip_and_determinism():
    blob = encode_webdataset_shard(SAMPLES)
    assert encode_webdataset_shard(SAMPLES) == blob  # byte-deterministic
    got = {}
    for key, ext, payload in parse_webdataset_shard(blob):
        got.setdefault(key, {})[ext] = payload
    assert got == SAMPLES


def test_key_grouping_rule():
    """Key = name up to the FIRST dot after the last slash: multi-part
    extensions stay whole, directories stay in the key."""
    blob = encode_webdataset_shard({"dir/0001": {"seg.png": b"x"}})
    [(key, ext, payload)] = list(parse_webdataset_shard(blob))
    assert (key, ext, payload) == ("dir/0001", "seg.png", b"x")


def test_garbage_rejected():
    with pytest.raises(NotImplementedError):
        list(parse_webdataset_shard(b"definitely not a tar file" * 40))


def test_read_webdataset_spark_and_grouping(spark, tmp_path):
    d = tmp_path / "shards"
    d.mkdir()
    (d / "shard-0.tar").write_bytes(encode_webdataset_shard(SAMPLES))
    (d / "shard-1.tar").write_bytes(
        encode_webdataset_shard({"000002": {"txt": b"charlie"}})
    )
    df = read_webdataset(spark, str(d))
    rows = {(r.key, r.ext): bytes(r.content) for r in df.collect()}
    assert rows[("000000", "txt")] == b"alpha doc"
    assert rows[("000001", "cls")] == b"3"
    assert rows[("000002", "txt")] == b"charlie"
    assert len(rows) == 6

    samples = group_webdataset_samples(df)
    got = {r.key: dict(r.parts) for r in samples.collect()}
    assert set(got) == {"000000", "000001", "000002"}
    assert bytes(got["000001"]["json"]) == b'{"id": 1}'
    assert set(got["000001"]) == {"txt", "json", "cls"}
