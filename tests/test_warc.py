"""WARC source/sink (sources/warc.py): spec framing round-trips,
multi-member gzip, HTTP body extraction, Spark scan, error contract."""

import hashlib

import pytest
from pyspark.sql import functions as F

from rag_vertex_ai_vector_search_spark.sources.warc import (
    encode_warc,
    http_payload_body,
    parse_warc_records,
    read_warc,
)

RECS = [
    {"warc_type": "response", "url": "https://a.example/1",
     "payload": b"<html><body>alpha page</body></html>"},
    {"warc_type": "response", "url": "https://b.example/2",
     "payload": b"bravo text", "content_type": "text/plain"},
    {"warc_type": "warcinfo", "url": "urn:info",
     "payload": b"software: test\r\n"},
]


@pytest.mark.parametrize("gz", [False, True])
def test_roundtrip_plain_and_gzip(gz):
    blob = encode_warc(RECS, gzip_per_record=gz)
    if gz:
        assert blob[:2] == b"\x1f\x8b"  # member-per-record layout
    out = list(parse_warc_records(blob))
    assert [r["warc-type"] for r in out] == ["response", "response", "warcinfo"]
    assert [r["warc-target-uri"] for r in out] == [
        "https://a.example/1", "https://b.example/2", "urn:info"
    ]
    # response payloads carry an HTTP wrapper; the entity body survives
    assert http_payload_body(out[0]["payload"]) == RECS[0]["payload"]
    assert http_payload_body(out[1]["payload"]) == RECS[1]["payload"]
    # non-response records pass through unwrapped
    assert out[2]["payload"] == RECS[2]["payload"]
    # deterministic bytes (fixed gzip mtime)
    assert encode_warc(RECS, gzip_per_record=gz) == blob


def test_malformed_streams_rejected():
    with pytest.raises(NotImplementedError):
        list(parse_warc_records(b"HTTP/1.1 200 OK\r\n\r\nnope"))
    blob = encode_warc(RECS[:1], gzip_per_record=False)
    with pytest.raises(NotImplementedError):
        list(parse_warc_records(blob[:-20]))  # truncated payload


def test_read_warc_spark_scan(spark, tmp_path):
    d = tmp_path / "crawl"
    d.mkdir()
    (d / "part-0.warc.gz").write_bytes(
        encode_warc(RECS, gzip_per_record=True)  # incl. one warcinfo
    )
    (d / "part-1.warc.gz").write_bytes(encode_warc([
        {"warc_type": "response", "url": "https://c.example/3",
         "payload": b"charlie <b>rich</b> body"},
    ]))
    df = read_warc(spark, str(d))
    rows = {r.url: r for r in df.collect()}
    # warcinfo filtered out by the default types=("response",)
    assert set(rows) == {
        "https://a.example/1", "https://b.example/2", "https://c.example/3"
    }
    r = rows["https://a.example/1"]
    assert bytes(r.body) == RECS[0]["payload"]
    assert r.content_length == len(RECS[0]["payload"])
    assert r.warc_type == "response"
    assert r.record_id.startswith("<urn:sha256:")

    # composition with the HTML stage: WARC -> visible text
    from rag_vertex_ai_vector_search_spark.functions.html import html_to_text

    texts = {
        r.url: r.t
        for r in df.select(
            "url", html_to_text(F.col("body").cast("string")).alias("t")
        ).collect()
    }
    assert texts["https://c.example/3"] == "charlie rich body"

    # include warcinfo when asked
    all_df = read_warc(spark, str(d), types=("response", "warcinfo"))
    assert all_df.count() == 4


def test_record_ids_are_payload_hashes():
    blob = encode_warc(RECS[:1], gzip_per_record=False)
    rec = next(parse_warc_records(blob))
    digest = hashlib.sha256(rec["payload"]).hexdigest()[:32]
    assert rec["warc-record-id"] == f"<urn:sha256:{digest}>"
