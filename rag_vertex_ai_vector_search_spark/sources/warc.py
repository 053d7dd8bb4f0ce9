"""WARC (Web ARChive, ISO 28500) source + sink: the container format
web-scale corpora actually arrive in (Common Crawl publishes WARC;
every web pipeline's first read is a WARC scan).

Record grammar (WARC/1.0 and 1.1): a version line, CRLF-separated
``Name: value`` headers (``WARC-Type``, ``WARC-Target-URI``,
``WARC-Date``, ``WARC-Record-ID``, ``Content-Type``,
``Content-Length``), a blank line, ``Content-Length`` payload bytes,
then TWO CRLFs. ``response`` records wrap an HTTP message, so the
document body sits after the payload's first blank line. The standard
``.warc.gz`` layout gzips EACH RECORD as its own member (mandated so
readers can seek to any record); the parser therefore handles plain
streams, multi-member gzip, and whole-file gzip identically.

Spark shape: ``read_warc`` scans files with ``binaryFile`` (one row
per WARC file -- Common Crawl ships ~1 GB chunks, thousands per
crawl, so file-level parallelism is the natural 100 TB grain) and
explodes records in a ``mapInPandas`` pass, emitting one row per
record WITHOUT the file bytes; everything downstream (HTML extract,
URL normalize, dedup, quality) is ordinary engine surface. A task
holds one file's bytes while slicing -- the same bound as the
MJPEG container walk, and the same per-record seam a smarter
range-splitting source would plug into.

``encode_warc`` is the hermetic round-trip companion (same role as
encode_png / encode_mjpeg_avi): it writes spec-shaped records the
parser reads back exactly, which is what lets the driver gate check
the full write -> read -> extract path against a SQL oracle.
"""

from __future__ import annotations

import gzip
import hashlib
import io
import zlib
from typing import Iterator

from pyspark.sql import DataFrame, SparkSession

_CRLF = b"\r\n"


def _gunzip_all(data: bytes) -> bytes:
    """Decompress every gzip member in sequence (the .warc.gz layout);
    pass non-gzip bytes through untouched."""
    if data[:2] != b"\x1f\x8b":
        return data
    out = bytearray()
    pos = 0
    while pos < len(data) and data[pos:pos + 2] == b"\x1f\x8b":
        d = zlib.decompressobj(16 + zlib.MAX_WBITS)
        out += d.decompress(data[pos:])
        pos = len(data) - len(d.unused_data)
    return bytes(out)


def parse_warc_records(content: bytes) -> Iterator[dict]:
    """Yield one dict per WARC record: the lowercased header map plus
    ``payload`` (bytes). Raises NotImplementedError on malformed
    framing -- the codec-contract error the callers' rejection paths
    expect."""
    data = _gunzip_all(bytes(content or b""))
    pos = 0
    while pos < len(data):
        # skip inter-record padding
        while data[pos:pos + 2] == _CRLF:
            pos += 2
        if pos >= len(data):
            return
        end_hdr = data.find(_CRLF + _CRLF, pos)
        if end_hdr < 0:
            raise NotImplementedError("truncated WARC header block")
        header_block = data[pos:end_hdr].decode("utf-8", "replace")
        lines = header_block.split("\r\n")
        if not lines[0].startswith("WARC/"):
            raise NotImplementedError(
                f"not a WARC record at offset {pos}: {lines[0][:40]!r}"
            )
        headers: dict[str, str] = {"warc-version": lines[0][5:]}
        for line in lines[1:]:
            if ":" in line:
                k, v = line.split(":", 1)
                headers[k.strip().lower()] = v.strip()
        try:
            length = int(headers["content-length"])
        except (KeyError, ValueError) as exc:
            raise NotImplementedError("WARC record missing Content-Length") from exc
        body_start = end_hdr + 4
        if body_start + length > len(data):
            raise NotImplementedError("truncated WARC payload")
        headers["payload"] = data[body_start:body_start + length]
        yield headers
        pos = body_start + length


def http_payload_body(payload: bytes) -> bytes:
    """The entity body of an HTTP message payload (bytes after the
    first blank line); the whole payload when no header block exists."""
    sep = payload.find(_CRLF + _CRLF)
    return payload[sep + 4:] if sep >= 0 else payload


def encode_warc(
    records: list[dict], *, gzip_per_record: bool = True
) -> bytes:
    """Write spec-shaped WARC bytes. Each input dict: ``warc_type``,
    ``url``, ``date``, ``payload`` (bytes), optional ``content_type``
    and ``http_status``. ``response`` records are wrapped in a minimal
    HTTP/1.1 message (the Common Crawl shape); record ids are
    deterministic (sha256 of the payload) so round-trips are hermetic.
    """
    out = bytearray()
    for r in records:
        payload = bytes(r["payload"])
        if r.get("warc_type", "response") == "response":
            body = payload
            status = int(r.get("http_status", 200))
            ctype = r.get("content_type", "text/html")
            payload = (
                f"HTTP/1.1 {status} OK\r\n"
                f"Content-Type: {ctype}\r\n"
                f"Content-Length: {len(body)}\r\n\r\n"
            ).encode() + body
        rid = hashlib.sha256(payload).hexdigest()[:32]
        hdr = (
            "WARC/1.0\r\n"
            f"WARC-Type: {r.get('warc_type', 'response')}\r\n"
            f"WARC-Target-URI: {r['url']}\r\n"
            f"WARC-Date: {r.get('date', '2024-01-01T00:00:00Z')}\r\n"
            f"WARC-Record-ID: <urn:sha256:{rid}>\r\n"
            "Content-Type: application/http;msgtype=response\r\n"
            f"Content-Length: {len(payload)}\r\n\r\n"
        ).encode()
        record = hdr + payload + _CRLF + _CRLF
        if gzip_per_record:
            buf = io.BytesIO()
            # fixed mtime keeps the bytes deterministic across runs
            with gzip.GzipFile(fileobj=buf, mode="wb", mtime=0) as gz:
                gz.write(record)
            record = buf.getvalue()
        out += record
    return bytes(out)


WARC_ROW_SCHEMA = (
    "warc_file string, warc_type string, url string, warc_date string,"
    " record_id string, payload_type string, content_length long,"
    " body binary"
)


def read_warc(
    spark: SparkSession, path: str, *, types: tuple[str, ...] = ("response",)
) -> DataFrame:
    """Scan ``path`` (glob ok) as WARC files -> one row per record of
    the requested ``types``: (warc_file, warc_type, url, warc_date,
    record_id, payload_type, content_length, body). For response
    records ``body`` is the HTTP entity body (headers stripped) and
    ``content_length`` its byte length."""
    import pandas as pd

    files = spark.read.format("binaryFile").load(path).select(
        "path", "content"
    )

    def _explode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for fpath, content in zip(pdf["path"], pdf["content"]):
                for rec in parse_warc_records(bytes(content)):
                    wtype = rec.get("warc-type", "")
                    if types and wtype not in types:
                        continue
                    body = rec["payload"]
                    if wtype == "response":
                        body = http_payload_body(body)
                    rows.append({
                        "warc_file": fpath,
                        "warc_type": wtype,
                        "url": rec.get("warc-target-uri", ""),
                        "warc_date": rec.get("warc-date", ""),
                        "record_id": rec.get("warc-record-id", ""),
                        "payload_type": rec.get("content-type", ""),
                        "content_length": len(body),
                        "body": body,
                    })
            yield pd.DataFrame(
                rows,
                columns=[
                    "warc_file", "warc_type", "url", "warc_date",
                    "record_id", "payload_type", "content_length", "body",
                ],
            )

    return files.mapInPandas(_explode, WARC_ROW_SCHEMA)
