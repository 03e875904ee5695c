"""WARC ingestion: Common Crawl's on-disk format → the documents table.

The S2 raw-ingestion path for real crawls: ``binaryFile`` yields one row per
WARC file; an Arrow-batched stage splits records, keeps ``response``
records, parses ``WARC-Target-URI`` / ``WARC-Date``, strips the HTTP
response envelope, and emits ``(url, warc_ts, html)`` rows — the UDTF
(one-to-many) shape. Gzip (including the per-record concatenated-member
layout CC uses for ``.warc.gz``) is handled transparently.

Pure stdlib; one linear pass per file; Content-Length driven slicing (no
regex over payloads).
"""

from __future__ import annotations

import gzip
import io
from collections.abc import Iterator

import pyarrow as pa
from pyspark.sql import DataFrame, SparkSession

WARC_DOCS_DDL = "url string, warc_ts string, html binary"

_GZIP_MAGIC = b"\x1f\x8b"


def _maybe_gunzip(data: bytes) -> bytes:
    """Decompress all concatenated gzip members (CC gzips per record)."""
    if not data.startswith(_GZIP_MAGIC):
        return data
    out = io.BytesIO()
    with gzip.GzipFile(fileobj=io.BytesIO(data)) as gz:
        while True:
            chunk = gz.read(1 << 20)
            if not chunk:
                break
            out.write(chunk)
    return out.getvalue()


def parse_warc(data: bytes) -> list[tuple[str, str, bytes]]:
    """bytes of a WARC file → [(url, warc_date, html_payload)] for response
    records. Tolerant: malformed records are skipped, the scan resyncs on
    the next ``WARC/`` marker."""
    data = _maybe_gunzip(data)
    out: list[tuple[str, str, bytes]] = []
    pos = 0
    n = len(data)
    while pos < n:
        start = data.find(b"WARC/", pos)
        if start == -1:
            break
        hdr_end = data.find(b"\r\n\r\n", start)
        if hdr_end == -1:
            break
        headers: dict[bytes, bytes] = {}
        for line in data[start:hdr_end].split(b"\r\n")[1:]:
            k, _, v = line.partition(b":")
            headers[k.strip().lower()] = v.strip()
        try:
            length = int(headers.get(b"content-length", b""))
        except ValueError:
            pos = hdr_end + 4
            continue
        body = data[hdr_end + 4 : hdr_end + 4 + length]
        pos = hdr_end + 4 + length
        if headers.get(b"warc-type") != b"response":
            continue
        url = headers.get(b"warc-target-uri", b"").decode("utf-8", "replace")
        ts = headers.get(b"warc-date", b"").decode("ascii", "replace")
        # strip the HTTP response envelope when present
        if body.startswith(b"HTTP/"):
            http_end = body.find(b"\r\n\r\n")
            body = body[http_end + 4 :] if http_end != -1 else b""
        if url:
            out.append((url, ts, body))
    return out


def read_warc(spark: SparkSession, glob: str) -> DataFrame:
    """WARC files → documents(url, warc_ts, html).

    binaryFile gives file-level parallelism (CC segments are ~1 GB each, so
    one task per segment file is the natural unit); record splitting runs
    inside the Arrow stage. warc_ts is parsed from the ISO WARC-Date.
    """
    from pyspark.sql import functions as F

    bf = spark.read.format("binaryFile").load(glob).select("content")

    def split_records(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for batch in batches:
            urls: list[str] = []
            tss: list[str] = []
            bodies: list[bytes] = []
            for blob in batch.column("content").to_pylist():
                for url, ts, body in parse_warc(blob):
                    urls.append(url)
                    tss.append(ts)
                    bodies.append(body)
            yield pa.RecordBatch.from_arrays(
                [
                    pa.array(urls, type=pa.string()),
                    pa.array(tss, type=pa.string()),
                    pa.array(bodies, type=pa.binary()),
                ],
                names=["url", "warc_ts", "html"],
            )

    rows = bf.mapInArrow(split_records, WARC_DOCS_DDL)
    return rows.select(
        "url", F.to_timestamp("warc_ts").alias("warc_ts"), "html"
    )
