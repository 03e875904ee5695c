"""Minimal PDF text extraction (the north_rule's 'PDF/layout parse' leg).

Pure stdlib (zlib IS the FlateDecode codec): scan ``stream…endstream``
objects, inflate when Flate-compressed, and pull text-showing operators
(``(…) Tj`` and ``[…] TJ``) out of ``BT…ET`` text blocks in layout order.
This covers machine-generated single-font PDFs — the dominant kind in web
crawls — and is honest about its limits: no CMap/ToUnicode handling, so
PDFs with subsetted/CID fonts need a real parser (documented, not faked).

A matching synthesizer emits valid single-page PDFs (plain or Flate) so the
round trip is golden-tested by construction, like the HTML fixtures.

``read_pdfs`` is the Spark surface: binaryFile → Arrow stage → (url, text)
rows that feed the same downstream pipeline (quality, dedup, tokens).
"""

from __future__ import annotations

import re
import zlib
from collections.abc import Iterator

import pyarrow as pa
from pyspark.sql import DataFrame, SparkSession

_STREAM_RE = re.compile(rb"<<(.*?)>>\s*stream\r?\n(.*?)endstream", re.S)
_TEXT_BLOCK_RE = re.compile(rb"BT(.*?)ET", re.S)
# (string) Tj  |  [ (s1) -250 (s2) ] TJ
_TJ_RE = re.compile(rb"\((?:[^()\\]|\\.)*\)\s*Tj|\[(?:[^\]\\]|\\.)*\]\s*TJ", re.S)
_STR_RE = re.compile(rb"\((?:[^()\\]|\\.)*\)", re.S)

_PDF_ESCAPES = {
    b"\\n": b"\n", b"\\r": b"\r", b"\\t": b"\t", b"\\b": b"\b",
    b"\\f": b"\f", b"\\(": b"(", b"\\)": b")", b"\\\\": b"\\",
}


def _unescape_pdf_string(s: bytes) -> bytes:
    out = bytearray()
    i = 0
    while i < len(s):
        if s[i : i + 1] == b"\\" and i + 1 < len(s):
            two = s[i : i + 2]
            if two in _PDF_ESCAPES:
                out += _PDF_ESCAPES[two]
                i += 2
                continue
            if s[i + 1] in b"01234567":  # octal \ooo — digits 8/9 are NOT
                # octal; \8 or \9 falls through to the drop-backslash branch
                # below instead of raising from int(..., 8).
                j = i + 1
                while j < min(i + 4, len(s)) and s[j] in b"01234567":
                    j += 1
                out.append(int(s[i + 1 : j], 8) & 0xFF)
                i = j
                continue
            i += 1  # line continuation / unknown escape: drop backslash
            continue
        out.append(s[i])
        i += 1
    return bytes(out)


def extract_pdf_text(data: bytes) -> str:
    """PDF bytes → extracted text (text-showing ops in stream order,
    strings joined with single spaces, like the HTML assembly contract)."""
    pieces: list[str] = []
    if not isinstance(data, (bytes, bytearray)):
        return ""
    for m in _STREAM_RE.finditer(data):
        hdr, body = m.group(1), m.group(2)
        if body.endswith(b"\r\n"):
            body = body[:-2]
        elif body.endswith(b"\n"):
            body = body[:-1]
        if b"FlateDecode" in hdr:
            try:
                body = zlib.decompress(body)
            except zlib.error:
                continue
        for block in _TEXT_BLOCK_RE.finditer(body):
            for op in _TJ_RE.finditer(block.group(1)):
                for lit in _STR_RE.finditer(op.group(0)):
                    raw = _unescape_pdf_string(lit.group(0)[1:-1])
                    txt = raw.decode("utf-8", errors="replace")
                    norm = " ".join(txt.split())
                    if norm:
                        pieces.append(norm)
    return " ".join(pieces).strip()


def synthesize_simple_pdf(lines: list[str], compress: bool = False) -> bytes:
    """A minimal valid single-page PDF showing ``lines`` top-to-bottom."""
    def esc(t: str) -> str:
        return t.replace("\\", r"\\").replace("(", r"\(").replace(")", r"\)")

    content = "BT /F1 12 Tf 72 760 Td " + " ".join(
        f"({esc(ln)}) Tj 0 -14 Td" for ln in lines
    ) + " ET"
    body = content.encode("utf-8")
    filt = b""
    if compress:
        body = zlib.compress(body)
        filt = b"/Filter /FlateDecode "
    objs = [
        b"<< /Type /Catalog /Pages 2 0 R >>",
        b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
        b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
        b"/Contents 4 0 R /Resources << /Font << /F1 5 0 R >> >> >>",
        b"<< " + filt + b"/Length " + str(len(body)).encode() + b" >>\n"
        b"stream\n" + body + b"\nendstream",
        b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>",
    ]
    out = bytearray(b"%PDF-1.4\n")
    offsets = []
    for i, o in enumerate(objs, start=1):
        offsets.append(len(out))
        out += f"{i} 0 obj\n".encode() + o + b"\nendobj\n"
    xref = len(out)
    out += b"xref\n0 " + str(len(objs) + 1).encode() + b"\n"
    out += b"0000000000 65535 f \n"
    for off in offsets:
        out += f"{off:010d} 00000 n \n".encode()
    out += (
        b"trailer\n<< /Size " + str(len(objs) + 1).encode() + b" /Root 1 0 R >>\n"
        b"startxref\n" + str(xref).encode() + b"\n%%EOF"
    )
    return bytes(out)


def _extract_or_empty(data: bytes) -> str:
    """Tolerant-input wrapper for crawl data: one malformed PDF must not
    fail the Spark task — it extracts as '' (same contract as empty HTML)."""
    try:
        return extract_pdf_text(data)
    except Exception:
        return ""


def read_pdfs(spark: SparkSession, glob: str) -> DataFrame:
    """PDF files → (url, text) rows via binaryFile + Arrow stage."""
    bf = spark.read.format("binaryFile").load(glob).select("path", "content")

    def kernel(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for batch in batches:
            paths = batch.column("path").to_pylist()
            blobs = batch.column("content").to_pylist()
            yield pa.RecordBatch.from_arrays(
                [
                    pa.array(paths, type=pa.string()),
                    pa.array(
                        [_extract_or_empty(b) for b in blobs], type=pa.string()
                    ),
                ],
                names=["url", "text"],
            )

    return bf.mapInArrow(kernel, "url string, text string")
