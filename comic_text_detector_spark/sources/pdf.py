"""Minimal PDF text extraction (the north_rule's 'PDF/layout parse' leg).

Pure stdlib (zlib IS the FlateDecode codec): scan ``stream…endstream``
objects, inflate when Flate-compressed, and pull text-showing operators
(``(…) Tj``, ``<hex> Tj`` and ``[…] TJ``) out of ``BT…ET`` text blocks in
layout order.

Two font regimes are supported:

* **Simple fonts** — string bytes decode directly (UTF-8 with replacement),
  the machine-generated single-font case.
* **Type0 / Identity-H CID fonts** (the dominant real-world crawl case) —
  the object graph is walked: ``/Font`` resource dicts map resource names
  to font objects; a Type0 font's ``/ToUnicode N 0 R`` stream is inflated
  and its ``bfchar``/``bfrange`` sections parsed into a CID→Unicode map;
  ``Tf`` operators are tracked through each content stream so every shown
  string decodes through the font that is actually selected. 2-byte CIDs
  (Identity-H) are mapped; unmapped CIDs are dropped, not faked.

Out of scope (documented, not faked): non-Identity CMap encodings,
predictor-coded xref streams, encryption.

Matching synthesizers emit valid single-page PDFs — simple (plain or
Flate) and Type0 with a real ToUnicode CMap (bfchar + bfrange) — so both
round trips are golden-tested by construction, like the HTML fixtures.

``read_pdfs`` is the Spark surface: binaryFile → Arrow stage → (url, text)
rows that feed the same downstream pipeline (quality, dedup, tokens).
"""

from __future__ import annotations

import re
import zlib
from collections.abc import Iterator

import pyarrow as pa
from pyspark.sql import DataFrame, SparkSession

_OBJHDR_RE = re.compile(rb"(\d+)\s+\d+\s+obj")
# tolerant fallback for orphan streams outside any object (truncated crawls)
_RAWSTREAM_RE = re.compile(rb"<<(.*?)>>\s*stream\r?\n(.*?)endstream", re.S)
# anchored on the dict close: a '(… stream\n…)' literal inside the dict must
# not be mistaken for the stream keyword
_STREAMKW_RE = re.compile(rb">>\s*stream\r?\n")
# direct /Length only — an indirect "/Length N 0 R" falls back to the
# endstream scan (the negative lookahead rejects the " 0 R" form)
_LENGTH_RE = re.compile(rb"/Length\s+(\d+)(?![\s\d]*R)")
# One pass over the whole content stream: BT/ET text-block markers, Tf font
# selection (a TEXT-STATE operator that legally appears OUTSIDE BT..ET and
# persists across blocks — PDF 32000-1 §9.3.1), and the show operators.
# /F1 12 Tf | (string) Tj | <hex> Tj | [ (s1) -250 <hex> ] TJ | BT | ET
_OP_RE = re.compile(
    rb"/(\w+)\s+[-\d.]+\s+Tf"
    rb"|(?:\((?:[^()\\]|\\.)*\)|<[0-9A-Fa-f\s]*>)\s*Tj"
    rb"|\[(?:[^\]\\]|\\.)*\]\s*TJ"
    rb"|\b(BT|ET)\b",
    re.S,
)
_STR_RE = re.compile(rb"\((?:[^()\\]|\\.)*\)|<[0-9A-Fa-f\s]*>", re.S)

_FONTDICT_RE = re.compile(rb"/Font\s*<<(.*?)>>", re.S)
_FONTREF_RE = re.compile(rb"/(\w+)\s+(\d+)\s+0\s+R")
_TOUNICODE_RE = re.compile(rb"/ToUnicode\s+(\d+)\s+0\s+R")
_BFCHAR_RE = re.compile(rb"beginbfchar(.*?)endbfchar", re.S)
_BFRANGE_RE = re.compile(rb"beginbfrange(.*?)endbfrange", re.S)
_HEXTOK_RE = re.compile(rb"<([0-9A-Fa-f]+)>")
_BFRANGE_ITEM_RE = re.compile(
    rb"<([0-9A-Fa-f]+)>\s*<([0-9A-Fa-f]+)>\s*"
    rb"(?:<([0-9A-Fa-f]+)>|\[((?:\s*<[0-9A-Fa-f]+>)*)\s*\])",
    re.S,
)

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


def _scan_objects(
    data: bytes,
) -> list[tuple[int, bytes, bytes | None, int, int]]:
    """Sequential ``N G obj`` walk → [(obj number, dict bytes, raw stream
    body or None, object start offset, object end offset)].

    A stream body is skipped via its direct ``/Length`` when the claimed
    endpoint is actually followed by ``endstream`` — so compressed payloads
    that happen to contain the literal bytes ``endobj``/``endstream`` can
    never truncate the enclosing object (a one-regex non-greedy scan does
    exactly that, and zlib output hits it in practice). Indirect or wrong
    ``/Length`` falls back to the endstream search with EOL trim. The
    offsets let callers find the UNCOVERED byte ranges, where orphan
    streams from truncated crawls hide."""
    out: list[tuple[int, bytes, bytes | None, int, int]] = []
    n = len(data)
    pos = 0
    while True:
        m = _OBJHDR_RE.search(data, pos)
        if not m:
            return out
        start = m.end()
        sm = _STREAMKW_RE.search(data, start)
        eo = data.find(b"endobj", start)
        if sm is not None and (eo == -1 or sm.start() < eo):
            hdr = data[start : sm.start()]
            body_start = sm.end()
            body_end = -1
            lm = _LENGTH_RE.search(hdr)
            if lm:
                cand = body_start + int(lm.group(1))
                if cand <= n and data[cand : cand + 16].lstrip(
                    b"\r\n \t"
                ).startswith(b"endstream"):
                    body_end = cand
            if body_end >= 0:
                body = data[body_start:body_end]
            else:  # spec: one EOL precedes endstream but is not stream data
                body_end = data.find(b"endstream", body_start)
                if body_end == -1:
                    body_end = n
                body = data[body_start:body_end]
                if body.endswith(b"\r\n"):
                    body = body[:-2]
                elif body.endswith(b"\n"):
                    body = body[:-1]
            eo = data.find(b"endobj", body_end)
            end = (eo + len(b"endobj")) if eo != -1 else n
            out.append((int(m.group(1)), hdr, body, m.start(), end))
        else:
            end = (eo + len(b"endobj")) if eo != -1 else n
            out.append(
                (
                    int(m.group(1)),
                    data[start : eo if eo != -1 else n],
                    None,
                    m.start(),
                    end,
                )
            )
        if eo == -1:
            return out
        pos = eo + len(b"endobj")


def _inflate(hdr: bytes, body: bytes) -> bytes | None:
    """Stream body through its filter chain (Flate or stored)."""
    if b"FlateDecode" in hdr:
        try:
            return zlib.decompress(body)
        except zlib.error:
            return None
    return body


def _parse_tounicode(cmap: bytes) -> dict[int, str]:
    """ToUnicode CMap stream → {CID: unicode string}. Handles ``bfchar``
    pairs and ``bfrange`` with either a destination start (incremented per
    code) or an explicit destination array; destinations are UTF-16BE."""
    out: dict[int, str] = {}

    def _dst(hexs: bytes) -> str:
        try:
            return bytes.fromhex(hexs.decode()).decode("utf-16-be", "replace")
        except ValueError:
            return ""

    for sec in _BFCHAR_RE.finditer(cmap):
        toks = _HEXTOK_RE.findall(sec.group(1))
        for src, dst in zip(toks[0::2], toks[1::2]):
            out[int(src, 16)] = _dst(dst)
    for sec in _BFRANGE_RE.finditer(cmap):
        for item in _BFRANGE_ITEM_RE.finditer(sec.group(1)):
            lo, hi = int(item.group(1), 16), int(item.group(2), 16)
            if hi < lo or hi - lo > 0xFFFF:
                continue
            if item.group(3) is not None:
                dsthex = item.group(3)
                width = max(2, len(dsthex) // 2)
                base = int(dsthex, 16)
                for i in range(hi - lo + 1):
                    try:
                        out[lo + i] = (base + i).to_bytes(width, "big").decode(
                            "utf-16-be", "replace"
                        )
                    except OverflowError:
                        break
            else:
                dsts = _HEXTOK_RE.findall(item.group(4))
                for i, d in enumerate(dsts[: hi - lo + 1]):
                    out[lo + i] = _dst(d)
    return out


def _font_cmaps(
    objs: list[tuple[int, bytes, bytes | None, int, int]],
) -> dict[bytes, dict[int, str]]:
    """{font resource name: CID→Unicode map} for every Type0 font whose
    ``/ToUnicode`` stream resolves. Non-Type0 fonts are absent (their
    strings decode as plain bytes). ``/Font`` resource dicts are searched
    in object DICTS only — never inside stream bytes."""
    by_num = {num: (hdr, body) for num, hdr, body, _s, _e in objs}
    cmaps: dict[bytes, dict[int, str]] = {}
    for _num, hdr, _body, _s, _e in objs:
        for fonts in _FONTDICT_RE.finditer(hdr):
            for name, num in _FONTREF_RE.findall(fonts.group(1)):
                font_hdr, _ = by_num.get(int(num), (None, None))
                if font_hdr is None or b"/Type0" not in font_hdr:
                    continue
                tu = _TOUNICODE_RE.search(font_hdr)
                if not tu:
                    continue
                tu_hdr, tu_body = by_num.get(int(tu.group(1)), (b"", None))
                if tu_body is None:
                    continue
                stream = _inflate(tu_hdr, tu_body)
                if stream:
                    cmaps[name] = _parse_tounicode(stream)
    return cmaps


def _decode_shown_string(tok: bytes, cmap: dict[int, str] | None) -> str:
    """One literal ``(…)`` or hex ``<…>`` string → text, through the active
    font's CID map when one exists (2-byte Identity-H codes), else bytes."""
    if tok[:1] == b"<":
        hexs = re.sub(rb"\s", b"", tok[1:-1])
        if len(hexs) % 2:
            hexs += b"0"
        try:
            raw = bytes.fromhex(hexs.decode())
        except ValueError:
            return ""
    else:
        raw = _unescape_pdf_string(tok[1:-1])
    if cmap is not None:
        return "".join(
            cmap.get((raw[k] << 8) | raw[k + 1], "")
            for k in range(0, len(raw) - 1, 2)
        )
    return raw.decode("utf-8", errors="replace")


def extract_pdf_text(data: bytes) -> str:
    """PDF bytes → extracted text (text-showing ops in stream order,
    strings joined with single spaces, like the HTML assembly contract).
    ``Tf`` operators select the active font per content stream, so Type0 /
    Identity-H strings decode through their ToUnicode CMap."""
    if not isinstance(data, (bytes, bytearray)):
        return ""
    data = bytes(data)
    objs = _scan_objects(data)
    # orphan streams in the byte ranges no object covers (header lost to
    # crawl truncation): raw-scan each gap and keep document order
    streams = [
        (s, hdr, raw) for _num, hdr, raw, s, _e in objs if raw is not None
    ]
    pos = 0
    gaps = []
    for _num, _h, _b, s, e in objs:
        if s > pos:
            gaps.append((pos, s))
        pos = max(pos, e)
    if pos < len(data):
        gaps.append((pos, len(data)))
    for gs, ge in gaps:
        for m in _RAWSTREAM_RE.finditer(data, gs, ge):
            body = m.group(2)
            if body.endswith(b"\r\n"):
                body = body[:-2]
            elif body.endswith(b"\n"):
                body = body[:-1]
            streams.append((m.start(), m.group(1), body))
    streams.sort(key=lambda t: t[0])
    cmaps = _font_cmaps(objs)
    pieces: list[str] = []
    for _pos, hdr, raw in streams:
        inflated = _inflate(hdr, raw)
        if inflated is None:
            continue
        body = inflated
        cmap: dict[int, str] | None = None
        in_text = False
        for op in _OP_RE.finditer(body):
            if op.group(2) is not None:  # BT / ET marker
                in_text = op.group(2) == b"BT"
                continue
            if op.group(1) is not None:  # Tf: text state, valid anywhere,
                cmap = cmaps.get(op.group(1))  # persists across BT blocks
                continue
            if not in_text:  # show operators only count inside BT..ET
                continue
            for lit in _STR_RE.finditer(op.group(0)):
                txt = _decode_shown_string(lit.group(0), cmap)
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


def synthesize_type0_pdf(lines: list[str], compress: bool = False) -> bytes:
    """A valid single-page Type0/Identity-H PDF. Text is shown as 2-byte
    CID hex strings under a synthetic CID assignment (deliberately NOT the
    Unicode code points, so decoding must go through the CMap): lowercase
    a–z map via one ``bfrange`` (CID 0x0100+i → 'a'+i) and every other
    character via ``bfchar`` entries (CIDs from 0x0200 in first-appearance
    order). The ToUnicode stream is a real CMap; round-trip golden like
    ``synthesize_simple_pdf``."""
    cid_of: dict[str, int] = {}
    bfchars: list[tuple[int, str]] = []
    nxt = 0x0200
    for ch in "".join(lines):
        if ch in cid_of:
            continue
        if "a" <= ch <= "z":
            cid_of[ch] = 0x0100 + ord(ch) - ord("a")
        else:
            cid_of[ch] = nxt
            bfchars.append((nxt, ch))
            nxt += 1

    def hexstr(s: str) -> str:
        return "<" + "".join(f"{cid_of[c]:04X}" for c in s) + ">"

    content = "BT /F1 12 Tf 72 760 Td " + " ".join(
        f"{hexstr(ln)} Tj 0 -14 Td" for ln in lines
    ) + " ET"
    cmap = (
        "/CIDInit /ProcSet findresource begin\n12 dict begin\nbegincmap\n"
        "1 begincodespacerange <0000> <FFFF> endcodespacerange\n"
        f"{max(1, len(bfchars))} beginbfchar\n"
        + "".join(f"<{cid:04X}> <{ord(ch):04X}>\n" for cid, ch in bfchars)
        + "endbfchar\n"
        "1 beginbfrange\n<0100> <0119> <0061>\nendbfrange\n"
        "endcmap\nCMapName currentdict /CMap defineresource pop\nend\nend"
    )

    def stream_obj(body: bytes) -> bytes:
        filt = b""
        if compress:
            body = zlib.compress(body)
            filt = b"/Filter /FlateDecode "
        return (
            b"<< " + filt + b"/Length " + str(len(body)).encode() + b" >>\n"
            b"stream\n" + body + b"\nendstream"
        )

    objs = [
        b"<< /Type /Catalog /Pages 2 0 R >>",
        b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
        b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
        b"/Contents 4 0 R /Resources << /Font << /F1 5 0 R >> >> >>",
        stream_obj(content.encode("utf-8")),
        b"<< /Type /Font /Subtype /Type0 /BaseFont /Synth "
        b"/Encoding /Identity-H /DescendantFonts [6 0 R] /ToUnicode 7 0 R >>",
        b"<< /Type /Font /Subtype /CIDFontType2 /BaseFont /Synth "
        b"/CIDSystemInfo << /Registry (Adobe) /Ordering (Identity) "
        b"/Supplement 0 >> /CIDToGIDMap /Identity >>",
        stream_obj(cmap.encode("utf-8")),
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
