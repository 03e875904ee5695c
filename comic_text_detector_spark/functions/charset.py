"""Charset sniffing + decode for raw crawl bytes — the OPT-IN step before
extraction for non-UTF-8 pages.

The extraction pipeline's default decode policy stays utf-8 with
errors='replace' (functions/html.py:12 — deterministic, golden-tied);
real crawls also carry UTF-16 (BOM'd), windows-1252 (declared or not),
and latin-1 legacy pages. This module resolves those the way browsers
do, in strict priority order:

1. **BOM** — utf-8 / utf-16-le / utf-16-be signatures win outright
   (a BOM is the author saying so; also the only reliable signal for
   utf-16, whose ``<meta>`` bytes are not ASCII-scannable).
2. **Declared** — ``<meta charset=…>`` or the http-equiv content-type
   form, scanned in the first 1024 bytes (the HTML5 prescan window),
   normalized through a small alias table; an unknown name is ignored
   (not guessed) and the chain continues.
3. **Validation** — strict utf-8 decode of the payload; valid utf-8 IS
   utf-8 (the declaration-less common case).
4. **Fallback** — cp1252 if every byte is defined there, else latin-1
   (which never fails). cp1252 first because the bytes 0x80–0x9F that
   distinguish it are smart quotes/dashes in real text, not C1 controls.

Every step is deterministic, so (charset, text) is oracle-checkable on
synthesized fixtures. Reference analog: decode-at-entry
(reference utils/io_utils.py:42) for the text modality.
"""

from __future__ import annotations

import re
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame

DECODED_DDL = "media_id string, charset string, text string"

_ALIASES = {
    "utf-8": "utf-8", "utf8": "utf-8",
    "utf-16": "utf-16-le",  # undeclared endianness: LE dominates the web
    "utf-16-le": "utf-16-le", "utf-16le": "utf-16-le",
    "utf-16-be": "utf-16-be", "utf-16be": "utf-16-be",
    "windows-1252": "cp1252", "cp1252": "cp1252", "cp-1252": "cp1252",
    "iso-8859-1": "latin-1", "latin-1": "latin-1", "latin1": "latin-1",
    "iso8859-1": "latin-1",
    "us-ascii": "utf-8", "ascii": "utf-8",  # ascii ⊂ utf-8
}

_META_RE = re.compile(
    rb"<meta[^>]+charset\s*=\s*[\"']?\s*([A-Za-z0-9_\-]+)", re.IGNORECASE
)

# cp1252's five undefined bytes; anything else decodes
_CP1252_HOLES = frozenset((0x81, 0x8D, 0x8F, 0x90, 0x9D))


def sniff_charset(data: bytes) -> tuple[str, int]:
    """(normalized codec name, BOM length to strip). Steps 1–2 of the
    policy; returns ('', 0) when neither a BOM nor a known declaration
    decides, leaving validation/fallback to ``decode_page_bytes``."""
    if data[:3] == b"\xef\xbb\xbf":
        return "utf-8", 3
    if data[:2] == b"\xff\xfe":
        return "utf-16-le", 2
    if data[:2] == b"\xfe\xff":
        return "utf-16-be", 2
    m = _META_RE.search(data[:1024])
    if m:
        name = _ALIASES.get(m.group(1).decode("ascii").lower())
        if name:
            return name, 0
    return "", 0


def decode_page_bytes(data: bytes | None) -> tuple[str, str]:
    """(charset, text) under the full policy. None → ('', '')."""
    if data is None:
        return "", ""
    data = bytes(data)
    charset, bom = sniff_charset(data)
    body = data[bom:]
    if charset:
        try:
            return charset, body.decode(charset)
        except (UnicodeDecodeError, LookupError):
            pass  # a lying declaration falls through to validation
    try:
        return "utf-8", body.decode("utf-8")
    except UnicodeDecodeError:
        pass
    if not any(b in _CP1252_HOLES for b in body):
        return "cp1252", body.decode("cp1252")
    return "latin-1", body.decode("latin-1")


def decode_pages(df: DataFrame, media_col: str = "media") -> DataFrame:
    """(media_id, media) → (media_id, charset, text) via an Arrow-batched
    ``mapInPandas`` kernel over ``decode_page_bytes`` — map-only, no
    shuffle, linear in payload bytes (the same scale shape as the image
    decodes)."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"media_id": [], "charset": [], "text": []}
            for mid, media in zip(pdf["media_id"], pdf[media_col]):
                cs, text = decode_page_bytes(media)
                out["media_id"].append(mid)
                out["charset"].append(cs)
                out["text"].append(text)
            yield pd.DataFrame(out)

    return df.select("media_id", media_col).mapInPandas(kernel, DECODED_DDL)


# ---------------------------------------------------------------------------
# Mojibake repair: UTF-8 bytes that were once decoded with cp1252 (the
# classic 'Ã©' for 'é', 'â€™' for a right single quote). The inverse
# table is browser windows-1252: the five bytes cp1252 leaves undefined
# map to their C1 control code points (what browsers emit), so 'â€\x9d'
# — a mojibake'd right DOUBLE quote whose middle byte is the 0x9D hole —
# still round-trips. Repair = re-encode through that table, strict
# utf-8 decode, accept only if both steps succeed AND the text changed;
# anything else returns the input untouched (drop-not-fake: a failed
# decode means the text was NOT utf-8-through-cp1252 mojibake).
# Applied to fixpoint (cap 4) for doubly-encoded text.
_INV_CP1252 = {
    (chr(b) if b in _CP1252_HOLES else bytes([b]).decode("cp1252")): b
    for b in range(256)
}


def fix_mojibake_text(s: str | None, max_passes: int = 4) -> tuple[str, bool]:
    """(repaired text, was_repaired). None → ('', False)."""
    if s is None:
        return "", False
    out = s
    for _ in range(max_passes):
        try:
            raw = bytes(_INV_CP1252[ch] for ch in out)
        except KeyError:
            break  # a char outside cp1252's image: not mojibake
        try:
            t = raw.decode("utf-8")
        except UnicodeDecodeError:
            break  # not utf-8 underneath: leave as-is
        if t == out:
            break  # pure-ASCII fixpoint
        out = t
    return out, out != s


def fix_mojibake(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(id, text) → (id, text, was_mojibake) with cp1252-mojibake
    repaired to fixpoint. Arrow-batched ``mapInPandas`` over the pure
    per-char table kernel — map-only, no shuffle, linear in text bytes
    (same scale shape as ``decode_pages``)."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            fixed, flags = [], []
            for s in pdf[text_col]:
                t, was = fix_mojibake_text(s)
                fixed.append(t)
                flags.append(was)
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    text_col: fixed,
                    "was_mojibake": flags,
                }
            )

    schema = df.select(id_col, text_col).schema
    ddl = (
        f"{id_col} {schema[0].dataType.simpleString()}, "
        f"{text_col} string, was_mojibake boolean"
    )
    return df.select(id_col, text_col).mapInPandas(kernel, ddl)
