"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

The Spark-side plumbing (schema, Arrow batch shape, partitioning, UDF
signatures) is real and tested; the actual media DECODE is stubbed behind
``CTD_FAKE_DECODE`` because no image/audio libraries exist in this
container — the stub is a clearly-marked deterministic fake so the
pipeline shape can be exercised end-to-end. Swapping the fake for
cv2/PIL/ffmpeg is a one-function change inside the mapInPandas kernel.
"""

from __future__ import annotations

import os
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA_DDL = "media_id string, media binary, mime string"
IMAGE_META_DDL = "media_id string, width int, height int, channels int, ok boolean"
FRAME_SAMPLE_DDL = "media_id string, frame_idx int, frame binary"

_MAGIC = {
    b"\x89PNG": "image/png",
    b"\xff\xd8\xff": "image/jpeg",
    b"RIFF": "audio/wav",
    b"\x1aE\xdf\xa3": "video/webm",
}


def sniff_mime(media: Column) -> Column:
    """Magic-byte MIME sniffing as a column expression (JVM-side)."""
    hexpfx = F.lower(F.hex(F.substring(media, 1, 4)))
    return (
        F.when(hexpfx.startswith("89504e47"), F.lit("image/png"))
        .when(hexpfx.startswith("ffd8ff"), F.lit("image/jpeg"))
        .when(hexpfx.startswith("52494646"), F.lit("audio/wav"))
        .when(hexpfx.startswith("1a45dfa3"), F.lit("video/webm"))
        .otherwise(F.lit("application/octet-stream"))
    )


def media_stats(df: DataFrame, media_col: str = "media") -> DataFrame:
    """Typed metadata projection: byte length, sha256, sniffed mime —
    all built-in expressions."""
    return df.select(
        "*",
        F.length(F.col(media_col)).alias("n_bytes"),
        F.sha2(F.col(media_col), 256).alias("sha256"),
        sniff_mime(F.col(media_col)).alias("sniffed_mime"),
    )


def _fake_decode(media: bytes) -> tuple[int, int, int]:
    """Deterministic fake: dimensions derived from content bytes."""
    h = hash_bytes = sum(media[:64]) if media else 0
    return (64 + hash_bytes % 512, 64 + (h // 7) % 512, 3)


def decode_image_meta(df: DataFrame, media_col: str = "media") -> DataFrame:
    """Decode → (width, height, channels) via Arrow-batched mapInPandas.

    With CTD_FAKE_DECODE=1 (default in this container) a deterministic fake
    stands in for the real decoder; otherwise raises NotImplementedError —
    plug cv2.imdecode here (the reference's imread, utils/io_utils.py:42).
    """
    fake = os.environ.get("CTD_FAKE_DECODE", "1") == "1"

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not fake:
                raise NotImplementedError(
                    "real image decode requires cv2/PIL (not in this container); "
                    "set CTD_FAKE_DECODE=1 for the deterministic stub"
                )
            out = {"media_id": [], "width": [], "height": [], "channels": [], "ok": []}
            for mid, media in zip(pdf["media_id"], pdf[media_col]):
                try:
                    w, h, c = _fake_decode(bytes(media) if media is not None else b"")
                    out["media_id"].append(mid)
                    out["width"].append(w)
                    out["height"].append(h)
                    out["channels"].append(c)
                    out["ok"].append(True)
                except Exception:
                    out["media_id"].append(mid)
                    out["width"].append(0)
                    out["height"].append(0)
                    out["channels"].append(0)
                    out["ok"].append(False)
            yield pd.DataFrame(out)

    return df.select("media_id", media_col).mapInPandas(kernel, IMAGE_META_DDL)


def sample_frames(
    df: DataFrame, every_n: int = 10, media_col: str = "media"
) -> DataFrame:
    """Frame sampling plumbing for video: emits (media_id, frame_idx, frame)
    rows — the UDTF (one-to-many) batch shape. The fake 'decoder' slices the
    byte stream deterministically; a real one calls ffmpeg per batch."""
    fake = os.environ.get("CTD_FAKE_DECODE", "1") == "1"

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not fake:
                raise NotImplementedError("real frame sampling requires ffmpeg")
            out = {"media_id": [], "frame_idx": [], "frame": []}
            for mid, media in zip(pdf["media_id"], pdf[media_col]):
                raw = bytes(media) if media is not None else b""
                n_frames = max(1, len(raw) // 256)
                for i in range(0, n_frames, every_n):
                    out["media_id"].append(mid)
                    out["frame_idx"].append(i)
                    out["frame"].append(raw[i * 256 : (i + 1) * 256])
            yield pd.DataFrame(out)

    return df.select("media_id", media_col).mapInPandas(kernel, FRAME_SAMPLE_DDL)
