"""Perceptual image hashing (multimodal/imagehash.py)."""

from __future__ import annotations

import numpy as np

from comic_text_detector_spark.multimodal.imagehash import (
    dhash_bytes,
    dhash_images,
    hamming_pairs,
)
from comic_text_detector_spark.multimodal.pixels import encode_png


def _stripe_png(vals):
    """18x16 RGB PNG: column stripe x (2 px wide) has gray value
    vals[x] in all three channels — each 9x8 dhash cell is exactly
    vals[x], so the expected hash is closed-form."""
    arr = np.zeros((16, 18, 3), dtype=np.uint8)
    for x in range(9):
        arr[:, 2 * x : 2 * x + 2, :] = vals[x]
    return encode_png(arr)


def _expected(vals):
    b = 0
    for y in range(8):
        for x in range(8):
            if vals[x + 1] > vals[x]:
                b |= 1 << (y * 8 + x)
    return b - (1 << 64) if b >= 1 << 63 else b


def test_dhash_known_values():
    inc = list(range(10, 100, 10))  # strictly increasing: all bits set
    assert dhash_bytes(_stripe_png(inc)) == _expected(inc)
    assert _expected(inc) == -1  # all 64 bits on -> signed -1
    flat = [50] * 9  # no gradient: zero hash
    assert dhash_bytes(_stripe_png(flat)) == 0
    mixed = [3, 200, 7, 7, 90, 10, 10, 250, 1]
    assert dhash_bytes(_stripe_png(mixed)) == _expected(mixed)


def test_dhash_refusals():
    tiny = encode_png(np.zeros((4, 4, 3), dtype=np.uint8))
    assert dhash_bytes(tiny) is None  # below the 9x8 lattice
    assert dhash_bytes(b"not an image") is None
    assert dhash_bytes(None) is None


def test_dhash_images_and_pairs(spark):
    base = [10, 80, 20, 90, 30, 100, 40, 110, 50]
    near = list(base)
    near[1] = 75  # same gradient signs -> identical hash
    far = sorted(base, reverse=True)  # monotone: all gradient bits 0
    rows = [
        ("a", bytearray(_stripe_png(base))),
        ("b", bytearray(_stripe_png(near))),
        ("c", bytearray(_stripe_png(far))),
        ("bad", bytearray(b"junk")),
    ]
    df = spark.createDataFrame(rows, "media_id string, media binary")
    hashed = dhash_images(df)
    got = {r.media_id: r.dhash for r in hashed.collect()}
    assert got["a"] == got["b"] and got["bad"] is None
    assert got["c"] != got["a"]
    pairs = hamming_pairs(hashed, max_dist=6).collect()
    assert [(p.media_id_a, p.media_id_b, p.dist) for p in pairs] == [
        ("a", "b", 0)
    ]


def test_pairs_partition_invariance(spark):
    rows = [(f"i{k}", (k // 3) * 17 - (1 << 40) * (k % 2)) for k in range(30)]
    df = spark.createDataFrame(rows, "media_id string, dhash long")
    a = hamming_pairs(df.repartition(1), max_dist=2).collect()
    b = hamming_pairs(df.repartition(8), max_dist=2).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
