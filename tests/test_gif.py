"""GIF LZW codec (multimodal/gif.py): a hand-computed bitstream vector
(encoder-independent), exact roundtrips incl. interlace and full
palettes, transparency compositing, refusals, fuzz, Spark surface."""

from __future__ import annotations

import struct

import numpy as np

from comic_text_detector_spark.multimodal.gif import (
    decode_gif_pixels,
    encode_gif,
    synthesize_gif_real,
)


def test_handcrafted_bitstream_vector():
    """2x1 image, indices [1, 0], LZW codes [CLEAR, 1, 0, EOI] packed by
    hand (LSB-first, 3-bit width) -> bytes 0x0C 0x0A. Decoding this fixed
    vector validates the bit order independently of our encoder."""
    gif = (
        b"GIF89a"
        + struct.pack("<HHBBB", 2, 1, 0x81, 0, 0)
        + bytes([10, 20, 30, 40, 50, 60, 0, 0, 0, 0, 0, 0])  # 4-entry GCT
        + struct.pack("<BHHHHB", 0x2C, 0, 0, 2, 1, 0)
        + bytes([2])            # LZW min code size
        + bytes([2, 0x0C, 0x0A, 0])  # one sub-block + terminator
        + b"\x3b"
    )
    out = decode_gif_pixels(gif)
    assert out.shape == (1, 2, 3)
    assert out[0, 0].tolist() == [40, 50, 60]  # index 1
    assert out[0, 1].tolist() == [10, 20, 30]  # index 0


def test_roundtrips_exact():
    rng = np.random.RandomState(0)
    pal = rng.randint(0, 256, (17, 3), np.uint8)
    img = pal[rng.randint(0, 17, (29, 35))]
    assert np.array_equal(decode_gif_pixels(encode_gif(img)), img)
    assert np.array_equal(
        decode_gif_pixels(encode_gif(img, interlace=True)), img
    )
    # near-full palette (9-bit LZW code width path)
    pal256 = np.unique(rng.randint(0, 256, (256, 3), np.uint8), axis=0)
    img2 = pal256[rng.randint(0, len(pal256), (40, 50))]
    assert np.array_equal(decode_gif_pixels(encode_gif(img2)), img2)
    # solid + tiny
    assert decode_gif_pixels(synthesize_gif_real(1, 1)).shape == (1, 1, 3)


def test_transparency_composites_background():
    """A GCE transparent index leaves the background color visible."""
    gif = (
        b"GIF89a"
        + struct.pack("<HHBBB", 2, 1, 0x81, 1, 0)  # bg index 1
        + bytes([10, 20, 30, 99, 98, 97, 0, 0, 0, 0, 0, 0])
        + bytes([0x21, 0xF9, 4, 0x01, 0, 0, 0, 0])  # GCE: transparent idx 0
        + struct.pack("<BHHHHB", 0x2C, 0, 0, 2, 1, 0)
        + bytes([2])
        + bytes([2, 0x0C, 0x0A, 0])  # indices [1, 0]; 0 is transparent
        + b"\x3b"
    )
    out = decode_gif_pixels(gif)
    assert out[0, 0].tolist() == [99, 98, 97]  # opaque index 1
    assert out[0, 1].tolist() == [99, 98, 97]  # transparent -> bg color


def test_refusals_and_fuzz():
    from comic_text_detector_spark.multimodal.binary_ops import synthesize_gif

    assert decode_gif_pixels(synthesize_gif(10, 10)) is None  # header-only
    assert decode_gif_pixels(b"GIF89a123") is None
    assert decode_gif_pixels(b"nope") is None
    assert decode_gif_pixels(None) is None
    full = bytearray(encode_gif(np.zeros((8, 8, 3), np.uint8)))
    for cut in (10, 14, len(full) // 2, len(full) - 2):
        out = decode_gif_pixels(bytes(full[:cut]))
        assert out is None or out.shape == (8, 8, 3)
    rng = np.random.RandomState(7)
    for _ in range(200):
        mut = bytearray(full)
        for _ in range(rng.randint(1, 5)):
            mut[rng.randint(6, len(mut))] = rng.randint(0, 256)
        out = decode_gif_pixels(bytes(mut))
        assert out is None or (
            isinstance(out, np.ndarray) and out.dtype == np.uint8
        )


def test_dispatcher_and_letterbox_over_gif(spark):
    from comic_text_detector_spark.multimodal.pixels import (
        decode_image_pixels,
        letterbox_images,
    )

    gif = synthesize_gif_real(40, 20, (10, 200, 90))
    assert decode_image_pixels(gif).shape == (20, 40, 3)
    df = spark.createDataFrame(
        [("g", gif)], "media_id string, media binary"
    )
    row = letterbox_images(df, size=64).collect()[0]
    assert row.ok and (row.out_w, row.out_h) == (64, 32)


def test_out_of_palette_index_refused():
    """Literal codes above the palette size must refuse, never fabricate
    pixels from a clamped palette entry (review finding)."""
    gif = (
        b"GIF89a"
        + struct.pack("<HHBBB", 2, 1, 0x81, 0, 0)
        + bytes([10, 20, 30, 100, 110, 120, 0, 0, 0, 0, 0, 0])
        + struct.pack("<BHHHHB", 0x2C, 0, 0, 2, 1, 0)
        + bytes([3])  # min code 3: literals 0-7, palette only 4 entries
    )
    acc = n = 0
    for code in (8, 5, 0, 9):  # CLEAR, literal 5 (out of range), 0, EOI
        acc |= code << n
        n += 4
    data = bytes([(acc >> (8 * i)) & 0xFF for i in range((n + 7) // 8)])
    gif += bytes([len(data)]) + data + b"\x00\x3b"
    assert decode_gif_pixels(gif) is None
