"""U8 rasterized label maps (operators/labelmaps.py): closed-form checks
on axis-aligned rects, the reference's ignore rule, border-value math on
real grids, non-axis polygons, and the Spark surface."""

from __future__ import annotations

import math

import numpy as np

from comic_text_detector_spark.operators.labelmaps import (
    build_label_maps,
    label_maps_df,
)


def _rect(x1, y1, x2, y2):
    return [(x1, y1), (x2, y1), (x2, y2), (x1, y2)]


def test_axis_rect_counts_closed_form():
    for x1, y1, dx, dy in [(5, 4, 9, 5), (2, 2, 4, 4), (0, 0, 20, 10),
                           (3, 2, 16, 11)]:
        x2, y2 = x1 + dx, y1 + dy
        maps = build_label_maps(32, 24, [_rect(x1, y1, x2, y2)])
        a, per = dx * dy, 2 * (dx + dy)
        d = a * (1 - 0.4 * 0.4) / per
        nx = math.floor(x2 - d) - math.ceil(x1 + d) + 1
        ny = math.floor(y2 - d) - math.ceil(y1 + d) + 1
        assert int(maps["shrink"].sum()) == max(0, nx) * max(0, ny)
        bx = min(31, math.floor(x2 + d)) - max(0, math.ceil(x1 - d)) + 1
        by = min(23, math.floor(y2 + d)) - max(0, math.ceil(y1 - d)) + 1
        assert int(maps["border_mask"].sum()) == bx * by
        assert int((maps["mask"] == 0).sum()) == 0


def test_ignore_rule_small_and_degenerate():
    # min side 3 < min_text_size 4 → mask zeroed over the original rect
    maps = build_label_maps(32, 24, [_rect(1, 1, 10, 4)])
    assert int(maps["shrink"].sum()) == 0
    assert int((maps["mask"] == 0).sum()) == 10 * 4
    assert int(maps["border_mask"].sum()) == 0
    # area < 1 → skipped entirely (validate refuses the degenerate)
    maps = build_label_maps(32, 24, [_rect(5, 5, 5.5, 5.5)])
    assert int(maps["shrink"].sum()) == 0
    # empty polygon list → clean empty maps
    maps = build_label_maps(8, 8, [])
    assert int(maps["shrink"].sum()) == 0 and int(maps["mask"].sum()) == 64


def test_border_values_match_rect_distance():
    """Inside the rect the kernel's general point-to-segment distance must
    equal the rect closed form min(x-x1, x2-x, y-y1, y2-y)."""
    x1, y1, x2, y2 = 4, 3, 18, 12
    maps = build_label_maps(32, 24, [_rect(x1, y1, x2, y2)])
    a, per = (x2 - x1) * (y2 - y1), 2 * ((x2 - x1) + (y2 - y1))
    d = a * (1 - 0.16) / per
    for px, py in [(5, 4), (10, 7), (17, 11), (4, 3), (11, 3)]:
        dist = min(px - x1, x2 - px, py - y1, y2 - py)
        want = (1 - min(dist / d, 1.0)) * 0.4 + 0.3
        assert abs(float(maps["border"][py, px]) - want) < 1e-6, (px, py)
    # outside the padded support the border stays at thresh_min
    assert float(maps["border"][0, 0]) == np.float32(0.3)
    # range always within [thresh_min, thresh_max]
    assert maps["border"].min() >= np.float32(0.3) - 1e-7
    assert maps["border"].max() <= np.float32(0.7) + 1e-7


def test_diamond_polygon_sane():
    maps = build_label_maps(40, 40, [[(20, 5), (35, 20), (20, 35), (5, 20)]])
    s = maps["shrink"].astype(bool)
    assert s.sum() > 0
    assert np.array_equal(s, s.T)  # symmetric about the main diagonal
    # shrink strictly inside the border support
    assert not (s & ~maps["border_mask"].astype(bool)).any()


def test_overlapping_polygons_compose():
    """Two overlapping rects: shrink maps union, border canvas is the
    per-pixel max of the two contributions."""
    r1, r2 = _rect(2, 2, 14, 10), _rect(8, 4, 20, 12)
    both = build_label_maps(32, 24, [r1, r2])
    m1 = build_label_maps(32, 24, [r1])
    m2 = build_label_maps(32, 24, [r2])
    assert np.array_equal(
        both["shrink"], np.maximum(m1["shrink"], m2["shrink"])
    )
    assert np.allclose(
        both["border"], np.maximum(m1["border"], m2["border"]), atol=1e-6
    )


def test_label_maps_df_spark_roundtrip(spark):
    from comic_text_detector_spark.multimodal.pixels import decode_png_pixels

    rows = [
        ("a", 32, 24, [[[5.0, 4.0], [14.0, 4.0], [14.0, 9.0], [5.0, 9.0]]]),
        ("tiny", 32, 24, [[[1.0, 1.0], [10.0, 1.0], [10.0, 4.0], [1.0, 4.0]]]),
        ("none", 16, 16, []),
    ]
    df = spark.createDataFrame(
        rows,
        "media_id string, w int, h int, polys array<array<array<double>>>",
    )
    out = {r.media_id: r for r in label_maps_df(df).collect()}
    exp = build_label_maps(32, 24, [_rect(5, 4, 14, 9)])
    assert out["a"].n_shrink == int(exp["shrink"].sum())
    assert out["a"].n_border_support == int(exp["border_mask"].sum())
    shrink_png = decode_png_pixels(bytes(out["a"].shrink_png))
    assert shrink_png.shape == (24, 32, 1)
    assert np.array_equal(shrink_png[:, :, 0] // 255, exp["shrink"])
    border_png = decode_png_pixels(bytes(out["a"].border_png))
    assert np.array_equal(
        border_png[:, :, 0],
        np.clip(np.floor(exp["border"] * 255.0 + 0.5), 0, 255).astype(np.uint8),
    )
    assert out["tiny"].n_shrink == 0 and out["tiny"].n_masked_off == 40
    assert out["none"].n_shrink == 0 and out["none"].n_masked_off == 0
