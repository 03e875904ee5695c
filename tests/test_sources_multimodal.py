"""Sources/sinks (S-group), multimodal binary plumbing, streaming analogs."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from comic_text_detector_spark.multimodal.binary_ops import (
    decode_image_meta,
    media_stats,
    sample_frames,
)
from comic_text_detector_spark.sources.readers import (
    paired_scan,
    parse_blocks_json,
    read_raw_pages,
)
from comic_text_detector_spark.sources.sinks import (
    blocks_json,
    line_poly_rows,
    yolo_label_lines,
)


def test_raw_page_source_binaryfile(spark, tmp_path):
    p = tmp_path / "pages"
    p.mkdir()
    (p / "a.html").write_bytes(b"<p>hello page one content here</p>")
    (p / "b.html").write_bytes(b"<p>second page content</p>")
    df = read_raw_pages(spark, str(p))
    rows = {r.url.split("/")[-1]: bytes(r.html) for r in df.collect()}
    assert rows["a.html"].startswith(b"<p>hello")
    assert len(rows) == 2


def test_blocks_json_roundtrip(spark):
    df = spark.createDataFrame(
        [("u1", [(0, 0, 10, 0.9, "eng", False, 12.0, 0, ["hello"])])],
        "url string, blocks array<struct<block_id:int,char_start:int,char_end:int,"
        "conf:double,language:string,vertical:boolean,font_size:double,angle:int,"
        "text:array<string>>>",
    )
    js = df.select("url", blocks_json(F.col("blocks")).alias("j"))
    back = js.select("url", parse_blocks_json(F.col("j")).alias("blocks"))
    row = back.collect()[0]
    assert row.blocks[0].language == "eng" and row.blocks[0].text == ["hello"]
    # tolerant re-read: unknown fields ignored (the **kwargs analog)
    extra = spark.createDataFrame(
        [('[{"block_id":1,"char_start":2,"char_end":3,"UNKNOWN_FIELD":42}]',)],
        "j string",
    )
    got = extra.select(parse_blocks_json(F.col("j")).alias("b")).collect()[0]
    assert got.b[0].block_id == 1 and got.b[0].conf is None


def test_yolo_label_and_poly_sinks(spark):
    df = spark.createDataFrame([(0, 0.5, 0.25, 0.1, 0.2)], "cls int, cx double, cy double, w double, h double")
    line = df.select(
        yolo_label_lines(F.col("cls"), F.col("cx"), F.col("cy"), F.col("w"), F.col("h")).alias("l")
    ).collect()[0].l
    assert line == "0 0.500000 0.250000 0.100000 0.200000"
    poly = spark.createDataFrame(
        [([[0.0, 1.0], [2.0, 3.0], [4.0, 5.0], [6.0, 7.0]],)],
        "pts array<array<double>>",
    )
    row = poly.select(line_poly_rows(F.col("pts")).alias("r")).collect()[0].r
    assert row == "0 1 2 3 4 5 6 7"


def test_paired_scan_join(spark):
    imgs = spark.createDataFrame([("x.jpg", 1), ("y.jpg", 2)], "path string, v int")
    masks = spark.createDataFrame(
        [("mask-x.png", 10), ("mask-y.png", 20)], "mpath string, mv int"
    )
    out = paired_scan(
        imgs,
        masks,
        F.regexp_replace("path", r"\.jpg$", ""),
        F.regexp_replace(F.regexp_replace("mpath", r"^mask-", ""), r"\.png$", ""),
    )
    got = {(r.path, r.mpath) for r in out.collect()}
    assert got == {("x.jpg", "mask-x.png"), ("y.jpg", "mask-y.png")}


@pytest.fixture()
def media_df(spark):
    rows = [
        ("m1", b"\x89PNG\r\n" + b"z" * 300, "image/png"),
        ("m2", b"\xff\xd8\xff\xe0" + b"q" * 100, "image/jpeg"),
        ("m3", b"garbage", "application/octet-stream"),
    ]
    return spark.createDataFrame(rows, "media_id string, media binary, mime string")


def test_media_stats_and_sniff(spark, media_df):
    out = {r.media_id: r for r in media_stats(media_df).collect()}
    assert out["m1"].sniffed_mime == "image/png"
    assert out["m2"].sniffed_mime == "image/jpeg"
    assert out["m3"].sniffed_mime == "application/octet-stream"
    assert out["m1"].n_bytes == 306
    assert len(out["m1"].sha256) == 64


def test_decode_image_meta_real_headers(spark, media_df, monkeypatch):
    from comic_text_detector_spark.multimodal.binary_ops import (
        parse_image_meta,
        synthesize_gif,
        synthesize_jpeg,
        synthesize_png,
    )

    rows = [
        ("png", synthesize_png(33, 21)),
        ("jpg", synthesize_jpeg(640, 480)),
        ("gif", synthesize_gif(12, 7)),
        ("bad", b"garbage bytes here"),
        ("trunc", b"\x89PNG\r\n\x1a\n\x00\x00"),  # signature but no IHDR
    ]
    df = spark.createDataFrame(rows, "media_id string, media binary")
    out = {r.media_id: r for r in decode_image_meta(df).collect()}
    png = out["png"]
    assert (png.mime, png.width, png.height, png.channels, png.ok) == (
        "image/png", 33, 21, 3, True,
    )
    assert (out["jpg"].mime, out["jpg"].width, out["jpg"].height, out["jpg"].ok) == (
        "image/jpeg", 640, 480, True,
    )
    assert (out["gif"].width, out["gif"].height, out["gif"].channels) == (12, 7, 3)
    assert not out["bad"].ok and not out["trunc"].ok
    # direct parser check, plus BMP which has no synthesizer
    assert parse_image_meta(synthesize_png(5, 4)) == ("image/png", 5, 4, 3)
    import struct as _s

    bmp = b"BM" + b"\x00" * 16 + _s.pack("<ii", 17, -9) + b"\x00" * 8
    assert parse_image_meta(bmp) == ("image/bmp", 17, 9, 3)

    # frame-sampling plumbing keeps its documented fake (video needs ffmpeg)
    monkeypatch.setenv("CTD_FAKE_DECODE", "1")
    frames = sample_frames(media_df, every_n=1).collect()
    assert {f.media_id for f in frames} == {"m1", "m2", "m3"}
    m1_frames = [f for f in frames if f.media_id == "m1"]
    assert m1_frames[0].frame_idx == 0 and len(bytes(m1_frames[0].frame)) > 0


def test_streaming_extract_matches_batch(spark, tmp_path):
    from comic_text_detector_spark.fixtures import corpus_df
    from comic_text_detector_spark.operators.dedup import asof_dedup
    from comic_text_detector_spark.plans.extract import extract_fused
    from comic_text_detector_spark.streaming.stream_extract import extract_stream

    docs = corpus_df(spark, 30)
    in_dir, out_dir, ckpt = (
        str(tmp_path / "in"),
        str(tmp_path / "out"),
        str(tmp_path / "ckpt"),
    )
    docs.write.parquet(in_dir)
    q = extract_stream(spark, in_dir, out_dir, ckpt)
    q.awaitTermination(120)
    got = spark.read.parquet(out_dir)
    expected = extract_fused(asof_dedup(docs))
    assert got.count() == expected.count()
    diff = (
        got.withColumnRenamed("text", "t1")
        .join(expected.withColumnRenamed("text", "t2"), "url")
        .filter(F.col("t1") != F.col("t2"))
        .count()
    )
    assert diff == 0


def test_session_window_stream_shape(spark):
    from comic_text_detector_spark.streaming.stream_extract import (
        session_counts_stream,
    )

    ev = spark.createDataFrame(
        [(1, "2026-01-01 00:00:00"), (1, "2026-01-01 00:10:00"), (1, "2026-01-01 02:00:00")],
        "user_id long, ts_s string",
    ).select("user_id", F.col("ts_s").cast("timestamp").alias("ts"))
    out = session_counts_stream(ev).collect()  # batch DF: runs eagerly
    assert sorted(r.n_events for r in out) == [1, 2]


def test_bucketed_table_write_read_prune(spark, tmp_path):
    """Iceberg-style bucketed layout: snapshot appends accumulate, point
    lookups partition-prune to one url_bucket directory, and a mismatched
    bucket count refuses (it would prune to the wrong directory)."""
    import pytest as _pytest

    from comic_text_detector_spark.fixtures import corpus_df
    from comic_text_detector_spark.operators.dedup import asof_dedup
    from comic_text_detector_spark.sources.sinks import (
        read_extracted_table,
        read_url,
        write_extracted_table,
    )

    path = str(tmp_path / "tbl")
    docs = asof_dedup(corpus_df(spark, 40)).select("url", "html")
    write_extracted_table(docs, path, buckets=8)
    n1 = read_extracted_table(spark, path).count()
    assert n1 == docs.count()

    # snapshot append: second batch lands alongside the first
    more = docs.limit(5).select(
        F.concat(F.lit("snap2-"), F.col("url")).alias("url"), "html"
    )
    write_extracted_table(more, path, buckets=8)
    assert read_extracted_table(spark, path).count() == n1 + 5

    # point lookup returns exactly the row and PRUNES the scan
    target = docs.select("url").first().url
    got = read_url(spark, path, target)
    assert got.count() == 1 and got.first().url == target
    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "url_bucket" in plan

    with _pytest.raises(ValueError, match="buckets=8"):
        write_extracted_table(more, path, buckets=16)


def test_span_mask_png_sink(spark):
    """S7 made real: the span-coverage mask is a valid grayscale PNG whose
    pixels round-trip exactly."""
    from comic_text_detector_spark.multimodal.binary_ops import (
        decode_grayscale_png,
        parse_image_meta,
    )
    from comic_text_detector_spark.sources.sinks import span_mask_png

    df = spark.createDataFrame(
        [
            ("u1", "hello world", [(0, 0, 5), (1, 6, 11)]),
            ("u2", "", []),
        ],
        "url string, text string,"
        " spans array<struct<block_id:int,char_start:int,char_end:int>>",
    )
    rows = {r.url: r for r in span_mask_png(df).collect()}
    m1 = bytes(rows["u1"].mask_png)
    assert parse_image_meta(m1) == ("image/png", 11, 1, 1)
    assert decode_grayscale_png(m1) == b"\xff" * 5 + b"\x00" + b"\xff" * 5
    assert not rows["u1"].truncated
    # empty document still yields a valid 1x1 PNG with a real pixel (the
    # IDAT must match the declared IHDR dims, not truncate)
    m2 = bytes(rows["u2"].mask_png)
    assert parse_image_meta(m2) == ("image/png", 1, 1, 1)
    assert decode_grayscale_png(m2) == b"\x00"
    # truncation cap bounds the row
    long = spark.createDataFrame(
        [("u3", "x" * 100, [(0, 0, 100)])],
        "url string, text string,"
        " spans array<struct<block_id:int,char_start:int,char_end:int>>",
    )
    r3 = span_mask_png(long, max_width=10).collect()[0]
    assert r3.truncated and parse_image_meta(bytes(r3.mask_png))[1] == 10
