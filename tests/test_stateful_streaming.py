"""applyInPandasWithState: exactly-once per url ACROSS micro-batches."""

from __future__ import annotations

import pyspark.sql.functions as F

from comic_text_detector_spark.fixtures import corpus_df
from comic_text_detector_spark.streaming.stateful_dedup import stateful_dedup_stream


def test_stateful_dedup_across_batches(spark, tmp_path):
    in_dir = str(tmp_path / "in")
    out_dir = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    base = corpus_df(spark, 8).select("url", "warc_ts", "html")

    def run_once():
        stream = spark.readStream.schema(
            "url string, warc_ts timestamp, html binary"
        ).parquet(in_dir)
        q = (
            stateful_dedup_stream(stream)
            .writeStream.format("parquet")
            .option("path", out_dir)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        # processing-time state timeouts keep an availableNow query alive
        # after the data drains; stop once idle with nothing available
        import time as _t

        deadline = _t.time() + 120
        while _t.time() < deadline and q.isActive:
            st = q.status
            if (
                not st["isDataAvailable"]
                and not st["isTriggerActive"]
                and q.recentProgress
            ):
                break
            _t.sleep(0.5)
        if q.isActive:
            q.stop()
        q.awaitTermination(60)

    # batch 1
    base.write.parquet(in_dir)
    run_once()
    n1 = spark.read.parquet(out_dir).count()
    n_urls = base.select("url").distinct().count()
    assert n1 == n_urls  # one row per url, incl. the dup- tier collapsed

    # batch 2: same urls again (recrawl) + two new ones → only new urls emit
    recrawl = base.withColumn(
        "warc_ts", F.col("warc_ts") + F.expr("INTERVAL 1 DAY")
    )
    new = base.limit(2).select(
        F.concat(F.lit("new-"), F.col("url")).alias("url"), "warc_ts", "html"
    )
    recrawl.unionByName(new).write.mode("append").parquet(in_dir)
    run_once()
    out = spark.read.parquet(out_dir)
    assert out.count() == n_urls + 2
    assert out.groupBy("url").count().filter(F.col("count") > 1).count() == 0


def test_watermark_drops_late_data(spark, tmp_path):
    """Across two availableNow triggers sharing a checkpoint: a finalized
    window emits exactly once, and a row older than the advanced watermark
    is dropped instead of resurrecting the window."""
    from comic_text_detector_spark.streaming.stream_extract import (
        windowed_counts_stream,
    )

    in_dir, out_dir, ckpt = (
        str(tmp_path / "in"), str(tmp_path / "out"), str(tmp_path / "ckpt"),
    )

    def run_once():
        stream = spark.readStream.schema("ts timestamp").parquet(in_dir)
        q = (
            windowed_counts_stream(stream)
            .writeStream.format("parquet")
            .outputMode("append")
            .option("path", out_dir)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    def ev(*ts):
        return spark.createDataFrame([(t,) for t in ts], "ts string").select(
            F.col("ts").cast("timestamp").alias("ts")
        )

    # trigger 1: two rows in the 00:00 window + one at 01:00 that advances
    # the watermark to 00:55, finalizing (and emitting) the 00:00 window
    ev("2026-01-01 00:00:30", "2026-01-01 00:02:00", "2026-01-01 01:00:00").write.parquet(in_dir)
    run_once()
    out1 = {
        str(r.win_start): r.n_events for r in spark.read.parquet(out_dir).collect()
    }
    assert out1.get("2026-01-01 00:00:00") == 2

    # trigger 2: one LATE row for the already-finalized window (dropped) and
    # one at 02:00 that finalizes the 01:00 window
    ev("2026-01-01 00:03:00", "2026-01-01 02:00:00").write.mode("append").parquet(in_dir)
    run_once()
    out2 = [
        (str(r.win_start), r.n_events)
        for r in spark.read.parquet(out_dir).collect()
    ]
    counts = {}
    for k, n in out2:
        counts.setdefault(k, []).append(n)
    # the 00:00 window was emitted ONCE, still with count 2 (late row dropped)
    assert counts["2026-01-01 00:00:00"] == [2]
    # the 01:00 window finalized in trigger 2 with exactly its on-time row
    assert counts["2026-01-01 01:00:00"] == [1]


def test_neardup_stream_across_batches(spark, tmp_path):
    """A near-duplicate arriving in a LATER micro-batch is matched against
    the remembered capture from the first batch — the cross-batch property
    a per-batch join cannot provide."""
    import random

    from comic_text_detector_spark.streaming.stateful_neardup import (
        neardup_stream,
    )

    in_dir, out_dir, ckpt = (
        str(tmp_path / "in"), str(tmp_path / "out"), str(tmp_path / "ckpt"),
    )

    def run_once():
        stream = spark.readStream.schema("url string, text string").parquet(in_dir)
        q = (
            neardup_stream(stream, max_hamming=8)
            .writeStream.format("parquet")
            .outputMode("append")
            .option("path", out_dir)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    rng = random.Random(11)
    words = "alpha beta gamma delta epsilon zeta eta theta iota kappa".split()
    base = " ".join(rng.choice(words) for _ in range(60))
    others = [
        (f"o{i}", " ".join(rng.choice(words) for _ in range(60)))
        for i in range(6)
    ]

    # batch 1: the original + unrelated docs
    spark.createDataFrame(
        [("orig", base)] + others, "url string, text string"
    ).write.parquet(in_dir)
    run_once()

    # batch 2: a near-dup of the batch-1 original (one word changed)
    w = base.split(); w[30] = "CHANGED"
    spark.createDataFrame(
        [("near", " ".join(w))], "url string, text string"
    ).write.mode("append").parquet(in_dir)
    run_once()

    matches = {
        (r.url, r.matched_url)
        for r in spark.read.parquet(out_dir).collect()
    }
    assert ("near", "orig") in matches  # cross-batch near-dup detected
    # the unrelated oN docs never match anything, in either direction
    unrelated = {f"o{i}" for i in range(6)}
    assert not [
        (a, b) for a, b in matches if a in unrelated or b in unrelated
    ]


def test_neardup_stream_ignores_shingleless_docs(spark, tmp_path):
    """Empty/1-word docs must not pair with each other at sig=0 (the batch
    path drops shingle-less docs; the stream does the same)."""
    from comic_text_detector_spark.streaming.stateful_neardup import (
        banded_simhash,
    )

    df = spark.createDataFrame(
        [("a", "hello"), ("b", ""), ("c", None), ("d", "two words here")],
        "url string, text string",
    )
    rows = banded_simhash(df).collect()  # batch mode: same kernel
    assert {r.url for r in rows} == {"d"}  # only the shingled doc banded


def test_extract_to_wet_stream(spark, tmp_path):
    """Streaming → WET: micro-batches land as parseable conversion-record
    blobs whose text round-trips byte-identically."""
    from pyspark.sql import functions as F

    from comic_text_detector_spark.fixtures import wrap_html_expr
    from comic_text_detector_spark.sources.warc import parse_warc
    from comic_text_detector_spark.streaming.stream_extract import (
        extract_to_wet_stream,
    )

    in_dir, out_dir, ck = (
        str(tmp_path / "in"), str(tmp_path / "out"), str(tmp_path / "ck")
    )
    docs = spark.createDataFrame(
        [(f"u{i}", f"stream doc {i} body text") for i in range(6)],
        "url string, text string",
    ).select(
        "url",
        F.to_timestamp(F.lit("2024-05-01 00:00:00")).alias("warc_ts"),
        wrap_html_expr(F.col("text")).alias("html"),
    )
    docs.write.parquet(in_dir)
    q = extract_to_wet_stream(spark, in_dir, out_dir, ck)
    q.awaitTermination(120)
    rows = spark.read.parquet(out_dir).collect()
    assert sum(r.n_records for r in rows) == 6
    texts = {}
    dates = set()
    for r in rows:
        for url, ts, body in parse_warc(
            bytes(r.wet), record_types=(b"conversion",)
        ):
            texts[url] = body.decode()
            dates.add(ts)
    assert texts["u3"] == "stream doc 3 body text"
    assert len(texts) == 6
    # capture timestamps ride through to WARC-Date (not the epoch default)
    assert dates == {"2024-05-01T00:00:00Z"}
    # batch_id partitioning (idempotent overwrite unit) present
    assert {r.batch_id for r in rows} == {0}


def test_stateful_frontier_slots_continue_across_batches(spark, tmp_path):
    """Per-host slot counters must survive micro-batch boundaries: batch 2
    schedules AFTER batch 1's slots, never bursting the host at slot 0
    again; worker assignment matches the batch operator's md5 affinity."""
    from comic_text_detector_spark.operators.dedup import md5_long
    from comic_text_detector_spark.streaming.stateful_frontier import (
        stateful_frontier_stream,
    )

    in_dir = str(tmp_path / "in")
    out_dir = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    def run_once():
        stream = spark.readStream.schema("url string").parquet(in_dir)
        q = (
            stateful_frontier_stream(stream, n_workers=8, per_host_delay_ms=500)
            .writeStream.format("parquet")
            .option("path", out_dir)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    b1 = [(f"https://a.example/p{i}",) for i in range(3)] + [
        ("https://b.example/only",),
        ("no-host-relative-url",),
    ]
    spark.createDataFrame(b1, "url string").write.parquet(in_dir)
    run_once()
    out1 = spark.read.parquet(out_dir).collect()
    a1 = sorted(r["slot"] for r in out1 if r["host"] == "a.example")
    assert a1 == [0, 1, 2]
    assert [r["slot"] for r in out1 if r["host"] == "b.example"] == [0]
    assert all(r["host"] != "" for r in out1)  # hostless excluded
    assert all(
        r["fetch_at_ms"] == r["slot"] * 500 for r in out1
    )

    # batch 2: two more a.example urls → slots 3, 4 (state carried)
    b2 = [("https://a.example/q1",), ("https://a.example/q2",)]
    spark.createDataFrame(b2, "url string").write.mode("append").parquet(in_dir)
    run_once()
    out2 = spark.read.parquet(out_dir).collect()
    a2 = sorted(r["slot"] for r in out2 if r["host"] == "a.example")
    assert a2 == [0, 1, 2, 3, 4]

    # worker affinity matches the batch operator's md5_long % n_workers
    expected_worker = spark.range(1).select(
        (md5_long(F.lit("a.example")) % 8).cast("int").alias("w")
    ).collect()[0]["w"]
    assert all(
        r["worker"] == expected_worker
        for r in out2
        if r["host"] == "a.example"
    )


def test_streaming_count_min_accumulates_across_batches(spark, tmp_path):
    """count_min_sketch is a plain streaming aggregation: run it over a
    file stream in complete mode across two availableNow triggers
    sharing a checkpoint — the final sketch equals the batch sketch of
    ALL rows (cell-exact), i.e. cross-batch heavy-hitter state needs no
    custom operator."""
    from pyspark.sql import functions as F

    from comic_text_detector_spark.operators.stats import (
        count_min_estimate,
        count_min_sketch,
    )

    in_dir, ckpt = str(tmp_path / "in"), str(tmp_path / "ck")
    b1 = spark.createDataFrame([("a",)] * 5 + [("b",)] * 2, "host string")
    b1.write.parquet(in_dir)

    def run_once():
        stream = spark.readStream.schema("host string").parquet(in_dir)
        q = (
            count_min_sketch(stream, "host", depth=3, width=256)
            .writeStream.format("memory")
            .queryName("cms_sink")
            .outputMode("complete")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    run_once()
    b2 = spark.createDataFrame([("a",)] * 3 + [("c",)] * 4, "host string")
    b2.write.mode("append").parquet(in_dir)
    run_once()
    streamed = spark.sql("SELECT * FROM cms_sink")
    batch = count_min_sketch(
        spark.read.parquet(in_dir), "host", depth=3, width=256
    )
    assert sorted(map(tuple, streamed.collect())) == sorted(
        map(tuple, batch.collect())
    )
    est = {
        r.key: r.est
        for r in count_min_estimate(
            streamed, spark.read.parquet(in_dir), "host", depth=3, width=256
        ).collect()
    }
    assert est["a"] == 8 and est["b"] == 2 and est["c"] == 4


def test_bloom_filter_stream_bounded_state(spark, tmp_path):
    """Cross-batch Bloom seen-filter: batch-2 repeats suppressed, new
    urls pass; the python hash mirror equals the batch operator's."""
    from comic_text_detector_spark.operators.bloom import _positions
    from comic_text_detector_spark.streaming.stateful_bloom import (
        _positions_py,
        bloom_filter_stream,
    )

    # hash-contract assertion: python mirror == Spark column positions
    probe = spark.createDataFrame([("https://x/1",)], "url string")
    spark_pos = probe.select(
        *[p.alias(f"p{j}") for j, p in
          enumerate(_positions(F.col("url"), 1 << 16, 3))]
    ).collect()[0]
    assert list(spark_pos) == _positions_py("https://x/1", 1 << 16, 3)

    in_dir, out_dir, ckpt = (
        str(tmp_path / d) for d in ("in", "out", "ckpt")
    )

    def run_once():
        stream = spark.readStream.schema("url string").parquet(in_dir)
        q = (
            bloom_filter_stream(stream)
            .writeStream.format("parquet")
            .option("path", out_dir)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        import time as _t

        deadline = _t.time() + 120
        while _t.time() < deadline and q.isActive:
            st = q.status
            if (
                not st["isDataAvailable"]
                and not st["isTriggerActive"]
                and q.recentProgress
            ):
                break
            _t.sleep(0.5)
        if q.isActive:
            q.stop()
        q.awaitTermination(60)

    batch1 = [(f"https://h{i}/p{i}",) for i in range(40)]
    spark.createDataFrame(batch1, "url string").write.mode(
        "append"
    ).parquet(in_dir)
    run_once()
    seen1 = {r.url for r in spark.read.parquet(out_dir).collect()}
    assert seen1 == {u for (u,) in batch1}  # no false positives at this load

    batch2 = batch1[:10] + [(f"https://new{i}/q{i}",) for i in range(5)]
    spark.createDataFrame(batch2, "url string").write.mode(
        "append"
    ).parquet(in_dir)
    run_once()
    seen2 = {r.url for r in spark.read.parquet(out_dir).collect()}
    assert seen2 == seen1 | {f"https://new{i}/q{i}" for i in range(5)}
