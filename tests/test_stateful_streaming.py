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
