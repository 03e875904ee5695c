"""Determinism/invariance: results must not depend on physical layout."""

from __future__ import annotations

from pyspark.sql import functions as F

from comic_text_detector_spark.fixtures import corpus_df
from comic_text_detector_spark.operators.dedup import asof_dedup
from comic_text_detector_spark.plans.extract import extract_fused
from comic_text_detector_spark.plans.runner import read_extracted, run_extract


def test_extract_invariant_to_partitioning(spark):
    docs = asof_dedup(corpus_df(spark, 40)).cache()
    a = {(r.url, r.text) for r in extract_fused(docs, num_partitions=2).collect()}
    b = {(r.url, r.text) for r in extract_fused(docs, num_partitions=16).collect()}
    c = {
        (r.url, r.text)
        for r in extract_fused(docs.repartition(7), num_partitions=None).collect()
    }
    assert a == b == c


def test_runner_salted_mode_end_to_end(spark, tmp_path):
    corpus = corpus_df(spark, 60)
    expected = asof_dedup(corpus)
    out = str(tmp_path / "salted")
    run_extract(
        spark, corpus, out, num_partitions=8, num_chunks=2,
        salt_hot_hosts=True, hot_row_threshold=5,
    )
    got = read_extracted(spark, out)
    assert got.count() == expected.count()
    bad = (
        got.withColumnRenamed("text", "etext")
        .join(expected.select("url", "text"), "url")
        .filter(F.col("etext") != F.col("text"))
        .count()
    )
    assert bad == 0


def test_streaming_incremental_checkpoint(spark, tmp_path):
    """Second availableNow run processes ONLY newly arrived files."""
    from comic_text_detector_spark.streaming.stream_extract import extract_stream

    in_dir = str(tmp_path / "in")
    out_dir = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    first = corpus_df(spark, 10)
    first.write.parquet(in_dir)
    q = extract_stream(spark, in_dir, out_dir, ckpt)
    q.awaitTermination(120)
    n1 = spark.read.parquet(out_dir).count()

    # new files arrive (disjoint urls)
    more = corpus_df(spark, 10).withColumn(
        "url", F.concat(F.lit("again-"), F.col("url"))
    )
    more.write.mode("append").parquet(in_dir)
    q2 = extract_stream(spark, in_dir, out_dir, ckpt)
    q2.awaitTermination(120)
    final = spark.read.parquet(out_dir)
    n2 = final.count()
    assert n2 == n1 + more.dropDuplicates(["url"]).count()
    # no url processed twice across the two incremental runs
    assert final.groupBy("url").count().filter(F.col("count") > 1).count() == 0
