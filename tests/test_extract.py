"""Golden-fixture byte-identity tests (the primary north_rule assertion).

Mirrors the reference's fixture-roundtrip validation pattern
(model2annotations writes goldens, traverse_by_dict re-reads them,
reference inference.py:19-70, :180-200) — here the goldens are known by
construction from the seeded generator.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from comic_text_detector_spark.fixtures import corpus_df, gen_documents, wrap_html_expr
from comic_text_detector_spark.operators.dedup import asof_dedup
from comic_text_detector_spark.plans.extract import (
    extract_document,
    extract_fused,
    extract_relational,
)

ROWS = gen_documents(150)


def test_kernel_byte_identity_and_block_counts():
    for r in ROWS:
        text, spans = extract_document(r["html"])
        assert text == r["text"], r["url"]
        assert len(spans) == r["n_blocks"], r["url"]


def test_kernel_span_consistency():
    """Slicing extracted text by spans and joining with ' ' reproduces it."""
    for r in ROWS:
        text, spans = extract_document(r["html"])
        assert " ".join(text[s:e] for _, s, e in spans) == text
        # spans are ordered, non-overlapping, within bounds
        prev_end = -1
        for bid, s, e in spans:
            assert 0 <= s < e <= len(text)
            assert s > prev_end
            prev_end = e


@pytest.fixture(scope="module")
def corpus(spark):
    return corpus_df(spark, 60).cache()


def test_fused_matches_golden_per_capture(spark, corpus):
    got = extract_fused(corpus, num_partitions=4).withColumnRenamed("text", "etext")
    joined = got.join(corpus.select("url", "text").distinct(), "url")
    # non-dup urls: extracted text equals golden byte-identically
    bad = joined.filter(
        ~F.col("url").startswith("https://dup-") & (F.col("etext") != F.col("text"))
    ).count()
    assert bad == 0


def test_asof_dedup_latest_capture_wins(spark, corpus):
    deduped = asof_dedup(corpus)
    assert deduped.count() == corpus.select("url").distinct().count()
    dup = deduped.filter(F.col("url") == "https://dup-host.example/a").collect()
    assert len(dup) == 1
    assert dup[0].text.startswith("capture version 2")
    got = extract_fused(deduped, num_partitions=4)
    bad = (
        got.withColumnRenamed("text", "etext")
        .join(deduped.select("url", "text"), "url")
        .filter(F.col("etext") != F.col("text"))
        .count()
    )
    assert bad == 0


def test_relational_plan_equals_fused_plan(spark, corpus):
    docs = asof_dedup(corpus)
    fused = extract_fused(docs, num_partitions=4)
    rel = extract_relational(docs)
    diff = (
        fused.alias("a")
        .join(rel.alias("b"), "url")
        .filter(
            (F.col("a.text") != F.col("b.text"))
            | (F.col("a.spans").cast("string") != F.col("b.spans").cast("string"))
        )
        .count()
    )
    assert diff == 0
    assert fused.count() == rel.count() == docs.count()


def test_driver_documents_roundtrip(spark):
    dd = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    for two_p in (False, True):
        wrapped = dd.select(
            F.col("doc_id").cast("string").alias("url"),
            wrap_html_expr(F.col("text"), two_paragraphs=two_p).alias("html"),
            F.col("text").alias("golden"),
        )
        got = extract_fused(wrapped.select("url", "html"))
        bad = (
            got.join(wrapped.select("url", "golden"), "url")
            .filter(F.col("text") != F.col("golden"))
            .count()
        )
        assert bad == 0


def test_null_html_extracts_empty(spark):
    """Nullable html:binary cells (real crawl tables) extract as '' rows,
    never a task failure."""
    from comic_text_detector_spark.plans.extract import extract_fused

    df = spark.createDataFrame(
        [("u1", None), ("u2", b"<p>real content here</p>")],
        "url string, html binary",
    )
    out = {r.url: r.text for r in extract_fused(df).collect()}
    assert out["u1"] == ""
    assert "real content" in out["u2"]
