"""Multiclass topic router: planted-separability learning, classify
semantics (argmax tie-break, empty-doc routing), validation guards, and
the capped-update path."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from comic_text_detector_spark.operators.topic import (
    topic_scores,
    train_topic_softmax,
)

WORDS = {0: "tables rows scans", 1: "windows streams batches",
         2: "customers orders queries"}


def _labeled(spark, n=60):
    rows = [
        (i, f"filler common tokens {WORDS[i % 3]} {WORDS[i % 3]}", i % 3)
        for i in range(n)
    ]
    return spark.createDataFrame(rows, "id long, text string, label long")


def test_train_topic_softmax_learns_planted_split(spark):
    df = _labeled(spark)
    w = train_topic_softmax(df, n_classes=3, id_col="id", n_buckets=512,
                            n_iter=4)
    assert w, "trainer returned an empty model"
    out = topic_scores(
        df.select(F.col("id").alias("doc_id"), "text"),
        w,
        n_classes=3,
        n_buckets=512,
    )
    got = {r.doc_id: r.topic for r in out.collect()}
    acc = sum(got[i] == i % 3 for i in range(60)) / 60
    assert acc == 1.0, f"planted 3-way split not recovered: acc={acc}"


def test_train_topic_capped_updates_bounded_and_learns(spark):
    df = _labeled(spark)
    w = train_topic_softmax(
        df, n_classes=3, id_col="id", n_buckets=1 << 20, n_iter=4,
        max_updates_per_iter=30,
    )
    # the collect bound is the cap itself; model can't exceed iters*cap
    assert 0 < len(w) <= 4 * 30
    out = topic_scores(
        df.select(F.col("id").alias("doc_id"), "text"), w, n_classes=3,
        n_buckets=1 << 20,
    )
    got = {r.doc_id: r.topic for r in out.collect()}
    acc = sum(got[i] == i % 3 for i in range(60)) / 60
    assert acc >= 0.9


def test_train_topic_guards(spark):
    df = _labeled(spark, n=6)
    with pytest.raises(ValueError, match="n_buckets"):
        train_topic_softmax(df, n_classes=3, id_col="id",
                            n_buckets=1 << 17)
    with pytest.raises(ValueError, match="n_classes"):
        train_topic_softmax(df, n_classes=1, id_col="id")
    with pytest.raises(ValueError, match="n_iter"):
        train_topic_softmax(df, n_classes=3, id_col="id", n_iter=0)
    empty = spark.createDataFrame([], "id long, text string, label long")
    with pytest.raises(ValueError, match="no labeled"):
        train_topic_softmax(empty, n_classes=3, id_col="id")


def test_topic_scores_tiebreak_and_empty_doc(spark):
    import hashlib

    def b(word, n=1 << 12):
        return int(hashlib.md5(word.encode()).hexdigest()[:8], 16) % n

    weights = {(1, b("left")): 500, (2, b("right")): 500}
    docs = spark.createDataFrame(
        [(0, "left right"), (1, ""), (2, None), (3, "right")],
        "doc_id long, text string",
    )
    got = {r.doc_id: (list(r.logits), r.topic)
           for r in topic_scores(docs, weights, n_classes=3).collect()}
    # doc 0 ties classes 1 and 2 -> smallest class wins
    assert got[0] == ([0, 500, 500], 1)
    assert got[1] == ([0, 0, 0], 0)  # empty doc routes to class 0
    assert got[2] == ([0, 0, 0], 0)
    assert got[3][1] == 2
