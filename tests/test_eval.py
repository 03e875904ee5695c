"""J6/A11 evaluator: greedy span matching + global PRF with planted truth."""

from __future__ import annotations

from comic_text_detector_spark.plans.eval import evaluate_extraction, match_counts


def test_eval_prf_planted(spark):
    golden = spark.createDataFrame(
        [
            ("u1", 0, 100),    # matched exactly
            ("u1", 200, 300),  # matched with shift (iou ~0.82)
            ("u1", 400, 500),  # missed (no pred)
            ("u2", 0, 50),     # matched
        ],
        "url string, char_start int, char_end int",
    )
    predicted = spark.createDataFrame(
        [
            ("u1", 0, 100),
            ("u1", 210, 310),
            ("u1", 900, 950),  # false positive
            ("u2", 0, 50),
        ],
        "url string, char_start int, char_end int",
    )
    counts = {r.url: (r.tp, r.n_gt, r.n_pred) for r in match_counts(golden, predicted).collect()}
    assert counts["u1"] == (2, 3, 3)
    assert counts["u2"] == (1, 1, 1)
    prf = evaluate_extraction(golden, predicted).collect()[0]
    assert prf.tp == 3 and prf.n_gt == 4 and prf.n_pred == 4
    assert prf.precision == 0.75 and prf.recall == 0.75 and prf.hmean == 0.75


def test_eval_greedy_first_come(spark):
    # two golden spans competing for one pred: the first (position order)
    # takes it — first-come-first-served like the reference evaluator
    golden = spark.createDataFrame(
        [("u1", 0, 100), ("u1", 10, 110)], "url string, char_start int, char_end int"
    )
    predicted = spark.createDataFrame(
        [("u1", 5, 105)], "url string, char_start int, char_end int"
    )
    c = match_counts(golden, predicted).collect()[0]
    assert (c.tp, c.n_gt, c.n_pred) == (1, 2, 1)


def test_eval_on_fixture_extraction(spark):
    """Self-consistency: the engine's own extraction scores PRF = 1.0
    against its golden span layout on the fixture corpus."""
    import pyspark.sql.functions as F

    from comic_text_detector_spark.fixtures import corpus_df
    from comic_text_detector_spark.operators.dedup import asof_dedup
    from comic_text_detector_spark.plans.extract import extract_fused

    docs = asof_dedup(corpus_df(spark, 40))
    out = extract_fused(docs)
    spans = out.select("url", F.explode("spans").alias("s")).select(
        "url", F.col("s.char_start").alias("char_start"), F.col("s.char_end").alias("char_end")
    )
    prf = evaluate_extraction(spans, spans).collect()[0]
    assert prf.hmean == 1.0 and prf.n_gt > 0
