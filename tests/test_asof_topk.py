"""As-of join and A4 top-k-separated values."""

from __future__ import annotations

from pyspark.sql import functions as F

from comic_text_detector_spark.operators.asof import asof_join
from comic_text_detector_spark.operators.topk_apart import topk_separated


def test_asof_join_basic(spark):
    left = spark.createDataFrame(
        [("u1", 10.0, "l1"), ("u1", 25.0, "l2"), ("u1", 5.0, "l0"), ("u2", 7.0, "l3")],
        "g string, lts double, lval string",
    )
    right = spark.createDataFrame(
        [("u1", 10.0, "r10"), ("u1", 20.0, "r20"), ("u2", 9.0, "r9")],
        "g string, rts double, rval string",
    )
    out = {
        (r.g, r.lts): r.right_rval
        for r in asof_join(left, right, "g", "lts", "rts", ["rval"]).collect()
    }
    assert out[("u1", 10.0)] == "r10"  # tie matches
    assert out[("u1", 25.0)] == "r20"  # latest at-or-before
    assert out[("u1", 5.0)] is None  # nothing before
    assert out[("u2", 7.0)] is None  # right is after left


def test_asof_join_tolerance(spark):
    left = spark.createDataFrame([("u1", 100.0, 1)], "g string, lts double, k int")
    right = spark.createDataFrame([("u1", 10.0, "old")], "g string, rts double, rv string")
    no_tol = asof_join(left, right, "g", "lts", "rts", ["rv"]).collect()[0]
    assert no_tol.right_rv == "old"
    with_tol = asof_join(
        left, right, "g", "lts", "rts", ["rv"], tolerance=50.0
    ).collect()[0]
    assert with_tol.right_rv is None


def test_topk_separated(spark):
    # group g1: value 100 dominates (10 rows), 105 next (8, too close to 100),
    # 50 next (6, far enough), 52 (5, too close to 50), 200 (4, far) → picks
    # 100, 50, 200
    rows = (
        [("g1", 100.0)] * 10 + [("g1", 105.0)] * 8 + [("g1", 50.0)] * 6
        + [("g1", 52.0)] * 5 + [("g1", 200.0)] * 4 + [("g1", 7.0)] * 1
    )
    df = spark.createDataFrame(rows, "g string, v double")
    out = sorted(
        (r.pick_rank, r.value) for r in topk_separated(df, "g", "v").collect()
    )
    assert out == [(1, 100.0), (2, 50.0), (3, 200.0)]


def test_topk_separated_mass_floor(spark):
    rows = [("g1", 1.0)] * 999 + [("g1", 500.0)] * 1  # 0.1% floor excludes 500
    df = spark.createDataFrame(rows, "g string, v double")
    out = topk_separated(df, "g", "v", mass_floor=0.01).collect()
    assert [(r.pick_rank, r.value) for r in out] == [(1, 1.0)]
