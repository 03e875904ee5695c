"""Token-grain extraction eval (plans/eval.py::token_prf) and blocked
edit-distance near-dup (operators/dedup.py::fuzzy_pairs_edit)."""

from __future__ import annotations

from comic_text_detector_spark.operators.dedup import fuzzy_pairs_edit
from comic_text_detector_spark.plans.eval import token_prf


def test_token_prf_multiset(spark):
    gold = spark.createDataFrame(
        [("u1", "a a b"), ("u2", "x y z"), ("u3", "k k"), ("u4", "")],
        "url string, text string",
    )
    pred = spark.createDataFrame(
        [("u1", "a b b"), ("u2", "x y z"), ("u3", ""), ("u4", "")],
        "url string, text string",
    )
    got = {r.url: r for r in token_prf(gold, pred).collect()}
    # multiset: min(2,1) for 'a' + min(1,2) for 'b' = 2 of 3
    assert (got["u1"].inter_n, got["u1"].gold_n, got["u1"].pred_n) == (2, 3, 3)
    assert got["u1"].p_micro == got["u1"].r_micro == 666666
    assert got["u1"].f1_micro == 666666
    # perfect extraction
    assert got["u2"].p_micro == got["u2"].r_micro == got["u2"].f1_micro == 1000000
    # empty prediction: honest zeros, not a crash or a drop
    assert (got["u3"].p_micro, got["u3"].r_micro, got["u3"].f1_micro) == (0, 0, 0)
    # both sides empty: no row at all (drop-not-fake)
    assert "u4" not in got


def test_token_prf_asymmetric(spark):
    gold = spark.createDataFrame([("u", "a b c d")], "url string, text string")
    pred = spark.createDataFrame([("u", "a b")], "url string, text string")
    (r,) = token_prf(gold, pred).collect()
    assert r.p_micro == 1000000 and r.r_micro == 500000
    # f1 = 2pr/(p+r) = 2*1e6*5e5/(1.5e6) = 666666 (floor)
    assert r.f1_micro == 666666


def test_fuzzy_pairs_edit(spark):
    rows = [
        (0, "g0", "title alpha beta"),
        (1, "g0", "title alphq beta"),   # 1 substitution from id 0
        (2, "g0", "title alph beta"),    # 1 deletion from id 0
        (3, "g0", "completely different thing"),
        (4, "g1", "title alpha beta"),   # same text, OTHER block: no pair
        (5, "g1", "zzzz"),
    ]
    df = spark.createDataFrame(rows, "id long, blk string, t string")
    pairs = {
        (r.id_a, r.id_b): r.dist
        for r in fuzzy_pairs_edit(
            df, ["blk"], text_col="t", max_dist=2
        ).collect()
    }
    # (1,2): deleting the 'q' of alphq yields alph = 1 edit; id 3
    # pairs with nobody
    assert pairs == {(0, 1): 1, (0, 2): 1, (1, 2): 1}


def test_fuzzy_pairs_length_prefilter(spark):
    # strings whose length gap alone exceeds max_dist are cut before
    # levenshtein ever runs
    df = spark.createDataFrame(
        [(0, "b", "ab"), (1, "b", "abcdefgh")], "id long, blk string, t string"
    )
    assert fuzzy_pairs_edit(df, ["blk"], text_col="t", max_dist=2).count() == 0


def test_pair_prf(spark):
    from comic_text_detector_spark.plans.eval import pair_prf

    found = spark.createDataFrame(
        [(1, 2), (3, 4), (6, 5)], "id_a long, id_b long"
    )
    truth = spark.createDataFrame(
        [(2, 1), (5, 6), (7, 8)], "id_a long, id_b long"
    )
    (r,) = pair_prf(found, truth).collect()
    # (1,2) and (5,6) match despite orientation; (3,4) is fp; (7,8) fn
    assert (r.tp, r.fp, r.fn) == (2, 1, 1)
    assert r.p_micro == r.r_micro == 666666
    assert r.f1_micro == 666666


def test_pair_prf_empty_sides(spark):
    from comic_text_detector_spark.plans.eval import pair_prf

    pairs = spark.createDataFrame([(1, 2)], "id_a long, id_b long")
    empty = spark.createDataFrame([], "id_a long, id_b long")
    (r,) = pair_prf(empty, pairs).collect()
    assert (r.tp, r.fp, r.fn) == (0, 0, 1)
    assert r.p_micro == r.r_micro == r.f1_micro == 0
