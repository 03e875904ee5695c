"""BM25 scoring (operators/retrieval.py): hand-computed planted values,
ranking sanity, length normalization, contracts."""

from __future__ import annotations

import math

import pytest

from comic_text_detector_spark.operators.retrieval import bm25_score


def _corpus(spark):
    return spark.createDataFrame(
        [
            ("hit2", "apple banana apple cherry"),
            ("hit1", "apple date elderberry fig grape"),
            ("miss", "kiwi lemon mango"),
            ("short", "apple"),
            ("empty", ""),
        ],
        "doc_id string, text string",
    )


def test_bm25_hand_computed(spark):
    out = {r.doc_id: r for r in
           bm25_score(_corpus(spark), ("apple", "banana")).collect()}
    # corpus stats: docs with tokens: 4 (empty excluded), total tokens 13
    n, avgdl = 4, 13 / 4
    k1, b = 1.2, 0.75

    def term(tf, df, dl):
        idf = math.log((n - df + 0.5) / (df + 0.5) + 1.0)
        return round(
            idf * (tf * (k1 + 1.0)) / (tf + k1 * (1 - b + b * dl / avgdl))
            * 1e6
        )

    # hit2: apple tf=2 df=3 dl=4; banana tf=1 df=1 dl=4
    want = (term(2, 3, 4) + term(1, 1, 4)) / 1e6
    assert abs(out["hit2"].score - want) < 1e-9
    assert out["hit2"].n_hit_terms == 2 and out["hit2"].dl == 4
    # miss and empty absent
    assert set(out) == {"hit2", "hit1", "short"}
    # short doc with same tf beats longer doc (length normalization)
    assert out["short"].score > out["hit1"].score


def test_bm25_ranking_and_contracts(spark):
    with pytest.raises(ValueError):
        bm25_score(_corpus(spark), ())
    empty = spark.createDataFrame(
        [("a", ""), ("b", None)], "doc_id string, text string"
    )
    with pytest.raises(ValueError):
        bm25_score(empty, ("x",))
    # rarer term outranks common term at equal tf/dl
    docs = spark.createDataFrame(
        [("r", "rare zz zz"), ("c", "common zz zz")]
        + [(f"f{i}", "common pad pad") for i in range(8)],
        "doc_id string, text string",
    )
    out = {r.doc_id: r.score
           for r in bm25_score(docs, ("rare", "common")).collect()}
    assert out["r"] > out["c"]
