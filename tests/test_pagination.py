"""Paginated-article stitching (operators/pagination.py)."""

from __future__ import annotations

from comic_text_detector_spark.operators.pagination import (
    extract_rel_next,
    stitch_pagination,
)


def test_extract_rel_next_forms(spark):
    df = spark.createDataFrame(
        [
            ("http://s/a1", '<link rel="next" href="http://s/a2">'),
            ("http://s/a2", '<a href="/a3?p=3&amp;x=1" rel="next">more</a>'),
            ("http://s/a3", "<p>last page, no next</p>"),
            ("http://s/self", '<link rel="next" href="http://s/self">'),
            ("http://s/rel", '<link rel="next" href="page2.html">'),
        ],
        "url string, html string",
    )
    got = {r.url: r.next_url for r in extract_rel_next(df).collect()}
    assert got == {
        "http://s/a1": "http://s/a2",
        # root-relative resolved, entity decoded
        "http://s/a2": "http://s/a3?p=3&x=1",
        # self-loop and non-root-relative forms dropped, never guessed
    }


def test_stitch_pagination_chain(spark):
    pages = spark.createDataFrame(
        [
            ("http://s/a1", "one"),
            ("http://s/a2", "two"),
            ("http://s/a3", "three"),
            ("http://s/solo", "alone"),
        ],
        "url string, text string",
    )
    nexts = spark.createDataFrame(
        [
            ("http://s/a1", "http://s/a2"),
            ("http://s/a2", "http://s/a3"),
            # next points OUTSIDE the corpus: chain ends at what we have
            ("http://s/a3", "http://s/a4-missing"),
        ],
        "url string, next_url string",
    )
    rows = stitch_pagination(pages, nexts).collect()
    assert len(rows) == 1
    (r,) = rows
    assert r.root_url == "http://s/a1"
    assert r.text == "one\ntwo\nthree"
    assert r.n_pages == 3 and not r.truncated


def test_stitch_pagination_cycle_truncates(spark):
    pages = spark.createDataFrame(
        [("r", "start"), ("x", "loop1"), ("y", "loop2")],
        "url string, text string",
    )
    nexts = spark.createDataFrame(
        [("r", "x"), ("x", "y"), ("y", "x")],
        "url string, next_url string",
    )
    (row,) = stitch_pagination(pages, nexts, max_hops=5).collect()
    assert row.root_url == "r" and row.truncated
    # the cycle contributes bounded members, never an infinite loop
    assert row.text.startswith("start\nloop1\nloop2")


def test_stitch_pagination_branch_determinism(spark):
    # broken markup: one page declares two nexts -> smallest wins
    pages = spark.createDataFrame(
        [("r", "a"), ("p1", "b"), ("p2", "c")], "url string, text string"
    )
    nexts = spark.createDataFrame(
        [("r", "p2"), ("r", "p1")], "url string, next_url string"
    )
    (row,) = stitch_pagination(pages, nexts).collect()
    assert row.text == "a\nb" and row.n_pages == 2
