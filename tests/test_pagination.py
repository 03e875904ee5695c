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


def test_extract_rel_next_boundary_and_protocol_relative(spark):
    df = spark.createDataFrame(
        [
            # data-rel must NOT fabricate an edge
            ("http://s/d", '<a data-rel="next" href="http://t/x">t</a>'),
            # data-href swallowed by an unanchored regex would mis-pick
            ("http://s/e",
             '<a data-href="http://bad/x" rel="next" href="/ok">n</a>'),
            # protocol-relative resolves against the scheme alone
            ("https://s/f", '<link rel="next" href="//cdn.s.com/f2">'),
            # entity decode shares links.py's definition (&apos; too)
            ("http://s/g", '<link rel="next" href="/p?q=a&apos;b">'),
        ],
        "url string, html string",
    )
    got = {r.url: r.next_url for r in extract_rel_next(df).collect()}
    assert "http://s/d" not in got
    assert got["http://s/e"] == "http://s/ok"
    assert got["https://s/f"] == "https://cdn.s.com/f2"
    assert got["http://s/g"] == "http://s/p?q=a'b"


def test_stitch_rootless_cycle_surfaces(spark):
    # a->b->a with no entry: both pages must SURVIVE as single-page
    # truncated rows, not vanish
    pages = spark.createDataFrame(
        [("a", "one"), ("b", "two")], "url string, text string"
    )
    nexts = spark.createDataFrame(
        [("a", "b"), ("b", "a")], "url string, next_url string"
    )
    got = {r.root_url: r for r in stitch_pagination(pages, nexts).collect()}
    assert set(got) == {"a", "b"}
    assert all(r.truncated and r.n_pages == 1 for r in got.values())
    assert got["a"].text == "one" and got["b"].text == "two"
