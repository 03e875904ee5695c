"""Redirect-chain resolution (operators/redirects.py)."""

from __future__ import annotations

from comic_text_detector_spark.operators.redirects import resolve_redirects

FETCHES = [
    # 2-hop chain: a -> b -> c(200)
    ("https://h/a", 301, "https://h/b"),
    ("https://h/b", 302, "/c"),  # root-relative Location
    ("https://h/c", 200, None),
    # 1-hop to an UNFETCHED target
    ("https://h/d", 301, "https://other/x"),
    # 2-cycle: e <-> f (never terminates)
    ("https://h/e", 301, "https://h/f"),
    ("https://h/f", 301, "https://h/e"),
    # broken redirect: relative non-root Location
    ("https://h/g", 302, "next.html"),
    # plain rows
    ("https://h/p", 200, None),
    ("https://h/q", 404, None),
]


def _res(spark, max_hops=4):
    df = spark.createDataFrame(
        FETCHES, "url string, status int, location string"
    )
    return {r.url: r for r in resolve_redirects(df, max_hops).collect()}


def test_chain_loop_broken_plain(spark):
    r = _res(spark)
    a = r["https://h/a"]
    assert (a.final_url, a.n_hops, a.terminal_status, a.resolved) == (
        "https://h/c", 2, 200, True,
    )
    b = r["https://h/b"]
    assert b.final_url == "https://h/c" and b.n_hops == 1 and b.resolved
    d = r["https://h/d"]
    assert d.final_url == "https://other/x" and d.n_hops == 1
    assert d.terminal_status is None and d.resolved  # unfetched target
    e = r["https://h/e"]
    assert e.n_hops == 4 and not e.resolved  # cycle: capped, unresolved
    assert e.final_url in ("https://h/e", "https://h/f")
    g = r["https://h/g"]
    assert (g.final_url, g.n_hops, g.resolved) == ("https://h/g", 0, False)
    assert g.terminal_status == 302
    p = r["https://h/p"]
    assert (p.final_url, p.terminal_status, p.resolved) == (
        "https://h/p", 200, True,
    )
    assert r["https://h/q"].terminal_status == 404


def test_hop_cap_one(spark):
    r = _res(spark, max_hops=1)
    a = r["https://h/a"]
    # a's frontier after 1 hop is b, which still redirects: unresolved
    assert a.final_url == "https://h/b" and a.n_hops == 1 and not a.resolved
    # b -> c settles within the cap (c has no outgoing edge)
    assert r["https://h/b"].resolved


def test_row_count_conservation(spark):
    df = spark.createDataFrame(
        FETCHES, "url string, status int, location string"
    )
    out = resolve_redirects(df, 4)
    assert out.count() == len(FETCHES)
    assert out.select("url").distinct().count() == len(FETCHES)
