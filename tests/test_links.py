"""Hyperlink extraction + anchor aggregation (functions/links.py)."""

from __future__ import annotations

from comic_text_detector_spark.functions.links import (
    anchor_stats,
    extract_links,
)


def test_extract_links_planted(spark):
    html_a = (
        b'<html><body><a href="https://x.example/p">go here</a>'
        b'<a class="c" href="http://y.example:8080/q?z=1">and there</a>'
        b"<a href='unquoted.example'>single-quoted skipped</a>"
        b'<a href="relative/path">rel</a></body></html>'
    )
    df = spark.createDataFrame(
        [("u1", html_a), ("u2", b"<p>no links at all</p>"), ("u3", None)],
        "url string, html binary",
    )
    rows = extract_links(df).collect()
    by_href = {r.href: r for r in rows}
    assert set(by_href) == {
        "https://x.example/p", "http://y.example:8080/q?z=1", "relative/path",
    }
    assert by_href["https://x.example/p"].anchor == "go here"
    assert by_href["https://x.example/p"].dst_host == "x.example"
    assert by_href["http://y.example:8080/q?z=1"].dst_host == "y.example:8080"
    # relative href → no scheme → empty host (caller resolves/filters)
    assert by_href["relative/path"].dst_host == ""
    assert all(r.src_url == "u1" for r in rows)


def test_data_href_not_mistaken_for_href(spark):
    """Drop-not-fake (advice finding): `data-href="a"` must never satisfy
    the href match — the attribute name is anchored at a space boundary,
    so the real href wins and a tag with ONLY data-href yields no row."""
    df = spark.createDataFrame(
        [("u", b'<a data-href="decoy" href="https://real.example/p">x</a>'
              b'<a data-href="only-decoy">y</a>'
              b'<a href="https://plain.example/q">z</a>')],
        "url string, html binary",
    )
    rows = extract_links(df).collect()
    assert sorted(r.href for r in rows) == [
        "https://plain.example/q", "https://real.example/p",
    ]
    by_href = {r.href: r for r in rows}
    assert by_href["https://real.example/p"].anchor == "x"
    assert by_href["https://real.example/p"].dst_host == "real.example"


def test_anchor_stats_counts_and_tiebreak(spark):
    links = spark.createDataFrame(
        [
            ("a", "h1", "click"),
            ("b", "h1", "click"),
            ("c", "h1", "zz"),
            ("d", "h1", "aa"),
            ("e", "h2", "x"),
            ("f", "h2", "y"),  # tie at 1 → lexicographically last wins
        ],
        "src_url string, dst_host string, anchor string",
    )
    out = {r.dst_host: r for r in anchor_stats(links).collect()}
    assert out["h1"].n_links == 4
    assert out["h1"].n_unique_anchors == 3
    assert out["h1"].top_anchor == "click"
    assert out["h2"].top_anchor == "y"


def test_href_containing_gt_yields_no_row(spark):
    """Drop-not-fake (review finding): a '>' inside the href value must
    yield NO row, not a corrupted anchor."""
    df = spark.createDataFrame(
        [("u", b'<a href="https://x.example/a>b">click</a>'
              b'<a href="https://ok.example/p">fine</a>')],
        "url string, html binary",
    )
    rows = extract_links(df).collect()
    assert [r.href for r in rows] == ["https://ok.example/p"]
