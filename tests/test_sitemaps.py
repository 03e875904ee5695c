"""Sitemap parsing (functions/sitemaps.py)."""

from __future__ import annotations

from comic_text_detector_spark.functions.sitemaps import parse_sitemap

URLSET = (
    '<?xml version="1.0" encoding="UTF-8"?>\n'
    '<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">\n'
    " <url><loc>https://ex.com/a?x=1&amp;y=2</loc>"
    "<lastmod>2025-03-01</lastmod><changefreq>Daily</changefreq>"
    "<priority>0.8</priority></url>\n"
    " <url><loc> https://ex.com/b </loc></url>\n"
    " <url><lastmod>2025-01-01</lastmod></url>\n"  # no loc: dropped
    "</urlset>"
)

INDEX = (
    "<sitemapindex><sitemap><loc>https://ex.com/s1.xml</loc>"
    "<lastmod>2025-02-02T10:00:00Z</lastmod></sitemap>"
    "<sitemap><loc>https://ex.com/s2.xml</loc></sitemap></sitemapindex>"
)


def _rows(spark, payloads):
    df = spark.createDataFrame(payloads, "url string, xml string")
    return parse_sitemap(df).collect()


def test_urlset_entries(spark):
    rows = sorted(_rows(spark, [("m", URLSET)]), key=lambda r: r.entry_idx)
    assert len(rows) == 2  # the loc-less entry is dropped
    a, b = rows
    assert not a.is_index
    assert a.loc == "https://ex.com/a?x=1&y=2"  # entity-decoded
    assert a.lastmod == "2025-03-01"
    assert a.changefreq == "daily" and a.priority == 0.8
    assert b.loc == "https://ex.com/b"  # whitespace trimmed
    assert b.lastmod is None and b.priority is None


def test_index_entries_and_non_sitemap(spark):
    rows = _rows(spark, [("i", INDEX), ("junk", "<html>not a map</html>")])
    assert all(r.sitemap_url == "i" for r in rows)  # junk yields no rows
    assert sorted(r.loc for r in rows) == [
        "https://ex.com/s1.xml",
        "https://ex.com/s2.xml",
    ]
    assert all(r.is_index for r in rows)
    assert rows[0].lastmod == "2025-02-02T10:00:00Z"


def test_bad_priority_and_root_not_entry(spark):
    xml = (
        "<urlset><url><loc>https://e/x</loc>"
        "<priority>high</priority></url></urlset>"
    )
    (r,) = _rows(spark, [("m", xml)])
    assert r.priority is None and r.loc == "https://e/x"
