"""Sitemap parsing — the crawl-discovery leg beside robots.txt and
RSS/Atom feeds: turn ``sitemap.xml`` / sitemap-index payloads into
(sitemap_url, entry_idx, is_index, loc, lastmod, changefreq, priority)
rows a frontier scheduler can consume directly
(``operators/curation.py::schedule_frontier``).

Reference analog: the detector's directory scan enumerating the work
list before the per-image loop (``inference.py:28``); here the site
publishes the work list itself and the operator reads it off.

Pure column expressions (close-tag split + ``(?is)`` regexp
extraction, the ``functions/tables.py`` idiom): zero shuffles, zero
Python, runs inside the scan projection. Discipline:

* The document kind is decided by the ROOT element: ``<sitemapindex``
  → ``is_index=true`` and ``<sitemap>`` entries; ``<urlset`` →
  ``is_index=false`` and ``<url>`` entries. A payload with neither
  root yields no rows (it is not a sitemap — never guess).
* ``<loc>`` is REQUIRED per sitemaps.org — an entry without it is
  dropped, never fabricated. ``&amp;``/``&apos;`` in loc are decoded
  (the protocol mandates entity-escaping URLs).
* ``lastmod`` stays the raw W3C-datetime string (callers compare
  lexicographically — the format sorts); ``changefreq`` lowercased;
  ``priority`` cast to double, NULL when absent or non-numeric.
* Namespace-prefixed element names (``<sm:url>``) are out of scope:
  prefixed entries simply don't match and are dropped —
  deterministic, documented, and vanishingly rare in real crawls.
* Gzipped sitemaps (``.xml.gz``) must be routed through
  ``functions/http.py::decode_gzip_body`` first; this operator takes
  decoded text.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# entry body: the open tag must be exactly <url ...> / <sitemap ...> —
# `<urlset`/`<sitemapindex` fail the (\s[^>]*)?> arm, so the root tag
# can never be mistaken for an entry.
URL_BODY = r"(?is)<url(\s[^>]*)?>(.*)$"
SITEMAP_BODY = r"(?is)<sitemap(\s[^>]*)?>(.*)$"


def _field(body: Column, name: str) -> Column:
    v = F.regexp_extract(body, f"(?is)<{name}[^>]*>\\s*(.*?)\\s*</{name}>", 1)
    return F.when(v != "", v)


def _decode(c: Column) -> Column:
    return F.replace(
        F.replace(c, F.lit("&apos;"), F.lit("'")), F.lit("&amp;"), F.lit("&")
    )


def parse_sitemap(
    df: DataFrame, url_col: str = "url", xml_col: str = "xml"
) -> DataFrame:
    """One output row per <url> (urlset) or <sitemap> (index) entry:
    (sitemap_url, entry_idx, is_index, loc, lastmod, changefreq,
    priority).

    One posexplode over a close-tag split — a map-side generator, so
    the operator scales exactly like the scan; the 10^12-row cost is
    the regexp work alone."""
    x = F.col(xml_col).cast("string")
    is_index = x.rlike(r"(?is)<sitemapindex[\s>]")
    is_urlset = x.rlike(r"(?is)<urlset[\s>]")
    close = F.when(is_index, F.lit("(?i)</sitemap>")).otherwise(
        F.lit("(?i)</url>")
    )
    entries = df.filter(is_index | is_urlset).select(
        F.col(url_col).alias("sitemap_url"),
        is_index.alias("is_index"),
        F.posexplode(F.split(x, close)).alias("entry_idx", "chunk"),
    )
    body = F.when(
        F.col("is_index"),
        F.regexp_extract(F.col("chunk"), SITEMAP_BODY, 2),
    ).otherwise(F.regexp_extract(F.col("chunk"), URL_BODY, 2))
    loc = _field(body, "loc")
    prio_s = F.coalesce(_field(body, "priority"), F.lit(""))
    return (
        entries.select(
            "sitemap_url",
            "entry_idx",
            "is_index",
            _decode(loc).alias("loc"),
            _field(body, "lastmod").alias("lastmod"),
            F.lower(_field(body, "changefreq")).alias("changefreq"),
            F.when(
                prio_s.rlike(r"^[0-9]+(\.[0-9]+)?$"),
                prio_s.cast("double"),
            ).alias("priority"),
        )
        .filter(F.col("loc").isNotNull())
    )
