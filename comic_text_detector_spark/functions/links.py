"""Hyperlink extraction from raw html — the crawl-graph feeder: (src,
href, anchor text, destination host) rows that downstream ops aggregate
(anchor-text signals) or fold into the link graph ``operators.graph.
pagerank`` scores for harvest prioritization.

Pure column expressions (regexp_extract_all + per-element regexp_extract
in the RE2 ∩ Java dialect, no lazy quantifiers), so extraction runs inside
the scan projection — zero shuffles of its own, and the DuckDB oracle
replays it verbatim. The pattern is deliberately the PRAGMATIC crawl
shape: double-quoted ``href`` attributes on ``<a>`` tags with untagged
anchor text — the overwhelming real-world case; exotic markup (unquoted
hrefs, nested tags inside the anchor) yields no row rather than a wrong
one, matching the extraction kernel's drop-not-fake discipline.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# a whole <a ... href="..." ...>anchor</a> element (both-dialect-safe:
# negated classes instead of lazy quantifiers). The attribute name is
# anchored at a space boundary — `([^>]* )?href=` / ` href=` — so that
# `data-href="a"` can never satisfy the `href` match (the unanchored
# `[^>]*href=` form silently extracted the WRONG attribute's value,
# violating drop-not-fake; the tag always starts '<a ' so a real href is
# always space-preceded inside the matched tag).
A_TAG = '<a ([^>]* )?href="[^">]*"[^>]*>[^<]*</a>'
HREF = ' href="([^">]*)"'
ANCHOR = '>([^<]*)</a>'
HOST = "^[a-zA-Z]+://([^/?#]+)"


def link_host(href: Column) -> Column:
    return F.regexp_extract(href, HOST, 1)


def extract_links(
    df: DataFrame, url_col: str = "url", html_col: str = "html"
) -> DataFrame:
    """(src_url, href, anchor, dst_host): one row per <a href> element in
    each page. ``html`` may be binary (cast to string) or string."""
    h = F.col(html_col).cast("string")
    tags = df.select(
        F.col(url_col).alias("src_url"),
        F.explode(
            F.regexp_extract_all(h, F.lit(A_TAG), F.lit(0))
        ).alias("tag"),
    )
    href = F.regexp_extract(F.col("tag"), HREF, 1)
    return tags.select(
        "src_url",
        href.alias("href"),
        F.regexp_extract(F.col("tag"), ANCHOR, 1).alias("anchor"),
        link_host(href).alias("dst_host"),
    )


def anchor_stats(
    links: DataFrame, dst_col: str = "dst_host"
) -> DataFrame:
    """Per-destination anchor-text aggregate: (dst, n_links,
    n_unique_anchors, top_anchor) — ``top_anchor`` is the most-frequent
    anchor, ties broken toward the lexicographically LAST (max-struct
    semantics; deterministic and oracle-replayable via ORDER BY c DESC,
    anchor DESC) — the classic anchor-text relevance signal."""
    counts = links.groupBy(dst_col, "anchor").agg(
        F.count("*").cast("long").alias("c")
    )
    ranked = counts.groupBy(dst_col).agg(
        F.sum("c").alias("n_links"),
        F.count("*").cast("long").alias("n_unique_anchors"),
        F.max(F.struct(F.col("c"), F.col("anchor").alias("a"))).alias("top"),
    )
    return ranked.select(
        dst_col,
        "n_links",
        "n_unique_anchors",
        F.col("top.a").alias("top_anchor"),
    )
