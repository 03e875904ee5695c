"""JSON-LD structured-data extraction — the schema.org sidecar blocks
(`<script type="application/ld+json">`) that carry article/product
metadata in machine-readable form. A corpus pipeline reads these for
publication dates, authorship and content typing that the visible HTML
often lacks; an index pipeline keys previews off them.

Same fast-path shape as ``functions.tables``: split on the close tag,
regexp-extract the block body, then JVM-side ``get_json_object`` for
the fields — pure column expressions, zero shuffles, zero Python, and
the DuckDB oracle predicts every row from the fixture arithmetic.

Discipline:

* ``block_idx`` is the ordinal of the ``</script>`` close among ALL
  scripts on the page (the same close-tag-ordinal convention as
  ``extract_tables``); non-JSON-LD scripts are filtered out, so
  ordinals may skip — deterministic, never renumbered.
* A malformed JSON body keeps its row with ``valid=false`` and NULL
  fields (the block EXISTS — that is a fact about the page — but no
  field value is fabricated from broken JSON).
* Top-level fields only: ``@graph`` arrays and nested entity
  resolution belong to a full JSON-LD processor, not the scan
  projection; such blocks simply yield NULLs for the absent top-level
  keys. ``author`` is read at both ``$.author.name`` (object form) and
  ``$.author`` (bare-string form), object form preferred.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

LDJSON_OPEN = '(?is)<script [^>]*application/ld\\+json[^>]*>'
LDJSON_BODY = '(?is)<script [^>]*application/ld\\+json[^>]*>(.*)$'


def _jfield(body: Column, path: str) -> Column:
    return F.get_json_object(body, path)


def extract_jsonld(
    df: DataFrame, url_col: str = "url", html_col: str = "html"
) -> DataFrame:
    """One row per JSON-LD block per page: (url, block_idx, valid,
    ld_type, name, headline, author_name, date_published, description).

    One map-side posexplode over the script split — zero shuffles; at
    10^12 documents the only cost is the regexp + JSON parse inside
    the projection."""
    h = F.col(html_col).cast("string")
    blocks = df.select(
        F.col(url_col).alias("url"),
        F.posexplode(F.split(h, "(?i)</script>")).alias("block_idx", "sc"),
    ).filter(F.col("sc").rlike(LDJSON_OPEN))
    body = F.regexp_extract(F.col("sc"), LDJSON_BODY, 1)
    author = F.coalesce(
        _jfield(body, "$.author.name"), _jfield(body, "$.author")
    )
    return blocks.select(
        "url",
        "block_idx",
        _jfield(body, "$").isNotNull().alias("valid"),
        _jfield(body, "$['@type']").alias("ld_type"),
        _jfield(body, "$.name").alias("name"),
        _jfield(body, "$.headline").alias("headline"),
        author.alias("author_name"),
        _jfield(body, "$.datePublished").alias("date_published"),
        _jfield(body, "$.description").alias("description"),
    )
