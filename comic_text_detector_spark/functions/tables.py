"""HTML table extraction — structured (url, table_idx, row_idx, cells)
rows from raw page bytes, the extraction-tier leg that turns tabular
page content into relational data a corpus pipeline can query (stats
tables, wiki infoboxes, product grids).

Reference analog: the detector's grouping of per-page boxes into
ordered TextBlock lines (``basemodel.py``'s group/sort stage) — here
the DOM's own <table>/<tr>/<td> lattice *is* the grouping, so the
operator only has to read it off, not infer it.

Pure column expressions (split on close tags + negated-class /
``(?is)`` regexp extraction, both-dialect-safe so the DuckDB oracle
replays it verbatim): zero shuffles, runs inside the scan projection.
Discipline and scope, stated explicitly:

* WELL-FORMED, NON-NESTED tables: each ``</table>`` close delimits one
  table, each ``</tr>`` one row, each ``</td>``/``</th>`` one cell.
  A nested inner table's close tag ends the chunk early, so nested
  markup yields garbled-but-deterministic rows — real crawl pipelines
  route nested tables to the full DOM tokenizer (``functions.html``);
  this fast path is for the overwhelmingly common flat case.
* ``table_idx``/``row_idx`` are the ordinals of the close tags; chunks
  with no matching open tag (the trailer after the last close, or
  stray closes) are dropped, never fabricated.
* Cell text: tags stripped (``<[^>]*>`` → space), entities decoded,
  whitespace collapsed, trimmed — an empty ``<td></td>`` survives as
  ``''`` (it is a real cell), a chunk with no ``<td``/``<th`` open tag
  is not a cell at all.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

TABLE_BODY = "(?is)<table[^>]*>(.*)$"
ROW_BODY = "(?is)<tr[^>]*>(.*)$"
CELL_OPEN = "(?is)<t[dh][^>]*>"
CELL_BODY = "(?is)<t[dh][^>]*>(.*)$"


def _cell_text(raw):
    """Strip tags → decode &apos;/&amp; (the shared two-entity set,
    &amp; last) → collapse whitespace → trim."""
    no_tags = F.regexp_replace(raw, "<[^>]*>", " ")
    decoded = F.replace(
        F.replace(no_tags, F.lit("&apos;"), F.lit("'")),
        F.lit("&amp;"),
        F.lit("&"),
    )
    return F.trim(F.regexp_replace(decoded, r"\s+", " "))


def extract_tables(
    df: DataFrame, url_col: str = "url", html_col: str = "html"
) -> DataFrame:
    """One output row per <tr> of every <table> in each page:
    (url, table_idx, row_idx, is_header, n_cells, cells).

    * ``is_header`` — the row contains at least one <th> cell.
    * ``cells`` — array<string> of cleaned cell texts, <td> and <th>
      alike, in document order.

    Two chained posexplodes over split arrays — still zero shuffles
    (explode is a map-side generator), so the operator scales exactly
    like the scan it rides on; at 10^12 documents the only cost is the
    regexp work inside the projection."""
    h = F.col(html_col).cast("string")
    tables = df.select(
        F.col(url_col).alias("url"),
        F.posexplode(F.split(h, "(?i)</table>")).alias("table_idx", "tc"),
    ).select(
        "url",
        "table_idx",
        F.regexp_extract(F.col("tc"), TABLE_BODY, 1).alias("body"),
    )
    rows = tables.filter(F.col("body") != "").select(
        "url",
        "table_idx",
        F.posexplode(F.split(F.col("body"), "(?i)</tr>")).alias(
            "row_idx", "rc"
        ),
    )
    rowhtml = F.regexp_extract(F.col("rc"), ROW_BODY, 1)
    cells_raw = F.filter(
        F.split(rowhtml, "(?i)</t[dh]>"),
        lambda c: c.rlike(CELL_OPEN),
    )
    cells = F.transform(
        cells_raw,
        lambda c: _cell_text(F.regexp_extract(c, CELL_BODY, 1)),
    )
    return (
        rows.filter(F.col("rc").rlike("(?is)<tr[^>]*>"))
        .select(
            "url",
            "table_idx",
            "row_idx",
            F.col("rc").rlike("(?is)<th[^>]*>").alias("is_header"),
            F.size(cells).alias("n_cells"),
            cells.alias("cells"),
        )
    )


# ---------------------------------------------------------------------------
# Heading outline: the document's declared section structure, for
# structure-aware training-data chunking (split at h2 boundaries
# instead of blind windows — operators/packing.py::chunk_sliding is
# the blind complement) and for corpus audits (title-vs-h1 drift).

HEADING_CHUNK = "(?is)<h([1-6])[^>]*>(.*)$"


def extract_headings(
    df: DataFrame, url_col: str = "url", html_col: str = "html"
) -> DataFrame:
    """One row per <h1>–<h6>: (url, heading_idx, level, text), in
    document order. Same close-tag-split generator as
    ``extract_tables`` (zero shuffles, map-side explode); heading text
    gets the shared tag-strip + entity decode + whitespace collapse,
    and an empty heading survives as '' (it is a real element).
    ``heading_idx`` is the ordinal of the close tag; chunks without a
    matching open tag are dropped, never fabricated. The level is read
    from the OPEN tag — a mismatched </h3> closing an <h2> ends the
    chunk early (garbled-but-deterministic, like nested tables)."""
    h = F.col(html_col).cast("string")
    chunks = df.select(
        F.col(url_col).alias("url"),
        F.posexplode(F.split(h, "(?i)</h[1-6]>")).alias(
            "heading_idx", "hc"
        ),
    )
    level = F.regexp_extract(F.col("hc"), HEADING_CHUNK, 1)
    body = F.regexp_extract(F.col("hc"), HEADING_CHUNK, 2)
    return chunks.filter(level != "").select(
        "url",
        "heading_idx",
        level.cast("int").alias("level"),
        _cell_text(body).alias("text"),
    )


SECTION_CHUNK = "(?is)^(.*?)</h([1-6])>(.*)$"


def section_chunks(
    df: DataFrame, url_col: str = "url", html_col: str = "html"
) -> DataFrame:
    """Section-grain document chunks: (url, section_idx, level,
    heading, body) — the structure-aware alternative to blind
    ``chunk_sliding`` windows for training-data assembly.

    Split on heading OPEN tags, so every chunk k ≥ 1 is
    'heading</hN> body…': heading and level come from the chunk's own
    close tag, body is everything after it (tag-stripped, entity-
    decoded, whitespace-collapsed). Chunk 0 is the preamble — emitted
    with NULL heading/level when it has any text (content before the
    first heading is real content). A chunk whose close tag never
    comes (malformed nesting) is dropped, never guessed. One split +
    one map-side explode: zero shuffles, linear in page bytes."""
    h = F.col(html_col).cast("string")
    chunks = df.select(
        F.col(url_col).alias("url"),
        F.posexplode(F.split(h, "(?i)<h[1-6][^>]*>")).alias(
            "section_idx", "sc"
        ),
    )
    c = F.col("sc")
    head = F.regexp_extract(c, SECTION_CHUNK, 1)
    level = F.regexp_extract(c, SECTION_CHUNK, 2)
    body = F.regexp_extract(c, SECTION_CHUNK, 3)
    is_pre = F.col("section_idx") == 0
    pre_text = _cell_text(c)
    return chunks.filter(
        (is_pre & (pre_text != "")) | (~is_pre & (level != ""))
    ).select(
        "url",
        "section_idx",
        F.when(~is_pre, level.cast("int")).alias("level"),
        F.when(~is_pre, _cell_text(head)).alias("heading"),
        F.when(is_pre, pre_text).otherwise(_cell_text(body)).alias("body"),
    )
