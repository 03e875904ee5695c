"""Markdown structure parsing — fenced code blocks, ATX headings,
inline links, and a plain-text projection, all as pure column
expressions over raw markdown strings.

Web corpora are full of markdown (READMEs, forum posts, docs sites,
GitHub-flavoured issue bodies); a curation pipeline needs to (a) pull
code out of prose before token statistics and language ID lie about
the document, and (b) flatten the remaining markup the same way the
HTML path flattens tags. Reference analog: the detector separates
text-block regions from background before OCR-ing them
(``basemodel.py``'s det→seg split) — here the fence lattice *is* the
region boundary, so the operator reads it off rather than inferring
it.

Engine discipline (same contract as ``functions/tables.py``):

* Pure ``split``/``regexp`` column expressions, zero Python, zero
  shuffles — every operator here runs inside the scan projection and
  scales exactly like the scan at 10^12 documents.
* Drop, never fabricate: an unterminated trailing fence emits no code
  row; a 7+-``#`` line is not a heading (CommonMark 4.2); a ``[text]``
  with no ``(href)`` is not a link.
* Both-dialect-safe regexes so the DuckDB oracle replays the same
  algebra verbatim.

Fence model: split on the literal ```` ``` ```` delimiter; chunks at
odd split positions are fence interiors IFF a closing delimiter
follows (odd position < last position). The first interior line is
the CommonMark info string — its first word, lowercased, is ``lang``;
the remainder after the first newline is ``code`` verbatim (no
whitespace mangling: code is payload, not prose). Indented (4-space)
code blocks are out of scope — real pipelines route those through the
fence-less plain-text path, same trade as tables.py's non-nested
scope.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# first word of the info string: letters/digits and the common
# language-tag punctuation (c++, c#, objective-c, node.js)
INFO_WORD = r"^[ \t]*([A-Za-z0-9_+#.-]*)"
# ATX heading: 1-6 #'s then space-or-EOL; captures run + remainder
ATX = r"^(#{1,6})([ \t].*)?$"
# inline link/image: optional '!', non-nested [text](href) with an
# href that stops at whitespace or ')' (CommonMark destination core)
LINK = r"(!?)\[([^\]]*)\]\(([^()\s]*)\)"


def extract_code_fences(
    df: DataFrame, url_col: str = "url", md_col: str = "md"
) -> DataFrame:
    """One row per CLOSED fenced code block: (url, fence_idx, lang,
    code).

    * ``fence_idx`` — ordinal of the fence among closed fences (0-based
      document order).
    * ``lang`` — lowercased first word of the info string, '' when the
      fence has none.
    * ``code`` — bytes after the info-string line, verbatim; '' for a
      fence whose interior has no newline (info string only).

    split → posexplode is a map-side generator: zero exchanges."""
    md = F.col(md_col).cast("string")
    parts = df.select(
        F.col(url_col).alias("url"),
        F.size(F.split(md, "```")).alias("n"),
        F.posexplode(F.split(md, "```")).alias("pos", "chunk"),
    )
    inside = parts.filter(
        (F.col("pos") % 2 == 1) & (F.col("pos") < F.col("n") - 1)
    )
    c = F.col("chunk")
    has_nl = F.instr(c, "\n") > 0
    return inside.select(
        "url",
        ((F.col("pos") - 1) / 2).cast("int").alias("fence_idx"),
        F.lower(
            F.regexp_extract(
                F.when(has_nl, F.substring_index(c, "\n", 1)).otherwise(c),
                INFO_WORD,
                1,
            )
        ).alias("lang"),
        F.when(
            has_nl, F.expr("substring(chunk, instr(chunk, '\\n') + 1)")
        )
        .otherwise(F.lit(""))
        .alias("code"),
    )


def strip_fences(md):
    """Column expr: markdown with every fence interior removed (even
    split positions re-joined with a space — the prose skeleton). An
    unterminated trailing fence is ALSO removed: it is code, not
    prose, even without its closing delimiter."""
    return F.array_join(
        F.filter(F.split(md, "```"), lambda _, i: i % 2 == 0), " "
    )


def markdown_outline(
    df: DataFrame, url_col: str = "url", md_col: str = "md"
) -> DataFrame:
    """ATX headings: (url, line_idx, level, text).

    * ``line_idx`` — a stable shuffle-free ordinal encoded as
      ``prose_chunk_pos · 100000 + line_pos_within_chunk``: monotone in
      document order for chunks under 100k lines (beyond that, ordering
      across chunks can interleave — still deterministic, and consumers
      needing a dense heading ordinal window over it either way).
    * ``level`` — length of the leading ``#`` run (1-6; a 7+ run is
      not a heading and emits nothing).
    * ``text`` — remainder with the optional ATX closing ``#`` run and
      surrounding whitespace stripped; a bare ``##`` line is a real
      empty heading (CommonMark 4.2 example 79).

    Fence interiors are stripped FIRST so a ``# comment`` inside code
    can never fabricate a heading — but fence removal joins chunks
    with a space, which would glue prose lines; headings therefore
    come from per-chunk line splits via a two-level explode."""
    md = F.col(md_col).cast("string")
    # explode prose chunks (even positions), then lines within each;
    # line_idx = running line offset: chunk-local pos is enough for
    # ordering because chunk order is preserved in (pos, line_pos)
    parts = df.select(
        F.col(url_col).alias("url"),
        F.size(F.split(md, "```")).alias("n"),
        F.posexplode(F.split(md, "```")).alias("pos", "chunk"),
    ).filter(F.col("pos") % 2 == 0)
    lines = parts.select(
        "url",
        "pos",
        F.posexplode(F.split(F.col("chunk"), "\n")).alias("lpos", "line"),
    )
    run = F.regexp_extract(F.col("line"), ATX, 1)
    rest = F.regexp_extract(F.col("line"), ATX, 2)
    return (
        lines.filter(run != "")
        .select(
            "url",
            (F.col("pos") * 100000 + F.col("lpos")).alias("line_idx"),
            F.length(run).cast("int").alias("level"),
            F.trim(F.regexp_replace(rest, r"[ \t]+#+[ \t]*$", "")).alias(
                "text"
            ),
        )
    )


def markdown_links(
    df: DataFrame, url_col: str = "url", md_col: str = "md"
) -> DataFrame:
    """Inline links and images: (url, link_idx, is_image, text, href).

    ``link_idx`` is the match ordinal in document order. Autolinks
    (``<https://…>``) and reference-style ``[text][ref]`` links are
    out of scope (drop-not-fake); fence interiors are stripped first
    so code samples cannot fabricate links."""
    md = strip_fences(F.col(md_col).cast("string"))
    zipped = F.arrays_zip(
        F.regexp_extract_all(md, F.lit(LINK), 1).alias("bang"),
        F.regexp_extract_all(md, F.lit(LINK), 2).alias("text"),
        F.regexp_extract_all(md, F.lit(LINK), 3).alias("href"),
    )
    return df.select(
        F.col(url_col).alias("url"), F.posexplode(zipped).alias("link_idx", "m")
    ).select(
        "url",
        "link_idx",
        (F.col("m.bang") == "!").alias("is_image"),
        F.col("m.text").alias("text"),
        F.col("m.href").alias("href"),
    )


def markdown_to_text(
    df: DataFrame, url_col: str = "url", md_col: str = "md"
) -> DataFrame:
    """Plain-text projection: (url, text) with fences removed, images
    reduced to their alt text, links to their anchor text, ATX marker
    runs and emphasis/inline-code markers stripped, whitespace
    collapsed. The markdown sibling of the HTML path's tag-strip —
    feed the result to token stats / langid / quality scoring.

    Marker stripping is deliberately lexical (``*``/``_`` runs and
    backticks removed wherever they appear): resolving emphasis
    pairing is a parser's job; for corpus statistics the lexical strip
    is the standard trade (same rule Gopher/C4 preprocessing applies).
    One codegen projection, zero shuffles."""
    md = strip_fences(F.col(md_col).cast("string"))
    t = F.regexp_replace(md, LINK, "$2")  # image/link -> text/alt
    # ATX heading lines in ONE pass: leading marker run (1-6 #'s; a 7+
    # run is literal text and stays intact) and the optional closing
    # sequence ('## Sub ##' -> 'Sub', CommonMark 4.2) — anchored to
    # HEADING lines only, so prose like 'see footnote #' keeps its
    # trailing hashes
    t = F.regexp_replace(
        t,
        r"(?m)^[ \t]*#{1,6}(?:[ \t]+([^\n]*?))?(?:[ \t]+#+)?[ \t]*$",
        "$1",
    )
    t = F.regexp_replace(t, r"[*_`]+", "")  # emphasis / inline code
    t = F.trim(F.regexp_replace(t, r"\s+", " "))
    return df.select(F.col(url_col).alias("url"), t.alias("text"))


# ---------------------------------------------------------------------------
# programming-language heuristic for extracted code blocks

# (name, marker regex) in PRIORITY order — first maximal count wins.
# Markers are chosen to be mutually sharp, not exhaustive: this is a
# router for corpus mixing (code vs prose vs which-pile), not a
# classifier with recall guarantees. Unknown languages route to ''.
LANG_MARKERS = [
    ("python", r"\b(def |import |elif |self\.)"),
    ("javascript", r"(\bconst |\bfunction |=>|console\.log)"),
    ("java", r"(\bpublic (class|static) |System\.out|@Override)"),
    ("c", r"(#include\b|printf\(|\bmalloc\()"),
    ("sql", r"(?i)\b(select .* from|insert into|create table)\b"),
    ("shell", r"(^#!/bin/|\becho |\bfi\b|\$\{)"),
]


def code_lang_guess(
    df: DataFrame, code_col: str = "code"
) -> DataFrame:
    """Append (lang_guess, lang_hits): heuristic language of a code
    snippet by signature-marker count, ties broken by the fixed
    priority order above; '' when no marker fires. Pure
    ``regexp_count`` column exprs — one codegen projection."""
    c = F.col(code_col).cast("string")
    counts = [
        F.regexp_count(c, F.lit(pat)).alias(f"_n_{name}")
        for name, pat in LANG_MARKERS
    ]
    out = df.select("*", *counts)
    best = F.lit("")
    best_n = F.lit(0)
    # walk in REVERSE priority with a >= takeover: the last writer for
    # a tied count is the EARLIEST name in LANG_MARKERS, so priority
    # order wins ties
    for name, _ in reversed(LANG_MARKERS):
        n = F.col(f"_n_{name}")
        take = n >= F.greatest(best_n, F.lit(1))
        best = F.when(take, F.lit(name)).otherwise(best)
        best_n = F.when(take, n).otherwise(best_n)
    return out.select(
        *[col for col in df.columns],
        best.alias("lang_guess"),
        best_n.cast("int").alias("lang_hits"),
    )
