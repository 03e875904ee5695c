"""HTTP response-envelope parsing — the very first gate a crawl
pipeline applies: keep status-200 ``text/html`` payloads, route
everything else (redirects, errors, binaries) away BEFORE the
expensive extraction stage ever sees the bytes.

``sources/warc.py::parse_warc`` strips the envelope when reading WARC
response records; this module is the column-level complement for
pipelines that carry the RAW envelope (direct fetch tables, revisit
analysis, redirect-chain mining) — pure regexp/substring column
expressions, zero shuffles, oracle-replayable.

Discipline: a payload that does not start with ``HTTP/`` yields NULL
status and a NULL body (it is not an HTTP envelope — never guess);
header values are first-match; the charset parameter is read from the
Content-Type header only (the HTML <meta> prescan lives in
``functions/charset.py`` and wins at decode time per the documented
policy there).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

STATUS_LINE = r"^HTTP/1\.[01] (\d{3})"
CRLF2 = "\r\n\r\n"


def _header(env: Column, name: str) -> Column:
    v = F.regexp_extract(env, f"(?i)\r\n{name}:[ \t]*([^\r]*)", 1)
    return F.when(v != "", v)


def http_response_meta(
    df: DataFrame, url_col: str = "url", payload_col: str = "payload"
) -> DataFrame:
    """(url, status, content_type, charset, content_length, location,
    body) from raw HTTP/1.x response envelopes.

    * ``status`` — int from the status line; NULL when the payload is
      not an envelope.
    * ``content_type`` — the media type alone, lowercased, parameters
      stripped (``text/html; charset=utf-8`` → ``text/html``).
    * ``charset`` — the Content-Type charset parameter, lowercased,
      NULL when absent.
    * ``content_length`` — the declared header value (bigint), NULL
      when absent or non-numeric; callers comparing it to the actual
      body size detect truncated captures.
    * ``location`` — the redirect target header, for 3xx chain mining.
    * ``body`` — everything after the first blank line; NULL (not '')
      when the envelope never terminates its headers.

    One codegen'd Project over the scan — zero shuffles, zero Python;
    the 10^12-row cost is the regexes alone."""
    p = F.col(payload_col).cast("string")
    env_end = F.instr(p, CRLF2)  # 1-based; 0 = no header terminator
    env = F.when(env_end > 0, F.substring(p, 1, env_end + 1)).otherwise(p)
    status_s = F.regexp_extract(p, STATUS_LINE, 1)
    is_http = status_s != ""
    ctype_raw = _header(env, "content-type")
    clen_s = F.regexp_extract(
        F.coalesce(_header(env, "content-length"), F.lit("")),
        r"^(\d+)$", 1,
    )
    return df.select(
        F.col(url_col).alias("url"),
        F.when(is_http, status_s.cast("int")).alias("status"),
        F.when(
            is_http,
            F.nullif(
                F.lower(F.trim(F.regexp_extract(ctype_raw, "^([^;]*)", 1))),
                F.lit(""),
            ),
        ).alias("content_type"),
        F.when(
            is_http,
            F.nullif(
                F.lower(
                    F.regexp_extract(
                        ctype_raw, '(?i)charset=[\'"]?([A-Za-z0-9_\\-]+)', 1
                    )
                ),
                F.lit(""),
            ),
        ).alias("charset"),
        F.when(is_http & (clen_s != ""), clen_s.cast("bigint")).alias(
            "content_length"
        ),
        F.when(is_http, _header(env, "location")).alias("location"),
        F.when(
            is_http & (env_end > 0),
            F.substring(p, env_end + 4, 2_147_483_647),
        ).alias("body"),
    )


def keep_html_ok(meta: DataFrame) -> DataFrame:
    """The canonical front-door filter: status 200, ``text/html`` or
    ``application/xhtml+xml``, non-NULL body. A pushed-down Filter on
    the parsed columns — redirects/errors/binaries never reach the
    extraction Arrow stage."""
    return meta.filter(
        (F.col("status") == 200)
        & F.col("content_type").isin("text/html", "application/xhtml+xml")
        & F.col("body").isNotNull()
    )
