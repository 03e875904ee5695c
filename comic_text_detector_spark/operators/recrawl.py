"""Recrawl scheduling — estimate per-url change behaviour from the
capture history and emit the next fetch time, so a recrawl pipeline
spends its budget on pages that actually change (the Cho &
Garcia-Molina uniform-vs-proportional allocation question, answered
with the frequency data a WARC archive already holds).

Reference analog: the detector re-running only on pages whose input
bytes changed (``inference.py``'s per-file loop keyed by mtime) —
here change is detected by content digest across captures.

Determinism contract: pure integer arithmetic end-to-end (epoch
seconds, milli-quantized change ratio, integer-division policy) — no
ln()/float estimator whose libm could differ between engines — so the
emitted schedule is bit-identical across runs/partitionings and the
DuckDB oracle replays it exactly.

Scale shape: ONE shuffle on the url key, shared by the lag window and
the aggregate (same partitioning, Catalyst reuses the exchange).
History per url is bounded by capture count — no cross-url state.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

HOUR = 3600
DAY = 86400


def _idiv(a: Column, b: Column) -> Column:
    # floor division for non-negative bigints, exact under 2^53
    return (a / b).cast("long")


def recrawl_schedule(
    captures: DataFrame,
    url_col: str = "url",
    ts_col: str = "ts",
    digest_col: str = "digest",
    min_interval_s: int = HOUR,
    max_interval_s: int = 30 * DAY,
    default_interval_s: int = 7 * DAY,
) -> DataFrame:
    """(url, n_captures, n_changes, avg_interval_s, change_ratio_milli,
    next_fetch_ts) per url from (url, ts epoch-seconds, digest) rows.

    * ``n_changes`` — captures whose digest differs from the previous
      capture's (ordered by (ts, digest) for tie determinism); the
      first capture is never a change.
    * ``avg_interval_s`` — floor(span / (n-1)); NULL for singletons.
    * ``change_ratio_milli`` — floor(1000·changes/(n-1)); NULL for
      singletons.
    * ``next_fetch_ts`` — last_ts + interval, where the interval is
      the integer policy avg·2000 // (1000 + 2·ratio_milli): a page
      that changed every capture refetches at ⅔·avg, a never-changed
      page at 2·avg, clamped to [min, max]; singletons (no rate
      evidence) refetch at ``default_interval_s``."""
    w = Window.partitionBy("url").orderBy("ts", "digest")
    prev = F.lag("digest").over(w)
    marked = captures.select(
        F.col(url_col).alias("url"),
        F.col(ts_col).cast("long").alias("ts"),
        F.col(digest_col).alias("digest"),
    ).withColumn(
        "__chg",
        F.when(prev.isNull(), F.lit(0))
        .when(prev != F.col("digest"), F.lit(1))
        .otherwise(F.lit(0)),
    )
    agg = marked.groupBy("url").agg(
        F.count(F.lit(1)).alias("n_captures"),
        F.sum("__chg").alias("n_changes"),
        F.min("ts").alias("__first"),
        F.max("ts").alias("__last"),
    )
    n1 = F.col("n_captures") - 1
    multi = F.col("n_captures") >= 2
    avg = F.when(multi, _idiv(F.col("__last") - F.col("__first"), n1))
    ratio = F.when(multi, _idiv(F.col("n_changes") * 1000, n1))
    raw_dt = _idiv(avg * 2000, F.lit(1000) + ratio * 2)
    # least/greatest SKIP nulls in both engines, so the singleton case
    # must be gated explicitly, not left to null propagation.
    next_dt = F.when(
        multi,
        F.greatest(
            F.lit(min_interval_s).cast("long"),
            F.least(F.lit(max_interval_s).cast("long"), raw_dt),
        ),
    ).otherwise(F.lit(default_interval_s).cast("long"))
    return agg.select(
        "url",
        "n_captures",
        F.col("n_changes").cast("long").alias("n_changes"),
        avg.alias("avg_interval_s"),
        ratio.alias("change_ratio_milli"),
        (F.col("__last") + next_dt).alias("next_fetch_ts"),
    )
