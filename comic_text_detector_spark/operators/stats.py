"""ANALYZE-style table statistics: per-column row/null/ndv/min/max/size
in one pass — the stats table behind cost-based decisions (broadcast-vs-
shuffle thresholds, skew detection, partition sizing) and data-quality
monitoring of a 10^12-row crawl table.

Why exact (not approx_count_distinct): the numbers feed the oracle gate
and dashboards that diff snapshots — an approximate ndv that wobbles
between runs reads as a data change. Spark computes multiple exact
count(DISTINCT) in one aggregate via its Expand operator (input rows are
replicated once per distinct aggregate); that is a deliberate trade —
one pass over the table at #cols× expansion instead of #cols passes. For
quick interactive checks at full scale, run on a ``hash_sample`` of the
table instead (deterministic, so still diffable).

String min/max use binary (codepoint) ordering in both Spark and DuckDB's
default collation — the oracle twins rely on that; unbounded text columns
track min/max of the md5 digest instead (stable, collation-free, and what
a dedup investigation actually wants to range-scan by).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["collect_table_stats"]


def collect_table_stats(
    df: DataFrame,
    cols: list[str] | None = None,
    digest_cols: tuple[str, ...] = (),
) -> DataFrame:
    """(col, n_rows, n_nulls, ndv, min_s, max_s, total_len) per column.

    ``digest_cols`` lists unbounded-text columns whose min/max should be
    taken over md5(value) rather than the value (see module docstring);
    ndv and total_len still describe the raw values. total_len is the
    exact sum of string lengths (characters) over non-null values — the
    sizing input for partition planning."""
    if cols is None:
        cols = list(df.columns)
    aggs = [F.count(F.lit(1)).alias("_n")]
    for c in cols:
        s = F.col(c).cast("string")
        keyed = F.md5(s) if c in digest_cols else s
        aggs += [
            F.count(c).alias(f"_nn_{c}"),
            F.countDistinct(c).alias(f"_ndv_{c}"),
            F.min(keyed).alias(f"_min_{c}"),
            F.max(keyed).alias(f"_max_{c}"),
            F.coalesce(F.sum(F.length(s)), F.lit(0)).alias(f"_len_{c}"),
        ]
    row = df.agg(*aggs)
    per_col = F.array(
        *[
            F.struct(
                F.lit(c).alias("col"),
                F.col("_n").alias("n_rows"),
                (F.col("_n") - F.col(f"_nn_{c}")).alias("n_nulls"),
                F.col(f"_ndv_{c}").alias("ndv"),
                F.col(f"_min_{c}").alias("min_s"),
                F.col(f"_max_{c}").alias("max_s"),
                F.col(f"_len_{c}").alias("total_len"),
            )
            for c in cols
        ]
    )
    return row.select(F.explode(per_col).alias("s")).select("s.*")


def count_min_sketch(
    df: DataFrame,
    key_col: str,
    depth: int = 4,
    width: int = 1024,
) -> DataFrame:
    """Count-Min sketch (Cormode & Muthukrishnan 2005) of a key stream —
    the heavy-hitter primitive for streams too hot to groupBy exactly
    (per-host hit counts across a 10^12-page crawl: the sketch is
    depth×width counters regardless of key cardinality, mergeable across
    batches by summing cells). Returns (d, bucket, cnt).

    Hashing is the repo's portable primitive (``md5_long`` of
    'cms{d}|{key}', bucket = hash % width), so a DuckDB twin recomputes
    the IDENTICAL sketch — deterministic, partitioning-independent.
    Build cost: one explode (×depth) + one map-side-combinable groupBy;
    at scale the depth fan-out happens inside the shuffle write, and the
    finished sketch is broadcast-sized for estimate joins."""
    from .dedup import md5_long

    if depth < 1 or width < 1:
        raise ValueError("depth and width must be >= 1")
    d = F.explode(F.sequence(F.lit(0), F.lit(depth - 1))).alias("d")
    rows = df.select(F.col(key_col).cast("string").alias("k"), d)
    return (
        rows.select(
            "d",
            (
                md5_long(
                    F.concat(
                        F.lit("cms"), F.col("d").cast("string"),
                        F.lit("|"), F.col("k"),
                    )
                )
                % width
            ).alias("bucket"),
        )
        .groupBy("d", "bucket")
        .agg(F.count("*").cast("long").alias("cnt"))
    )


def count_min_estimate(
    sketch: DataFrame,
    keys: DataFrame,
    key_col: str,
    depth: int = 4,
    width: int = 1024,
) -> DataFrame:
    """Point-estimate counts for candidate keys from a finished sketch:
    est(k) = min over rows d of the counter at bucket_d(k) — an upper
    bound on the true count (collisions only inflate), exact when no
    collision hits all depth rows. The sketch side is depth×width rows →
    broadcast; the candidate stream never shuffles. Returns (key, est)
    with est = 0 for keys the stream never touched (empty cells)."""
    from .dedup import md5_long

    probes = keys.select(
        F.col(key_col).cast("string").alias("key")
    ).distinct().select(
        "key",
        F.explode(F.sequence(F.lit(0), F.lit(depth - 1))).alias("d"),
    ).select(
        "key",
        "d",
        (
            md5_long(
                F.concat(
                    F.lit("cms"), F.col("d").cast("string"),
                    F.lit("|"), F.col("key"),
                )
            )
            % width
        ).alias("bucket"),
    )
    return (
        probes.join(F.broadcast(sketch), ["d", "bucket"], "left")
        .groupBy("key")
        .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0))).alias("est"))
    )


def count_min_sketch_sql(
    keys_sql: str, depth: int = 4, width: int = 1024
) -> str:
    """DuckDB twin of ``count_min_sketch`` over a relation with a ``k``
    column (one row per occurrence)."""
    return (
        f"SELECT d, ('0x' || substr(md5('cms' || d::VARCHAR || '|' || k),"
        f" 1, 8))::BIGINT % {width} AS bucket,"
        " CAST(count(*) AS BIGINT) AS cnt"
        f" FROM ({keys_sql}), range({depth}) t(d)"
        " GROUP BY 1, 2"
    )


def count_min_estimate_sql(
    keys_sql: str,
    probe_sql: str | None = None,
    depth: int = 4,
    width: int = 1024,
) -> str:
    """DuckDB twin of sketch-build + estimate: probe keys default to the
    stream's own distinct keys."""
    probe = probe_sql or f"SELECT DISTINCT k FROM ({keys_sql})"
    return (
        "WITH sk AS ("
        + count_min_sketch_sql(keys_sql, depth, width)
        + f"), pr AS (SELECT k AS key, d,"
        f" ('0x' || substr(md5('cms' || d::VARCHAR || '|' || k), 1, 8))"
        f"::BIGINT % {width} AS bucket"
        f" FROM ({probe}), range({depth}) t(d)) "
        "SELECT pr.key, min(coalesce(sk.cnt, 0)) AS est FROM pr"
        " LEFT JOIN sk ON sk.d = pr.d AND sk.bucket = pr.bucket"
        " GROUP BY pr.key"
    )
