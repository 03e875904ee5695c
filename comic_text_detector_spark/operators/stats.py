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
