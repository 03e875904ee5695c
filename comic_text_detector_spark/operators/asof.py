"""As-of join: each left row matched to the latest right row at-or-before it.

The reference has no as-of joins (SURVEY.md §2.3 note); the engine's data
model adds the pattern naturally (latest capture/state as of a time). The
implementation is the union-sweep trick — scales like a sort-merge join but
with ONE shuffle on the group key and no range condition in the join itself:

  pack each side's payload into a struct → union → window ordered by
  (ts, right-before-left) → last non-null right struct ← assign to left.

No per-row Python, no skew beyond the group key's own distribution.
Semantics mirror DuckDB ASOF JOIN (match when right_ts <= left_ts; ties
match), which is exactly what the oracle uses.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T


def asof_join(
    left: DataFrame,
    right: DataFrame,
    group_col: str,
    left_ts: str,
    right_ts: str,
    payload_cols: list[str],
    tolerance: float | None = None,
) -> DataFrame:
    """Returns all left columns plus ``right_<payload>`` columns (null when
    no right row precedes). ``tolerance`` nulls matches older than
    ``left_ts - tolerance``."""
    l_struct_t = T.StructType([left.schema[c] for c in left.columns])
    r_fields = [right.schema[c] for c in payload_cols]
    r_struct_t = T.StructType(r_fields)

    lt = left.select(
        F.col(group_col).alias("__g"),
        F.col(left_ts).cast("double").alias("__ts"),
        F.lit(1).alias("__side"),
        F.struct(*left.columns).alias("__l"),
        F.lit(None).cast(r_struct_t).alias("__r"),
        F.lit(None).cast("double").alias("__rts"),
    )
    rt = right.select(
        F.col(group_col).alias("__g"),
        F.col(right_ts).cast("double").alias("__ts"),
        F.lit(0).alias("__side"),
        F.lit(None).cast(l_struct_t).alias("__l"),
        F.struct(*payload_cols).alias("__r"),
        F.col(right_ts).cast("double").alias("__rts"),
    )
    both = lt.unionByName(rt)
    # right rows sort BEFORE left rows at equal ts so same-ts rights match
    w = (
        Window.partitionBy("__g")
        .orderBy(F.col("__ts").asc(), F.col("__side").asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    filled = both.withColumn(
        "__rm", F.last("__r", ignorenulls=True).over(w)
    ).withColumn("__rtsm", F.last("__rts", ignorenulls=True).over(w))
    out = filled.filter(F.col("__side") == 1)
    match_ok = F.col("__rm").isNotNull()
    if tolerance is not None:
        match_ok = match_ok & (
            F.col("__ts") - F.col("__rtsm") <= F.lit(tolerance)
        )
    return out.select(
        *[F.col(f"__l.{c}").alias(c) for c in left.columns],
        *[
            F.when(match_ok, F.col(f"__rm.{c}")).alias(f"right_{c}")
            for c in payload_cols
        ],
    )
