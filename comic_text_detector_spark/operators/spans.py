"""Interval (span) set operations — the mask algebra recast (SURVEY.md §2.7).

The reference's pixel-mask OR/XOR/NOT/subtract (utils/textmask.py:104-168)
become set operations over character intervals. All relational:

* ``coalesce_spans`` — interval union with merging (mask OR, X1): the
  classic islands pattern (running max-end + new-island flag + cumsum).
* ``interval_xor_len`` — symmetric-difference length between two span sets
  per group (mask XOR, X2 — the minxor selection objective of
  utils/textmask.py:29-41): a relational sweep line over interval
  boundaries (+1/-1 coverage deltas, running sums, segment lengths).
* ``min_xor_candidate`` — A6: among candidate span-sets, pick the one whose
  XOR against a target set is smallest (utils/textmask.py:43-54's
  candidate selection), with deterministic tie-break on candidate id.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def coalesce_spans(
    df: DataFrame, group_cols: list[str], start: str = "char_start",
    end: str = "char_end",
) -> DataFrame:
    """Merge overlapping/touching intervals per group (mask OR / X1)."""
    w = Window.partitionBy(*group_cols).orderBy(F.col(start), F.col(end))
    prev_max_end = F.max(end).over(w.rowsBetween(Window.unboundedPreceding, -1))
    flagged = df.withColumn(
        "__new",
        F.when(
            prev_max_end.isNull() | (F.col(start) > prev_max_end), F.lit(1)
        ).otherwise(F.lit(0)),
    ).withColumn(
        "__island",
        F.sum("__new").over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    return (
        flagged.groupBy(*group_cols, "__island")
        .agg(F.min(start).alias(start), F.max(end).alias(end))
        .drop("__island")
    )


def interval_xor_len(
    a: DataFrame, b: DataFrame, group_cols: list[str],
    start: str = "char_start", end: str = "char_end",
) -> DataFrame:
    """Per group: total length covered by exactly one of the two span sets.

    Sweep line: every interval contributes (+1 at start, -1 at end) to its
    side's coverage counter; between consecutive boundary positions the
    segment length counts when (covA>0) != (covB>0). Pure window algebra —
    the same shape works at any scale because everything is keyed by group.
    """
    def deltas(df: DataFrame, side: str) -> DataFrame:
        s = df.select(
            *group_cols,
            F.col(start).alias("pos"),
            F.lit(1).alias(f"d_{side}"),
            F.lit(0).alias(f"d_{'b' if side == 'a' else 'a'}"),
        )
        e = df.select(
            *group_cols,
            F.col(end).alias("pos"),
            F.lit(-1).alias(f"d_{side}"),
            F.lit(0).alias(f"d_{'b' if side == 'a' else 'a'}"),
        )
        return s.unionByName(e)

    events = deltas(a, "a").unionByName(deltas(b, "b"))
    merged = events.groupBy(*group_cols, "pos").agg(
        F.sum("d_a").alias("da"), F.sum("d_b").alias("db")
    )
    w = Window.partitionBy(*group_cols).orderBy("pos")
    run = merged.withColumn(
        "cov_a", F.sum("da").over(w.rowsBetween(Window.unboundedPreceding, 0))
    ).withColumn(
        "cov_b", F.sum("db").over(w.rowsBetween(Window.unboundedPreceding, 0))
    ).withColumn("next_pos", F.lead("pos").over(w))
    seg = run.withColumn(
        "xor_seg",
        F.when(
            F.col("next_pos").isNotNull()
            & ((F.col("cov_a") > 0) != (F.col("cov_b") > 0)),
            F.col("next_pos") - F.col("pos"),
        ).otherwise(F.lit(0)),
    )
    # round before the integer cast: positions may be floats and the segment
    # sum can land at 84.999999...; Spark's double→bigint cast truncates
    # while other engines round, so make the rounding explicit.
    return seg.groupBy(*group_cols).agg(
        F.round(F.sum("xor_seg")).cast("bigint").alias("xor_len")
    )


def min_xor_candidate(
    candidates: DataFrame,
    target: DataFrame,
    group_cols: list[str],
    candidate_col: str = "candidate_id",
    start: str = "char_start",
    end: str = "char_end",
) -> DataFrame:
    """A6 minxor selection: per group, the candidate span-set with minimum
    XOR length against the target set (ties → smallest candidate id, the
    reference's first-wins order).

    The target set is replicated per candidate via an equi-join on the
    group key, so the sweep runs per (group, candidate) — small per-group
    sets, keyed shuffle only.
    """
    cand_groups = [*group_cols, candidate_col]
    tgt = target.join(
        candidates.select(*group_cols, candidate_col).distinct(), group_cols
    )
    per_cand = interval_xor_len(candidates, tgt, cand_groups, start, end)
    w = Window.partitionBy(*group_cols).orderBy(
        F.col("xor_len").asc(), F.col(candidate_col).asc()
    )
    return (
        per_cand.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )
