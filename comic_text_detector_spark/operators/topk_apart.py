"""A4 top-k separated values (reference utils/textmask.py:16-27).

The reference picks up to k=3 dominant grey values from a histogram, sorted
by mass desc, requiring each new pick to be >= bin_tol (10) away from every
previous pick, stopping below a 0.1% mass floor. The greedy separation
constraint is sequential, so the per-group tail runs in applyInPandas — but
ONLY after a relational histogram + per-group top-N window has shrunk each
group to a handful of rows (the heavy lifting stays JVM-side).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

K = 3  # reference utils/textmask.py:16
MIN_GAP = 10.0  # bin_tol
MASS_FLOOR = 0.001  # 0.1% of total mass


def topk_separated(
    df: DataFrame,
    group_col: str,
    value_col: str,
    k: int = K,
    min_gap: float = MIN_GAP,
    mass_floor: float = MASS_FLOOR,
    prefilter_n: int = 64,
) -> DataFrame:
    """(group, value, cnt, pick_rank) — up to k dominant values per group,
    pairwise >= min_gap apart, each with >= mass_floor of the group's rows.

    Ties in count break by value asc (deterministic)."""
    hist = df.groupBy(group_col, F.col(value_col).alias("value")).agg(
        F.count("*").alias("cnt")
    )
    tot = hist.groupBy(group_col).agg(F.sum("cnt").alias("total"))
    w = Window.partitionBy(group_col).orderBy(
        F.col("cnt").desc(), F.col("value").asc()
    )
    cand = (
        hist.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= prefilter_n)
        .join(tot, group_col)
        .filter(F.col("cnt") >= F.col("total") * mass_floor)
        .drop("__rn", "total")
    )
    schema = f"{group_col} {df.schema[group_col].dataType.simpleString()}, value double, cnt bigint, pick_rank int"

    def pick(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["cnt", "value"], ascending=[False, True])
        picks: list[tuple] = []
        for _, row in pdf.iterrows():
            if len(picks) >= k:
                break
            v = float(row["value"])
            if all(abs(v - p[1]) >= min_gap for p in picks):
                picks.append((row[group_col], v, int(row["cnt"]), len(picks) + 1))
        return pd.DataFrame(
            picks, columns=[group_col, "value", "cnt", "pick_rank"]
        )

    return cand.withColumn("value", F.col("value").cast("double")).groupBy(
        group_col
    ).applyInPandas(pick, schema)
