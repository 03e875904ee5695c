"""J4 scattered-block merging (reference utils/textblock.py:344-388).

The reference iteratively merges single-line blocks when font sizes are
within a 1.3x ratio, directions agree within 30 degrees, and the gap is at
most 2x the font size — connected components over a similarity self-join.
Per document the block sets are tiny, so the union-find runs in a grouped
pandas UDF keyed by the group column; cross-document merging never happens
(the reference operates per image), so the shuffle is the group key only.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

FSIZE_RATIO_MAX = 1.3  # reference utils/textblock.py:352-356
COS_ANGLE_MIN = math.cos(math.radians(30))  # direction agreement
GAP_FACTOR = 2.0  # distance <= 2 * font size


class _DSU:
    def __init__(self, n: int):
        self.p = list(range(n))

    def find(self, x: int) -> int:
        while self.p[x] != x:
            self.p[x] = self.p[self.p[x]]
            x = self.p[x]
        return x

    def union(self, a: int, b: int) -> None:
        ra, rb = self.find(a), self.find(b)
        if ra != rb:
            # deterministic: smaller root wins
            if ra < rb:
                self.p[rb] = ra
            else:
                self.p[ra] = rb


def _mergeable(
    fs_a, fs_b, vx_a, vy_a, vx_b, vy_b, cx_a, cy_a, cx_b, cy_b
) -> bool:
    big, small = max(fs_a, fs_b), min(fs_a, fs_b)
    if small <= 0 or big / small > FSIZE_RATIO_MAX:
        return False
    na = math.hypot(vx_a, vy_a)
    nb = math.hypot(vx_b, vy_b)
    if na > 0 and nb > 0:
        cos = abs(vx_a * vx_b + vy_a * vy_b) / (na * nb)
        if cos < COS_ANGLE_MIN:
            return False
    dist = math.hypot(cx_a - cx_b, cy_a - cy_b)
    return dist <= GAP_FACTOR * big


def merge_blocks(
    blocks: DataFrame, group_col: str = "url", id_col: str = "block_id"
) -> DataFrame:
    """blocks(group, block_id, font_size, vec_x, vec_y, cx, cy, ...) →
    same rows plus ``merged_id`` (the smallest block id of the connected
    component — the reference's first-block-wins identity)."""
    schema_ddl = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in blocks.schema.fields
    ) + ", merged_id bigint"

    def merge_group(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(id_col).reset_index(drop=True)
        n = len(pdf)
        dsu = _DSU(n)
        fs = pdf["font_size"].to_numpy(float)
        vx = pdf["vec_x"].to_numpy(float)
        vy = pdf["vec_y"].to_numpy(float)
        cx = pdf["cx"].to_numpy(float)
        cy = pdf["cy"].to_numpy(float)
        for i in range(n):
            for j in range(i + 1, n):
                if _mergeable(
                    fs[i], fs[j], vx[i], vy[i], vx[j], vy[j],
                    cx[i], cy[i], cx[j], cy[j],
                ):
                    dsu.union(i, j)
        roots = np.array([dsu.find(i) for i in range(n)])
        ids = pdf[id_col].to_numpy()
        pdf["merged_id"] = [int(ids[r]) for r in roots]
        return pdf

    return blocks.groupBy(group_col).applyInPandas(merge_group, schema_ddl)


def merge_spans_by_gap(
    blocks: DataFrame,
    group_col: str = "url",
    start: str = "char_start",
    end: str = "char_end",
    gap_expr=None,
) -> DataFrame:
    """The webtext recast of J4 as a pure relational operator: adjacent
    span-blocks merge when the start-to-previous-end gap is within
    tolerance — W3's lag + running-sum machinery, then a span aggregate."""
    from pyspark.sql import Window

    tol = gap_expr if gap_expr is not None else F.lit(40.0)
    w = Window.partitionBy(group_col).orderBy(F.col(start), F.col(end))
    gap = F.col(start) - F.lag(F.col(end)).over(w)
    sess = blocks.withColumn(
        "__new", F.when(gap > tol, F.lit(1)).otherwise(F.lit(0))
    ).withColumn(
        "__sess",
        F.sum("__new").over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    return (
        sess.groupBy(group_col, "__sess")
        .agg(F.min(start).alias(start), F.max(end).alias(end))
        .drop("__sess")
    )
