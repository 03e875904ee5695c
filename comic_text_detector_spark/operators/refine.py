"""U4/U5 refinement recast: span-boundary refinement over the node stream.

The reference's ``refine_mask`` re-examines each block window with
higher-resolution evidence and keeps/extends only pixels that pass
(utils/textmask.py:159-169); ``refine_undetected_mask`` recovers dense
regions no block covered (:135-156). The webtext analog operates on the
nodes table with per-node density scores:

* ``refine_blocks_hysteresis`` — two-threshold hysteresis per block: strip
  leading/trailing nodes below ``low`` (boundary refinement), and absorb
  adjacent out-of-block nodes at/above ``high`` into the block (window
  expansion within the F7-style context). Pure window algebra —
  oracle-checkable.
* recovery of never-covered dense nodes is operators/joins.recover_uncovered.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

LOW_THRES = 0.3  # mask threshold analog (utils/db_utils.py:33)
HIGH_THRES = 0.7  # absorb threshold (1 - mask_thres, the strong-evidence gate)


def refine_blocks_hysteresis(
    nodes: DataFrame,
    blocks: DataFrame,
    group_col: str = "url",
    node_id: str = "node_id",
    score: str = "score",
    b_start: str = "node_start",
    b_end: str = "node_end",
    block_id: str = "block_id",
    low: float = LOW_THRES,
    high: float = HIGH_THRES,
) -> DataFrame:
    """nodes(group, node_id, score) x blocks(group, block_id, node_start,
    node_end) → refined blocks (node_start, node_end), empty blocks dropped.

    Membership: a node belongs to the refined block iff
      (inside original && not a sub-``low`` prefix/suffix) OR
      (directly adjacent run of >= ``high`` nodes touching the block).
    Implemented as: assign nodes to blocks by interval join (+1 slack for
    adjacency), then per (group, block): trim = min/max node_id among nodes
    with score >= low inside the original bounds; absorb = extend through
    consecutive >= high neighbors via the island trick on the slacked set.
    """
    j = nodes.join(blocks, group_col)
    near = j.filter(
        (F.col(node_id) >= F.col(b_start) - 1) & (F.col(node_id) <= F.col(b_end) + 1)
    )
    inside = (F.col(node_id) >= F.col(b_start)) & (F.col(node_id) <= F.col(b_end))
    qualified = near.filter(
        (inside & (F.col(score) >= low)) | (~inside & (F.col(score) >= high))
    )
    # consecutive runs only: must remain contiguous with the block core —
    # islands over node_id within (group, block)
    w = Window.partitionBy(group_col, block_id).orderBy(node_id)
    gap = F.col(node_id) - F.lag(node_id).over(w)
    runs = qualified.withColumn(
        "__new", F.when(gap > 1, F.lit(1)).otherwise(F.lit(0))
    ).withColumn(
        "__run", F.sum("__new").over(w.rowsBetween(Window.unboundedPreceding, 0))
    )
    # keep the run that overlaps the original core (contains any inside node)
    core_runs = (
        runs.withColumn("__inside", inside.cast("int"))
        .groupBy(group_col, block_id, "__run")
        .agg(
            F.min(node_id).alias("rs"),
            F.max(node_id).alias("re"),
            F.max("__inside").alias("has_core"),
        )
        .filter(F.col("has_core") == 1)
    )
    return core_runs.groupBy(group_col, block_id).agg(
        F.min("rs").alias(b_start), F.max("re").alias(b_end)
    )
