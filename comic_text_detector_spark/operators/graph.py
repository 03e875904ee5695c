"""Distributed connected components: near-dup pairs → duplicate clusters.

The step after minhash/simhash/embedding pair generation: pairs form a
graph whose components are the duplicate clusters (keep one representative
per cluster). Unlike the per-document union-find of J4 (operators/merge.py),
dup clusters span partitions, so this is the genuinely distributed iterative
algorithm: min-label propagation in pure DataFrame ops, driver-controlled
fixpoint loop (converges in O(graph diameter) rounds; crawl dup-clusters
are shallow — a handful of rounds in practice).

Each round is (a) neighbor-min propagation (join + aggregate) and (b) a
pointer-jump through the current labels (comp := comp[comp]) — the
short-cutting that turns O(diameter) rounds into O(log n). Iterative
DataFrame loops explode their LOGICAL plan even when cached (caching
truncates physical recomputation, not analysis), so every round is
``localCheckpoint``-ed to cut lineage.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_iter: int = 25,
) -> DataFrame:
    """(id, cluster_rep) for every id appearing in pairs; cluster_rep is the
    minimum id of the component (deterministic representative)."""
    e = pairs.select(F.col(id_a).alias("src"), F.col(id_b).alias("dst"))
    edges = (
        e.unionByName(e.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
        .distinct()
        .localCheckpoint()
    )
    labels = (
        edges.select(F.col("src").alias("id"))
        .distinct()
        .withColumn("comp", F.col("id"))
        .localCheckpoint()
    )
    for _ in range(max_iter):
        nbr_min = (
            edges.join(labels, edges.dst == labels.id)
            .groupBy("src")
            .agg(F.min("comp").alias("nbr_comp"))
        )
        stepped = labels.join(nbr_min, labels.id == nbr_min.src, "left").select(
            "id",
            F.least(F.col("comp"), F.coalesce("nbr_comp", F.col("comp"))).alias(
                "comp"
            ),
        )
        # pointer jump: comp := comp[comp] (path compression → O(log n))
        reps = stepped.select(
            F.col("id").alias("rid"), F.col("comp").alias("rcomp")
        )
        new_labels = (
            stepped.join(reps, stepped.comp == reps.rid, "left")
            .select(
                "id",
                F.least(
                    F.col("comp"), F.coalesce("rcomp", F.col("comp"))
                ).alias("comp"),
            )
            .localCheckpoint()
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "id")
            .filter(F.col("n.comp") != F.col("o.comp"))
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    return labels.select("id", F.col("comp").alias("cluster_rep"))


def dedup_keep_representatives(
    docs: DataFrame, pairs: DataFrame, id_col: str
) -> DataFrame:
    """Drop near-duplicates: keep each cluster's minimum-id document plus
    every unpaired document (left anti join against non-representatives)."""
    cc = connected_components(pairs)
    losers = cc.filter(F.col("id") != F.col("cluster_rep")).select(
        F.col("id").alias(id_col)
    )
    return docs.join(losers, id_col, "left_anti")
