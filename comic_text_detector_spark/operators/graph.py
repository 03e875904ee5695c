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


def pagerank(
    edges: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
    n_iter: int = 3,
    damping_milli: int = 850,
    scale: int = 1_000_000,
) -> DataFrame:
    """Integer-deterministic PageRank over a link graph — the crawl-side
    authority signal (harvest prioritization, seed weighting) the curation
    stack was missing. Returns (node, rank) with rank in integer
    ``scale``-units (micro-rank by default).

    Determinism contract (the trainer's discipline applied to an
    iterative graph algorithm): ranks live as integers; each edge
    contributes ``floor(rank(src) / outdeg(src))``; the damped update is
    ``base + floor(damping_milli * Σcontrib / 1000)`` with
    ``base = floor((1000 - damping_milli) * scale / (1000 * N))``. The
    divisions run through IEEE doubles, which are exact for these
    integer operands as long as ``1000 * scale`` stays below 2^53 —
    enforced by a ``scale`` cap — so an UNROLLED SQL replay matches
    bit-for-bit (``pagerank_sql``) and results are independent of
    partitioning.
    Dangling nodes (no out-links) leak their mass — documented, standard
    for the simple formulation; total mass therefore shrinks slightly
    rather than being redistributed.

    Scale shape: each iteration is ONE shuffle (join ranks→edges on src,
    aggregate by dst with map-side partials); edges are checkpointed once
    and re-used; ranks are ``localCheckpoint``-ed per round to stop
    logical-plan growth (same lesson as ``connected_components``). At
    crawl scale pre-partition edges by src so the per-iteration join
    co-locates."""
    if n_iter < 1:
        raise ValueError(f"n_iter must be >= 1, got {n_iter}")
    if not 0 < scale <= (1 << 53) // 1000:
        # beyond this the double divisions stop being exact integer math
        # and the bit-for-bit contract above would silently break
        raise ValueError(f"scale must be in (0, 2^53/1000], got {scale}")
    e = edges.select(
        F.col(src_col).alias("src"), F.col(dst_col).alias("dst")
    ).distinct().localCheckpoint()
    nodes = (
        e.select(F.col("src").alias("node"))
        .unionByName(e.select(F.col("dst").alias("node")))
        .distinct()
        .localCheckpoint()
    )
    n_nodes = nodes.count()
    if n_nodes == 0:
        raise ValueError("empty graph")
    outdeg = e.groupBy("src").agg(F.count("*").cast("long").alias("deg"))
    base = (1000 - damping_milli) * scale // (1000 * n_nodes)
    init = scale // n_nodes
    ranks = nodes.select(
        "node", F.lit(int(init)).cast("long").alias("rank")
    ).localCheckpoint()
    for _ in range(n_iter):
        contrib = (
            e.join(ranks.withColumnRenamed("node", "src"), "src")
            .join(outdeg, "src")
            .select(
                F.col("dst").alias("node"),
                F.floor(F.col("rank") / F.col("deg")).cast("long").alias("c"),
            )
            .groupBy("node")
            .agg(F.sum("c").alias("s"))
        )
        ranks = (
            nodes.join(contrib, "node", "left")
            .select(
                "node",
                (
                    F.lit(int(base))
                    + F.floor(
                        F.lit(damping_milli)
                        * F.coalesce(F.col("s"), F.lit(0))
                        / F.lit(1000)
                    )
                ).cast("long").alias("rank"),
            )
            .localCheckpoint()
        )
    return ranks


def pagerank_sql(
    edges_sql: str,
    n_iter: int = 3,
    damping_milli: int = 850,
    scale: int = 1_000_000,
) -> str:
    """Unrolled oracle twin of ``pagerank``: one contrib/rank CTE pair per
    iteration over an ``edges_sql`` relation with columns (src, dst)."""
    parts = [
        f"e AS (SELECT DISTINCT src, dst FROM ({edges_sql})), "
        "nodes AS (SELECT src AS node FROM e UNION"
        " SELECT dst AS node FROM e), "
        "nn AS (SELECT count(*) AS n FROM nodes), "
        "outdeg AS (SELECT src, CAST(count(*) AS BIGINT) AS deg"
        " FROM e GROUP BY src), "
        "r0 AS (SELECT node,"
        f" CAST({scale} // (SELECT n FROM nn) AS BIGINT) AS rank"
        " FROM nodes) "
    ]
    base = (
        f"CAST((1000 - {damping_milli}) * {scale} //"
        f" (1000 * (SELECT n FROM nn)) AS BIGINT)"
    )
    for i in range(1, n_iter + 1):
        prev = f"r{i - 1}"
        parts.append(
            f", c{i} AS (SELECT e.dst AS node,"
            f" sum(CAST(floor(r.rank / CAST(d.deg AS DOUBLE)) AS BIGINT))"
            f" AS s FROM e JOIN {prev} r ON r.node = e.src"
            f" JOIN outdeg d ON d.src = e.src GROUP BY e.dst)"
            f", r{i} AS (SELECT n.node, {base} +"
            f" CAST(floor({damping_milli} * coalesce(c.s, 0) / 1000.0)"
            f" AS BIGINT) AS rank"
            f" FROM nodes n LEFT JOIN c{i} c ON c.node = n.node)"
        )
    parts.append(f" SELECT node, rank FROM r{n_iter}")
    return "WITH " + "".join(parts)
