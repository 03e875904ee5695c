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

from pyspark.sql import DataFrame, Window
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
    stop_when_stable: bool = False,
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
    init = scale // n_nodes
    ranks = nodes.select(
        "node", F.lit(int(init)).cast("long").alias("rank")
    ).localCheckpoint()
    return _pagerank_loop(
        e, nodes, ranks, n_iter, damping_milli, scale, n_nodes,
        stop_when_stable,
    )


def _pagerank_loop(
    e: DataFrame,
    nodes: DataFrame,
    ranks: DataFrame,
    n_iter: int,
    damping_milli: int,
    scale: int,
    n_nodes: int,
    stop_when_stable: bool = False,
    base_col: str | None = None,
) -> DataFrame:
    """The damped-update iteration shared by the batch, incremental AND
    personalized (trustrank) entry points: one shuffle per round,
    localCheckpoint-ed lineage. The teleport base is the uniform scalar
    by default; ``base_col`` names a per-node bigint column on
    ``nodes`` instead (trustrank: seed-restricted teleport) — one loop
    definition, so checkpoint/arithmetic fixes can never diverge.
    ``stop_when_stable`` breaks early once a round changes no rank (one
    extra scalar count per round — used by convergence-to-fixpoint runs;
    the unrolled-SQL oracles always pin an exact ``n_iter``)."""
    outdeg = e.groupBy("src").agg(F.count("*").cast("long").alias("deg"))
    base = (1000 - damping_milli) * scale // (1000 * n_nodes)
    base_expr = F.col(base_col) if base_col else F.lit(int(base))
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
        new_ranks = (
            nodes.join(contrib, "node", "left")
            .select(
                "node",
                (
                    base_expr
                    + F.floor(
                        F.lit(damping_milli)
                        * F.coalesce(F.col("s"), F.lit(0))
                        / F.lit(1000)
                    )
                ).cast("long").alias("rank"),
            )
            .localCheckpoint()
        )
        if stop_when_stable:
            changed = (
                new_ranks.alias("n")
                .join(ranks.alias("o"), "node")
                .filter(F.col("n.rank") != F.col("o.rank"))
                .count()
            )
            ranks = new_ranks
            if changed == 0:
                break
        else:
            ranks = new_ranks
    return ranks


def pagerank_incremental(
    edges_prev: DataFrame,
    ranks_prev: DataFrame,
    edges_add: DataFrame | None = None,
    edges_remove: DataFrame | None = None,
    src_col: str = "src",
    dst_col: str = "dst",
    n_iter: int = 2,
    damping_milli: int = 850,
    scale: int = 1_000_000,
    stop_when_stable: bool = False,
) -> DataFrame:
    """PageRank over a RECRAWL DELTA without full recomputation: merge the
    previous edge set with the snapshot's adds/removes, then restart the
    power iteration FROM THE PREVIOUS RANKS instead of uniform — the
    standard warm-start, which converges in a few rounds when the delta is
    small because the old ranks are already near the new fixpoint (the
    iteration map is the same contraction; only its fixpoint moved
    slightly). ``n_iter=2`` is the cheap recrawl default; pass
    ``stop_when_stable=True`` to iterate to the integer fixpoint.

    Returns (node, rank) over the MERGED graph. Nodes new to the graph
    start at the uniform ``scale // N`` of the merged graph; nodes that
    vanished (every incident edge removed) are absent, same as batch.
    The damping base term uses the merged graph's node count, so the
    warm restart iterates the SAME map a cold batch run does; at the
    fixpoint the two agree to within a few integer units (the
    floor-quantized map admits a small family of fixpoints — each floor
    can absorb <1 unit per round — so trajectories from different starts
    may stabilize units apart; parity-tested at ≤32 micro-units of scale
    1e6). After the default short restart they agree to within the
    delta's residual.

    Determinism contract: identical integer arithmetic to ``pagerank``;
    ``pagerank_incremental_sql`` replays prev-phase + merge + restart
    unrolled, bit-for-bit.

    Scale shape: the merge is a distinct union + an anti-join (keyed on
    the edge pair); each restart iteration is the same single shuffle as
    batch. Nothing rescans the historical crawl — only the previous
    ranks table (one row per node) and the delta move."""
    if n_iter < 1:
        raise ValueError(f"n_iter must be >= 1, got {n_iter}")
    if not 0 < scale <= (1 << 53) // 1000:
        raise ValueError(f"scale must be in (0, 2^53/1000], got {scale}")
    ep = edges_prev.select(
        F.col(src_col).alias("src"), F.col(dst_col).alias("dst")
    )
    if edges_add is not None:
        ep = ep.unionByName(
            edges_add.select(
                F.col(src_col).alias("src"), F.col(dst_col).alias("dst")
            )
        )
    merged = ep.distinct()
    if edges_remove is not None:
        merged = merged.join(
            edges_remove.select(
                F.col(src_col).alias("src"), F.col(dst_col).alias("dst")
            ),
            ["src", "dst"],
            "left_anti",
        )
    e = merged.localCheckpoint()
    nodes = (
        e.select(F.col("src").alias("node"))
        .unionByName(e.select(F.col("dst").alias("node")))
        .distinct()
        .localCheckpoint()
    )
    n_nodes = nodes.count()
    if n_nodes == 0:
        raise ValueError("empty merged graph")
    init = scale // n_nodes
    ranks = (
        nodes.join(
            ranks_prev.select("node", F.col("rank").alias("prev_rank")),
            "node",
            "left",
        )
        .select(
            "node",
            F.coalesce(F.col("prev_rank"), F.lit(int(init)))
            .cast("long")
            .alias("rank"),
        )
        .localCheckpoint()
    )
    return _pagerank_loop(
        e, nodes, ranks, n_iter, damping_milli, scale, n_nodes,
        stop_when_stable,
    )


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


def pagerank_incremental_sql(
    edges_prev_sql: str,
    edges_add_sql: str | None,
    edges_remove_sql: str | None,
    prev_iters: int = 3,
    n_iter: int = 2,
    damping_milli: int = 850,
    scale: int = 1_000_000,
) -> str:
    """Unrolled oracle twin of ``pagerank_incremental`` with the previous
    ranks themselves produced by an unrolled ``prev_iters`` batch run over
    ``edges_prev_sql`` — the whole recrawl story (previous crawl → delta
    merge → warm restart) replayed as one SQL query, bit-for-bit."""
    parts = [
        f"ep AS (SELECT DISTINCT src, dst FROM ({edges_prev_sql})), "
        "nodes_p AS (SELECT src AS node FROM ep UNION"
        " SELECT dst AS node FROM ep), "
        "nnp AS (SELECT count(*) AS n FROM nodes_p), "
        "outdeg_p AS (SELECT src, CAST(count(*) AS BIGINT) AS deg"
        " FROM ep GROUP BY src), "
        "p0 AS (SELECT node,"
        f" CAST({scale} // (SELECT n FROM nnp) AS BIGINT) AS rank"
        " FROM nodes_p)"
    ]
    base_p = (
        f"CAST((1000 - {damping_milli}) * {scale} //"
        f" (1000 * (SELECT n FROM nnp)) AS BIGINT)"
    )
    for i in range(1, prev_iters + 1):
        parts.append(
            f", pc{i} AS (SELECT ep.dst AS node,"
            f" sum(CAST(floor(r.rank / CAST(d.deg AS DOUBLE)) AS BIGINT))"
            f" AS s FROM ep JOIN p{i - 1} r ON r.node = ep.src"
            f" JOIN outdeg_p d ON d.src = ep.src GROUP BY ep.dst)"
            f", p{i} AS (SELECT n.node, {base_p} +"
            f" CAST(floor({damping_milli} * coalesce(c.s, 0) / 1000.0)"
            f" AS BIGINT) AS rank"
            f" FROM nodes_p n LEFT JOIN pc{i} c ON c.node = n.node)"
        )
    union_add = (
        f" UNION SELECT src, dst FROM ({edges_add_sql})"
        if edges_add_sql
        else ""
    )
    except_rm = (
        f" EXCEPT SELECT src, dst FROM ({edges_remove_sql})"
        if edges_remove_sql
        else ""
    )
    parts.append(
        f", em AS (SELECT src, dst FROM ep{union_add}{except_rm}), "
        "nodes_m AS (SELECT src AS node FROM em UNION"
        " SELECT dst AS node FROM em), "
        "nnm AS (SELECT count(*) AS n FROM nodes_m), "
        "outdeg_m AS (SELECT src, CAST(count(*) AS BIGINT) AS deg"
        " FROM em GROUP BY src), "
        "q0 AS (SELECT n.node, CAST(coalesce(p.rank,"
        f" {scale} // (SELECT n FROM nnm)) AS BIGINT) AS rank"
        f" FROM nodes_m n LEFT JOIN p{prev_iters} p ON p.node = n.node)"
    )
    base_m = (
        f"CAST((1000 - {damping_milli}) * {scale} //"
        f" (1000 * (SELECT n FROM nnm)) AS BIGINT)"
    )
    for i in range(1, n_iter + 1):
        parts.append(
            f", qc{i} AS (SELECT em.dst AS node,"
            f" sum(CAST(floor(r.rank / CAST(d.deg AS DOUBLE)) AS BIGINT))"
            f" AS s FROM em JOIN q{i - 1} r ON r.node = em.src"
            f" JOIN outdeg_m d ON d.src = em.src GROUP BY em.dst)"
            f", q{i} AS (SELECT n.node, {base_m} +"
            f" CAST(floor({damping_milli} * coalesce(c.s, 0) / 1000.0)"
            f" AS BIGINT) AS rank"
            f" FROM nodes_m n LEFT JOIN qc{i} c ON c.node = n.node)"
        )
    parts.append(f" SELECT node, rank FROM q{n_iter}")
    return "WITH " + "".join(parts)


def bfs_depth(
    edges: DataFrame,
    seeds: DataFrame,
    max_depth: int = 8,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """Minimum-hop BFS labels from a seed set over a directed edge list:
    (node, depth) for every node reachable within ``max_depth`` hops
    (seeds at depth 0). The crawl-scheduling primitive behind
    depth-budgeted frontiers ("crawl N hops out from the seed list") and
    link-distance features.

    Frontier-only expansion: each level joins ONLY the newly discovered
    nodes against the edge list (shuffle proportional to the frontier,
    not the visited set), anti-joins out already-labelled nodes, and
    ``localCheckpoint``s both accumulators so the plan cannot grow with
    depth (same discipline as ``connected_components``/``pagerank``).
    Levels are inherently sequential; within a level everything is one
    hash join. Early-exits when the frontier empties.

    Determinism is structural — a node's label is the first level that
    reaches it, so no ordering or floats are involved; the oracle twin
    (``bfs_depth_sql``) replays it as a depth-bounded recursive CTE with
    a min() roll-up."""
    # materialize the deduped edge list ONCE — without this every level's
    # frontier join (and each eager localCheckpoint of nxt) re-runs the
    # full edge scan + distinct shuffle, defeating the frontier-only
    # claim (same discipline as connected_components/pagerank)
    e = (
        edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
        .where(F.col("src").isNotNull() & F.col("dst").isNotNull())
        .distinct()
        .localCheckpoint()
    )
    dist = seeds.select(
        F.col(seeds.columns[0]).alias("node"),
        F.lit(0).cast("int").alias("depth"),
    ).distinct()
    front = dist.select("node")
    for d in range(1, max_depth + 1):
        nxt = (
            front.join(e, front["node"] == e["src"])
            .select(F.col("dst").alias("node"))
            .distinct()
            .join(dist, "node", "left_anti")
            .localCheckpoint()
        )
        if not nxt.take(1):
            break
        dist = dist.unionByName(
            nxt.withColumn("depth", F.lit(d).cast("int"))
        ).localCheckpoint()
        front = nxt
    return dist


def bfs_depth_sql(edges_sql: str, seeds_sql: str, max_depth: int = 8) -> str:
    """DuckDB twin: depth-bounded recursive reachability, then min(depth)
    per node == the BFS label (UNION dedups (node, depth) pairs, so the
    recursion is finite without a visited-set)."""
    return (
        "WITH RECURSIVE e AS (SELECT DISTINCT src, dst FROM ("
        + edges_sql
        + ") WHERE src IS NOT NULL AND dst IS NOT NULL), "
        "s AS (SELECT DISTINCT node FROM (" + seeds_sql + ")), "
        "reach AS (SELECT node, 0 AS depth FROM s "
        "UNION SELECT e.dst AS node, r.depth + 1 AS depth "
        f"FROM reach r JOIN e ON e.src = r.node WHERE r.depth < {max_depth})"
        " SELECT node, CAST(min(depth) AS INT) AS depth FROM reach "
        "GROUP BY node"
    )


def hits_scores(
    edges: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
    n_iter: int = 2,
    scale: int = 1000,
) -> DataFrame:
    """Integer-deterministic HITS (Kleinberg 1999): hub and authority
    scores over a link graph — the complementary crawl signal to
    ``pagerank`` (a good HUB page links to many good content pages; a
    good AUTHORITY is linked from good hubs; seed-list curation wants
    hubs, harvest ranking wants authorities). Returns (node, hub, auth)
    in integer ``scale``-units.

    Same determinism contract as ``pagerank``: scores are exact BIGINTs;
    each iteration computes auth(u) = Σ hub(v) over in-edges then
    L1-normalizes by ``floor(s * scale / total)``, then hub(u) =
    Σ auth(v) over out-edges (the freshly updated auths — standard HITS
    order) with the same normalization. The double divisions are exact
    for these operands while ``total * scale < 2^53``; with the default
    milli-scale that caps the graph at ~9e9 nodes, far past any test and
    enforced on the realized total. The unrolled SQL twin
    (``hits_sql``) replays every iteration bit-for-bit.

    Scale shape: one shuffle per half-step (join scores→edges, aggregate
    by the other endpoint, map-side partials); edges checkpointed once;
    scores localCheckpoint-ed per round. Zero-total degenerate graphs
    (no edges) raise rather than divide by zero."""
    if n_iter < 1:
        raise ValueError(f"n_iter must be >= 1, got {n_iter}")
    e = edges.select(
        F.col(src_col).alias("src"), F.col(dst_col).alias("dst")
    ).distinct().localCheckpoint()
    nodes = (
        e.select(F.col("src").alias("node"))
        .unionByName(e.select(F.col("dst").alias("node")))
        .distinct()
        .localCheckpoint()
    )
    if nodes.limit(1).count() == 0:
        raise ValueError("empty graph")

    def _norm(scores: DataFrame, col: str) -> DataFrame:
        total = scores.agg(F.sum(col).alias("t")).first().t
        if total is None or total <= 0:
            raise ValueError("HITS normalization total is zero")
        if total * scale >= (1 << 53):
            raise ValueError(
                f"HITS exactness bound exceeded: total*scale = "
                f"{total * scale} >= 2^53"
            )
        return scores.select(
            "node",
            F.floor(
                F.col(col).cast("double") * F.lit(scale) / F.lit(int(total))
            )
            .cast("long")
            .alias(col),
        )

    hub = nodes.select(
        "node", F.lit(int(scale)).cast("long").alias("hub")
    ).localCheckpoint()
    auth = None
    for _ in range(n_iter):
        auth = (
            e.join(hub, e["src"] == hub["node"])
            .groupBy(F.col("dst").alias("node"))
            .agg(F.sum("hub").alias("auth"))
        )
        auth = (
            nodes.join(auth, "node", "left")
            .select("node", F.coalesce("auth", F.lit(0)).alias("auth"))
        )
        auth = _norm(auth, "auth").localCheckpoint()
        hub = (
            e.join(auth, e["dst"] == auth["node"])
            .groupBy(F.col("src").alias("node"))
            .agg(F.sum("auth").alias("hub"))
        )
        hub = (
            nodes.join(hub, "node", "left")
            .select("node", F.coalesce("hub", F.lit(0)).alias("hub"))
        )
        hub = _norm(hub, "hub").localCheckpoint()
    return nodes.join(hub, "node").join(auth, "node").select(
        "node", "hub", "auth"
    )


def hits_sql(edges_sql: str, n_iter: int = 2, scale: int = 1000) -> str:
    """DuckDB twin of hits_scores: every half-step unrolled, identical
    floor(s*scale/total) normalization."""

    def norm(prev: str, col: str, out: str) -> str:
        return (
            f"{out} AS (SELECT node, CAST(floor(CAST({col} AS DOUBLE) * "
            f"{scale} / t.total) AS BIGINT) AS {col} FROM {prev} CROSS "
            f"JOIN (SELECT SUM({col}) AS total FROM {prev}) t)"
        )

    parts = [
        f"e AS (SELECT DISTINCT src, dst FROM ({edges_sql}))",
        (
            "nodes AS (SELECT src AS node FROM e UNION "
            "SELECT dst AS node FROM e)"
        ),
        f"h0 AS (SELECT node, CAST({scale} AS BIGINT) AS hub FROM nodes)",
    ]
    prev_h = "h0"
    for t in range(1, n_iter + 1):
        parts += [
            (
                f"a{t}r AS (SELECT nodes.node, coalesce(s.s, 0) AS auth "
                "FROM nodes LEFT JOIN (SELECT e.dst AS node, "
                f"SUM({prev_h}.hub) AS s FROM e JOIN {prev_h} "
                f"ON {prev_h}.node = e.src GROUP BY e.dst) s "
                "ON s.node = nodes.node)"
            ),
            norm(f"a{t}r", "auth", f"a{t}"),
            (
                f"h{t}r AS (SELECT nodes.node, coalesce(s.s, 0) AS hub "
                "FROM nodes LEFT JOIN (SELECT e.src AS node, "
                f"SUM(a{t}.auth) AS s FROM e JOIN a{t} "
                f"ON a{t}.node = e.dst GROUP BY e.src) s "
                "ON s.node = nodes.node)"
            ),
            norm(f"h{t}r", "hub", f"h{t}"),
        ]
        prev_h = f"h{t}"
    return (
        "WITH "
        + ", ".join(parts)
        + f" SELECT nodes.node, h{n_iter}.hub, a{n_iter}.auth FROM nodes "
        f"JOIN h{n_iter} ON h{n_iter}.node = nodes.node "
        f"JOIN a{n_iter} ON a{n_iter}.node = nodes.node"
    )


def trustrank(
    edges: DataFrame,
    seeds: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
    seed_col: str = "node",
    n_iter: int = 3,
    damping_milli: int = 850,
    scale: int = 1_000_000,
) -> DataFrame:
    """Integer-deterministic TrustRank (Gyöngyi et al., VLDB 2004):
    personalized PageRank whose teleport mass lands ONLY on a curated
    seed set of trusted hosts, so trust decays with link distance from
    the seeds — the standard spam-demotion companion to the authority
    ranks ``pagerank`` already provides (the crawl frontier wants both:
    harvest by authority, admit by trust).

    Same determinism contract as ``pagerank``: ranks are bigints in
    ``scale`` units; each edge carries ``floor(rank(src)/outdeg(src))``;
    the damped update adds the teleport base ``floor((1000 - d) * scale /
    (1000 * n_seeds))`` to SEED nodes only (non-seeds get base 0, so a
    node unreachable from any seed holds rank 0 forever — exactly the
    spam-isolation semantics). All divisions are exact in IEEE doubles
    under the same ``scale <= 2^53/1000`` cap, so ``trustrank_sql``
    replays the run bit-for-bit.

    Scale shape mirrors ``pagerank``: one shuffle per iteration (ranks
    join edges on src, aggregate by dst), edges/nodes checkpointed once,
    per-round ``localCheckpoint`` to stop plan growth. The seed relation
    is a per-node flag joined once into the node table — broadcast-sized
    in practice (trusted-seed lists are thousands of hosts, not
    billions)."""
    if n_iter < 1:
        raise ValueError(f"n_iter must be >= 1, got {n_iter}")
    if not 0 < scale <= (1 << 53) // 1000:
        raise ValueError(f"scale must be in (0, 2^53/1000], got {scale}")
    e = edges.select(
        F.col(src_col).alias("src"), F.col(dst_col).alias("dst")
    ).distinct().localCheckpoint()
    s = seeds.select(F.col(seed_col).alias("node")).distinct()
    nodes = (
        e.select(F.col("src").alias("node"))
        .unionByName(e.select(F.col("dst").alias("node")))
        .distinct()
        .join(s.select("node", F.lit(1).alias("is_seed")), "node", "left")
        .select("node", F.coalesce("is_seed", F.lit(0)).alias("is_seed"))
        .localCheckpoint()
    )
    n_seeds = nodes.filter(F.col("is_seed") == 1).count()
    if n_seeds == 0:
        raise ValueError("no seed node appears in the graph")
    init = scale // n_seeds
    base = (1000 - damping_milli) * scale // (1000 * n_seeds)
    nodes = nodes.select(
        "node",
        (F.col("is_seed") * F.lit(int(base))).cast("long").alias("base"),
        "is_seed",
    ).localCheckpoint()
    ranks = nodes.select(
        "node",
        (F.col("is_seed") * F.lit(int(init))).cast("long").alias("rank"),
    ).localCheckpoint()
    return _pagerank_loop(
        e, nodes, ranks, n_iter, damping_milli, scale, n_seeds,
        base_col="base",
    ).select("node", "rank")


def trustrank_sql(
    edges_sql: str,
    seeds_sql: str,
    n_iter: int = 3,
    damping_milli: int = 850,
    scale: int = 1_000_000,
) -> str:
    """Unrolled oracle twin of ``trustrank``: ``seeds_sql`` is a relation
    with a ``node`` column; teleport base applies only where the node is
    seeded, replaying the bigint quantization bit-for-bit."""
    parts = [
        f"e AS (SELECT DISTINCT src, dst FROM ({edges_sql})), "
        f"sd AS (SELECT DISTINCT node FROM ({seeds_sql})), "
        "nodes AS (SELECT n.node,"
        " CASE WHEN sd.node IS NULL THEN 0 ELSE 1 END AS is_seed"
        " FROM (SELECT src AS node FROM e UNION SELECT dst FROM e) n"
        " LEFT JOIN sd ON sd.node = n.node), "
        "ns AS (SELECT count(*) AS n FROM nodes WHERE is_seed = 1), "
        "outdeg AS (SELECT src, CAST(count(*) AS BIGINT) AS deg"
        " FROM e GROUP BY src), "
        "r0 AS (SELECT node,"
        f" CAST(is_seed * ({scale} // (SELECT n FROM ns)) AS BIGINT)"
        " AS rank FROM nodes) "
    ]
    base = (
        f"CAST(n.is_seed * ((1000 - {damping_milli}) * {scale} //"
        f" (1000 * (SELECT n FROM ns))) AS BIGINT)"
    )
    for i in range(1, n_iter + 1):
        parts.append(
            f", c{i} AS (SELECT e.dst AS node,"
            f" sum(CAST(floor(r.rank / CAST(d.deg AS DOUBLE)) AS BIGINT))"
            f" AS s FROM e JOIN r{i - 1} r ON r.node = e.src"
            f" JOIN outdeg d ON d.src = e.src GROUP BY e.dst)"
            f", r{i} AS (SELECT n.node, {base} +"
            f" CAST(floor({damping_milli} * coalesce(c.s, 0) / 1000.0)"
            f" AS BIGINT) AS rank"
            f" FROM nodes n LEFT JOIN c{i} c ON c.node = n.node)"
        )
    parts.append(f" SELECT node, rank FROM r{n_iter}")
    return "WITH " + "".join(parts)


def label_propagation(
    edges: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
    n_iter: int = 3,
) -> DataFrame:
    """Synchronous label-propagation community detection (Raghavan et
    al. 2007, made deterministic): (node, community) over the
    UNDIRECTED graph of ``edges``.

    Where ``connected_components`` answers "reachable at all" (dup
    clusters) and ``pagerank``/``trustrank`` answer "how authoritative",
    LPA answers "which densely-linked neighborhood" — the host-community
    signal behind link-farm and mutual-admiration-ring detection: a
    spam ring collapses into one community whose internal link mass
    dwarfs its external edges.

    Determinism contract (the classic algorithm is notoriously
    order-dependent; this recast is not): updates are SYNCHRONOUS
    (round t+1 reads only round t), every node casts one SELF-VOTE for
    its own current label (the standard stabilization — without it a
    lone edge p—q oscillates p↔q forever under synchronous updates),
    the new label is the vote with the highest count, ties broken by
    SMALLEST label — so
    the result is a pure function of the edge set, independent of
    partitioning and engine, and an unrolled SQL twin (``lpa_sql``)
    replays it bit-for-bit. Self-loops are dropped; parallel edges
    count once (distinct neighbor pairs); a node whose only edges were
    self-loops keeps its own id as its community.

    Scale shape: per round ONE (node, nlabel) aggregate and one
    argmax window on node — both hash on the node key; labels are
    ``localCheckpoint``-ed per round (plan-growth cap, same as
    pagerank). n_iter is small (3-5) because LPA either converges in
    a few rounds or oscillates — bounded rounds ARE the algorithm."""
    if n_iter < 1:
        raise ValueError(f"n_iter must be >= 1, got {n_iter}")
    e = (
        edges.select(F.col(src_col).alias("src"), F.col(dst_col).alias("dst"))
        .filter(F.col("src") != F.col("dst"))
        .distinct()
    )
    nbrs = (
        e.select(F.col("src").alias("node"), F.col("dst").alias("nbr"))
        .unionByName(
            e.select(F.col("dst").alias("node"), F.col("src").alias("nbr"))
        )
        .distinct()
    )
    nodes = (
        edges.select(F.col(src_col).alias("node"))
        .unionByName(edges.select(F.col(dst_col).alias("node")))
        .distinct()
        .localCheckpoint()
    )
    nbrs = (
        nbrs.unionByName(
            nodes.select("node", F.col("node").alias("nbr"))
        )
        .distinct()
        .localCheckpoint()
    )
    labels = nodes.select("node", F.col("node").alias("label"))
    w = Window.partitionBy("node").orderBy(
        F.desc("n"), F.col("nlabel").asc()
    )
    for _ in range(n_iter):
        counts = (
            nbrs.join(
                labels.select(
                    F.col("node").alias("nbr"), F.col("label").alias("nlabel")
                ),
                "nbr",
            )
            .groupBy("node", "nlabel")
            .agg(F.count("*").alias("n"))
        )
        best = (
            counts.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .select("node", F.col("nlabel").alias("new_label"))
        )
        labels = (
            labels.join(best, "node", "left")
            .select(
                "node",
                F.coalesce(F.col("new_label"), F.col("label")).alias("label"),
            )
            .localCheckpoint()
        )
    return labels.select("node", F.col("label").alias("community"))


def lpa_sql(edges_sql: str, n_iter: int = 3) -> str:
    """Unrolled oracle twin of ``label_propagation``: one counts/argmax
    CTE pair per round over an ``edges_sql`` relation (src, dst)."""
    parts = [
        f"e AS (SELECT DISTINCT src, dst FROM ({edges_sql})"
        " WHERE src <> dst), "
        "nodes0 AS (SELECT src AS node FROM"
        f" ({edges_sql}) UNION SELECT dst FROM ({edges_sql})), "
        "nb AS (SELECT src AS node, dst AS nbr FROM e"
        " UNION SELECT dst, src FROM e"
        " UNION SELECT node, node FROM nodes0), "
        "l0 AS (SELECT node, node AS label FROM nodes0) "
    ]
    for i in range(1, n_iter + 1):
        prev = f"l{i - 1}"
        parts.append(
            f", c{i} AS (SELECT nb.node, p.label AS nlabel,"
            f" count(*) AS n FROM nb JOIN {prev} p ON p.node = nb.nbr"
            f" GROUP BY nb.node, p.label)"
            f", b{i} AS (SELECT node, nlabel FROM (SELECT node, nlabel,"
            f" row_number() OVER (PARTITION BY node ORDER BY n DESC,"
            f" nlabel ASC) AS rn FROM c{i}) WHERE rn = 1)"
            f", l{i} AS (SELECT p.node,"
            f" coalesce(b.nlabel, p.label) AS label FROM {prev} p"
            f" LEFT JOIN b{i} b ON b.node = p.node)"
        )
    return (
        "WITH "
        + "".join(parts)
        + f" SELECT node, label AS community FROM l{n_iter}"
    )


def keep_best_representatives(
    docs: DataFrame,
    pairs: DataFrame,
    id_col: str,
    score_col: str,
) -> DataFrame:
    """Quality-aware near-dup survivor selection: like
    ``dedup_keep_representatives`` (min-id winner) but each duplicate
    cluster keeps its HIGHEST-``score_col`` member (ties by smallest
    id) — the policy real pipelines want, because the min-id member of
    a mirror cluster is as likely the ad-ridden copy as the clean one.
    Unpaired documents always survive.

    One ``connected_components`` run (localCheckpoint-ed pointer
    jumping), one id join to attach scores, one per-cluster argmax
    window keyed on the cluster representative, one anti join back —
    every exchange hashes on id/cluster keys."""
    cc = connected_components(pairs)
    members = cc.join(
        docs.select(
            F.col(id_col).alias("id"), F.col(score_col).alias("__s")
        ),
        "id",
    )
    w = Window.partitionBy("cluster_rep").orderBy(
        F.desc("__s"), F.col("id").asc()
    )
    losers = (
        members.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") > 1)
        .select(F.col("id").alias(id_col))
    )
    return docs.join(losers, id_col, "left_anti")
