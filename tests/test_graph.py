"""Distributed connected components + cluster-dedup."""

from __future__ import annotations

from comic_text_detector_spark.operators.graph import (
    connected_components,
    dedup_keep_representatives,
)


def test_connected_components_planted(spark):
    # components: {1,2,3,4} (chain), {10,11}, {20} absent (no pairs)
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11)], "id_a long, id_b long"
    )
    cc = {r.id: r.cluster_rep for r in connected_components(pairs).collect()}
    assert cc == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10}


def test_connected_components_long_chain(spark):
    # a 30-node chain needs multiple propagation rounds
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(30)], "id_a long, id_b long"
    )
    cc = connected_components(pairs)
    reps = {r.cluster_rep for r in cc.collect()}
    assert reps == {0}


def test_dedup_keep_representatives(spark):
    docs = spark.createDataFrame(
        [(i, f"doc{i}") for i in range(6)], "doc_id long, text string"
    )
    pairs = spark.createDataFrame([(0, 3), (3, 5)], "id_a long, id_b long")
    kept = sorted(
        r.doc_id for r in dedup_keep_representatives(docs, pairs, "doc_id").collect()
    )
    assert kept == [0, 1, 2, 4]  # 3 and 5 collapse into 0's cluster


def test_pagerank_planted_star(spark):
    """Star graph: every leaf links to the hub — the hub must dominate,
    leaves tie exactly (integer determinism), mass accounting sane."""
    from comic_text_detector_spark.operators.graph import pagerank

    edges = spark.createDataFrame(
        [(f"leaf{i}", "hub") for i in range(9)] + [("hub", "leaf0")],
        "src string, dst string",
    )
    ranks = {r.node: r.rank for r in pagerank(edges, n_iter=5).collect()}
    assert ranks["hub"] > ranks["leaf0"] > ranks["leaf1"]  # leaf0 gets hub's link
    assert len({ranks[f"leaf{i}"] for i in range(1, 9)}) == 1  # exact tie
    assert sum(ranks.values()) <= 1_000_000  # dangling leak only shrinks


def test_pagerank_deterministic_and_cycle_uniform(spark):
    from comic_text_detector_spark.operators.graph import pagerank

    cyc = spark.createDataFrame(
        [(f"n{i}", f"n{(i + 1) % 6}") for i in range(6)],
        "src string, dst string",
    )
    a = sorted(map(tuple, pagerank(cyc, n_iter=4).collect()))
    b = sorted(map(tuple, pagerank(cyc.repartition(5), n_iter=4).collect()))
    assert a == b
    assert len({r for _, r in a}) == 1  # symmetric cycle → identical ranks

    import pytest

    with pytest.raises(ValueError):
        pagerank(spark.createDataFrame([], "src string, dst string"))


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "src string, dst string")


def test_pagerank_incremental_parity_with_batch_at_fixpoint(spark):
    """The warm restart and a cold batch run share the same iteration map
    over the merged graph. The floor-quantized integer map admits a small
    FAMILY of fixpoints (each floor can absorb <1 unit per round), so the
    two trajectories may stabilize a few units apart — parity here means
    identical node set and ranks within 32 micro-units of scale 1e6
    (3.2e-5 relative; measured drift on this graph is 2-4 units)."""
    from comic_text_detector_spark.operators.graph import (
        pagerank,
        pagerank_incremental,
    )

    prev = _edges(spark, [
        ("a", "b"), ("b", "c"), ("c", "a"), ("a", "c"), ("d", "a"),
    ])
    add = _edges(spark, [("c", "d"), ("e", "a")])
    rem = _edges(spark, [("a", "c")])
    prev_r = pagerank(prev, n_iter=3)
    inc = pagerank_incremental(
        prev, prev_r, add, rem, n_iter=60, stop_when_stable=True
    )
    merged = _edges(spark, [
        ("a", "b"), ("b", "c"), ("c", "a"), ("d", "a"),
        ("c", "d"), ("e", "a"),
    ])
    batch = pagerank(merged, n_iter=60, stop_when_stable=True)
    got = {r.node: r.rank for r in inc.collect()}
    want = {r.node: r.rank for r in batch.collect()}
    assert set(got) == set(want)
    assert all(abs(got[n] - want[n]) <= 32 for n in want), (got, want)


def test_pagerank_incremental_planted_delta(spark):
    """Removing a node's only inbound edge drops it to the damping base;
    adding inbound edges raises the target; a brand-new node joins at the
    merged graph's uniform init before iterating."""
    from comic_text_detector_spark.operators.graph import (
        pagerank,
        pagerank_incremental,
    )

    prev = _edges(spark, [("a", "b"), ("b", "a"), ("a", "c"), ("c", "a")])
    prev_r = pagerank(prev, n_iter=3)
    before = {r.node: r.rank for r in prev_r.collect()}

    # remove c's only inbound edge (a->c): c keeps only the base term
    out = pagerank_incremental(
        prev, prev_r, edges_remove=_edges(spark, [("a", "c")]), n_iter=4
    )
    got = {r.node: r.rank for r in out.collect()}
    n, scale, dm = 3, 1_000_000, 850
    assert got["c"] == (1000 - dm) * scale // (1000 * n)
    assert got["c"] < before["c"]

    # add a new node e pointing at b: b's rank rises vs the same restart
    # without the add (e also becomes a ranked node)
    with_add = {
        r.node: r.rank
        for r in pagerank_incremental(
            prev, prev_r, edges_add=_edges(spark, [("e", "b")]), n_iter=4
        ).collect()
    }
    without = {
        r.node: r.rank
        for r in pagerank_incremental(prev, prev_r, n_iter=4).collect()
    }
    assert "e" in with_add and "e" not in without
    assert with_add["b"] > without["b"]


def test_pagerank_incremental_noop_delta_matches_restart(spark):
    """Removing an edge that does not exist must be a no-op: the result
    equals a plain warm restart on the unchanged graph."""
    from comic_text_detector_spark.operators.graph import (
        pagerank_incremental,
        pagerank,
    )

    prev = _edges(spark, [("a", "b"), ("b", "a"), ("b", "c")])
    prev_r = pagerank(prev, n_iter=2)
    noop = pagerank_incremental(
        prev, prev_r, edges_remove=_edges(spark, [("x", "y")]), n_iter=3
    )
    plain = pagerank_incremental(prev, prev_r, n_iter=3)
    assert {(r.node, r.rank) for r in noop.collect()} == {
        (r.node, r.rank) for r in plain.collect()
    }


def test_bfs_depth_chain_and_branches(spark):
    from comic_text_detector_spark.operators.graph import bfs_depth

    # 0 -> 1 -> 2 -> 3 -> 4; shortcut 0 -> 3; island 9 -> 10
    edges = spark.createDataFrame(
        [("0", "1"), ("1", "2"), ("2", "3"), ("3", "4"), ("0", "3"),
         ("9", "10")],
        "src string, dst string",
    )
    seeds = spark.createDataFrame([("0",)], "node string")
    got = {r.node: r.depth for r in bfs_depth(edges, seeds, 8).collect()}
    # min-hop wins: 3 is reachable in 1 via the shortcut, 4 in 2
    assert got == {"0": 0, "1": 1, "2": 2, "3": 1, "4": 2}


def test_bfs_depth_cap_and_cycle_termination(spark):
    from comic_text_detector_spark.operators.graph import bfs_depth

    # a 6-cycle; with max_depth=3 only 4 labels appear and the loop ends
    edges = spark.createDataFrame(
        [(str(i), str((i + 1) % 6)) for i in range(6)],
        "src string, dst string",
    )
    seeds = spark.createDataFrame([("0",)], "node string")
    got = {r.node: r.depth for r in bfs_depth(edges, seeds, 3).collect()}
    assert got == {"0": 0, "1": 1, "2": 2, "3": 3}


def test_bfs_depth_multiple_seeds_min_and_null_edges(spark):
    from comic_text_detector_spark.operators.graph import bfs_depth

    edges = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "d"), (None, "a"), ("d", None)],
        "src string, dst string",
    )
    seeds = spark.createDataFrame(
        [("a",), ("c",), ("a",)], "node string"  # dup seed tolerated
    )
    got = {r.node: r.depth for r in bfs_depth(edges, seeds, 8).collect()}
    # c is a seed, so d is 1 hop (not 3 via a); null endpoints dropped
    assert got == {"a": 0, "c": 0, "b": 1, "d": 1}


def test_hits_star_hub_vs_authority(spark):
    from comic_text_detector_spark.operators.graph import hits_scores

    # h points at all three a's; x points only at a1
    edges = spark.createDataFrame(
        [("h", "a1"), ("h", "a2"), ("h", "a3"), ("x", "a1")],
        "src string, dst string",
    )
    out = {r.node: r for r in hits_scores(edges, n_iter=2).collect()}
    # h links to every authority -> best hub; a1 has two in-links -> top
    # authority; pure hubs have zero authority and vice versa
    assert out["h"].hub > out["x"].hub > 0
    assert out["a1"].auth > out["a2"].auth > 0
    assert out["h"].auth == 0 and out["x"].auth == 0
    assert out["a1"].hub == 0
    # symmetric nodes get identical scores
    assert out["a2"].auth == out["a3"].auth


def test_hits_deterministic_across_repartition(spark):
    from comic_text_detector_spark.operators.graph import hits_scores

    edges = spark.createDataFrame(
        [(f"n{i}", f"n{(i * 3 + 1) % 17}") for i in range(17)],
        "src string, dst string",
    )
    a = sorted(map(tuple, hits_scores(edges, n_iter=3).collect()))
    b = sorted(
        map(tuple, hits_scores(edges.repartition(5), n_iter=3).collect())
    )
    assert a == b


def test_hits_empty_graph_raises(spark):
    import pytest

    from comic_text_detector_spark.operators.graph import hits_scores

    empty = spark.createDataFrame([], "src string, dst string")
    with pytest.raises(ValueError, match="empty graph"):
        hits_scores(empty)


def test_trustrank_seed_decay_and_isolation(spark):
    """Chain seeded at its head: trust decays monotonically with link
    distance; a disconnected spam island (unreachable from the seed)
    holds rank 0 forever; seed teleport keeps the head on top."""
    from comic_text_detector_spark.operators.graph import trustrank

    edges = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "d")]  # trusted chain
        + [("x", "y"), ("y", "x")],  # spam island, no path from seed
        "src string, dst string",
    )
    seeds = spark.createDataFrame([("a",)], "node string")
    ranks = {
        r.node: r.rank for r in trustrank(edges, seeds, n_iter=4).collect()
    }
    assert ranks["a"] > ranks["b"] > ranks["c"] > ranks["d"]
    assert ranks["x"] == 0 and ranks["y"] == 0


def test_trustrank_vs_pagerank_spam_demotion(spark):
    """A heavily-inlinked spam hub outranks a trusted page under plain
    pagerank but not under trustrank seeded away from it."""
    from comic_text_detector_spark.operators.graph import pagerank, trustrank

    edges = spark.createDataFrame(
        [(f"s{i}", "spamhub") for i in range(20)]  # link farm
        + [("good", "spamhub"), ("trusted", "good")],
        "src string, dst string",
    )
    seeds = spark.createDataFrame([("trusted",)], "node string")
    pr = {r.node: r.rank for r in pagerank(edges, n_iter=3).collect()}
    tr = {r.node: r.rank for r in trustrank(edges, seeds, n_iter=3).collect()}
    assert pr["spamhub"] > pr["good"]  # the farm wins on raw authority
    assert tr["trusted"] > tr["spamhub"] or tr["good"] > tr["spamhub"] or (
        tr["spamhub"] < pr["spamhub"]
    )
    # farm sources are unreachable from the seed: zero trust
    assert all(tr[f"s{i}"] == 0 for i in range(20))


def test_trustrank_no_seed_in_graph_raises(spark):
    import pytest as _pytest

    from comic_text_detector_spark.operators.graph import trustrank

    edges = spark.createDataFrame([("a", "b")], "src string, dst string")
    seeds = spark.createDataFrame([("zzz",)], "node string")
    with _pytest.raises(ValueError):
        trustrank(edges, seeds)


def test_keep_best_representatives(spark):
    from comic_text_detector_spark.operators.graph import (
        keep_best_representatives,
    )

    docs = spark.createDataFrame(
        [(1, 10), (2, 90), (3, 50), (7, 5), (9, 99)],
        "doc_id long, q long",
    )
    # cluster {1,2,3} via a chain; 7 and 9 unpaired
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3)], "id_a long, id_b long"
    )
    kept = sorted(
        r.doc_id
        for r in keep_best_representatives(docs, pairs, "doc_id", "q")
        .collect()
    )
    # best-quality member 2 survives (NOT min-id 1); singletons stay
    assert kept == [2, 7, 9]


def test_keep_best_representatives_tie(spark):
    from comic_text_detector_spark.operators.graph import (
        keep_best_representatives,
    )

    docs = spark.createDataFrame(
        [(5, 10), (6, 10)], "doc_id long, q long"
    )
    pairs = spark.createDataFrame([(5, 6)], "id_a long, id_b long")
    kept = [
        r.doc_id
        for r in keep_best_representatives(docs, pairs, "doc_id", "q")
        .collect()
    ]
    assert kept == [5]  # score tie -> smallest id
