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
