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
