"""Deterministic synchronous label propagation (operators/graph.py)."""

from __future__ import annotations

import duckdb

from comic_text_detector_spark.operators.graph import (
    label_propagation,
    lpa_sql,
)


def test_lpa_two_triangles(spark):
    edges = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "a"), ("d", "e"), ("e", "f"),
         ("f", "d")],
        "src string, dst string",
    )
    got = {r.node: r.community for r in label_propagation(edges, n_iter=3).collect()}
    # each triangle converges to its min node id
    assert got == {"a": "a", "b": "a", "c": "a", "d": "d", "e": "d", "f": "d"}


def test_lpa_self_loop_and_parallel_edges(spark):
    edges = spark.createDataFrame(
        [("x", "x"), ("p", "q"), ("q", "p"), ("p", "q")],
        "src string, dst string",
    )
    got = {r.node: r.community for r in label_propagation(edges, n_iter=2).collect()}
    # self-loop-only node keeps its own id; parallel/reverse edges count once
    assert got["x"] == "x"
    assert got["p"] == got["q"] == "p"


def test_lpa_matches_sql_twin(spark):
    rows = [
        ("a", "b"), ("b", "c"), ("c", "a"),
        ("c", "d"),  # bridge
        ("d", "e"), ("e", "f"), ("f", "d"),
        ("g", "g"),
    ]
    edges = spark.createDataFrame(rows, "src string, dst string")
    got = sorted(
        (r.node, r.community)
        for r in label_propagation(edges, n_iter=3).collect()
    )
    vals = ", ".join(f"('{s}', '{d}')" for s, d in rows)
    sql = lpa_sql(f"SELECT * FROM (VALUES {vals}) AS t(src, dst)", 3)
    want = sorted(map(tuple, duckdb.sql(sql).fetchall()))
    assert got == want


def test_lpa_repartition_invariant(spark):
    rows = [(f"n{i}", f"n{(i * 3) % 17}") for i in range(60)]
    edges = spark.createDataFrame(rows, "src string, dst string")
    a = sorted(map(tuple, label_propagation(edges, n_iter=3).collect()))
    b = sorted(
        map(
            tuple,
            label_propagation(edges.repartition(7), n_iter=3).collect(),
        )
    )
    assert a == b
