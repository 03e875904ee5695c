"""ANN: brute-force correctness and LSH recall against it."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from comic_text_detector_spark.operators.similarity import cosine_topk, lsh_bucket_topk


def test_cosine_topk_exact(spark):
    rows = [
        (1, [1.0, 0.0, 0.0]),
        (2, [0.9, 0.1, 0.0]),   # closest to 1
        (3, [0.0, 1.0, 0.0]),
        (4, [0.5, 0.5, 0.0]),
        (5, [-1.0, 0.0, 0.0]),
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = cosine_topk(emb, emb.filter(F.col("vec_id") == 1), k=2)
    got = [(r.rank, r.neighbor_id) for r in out.collect()]
    assert got == [(1, 2), (2, 4)]
    cos12 = [r.cos for r in out.collect() if r.neighbor_id == 2][0]
    expect = 0.9 / math.sqrt(0.9**2 + 0.1**2)
    assert abs(cos12 - expect) < 1e-9


def test_lsh_recall_against_bruteforce(spark):
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet").cache()
    q = emb.filter(F.col("vec_id") < 15)
    truth = {(r.query_id, r.neighbor_id) for r in cosine_topk(emb, q, k=5).collect()}
    got = {
        (r.query_id, r.neighbor_id)
        for r in lsh_bucket_topk(emb, q, k=5, num_planes=4, num_tables=16).collect()
    }
    recall = len(got & truth) / len(truth)
    assert recall >= 0.85, recall
