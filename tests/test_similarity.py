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


def test_embedding_near_dup_pairs_planted(spark):
    import random

    from comic_text_detector_spark.operators.similarity import (
        embedding_near_dup_pairs,
    )

    rng = random.Random(3)
    rows = []
    for i in range(60):
        rows.append((i, [rng.gauss(0, 1) for _ in range(64)]))
    # planted near-dups: tiny perturbations of vectors 0 and 1
    for j, base in ((100, 0), (101, 1)):
        v = [x + rng.gauss(0, 0.01) for x in rows[base][1]]
        rows.append((j, v))
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    pairs = {
        (r.id_a, r.id_b)
        for r in embedding_near_dup_pairs(emb, threshold=0.95, dim=64).collect()
    }
    assert (0, 100) in pairs and (1, 101) in pairs
    assert all(a in (0, 1) and b in (100, 101) for a, b in pairs)


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


def test_ivf_recall_against_bruteforce(spark):
    """IVF coarse-quantizer path: probing nprobe of n_centroids inverted
    lists recovers most of the exact top-k."""
    from comic_text_detector_spark.operators.similarity import ivf_topk

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet").cache()
    q = emb.filter(F.col("vec_id") < 15)
    truth = {(r.query_id, r.neighbor_id) for r in cosine_topk(emb, q, k=5).collect()}
    got = {
        (r.query_id, r.neighbor_id)
        for r in ivf_topk(emb, q, k=5, n_centroids=8, nprobe=4, iters=3).collect()
    }
    recall = len(got & truth) / len(truth)
    assert recall >= 0.7, recall
    # ranks are contiguous from 1 per query
    ranks = {}
    for r in ivf_topk(emb, q.limit(3), k=3, n_centroids=8, nprobe=4, iters=2).collect():
        ranks.setdefault(r.query_id, []).append(r.rank)
    assert all(sorted(v) == list(range(1, len(v) + 1)) for v in ranks.values())


def test_ivf_sample_trained_recall_and_determinism(spark):
    """100 TB path: the quantizer trains on a deterministic hash subsample
    (Lloyd iterations never scan the full corpus); recall holds and the
    trained centroids are invariant under repartitioning."""
    from comic_text_detector_spark.operators.similarity import (
        ivf_topk,
        kmeans_centroids,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet").cache()
    q = emb.filter(F.col("vec_id") < 15)
    truth = {(r.query_id, r.neighbor_id) for r in cosine_topk(emb, q, k=5).collect()}
    got = {
        (r.query_id, r.neighbor_id)
        for r in ivf_topk(
            emb, q, k=5, n_centroids=8, nprobe=4, iters=3,
            train_sample_rate=0.5,
        ).collect()
    }
    recall = len(got & truth) / len(truth)
    assert recall >= 0.7, recall

    c1 = kmeans_centroids(emb, k=4, iters=2, sample_rate=0.5)
    c2 = kmeans_centroids(emb.repartition(5), k=4, iters=2, sample_rate=0.5)
    assert c1 == c2
    # the sample really is a strict subset of the corpus
    from comic_text_detector_spark.operators.curation import hash_uniform
    n_all = emb.count()
    n_train = emb.filter(
        hash_uniform(F.col("vec_id"), "kmeans") < F.lit(0.5)
    ).count()
    assert 0 < n_train < n_all


def test_kmeans_fails_fast_on_tiny_sample(spark):
    """A sample too small for k centroids must raise, not silently return
    empty top-k results (review repro)."""
    import pytest

    from comic_text_detector_spark.operators.similarity import (
        kmeans_centroids,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    with pytest.raises(ValueError, match="sample_rate"):
        kmeans_centroids(emb, k=8, iters=1, sample_rate=1e-9)
