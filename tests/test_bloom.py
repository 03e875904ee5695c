"""Deterministic Bloom filter (operators/bloom.py)."""

from __future__ import annotations

import pytest

from comic_text_detector_spark.operators.bloom import (
    bloom_build,
    bloom_contains,
)

M, K = 1 << 14, 3


def _urls(spark, names):
    return spark.createDataFrame([(n,) for n in names], "url string")


def test_no_false_negatives_and_low_fp(spark):
    seen = [f"https://h{i}/p{i}" for i in range(200)]
    bloom = bloom_build(_urls(spark, seen), m_bits=M, k=K)
    probe = seen[:50] + [f"https://new{i}/q{i}" for i in range(200)]
    out = {
        r.url: r.maybe_present
        for r in bloom_contains(
            _urls(spark, probe), bloom, m_bits=M, k=K
        ).collect()
    }
    assert all(out[u] for u in seen[:50])  # NEVER a false negative
    fps = sum(out[u] for u in probe[50:])
    # 200 keys * 3 bits in 16384: fp rate ~ (600/16384)^3 ~ 5e-5
    assert fps <= 2


def test_deterministic_across_partitionings(spark):
    seen = [f"u{i}" for i in range(100)]
    b1 = bloom_build(_urls(spark, seen).repartition(1), m_bits=M, k=K)
    b8 = bloom_build(_urls(spark, seen).repartition(8), m_bits=M, k=K)
    assert sorted(map(tuple, b1.collect())) == sorted(map(tuple, b8.collect()))


def test_empty_filter_rejects_everything(spark):
    empty = bloom_build(_urls(spark, []), m_bits=M, k=K)
    out = bloom_contains(_urls(spark, ["a", "b"]), empty, m_bits=M, k=K)
    assert [r.maybe_present for r in out.collect()] == [False, False]


def test_param_validation(spark):
    df = _urls(spark, ["a"])
    with pytest.raises(ValueError):
        bloom_build(df, m_bits=32)
    with pytest.raises(ValueError):
        bloom_build(df, k=0)
