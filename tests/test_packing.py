"""Sequence packing: greedy fill invariants vs an independent replica."""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from comic_text_detector_spark.operators.packing import (
    pack_sequences,
    pack_stats,
)


def _replica(rows, budget, salt="pack"):
    """Independent python reimplementation of the documented greedy rule
    (md5 order, first doc always in pack 0, overflow opens next pack)."""
    ordered = sorted(
        rows, key=lambda r: (hashlib.md5(f"{salt}:{r[0]}".encode()).hexdigest(), r[0])
    )
    out, pack, acc, first = {}, 0, 0, True
    pos = 0
    for i, tok in ordered:
        if not first and acc + tok > budget:
            pack += 1
            acc, pos = 0, 0
        acc += tok
        out[i] = (pack, pos)
        pos += 1
        first = False
    return out


def test_pack_sequences_greedy(spark):
    rows = [("a", 4), ("b", 4), ("c", 4), ("d", 11), ("e", 2), ("f", 0)]
    df = spark.createDataFrame(rows, "doc_id string, n_tokens bigint")
    got = {
        r.doc_id: r
        for r in pack_sequences(df, budget=10, n_buckets=1).collect()
    }
    exp = _replica(rows, 10)
    assert {k: (v.pack_id, v.pack_pos) for k, v in got.items()} == exp
    # every doc packed exactly once; packs respect the budget except the
    # oversize doc, which sits alone
    by_pack = {}
    for k, v in got.items():
        by_pack.setdefault(v.pack_id, []).append(dict(rows)[k])
    for toks in by_pack.values():
        assert sum(toks) <= 10 or len(toks) == 1

    stats = pack_stats(
        pack_sequences(df, budget=10, n_buckets=1), budget=10
    ).collect()
    assert sum(s.n_docs for s in stats) == len(rows)
    assert all(s.fill_ratio <= 1.0 or s.n_docs == 1 for s in stats)

    # deterministic under repartitioning (the shard-local fill depends
    # only on the hash order, not on physical layout)
    g2 = {
        r.doc_id: (r.pack_id, r.pack_pos)
        for r in pack_sequences(
            df.repartition(5), budget=10, n_buckets=1
        ).collect()
    }
    assert g2 == exp


def test_pack_sequences_buckets(spark):
    df = spark.range(300).select(
        F.col("id").alias("doc_id"),
        (F.pmod(F.col("id") * 37, F.lit(90)) + 1).alias("n_tokens"),
    )
    packed = pack_sequences(df, budget=128, n_buckets=8)
    rows = packed.collect()
    assert len(rows) == 300  # no row lost
    assert {r.bucket for r in rows} <= set(range(8))
    # budget respected within every (bucket, pack) except singletons
    agg = (
        packed.groupBy("bucket", "pack_id")
        .agg(F.sum("n_tokens").alias("t"), F.count("*").alias("n"))
        .collect()
    )
    assert all(a.t <= 128 or a.n == 1 for a in agg)
    # positions are contiguous from 0 inside each pack
    pos = {}
    for r in rows:
        pos.setdefault((r.bucket, r.pack_id), []).append(r.pack_pos)
    assert all(sorted(v) == list(range(len(v))) for v in pos.values())


def test_pack_negative_and_validation(spark):
    """Review repros: negative/null token counts clamp to 0 consistently
    in budget accounting AND the emitted column (pack_stats must not go
    negative); n_buckets validates eagerly."""
    import pytest

    df = spark.createDataFrame(
        [("a", 4), ("b", -7), ("c", None)],
        "doc_id string, n_tokens bigint",
    )
    packed = pack_sequences(df, budget=10, n_buckets=1)
    rows = {r.doc_id: r for r in packed.collect()}
    assert rows["b"].n_tokens == 0 and rows["c"].n_tokens == 0
    stats = pack_stats(packed, budget=10).collect()
    assert all(s.pack_tokens >= 0 and s.fill_ratio >= 0.0 for s in stats)
    assert sum(s.pack_tokens for s in stats) == 4

    with pytest.raises(ValueError, match="n_buckets"):
        pack_sequences(df, budget=10, n_buckets=0)
    with pytest.raises(ValueError, match="budget"):
        pack_sequences(df, budget=0)


def test_pack_split_long_invariants(spark):
    """split_long: no token lost (parts sum to the original count), parts
    are in order within each doc (by pack, then position), each part is
    <= budget, and full parts fill packs exactly."""
    from pyspark.sql import functions as F

    from comic_text_detector_spark.operators.packing import pack_sequences

    rows = [(i, t) for i, t in enumerate(
        [250, 80, 81, 0, None, 79, 400, 1, 160, 161, -5]
    )]
    df = spark.createDataFrame(rows, "doc_id int, n_tokens int")
    out = pack_sequences(
        df, budget=80, n_buckets=4, split_long=True
    ).collect()

    by_doc = {}
    for r in out:
        by_doc.setdefault(r.doc_id, []).append(r)
    assert set(by_doc) == {i for i, _ in rows}  # no row dropped
    for i, t in rows:
        parts = sorted(by_doc[i], key=lambda r: r.part)
        clamped = max(t or 0, 0)
        # token conservation
        assert sum(r.n_tokens for r in parts) == clamped, (i, t)
        # part count = ceil(t/budget) (min 1); each part <= budget
        import math
        want = max(1, math.ceil(clamped / 80)) if clamped > 80 else 1
        assert len(parts) == want and all(r.n_tokens <= 80 for r in parts)
        assert [r.part for r in parts] == list(range(len(parts)))
        # parts appear in order along the fill: (pack_id, pack_pos) is
        # non-decreasing lexicographically with part index
        keys = [(r.pack_id, r.pack_pos) for r in parts]
        assert keys == sorted(keys), (i, keys)
        # an exactly-budget part shares its pack only with zero-token rows
        # (they consume no budget), never with token-bearing ones

    # per-pack budget never exceeded
    sums = (
        pack_sequences(df, budget=80, n_buckets=4, split_long=True)
        .groupBy("bucket", "pack_id")
        .agg(F.sum("n_tokens").alias("s"))
        .collect()
    )
    assert all(r.s <= 80 for r in sums)


def test_pack_split_long_default_schema_unchanged(spark):
    from comic_text_detector_spark.operators.packing import pack_sequences

    df = spark.createDataFrame([(1, 10)], "doc_id int, n_tokens int")
    assert "part" not in pack_sequences(df, budget=8).columns


class TestChunkSliding:
    def _chunks(self, spark, text, chunk=8, stride=6):
        from comic_text_detector_spark.operators.packing import chunk_sliding

        df = spark.createDataFrame([(1, text)], "doc_id long, text string")
        rows = chunk_sliding(df, chunk=chunk, stride=stride).collect()
        return sorted(rows, key=lambda r: r["chunk_id"])

    def test_window_math(self, spark):
        words = [f"w{i}" for i in range(20)]
        rows = self._chunks(spark, " ".join(words), chunk=8, stride=6)
        # 1 + ceil((20-8)/6) = 3 windows at starts 0, 6, 12
        assert [r["start_word"] for r in rows] == [0, 6, 12]
        assert [r["n_tokens"] for r in rows] == [8, 8, 8]
        assert rows[1]["chunk_text"].split(" ") == words[6:14]
        # overlap tokens are shared between consecutive windows
        assert rows[0]["chunk_text"].split(" ")[6:] == rows[1][
            "chunk_text"
        ].split(" ")[:2]

    def test_short_doc_single_window(self, spark):
        rows = self._chunks(spark, "a b c", chunk=8, stride=6)
        assert len(rows) == 1 and rows[0]["n_tokens"] == 3

    def test_boundary_one_past_chunk(self, spark):
        rows = self._chunks(spark, " ".join("x" * 1 for _ in range(9)),
                            chunk=8, stride=6)
        assert len(rows) == 2 and rows[1]["n_tokens"] == 3  # words 6..8

    def test_exact_partition_when_stride_equals_chunk(self, spark):
        words = [f"w{i}" for i in range(24)]
        rows = self._chunks(spark, " ".join(words), chunk=8, stride=8)
        assert [r["n_tokens"] for r in rows] == [8, 8, 8]
        # disjoint cover: concatenation reconstructs the stream exactly
        assert " ".join(r["chunk_text"] for r in rows) == " ".join(words)

    def test_empty_doc_dropped(self, spark):
        from comic_text_detector_spark.operators.packing import chunk_sliding

        df = spark.createDataFrame(
            [(1, ""), (2, None), (3, "  ")], "doc_id long, text string"
        )
        assert chunk_sliding(df).count() == 0

    def test_bad_stride_rejected(self, spark):
        import pytest as _pt

        from comic_text_detector_spark.operators.packing import chunk_sliding

        df = spark.createDataFrame([(1, "a")], "doc_id long, text string")
        with _pt.raises(ValueError):
            chunk_sliding(df, chunk=8, stride=9)
        with _pt.raises(ValueError):
            chunk_sliding(df, chunk=8, stride=0)
