"""ANALYZE-style exact table stats."""

from __future__ import annotations

from comic_text_detector_spark.operators.stats import collect_table_stats


def test_collect_table_stats_exact(spark):
    df = spark.createDataFrame(
        [
            (1, "aa", None),
            (2, "bb", 5),
            (3, "aa", 7),
            (4, None, 7),
        ],
        "id long, s string, v long",
    )
    got = {r.col: r for r in collect_table_stats(df).collect()}
    assert got["id"].n_rows == 4 and got["id"].n_nulls == 0
    assert got["id"].ndv == 4 and got["id"].min_s == "1" and got["id"].max_s == "4"
    assert got["s"].n_nulls == 1 and got["s"].ndv == 2
    assert got["s"].total_len == 6  # 3 non-null x 2 chars
    assert got["v"].n_nulls == 1 and got["v"].ndv == 2
    assert got["v"].min_s == "5" and got["v"].max_s == "7"


def test_collect_table_stats_digest_cols(spark):
    import hashlib

    df = spark.createDataFrame(
        [(1, "zzz"), (2, "aaa")], "id long, t string"
    )
    got = {
        r.col: r
        for r in collect_table_stats(df, digest_cols=("t",)).collect()
    }
    digs = sorted(
        hashlib.md5(x.encode()).hexdigest() for x in ("zzz", "aaa")
    )
    # min/max are over the digest, ndv/total_len over the raw values
    assert (got["t"].min_s, got["t"].max_s) == (digs[0], digs[-1])
    assert got["t"].ndv == 2 and got["t"].total_len == 6
