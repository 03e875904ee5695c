"""Recrawl scheduling (operators/recrawl.py)."""

from __future__ import annotations

from comic_text_detector_spark.operators.recrawl import recrawl_schedule

T0 = 1_700_000_000


def _sched(spark, rows, **kw):
    df = spark.createDataFrame(rows, "url string, ts long, digest string")
    return {r.url: r for r in recrawl_schedule(df, **kw).collect()}


def test_rates_and_policy(spark):
    rows = (
        # hot: changes every capture, 1000 s apart
        [("hot", T0 + j * 1000, f"d{j}") for j in range(4)]
        # cold: never changes, 2000 s apart
        + [("cold", T0 + j * 2000, "same") for j in range(3)]
        # single capture
        + [("one", T0, "x")]
    )
    r = _sched(spark, rows, min_interval_s=10, max_interval_s=10**9)
    hot = r["hot"]
    assert hot.n_captures == 4 and hot.n_changes == 3
    assert hot.avg_interval_s == 1000 and hot.change_ratio_milli == 1000
    # ratio 1000 -> 2000/3000 of avg = 666
    assert hot.next_fetch_ts == T0 + 3000 + 666
    cold = r["cold"]
    assert cold.n_changes == 0 and cold.change_ratio_milli == 0
    assert cold.next_fetch_ts == T0 + 4000 + 4000  # 2x avg
    one = r["one"]
    assert one.n_captures == 1 and one.avg_interval_s is None
    assert one.next_fetch_ts == T0 + 7 * 86400  # default interval


def test_clamps(spark):
    rows = [("u", T0 + j, f"d{j}") for j in range(3)]  # avg 1 s, hot
    r = _sched(spark, rows, min_interval_s=3600)
    assert r["u"].next_fetch_ts == T0 + 2 + 3600  # clamped up
    rows2 = [("v", T0 + j * 10**8, "same") for j in range(2)]
    r2 = _sched(spark, rows2, max_interval_s=86400)
    assert r2["v"].next_fetch_ts == T0 + 10**8 + 86400  # clamped down


def test_tie_and_partition_determinism(spark):
    rows = [("u", T0, "b"), ("u", T0, "a"), ("u", T0 + 5, "b")]
    df = spark.createDataFrame(rows, "url string, ts long, digest string")
    a = recrawl_schedule(df.repartition(1)).collect()
    b = recrawl_schedule(df.repartition(7)).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
    # order (ts, digest): a,b,b -> one change
    assert a[0].n_changes == 1
