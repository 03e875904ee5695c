"""Bucketed co-located join: the zero-shuffle big-big join pattern.

At 100 TB the expensive joins (documents ⋈ extracted, documents ⋈ dedup
verdicts) must not shuffle either side: both tables bucketed by the join
key join with NO Exchange in the physical plan. Verified here against the
actual plan string.
"""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest


@pytest.fixture()
def warehouse(spark, tmp_path):
    spark.conf.set(
        "spark.sql.sources.bucketing.enabled", "true"
    )
    return spark


def test_bucketed_join_has_no_exchange(warehouse, spark, tmp_path):
    import shutil

    for t in ("t_docs_b", "t_meta_b"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
        # a previously crashed run may leave an orphaned managed location
        shutil.rmtree(f"spark-warehouse/{t}", ignore_errors=True)
    docs = spark.range(0, 10_000).select(
        F.concat(F.lit("https://h/"), F.col("id")).alias("url"),
        (F.col("id") % 97).alias("x"),
    )
    meta = spark.range(0, 10_000, 2).select(
        F.concat(F.lit("https://h/"), F.col("id")).alias("url"),
        (F.col("id") % 7).alias("y"),
    )
    (
        docs.write.mode("overwrite")
        .bucketBy(8, "url").sortBy("url")
        .saveAsTable("t_docs_b")
    )
    (
        meta.write.mode("overwrite")
        .bucketBy(8, "url").sortBy("url")
        .saveAsTable("t_meta_b")
    )
    # force the sort-merge path (a broadcast would hide bucket co-location)
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = spark.table("t_docs_b").join(spark.table("t_meta_b"), "url")
        plan = j._jdf.queryExecution().executedPlan().toString()
        # co-located buckets: SortMergeJoin with NO shuffle exchange
        assert "SortMergeJoin" in plan, plan
        assert "Exchange hashpartitioning" not in plan, plan
        assert j.count() == 5_000
        # sanity: the same join on unbucketed frames DOES shuffle
        ju = docs.join(meta, "url")
        plan_u = ju._jdf.queryExecution().executedPlan().toString()
        assert "Exchange hashpartitioning" in plan_u
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_bucketed_extraction_zero_exchange(warehouse, spark, tmp_path):
    """README's 100-TB claim, verified against the plan: over a table
    bucketed by url, extract_fused(num_partitions=None) runs with ZERO
    Exchange nodes — the scan's bucket layout IS the partitioning — and
    the task count equals the bucket count."""
    import shutil

    from comic_text_detector_spark.fixtures import wrap_html_expr
    from comic_text_detector_spark.plans.extract import extract_fused

    spark.sql("DROP TABLE IF EXISTS t_pages_b")
    shutil.rmtree("spark-warehouse/t_pages_b", ignore_errors=True)
    docs = (
        spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        .select(
            F.concat(F.lit("https://h/"), F.col("doc_id")).alias("url"),
            wrap_html_expr(F.col("text")).alias("html"),
        )
    )
    docs.write.bucketBy(8, "url").sortBy("url").saveAsTable("t_pages_b")
    tbl = spark.table("t_pages_b")
    out = extract_fused(tbl, num_partitions=None)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert out.count() == 500
    # tiny test buckets get packed several-per-split by maxPartitionBytes;
    # at real bucket sizes each bucket is its own split — the invariant
    # here is only that parallelism comes from the scan, within the layout
    assert 1 <= out.rdd.getNumPartitions() <= 8
    spark.sql("DROP TABLE IF EXISTS t_pages_b")
