"""AQE skew-join splitting: the runtime re-plan the engine relies on for
residual skew that salting didn't pre-empt."""

from __future__ import annotations

import pyspark.sql.functions as F


def test_aqe_splits_skewed_join_partition(spark):
    # one hot key holding ~90% of the fact side
    fact = spark.range(0, 400_000).select(
        F.when(F.col("id") % 10 != 0, F.lit(7)).otherwise(F.col("id") % 97).alias("k"),
        F.concat(F.lit("payload-"), F.col("id")).alias("p"),
    )
    dim = spark.range(0, 97).select(
        F.col("id").alias("k"), F.concat(F.lit("d"), F.col("id")).alias("d")
    )
    conf = spark.conf
    saved = {
        k: conf.get(k)
        for k in (
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
            "spark.sql.adaptive.advisoryPartitionSizeInBytes",
            "spark.sql.autoBroadcastJoinThreshold",
        )
    }
    try:
        # thresholds low enough that the hot partition counts as skewed
        conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "64KB")
        conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "64KB")
        conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")  # force SMJ
        # aggregate AFTER the join so the collected result is tiny but the
        # join itself still executes inside THIS DataFrame's query execution
        # (count() would build a separate plan and never finalize this one)
        j = fact.join(dim, "k").groupBy("d").agg(F.count("*").alias("n"))
        rows = j.collect()
        assert sum(r.n for r in rows) == 400_000
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "isFinalPlan=true" in plan
        assert "skew=true" in plan, plan[:2000]
    finally:
        for k, v in saved.items():
            conf.set(k, v)
