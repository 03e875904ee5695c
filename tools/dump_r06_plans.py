"""Dump .explain('formatted') for the timed bench suite queries into
plans/r06/<query>_<tag>.txt (tag = before / after). Usage:

    python tools/dump_r06_plans.py before [query ...]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, "/root/repo")

SUITE = (
    "pipeline_e2e",
    "tpch_q1",
    "asof_latest_event",
    "w3_sessionize_events",
    "minhash_lsh_pairs",
    "dedup_exact",
    "ann_cosine_topk",
    "fingerprint_kgram",
)


def main() -> None:
    tag = sys.argv[1] if len(sys.argv) > 1 else "before"
    only = sys.argv[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = "/root/repo/plans/r06"
    os.makedirs(out_dir, exist_ok=True)

    import __spark_entry__ as entry
    from comic_text_detector_spark.plans.extract import extract_fused
    from comic_text_detector_spark.session import get_spark
    from pyspark.sql import functions as F

    spark = get_spark(app_name="dump-r06-plans", master="local[4]")
    spark.sparkContext.setLogLevel("ERROR")
    qs = entry.queries()
    names = only or list(SUITE)
    for name in names:
        df = qs[name](spark, sf_dir)
        plan = df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
        )
        with open(f"{out_dir}/{name}_{tag}.txt", "w") as f:
            f.write(plan)
        print(name, "->", f"{out_dir}/{name}_{tag}.txt")
    if not only or "extract_fused" in only:
        corpus = spark.createDataFrame(
            [("u", b"<p>x</p>")], "url string, html binary"
        )
        df = extract_fused(corpus)
        plan = df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
        )
        with open(f"{out_dir}/extract_fused_{tag}.txt", "w") as f:
            f.write(plan)
        print("extract_fused ->", f"{out_dir}/extract_fused_{tag}.txt")
    spark.stop()


if __name__ == "__main__":
    main()
