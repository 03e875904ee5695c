"""The bench curation e2e chain (bench.run_curate_e2e): every stage must
do its planted job — robots drops /private/, decontamination drops
benchmark-derived docs, line-dedup strips the corpus-wide boilerplate
line, span-dedup cuts the planted verbatim passage, packing conserves
docs — so the recorded BENCH numbers measure real work, not no-ops."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

import bench


@pytest.fixture(scope="module")
def chain(spark, tmp_path_factory, request):
    tmp = tmp_path_factory.mktemp("curate_bench")
    corpus = str(tmp / "corpus.parquet")
    work = str(tmp / "work")
    mp = pytest.MonkeyPatch()
    request.addfinalizer(mp.undo)
    mp.setattr(bench, "SF_DIR", "/root/testdata/sf0.001")
    mp.setattr(bench, "CURATE_REPLICAS", 4)
    bench.ensure_curate_corpus(spark, path=corpus, replicas=4)
    summary = bench.run_curate_e2e(
        spark, corpus_path=corpus, work_dir=work, select_mod=1
    )
    return spark, corpus, work, summary


def test_stage_monotone_and_counts(chain):
    spark, corpus, work, s = chain
    assert s["docs_in"] == 500 * 4
    r = s["stage_rows"]
    assert s["docs_in"] > r["robots"] > r["decontaminate"] > 0
    # line/span stages rewrite text, never drop docs
    assert r["line_dedup"] == r["cut_spans"] == r["decontaminate"]
    assert r["lm_floor"] >= r["logit_floor"] == s["docs_out"]
    assert r["pack"] >= s["docs_out"]  # split parts can only add rows
    assert set(s["stage_wall_ms"]) == set(r)


def test_robots_dropped_private(chain):
    spark, corpus, work, s = chain
    kept = spark.read.parquet(f"{work}/robots")
    assert kept.filter(F.col("url").contains("/private/")).count() == 0
    n_private = (
        spark.read.parquet(corpus)
        .filter(F.col("url").contains("/private/"))
        .count()
    )
    assert n_private > 0
    assert s["docs_in"] - s["stage_rows"]["robots"] == n_private


def test_decontaminate_dropped_benchmark_derived(chain):
    spark, corpus, work, s = chain
    kept = spark.read.parquet(f"{work}/decontaminate")
    # urls end in /<rep>/<doc_id>; every doc derived from a benchmark base
    # doc (doc_id < 50) shares 5-grams with it and must be gone
    doc_id = F.regexp_extract("url", r"/(\d+)$", 1).cast("long")
    assert kept.filter(doc_id < 50).count() == 0


def test_line_dedup_stripped_boilerplate(chain):
    spark, corpus, work, s = chain
    out = spark.read.parquet(f"{work}/line_dedup")
    assert out.filter(F.col("text").contains(bench._BOILER_LINE)).count() == 0
    # the per-doc unique first line survives (it is not boilerplate)
    assert out.filter(F.col("text").startswith("doc u")).count() == out.count()


def test_cut_spans_removed_planted_passage(chain):
    spark, corpus, work, s = chain
    before = spark.read.parquet(f"{work}/line_dedup")
    n_planted = before.filter(
        F.col("text").contains(bench._DUP_PASSAGE)
    ).count()
    assert n_planted > 0  # survivors of earlier stages still carry it
    after = spark.read.parquet(f"{work}/cut_spans")
    assert after.filter(F.col("text").contains(bench._DUP_PASSAGE)).count() == 0


def test_pack_covers_every_survivor(chain):
    spark, corpus, work, s = chain
    packed = spark.read.parquet(f"{work}/pack")
    assert packed.select("url").distinct().count() == s["docs_out"]
    # split_long conserves tokens: sum over parts == each doc's count
    survivors = spark.read.parquet(f"{work}/logit_floor").select(
        "url", F.size(F.split("text", " ")).alias("want")
    )
    got = packed.groupBy("url").agg(F.sum("n_tokens").alias("got"))
    assert survivors.join(got, "url").filter(
        F.col("want") != F.col("got")
    ).count() == 0
