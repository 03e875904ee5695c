"""DSIR importance resampling: planted distribution-shift behavior,
selection modes, and DuckDB oracle parity."""

import duckdb
import pandas as pd
import pytest

from comic_text_detector_spark.operators.dsir import (
    dsir_select,
    dsir_select_sql,
    dsir_weights,
    dsir_weights_sql,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


class TestDsirWeights:
    def test_target_like_doc_outranks(self, spark):
        # Target speaks "math"; raw pool has one math doc and two
        # cooking docs. The math doc must carry the highest weight.
        target = _docs(
            spark,
            [
                (100, "theorem proof lemma theorem integral"),
                (101, "lemma proof proof theorem algebra"),
            ],
        )
        raw = _docs(
            spark,
            [
                (1, "theorem proof lemma algebra integral"),
                (2, "butter flour sugar oven whisk"),
                (3, "salt pepper onion garlic stock"),
            ],
        )
        w = {
            r["doc_id"]: r["logw"]
            for r in dsir_weights(raw, target).collect()
        }
        assert w[1] > w[2] and w[1] > w[3]

    def test_empty_and_null_docs_absent(self, spark):
        target = _docs(spark, [(9, "a b c")])
        raw = _docs(spark, [(1, "a b"), (2, ""), (3, None)])
        ids = {r["doc_id"] for r in dsir_weights(raw, target).collect()}
        assert ids == {1}

    def test_weight_is_exact_micro_sum(self, spark):
        # n_feats counts every unigram+bigram occurrence: 3 words ->
        # 3 unigrams + 2 bigrams.
        target = _docs(spark, [(9, "a b c")])
        raw = _docs(spark, [(1, "a b c")])
        r = dsir_weights(raw, target).collect()[0]
        assert r["n_feats"] == 5
        assert round(r["logw"] * 1e6) == pytest.approx(r["logw"] * 1e6)


class TestDsirSelect:
    ROWS = [(i, f"word{i % 4} common text number {i}") for i in range(40)]

    def test_deterministic_topk_ordering(self, spark):
        raw = _docs(spark, self.ROWS)
        target = raw.filter("doc_id % 4 = 0")
        got = dsir_select(raw, target, k=10).collect()
        keys = [(r["sel_key"], r["doc_id"]) for r in got]
        assert keys == sorted(keys, key=lambda t: (-t[0], t[1]))
        assert len(got) == 10

    def test_gumbel_seed_changes_sample_not_weights(self, spark):
        raw = _docs(spark, self.ROWS)
        target = raw.filter("doc_id % 4 = 0")
        a = dsir_select(raw, target, k=10, seed=1).collect()
        b = dsir_select(raw, target, k=10, seed=1).collect()
        assert [r["doc_id"] for r in a] == [r["doc_id"] for r in b]
        for r in a:  # sel_key = logw + gumbel noise, so never equal
            assert r["sel_key"] != pytest.approx(r["logw"], abs=1e-9)


class TestDsirOracleParity:
    def _parity(self, spark, spark_df, sql, rows, key):
        got = spark_df.toPandas()
        if key:
            got = got.sort_values(key).reset_index(drop=True)
        con = duckdb.connect()
        con.register("documents", pd.DataFrame(rows, columns=["doc_id", "text"]))
        ora = con.execute(sql).df()
        if key:
            ora = ora.sort_values(key).reset_index(drop=True)
        cols = sorted(got.columns)
        assert got[cols].equals(ora[cols].astype(got[cols].dtypes.to_dict()))

    def test_weights_and_select_match_duckdb(self, spark):
        rows = [
            (i, " ".join(f"tok{(i * 7 + j) % 13}" for j in range(12)))
            for i in range(60)
        ] + [(60, ""), (61, None)]
        raw = _docs(spark, rows)
        target = raw.filter("doc_id % 5 = 0")
        raw_src = "SELECT doc_id, text FROM documents"
        tgt_src = "SELECT doc_id, text FROM documents WHERE doc_id % 5 = 0"
        self._parity(
            spark,
            dsir_weights(raw, target),
            dsir_weights_sql(raw_src, tgt_src),
            rows,
            key=["doc_id"],
        )
        self._parity(
            spark,
            dsir_select(raw, target, k=15, seed=3),
            dsir_select_sql(raw_src, tgt_src, k=15, seed=3),
            rows,
            key=None,  # LIMIT ordering is part of the contract
        )
