"""Token-ID emission + fixed-length packing: id/count consistency with the
BPE counter, vocab determinism, unk handling, and pack shape/conservation
invariants.

Reference lineage: the reference's final artifact emission
(inference.py:147-163 writes boxes/mask/lines per image); here the final
artifact is the packed token-id shard a pretraining loader consumes.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from comic_text_detector_spark.functions.textstats import (
    bpe_reference_encode,
    token_count_bpe,
)
from comic_text_detector_spark.operators.tokenize import (
    build_bpe_vocab,
    pack_token_ids,
    tokenize_ids,
)

DOCS = [
    ("a", "the cat and the hat"),
    ("b", "in the beginning"),
    ("c", ""),
    ("d", None),
    ("e", "station station station"),
    ("f", "q"),
]


def _docs(spark):
    return spark.createDataFrame(DOCS, "doc_id string, text string")


def test_token_stream_matches_reference_bpe(spark):
    """ids decode (via the vocab) to exactly the priority-loop reference
    BPE token stream, doc by doc."""
    df = _docs(spark)
    vocab = {r.token: r.tid for r in build_bpe_vocab(df).collect()}
    inv = {v: k for k, v in vocab.items()}
    got = {
        r.doc_id: [inv[i] for i in r.ids]
        for r in tokenize_ids(df).collect()
    }
    for doc_id, text in DOCS:
        assert got[doc_id] == bpe_reference_encode(text or "")


def test_n_tokens_matches_token_count_bpe(spark):
    df = _docs(spark)
    counts = {
        r.doc_id: r.n_tokens_bpe for r in token_count_bpe(df).collect()
    }
    for r in tokenize_ids(df).collect():
        assert len(r.ids) == r.n_tokens == counts[r.doc_id]


def test_vocab_dense_lexicographic(spark):
    rows = build_bpe_vocab(_docs(spark)).collect()
    toks = [r.token for r in sorted(rows, key=lambda r: r.tid)]
    assert [r.tid for r in sorted(rows, key=lambda r: r.tid)] == list(
        range(len(rows))
    )
    assert toks == sorted(toks)


def test_external_vocab_unk(spark):
    """A supplied vocab maps unseen tokens to unk_id — never dropped, so
    len(ids) still equals n_tokens."""
    df = _docs(spark)
    vocab = build_bpe_vocab(df.filter(F.col("doc_id") == "f"))
    out = {
        r.doc_id: r
        for r in tokenize_ids(df, vocab=vocab, unk_id=-9).collect()
    }
    assert list(out["f"].ids) == [0]  # 'q' is the only vocab entry
    a = out["a"]
    assert len(a.ids) == a.n_tokens > 0
    assert all(i == -9 for i in a.ids)  # nothing in 'a' survives 'q'-vocab


def test_empty_and_null_docs_present(spark):
    out = {r.doc_id: r for r in tokenize_ids(_docs(spark)).collect()}
    for d in ("c", "d"):
        assert out[d].n_tokens == 0 and list(out[d].ids) == []


def test_pack_token_ids_shape_and_conservation(spark):
    budget = 7
    df = _docs(spark)
    packs = pack_token_ids(df, budget=budget, n_buckets=2, pad_id=-1).collect()
    tok = tokenize_ids(df).collect()
    total = sum(r.n_tokens for r in tok)
    assert sum(p.n_tokens for p in packs) == total
    assert sum(p.n_docs for p in packs) >= len(
        [r for r in tok if r.n_tokens > 0]
    )
    for p in packs:
        assert len(p.ids) == budget
        body = list(p.ids)[: p.n_tokens]
        tail = list(p.ids)[p.n_tokens :]
        assert all(i == -1 for i in tail)
        assert all(i != -1 for i in body) or p.n_tokens == 0


def test_pack_token_ids_id_multiset_preserved(spark):
    """Every emitted non-pad id across all packs is exactly the corpus
    token-id multiset: no id lost, duplicated, or faked by packing."""
    from collections import Counter

    df = _docs(spark)
    want = Counter()
    for r in tokenize_ids(df).collect():
        want.update(r.ids)
    got = Counter()
    for p in pack_token_ids(df, budget=5, n_buckets=3).collect():
        got.update(list(p.ids)[: p.n_tokens])
    assert got == want


def test_pack_token_ids_split_long_slices_in_order(spark):
    """A doc over budget splits into consecutive budget-size slices; within
    any single pack, slices of the same doc appear in part order and
    concatenate back to a contiguous run of the doc's id stream."""
    df = _docs(spark).filter(F.col("doc_id") == "e")
    full = tokenize_ids(df).collect()[0]
    assert full.n_tokens > 4  # must actually split at budget 4
    packs = pack_token_ids(df, budget=4, n_buckets=1).collect()
    chunks = []
    for p in sorted(packs, key=lambda p: p.pack_id):
        chunks.extend(list(p.ids)[: p.n_tokens])
    assert chunks == list(full.ids)


def _mlp(p):
    import math

    return round(math.log10(p) * 1000)


def _demo_pieces(spark):
    rows = [("t", _mlp(.05)), ("a", _mlp(.05)), ("b", _mlp(.05)),
            ("l", _mlp(.05)), ("e", _mlp(.05)), ("ta", _mlp(.02)),
            ("ble", _mlp(.03)), ("table", _mlp(.04)), ("s", _mlp(.05)),
            ("c", _mlp(.05)), ("n", _mlp(.05)), ("scan", _mlp(.01))]
    return spark.createDataFrame(rows, "piece string, milli_lp long")


def test_unigram_tokenize_viterbi_optimal(spark):
    """Hand-checked min-cost segmentations: whole-word piece beats any
    split; unknown chars pay the UNK cost; wordless docs emit empty."""
    from comic_text_detector_spark.operators.tokenize import unigram_tokenize

    docs = spark.createDataFrame(
        [(1, "table scan"), (2, "tableta"), (3, "xq table"), (4, " ")],
        "doc_id long, text string",
    )
    got = {r.doc_id: r for r in
           unigram_tokenize(docs, _demo_pieces(spark)).collect()}
    assert got[1].tokens == ["table", "scan"]
    assert got[1].total_cost == 1398 + 2000
    assert got[2].tokens == ["table", "ta"]  # 1398+1699 beats ta+ble+ta
    assert got[3].tokens == ["x", "q", "table"]
    assert got[3].total_cost == 20000 * 2 + 1398
    assert got[4].tokens == [] and got[4].n_tokens == 0
    assert got[4].total_cost == 0


def test_unigram_tokenize_tie_prefers_longest_piece(spark):
    """Equal-cost paths resolve to the longest final piece (smallest
    start index), matching the oracle's list-min tie-break."""
    from comic_text_detector_spark.operators.tokenize import unigram_tokenize

    pieces = spark.createDataFrame(
        [("ab", -2000), ("a", -1000), ("b", -1000)],
        "piece string, milli_lp long",
    )
    docs = spark.createDataFrame([(1, "ab")], "doc_id long, text string")
    r = unigram_tokenize(docs, pieces).collect()[0]
    assert r.tokens == ["ab"] and r.total_cost == 2000


def test_unigram_tokenize_deterministic_across_repartition(spark):
    from comic_text_detector_spark.operators.tokenize import unigram_tokenize

    docs = spark.createDataFrame(
        [(i, "table scan stable tan") for i in range(40)],
        "doc_id long, text string",
    )
    a = unigram_tokenize(docs, _demo_pieces(spark)).orderBy("doc_id")
    b = unigram_tokenize(
        docs.repartition(7), _demo_pieces(spark)
    ).orderBy("doc_id")
    assert [tuple(r) for r in a.collect()] == [tuple(r) for r in b.collect()]


def test_train_unigram_hard_em_planted(spark):
    """On a corpus dominated by 'table' and 'scan' the EM keeps both as
    whole pieces, floors unused single chars at count 1, and prunes to
    the requested vocab."""
    from comic_text_detector_spark.operators.tokenize import (
        train_unigram_pieces,
        unigram_tokenize,
    )

    docs = spark.createDataFrame(
        [(1, "table table scan table"), (2, "scan scan stable")],
        "doc_id long, text string",
    )
    p = train_unigram_pieces(
        docs, max_piece_len=5, min_count=2, vocab_size=12, n_iter=2
    )
    rows = {r.piece: r for r in p.collect()}
    assert rows["table"].cnt == 4 and rows["scan"].cnt == 3
    assert rows["s"].cnt == 1  # floored, not dropped
    assert len(rows) <= 12
    assert all(len(x) == 1 for x in rows if x not in ("table", "scan"))
    seg = unigram_tokenize(docs, p.select("piece", "milli_lp"))
    toks = {r.doc_id: r.tokens for r in seg.collect()}
    assert toks[2] == ["scan", "scan", "s", "table"]


def _wp(spark, vocab, words):
    from comic_text_detector_spark.operators.tokenize import (
        wordpiece_tokenize,
    )

    docs = spark.createDataFrame(
        [(i, w) for i, w in enumerate(words)], "doc_id long, text string"
    )
    v = spark.createDataFrame([(p,) for p in vocab], "piece string")
    return {
        r.doc_id: (list(r.tokens), r.n_tokens, r.n_unk)
        for r in wordpiece_tokenize(docs, v).collect()
    }


def test_wordpiece_greedy_longest_match(spark):
    # greedy takes 'tab' then must do '##l ##e'; Viterbi would prefer
    # 'ta ##ble' (2 pieces) — the classic greedy-vs-optimal divergence.
    got = _wp(
        spark,
        ["tab", "ta", "##ble", "##l", "##e", "t", "a", "b"],
        ["table"],
    )
    assert got[0][0] == ["tab", "##l", "##e"]


def test_wordpiece_unk_is_all_or_nothing(spark):
    got = _wp(
        spark,
        ["he", "##llo", "wor"],  # 'world' dies at position 3
        ["hello world hello"],
    )
    toks, n, n_unk = got[0]
    assert toks == ["he", "##llo", "[UNK]", "he", "##llo"]
    assert n == 5 and n_unk == 1


def test_wordpiece_long_word_and_empty(spark):
    vocab = [c for c in "ax"] + ["##" + c for c in "ax"]
    got = _wp(spark, vocab, ["a" * 101, "", None, "ax " + "a" * 100])
    assert got[0][0] == ["[UNK]"]  # > max_word_len
    assert got[1] == ([], 0, 0)
    assert got[2] == ([], 0, 0)
    assert got[3][1] == 2 + 100 and got[3][2] == 0


def test_wordpiece_matches_sql_twin(spark):
    import duckdb
    import pandas as pd

    from comic_text_detector_spark.operators.tokenize import (
        WORDPIECE_DEMO_VOCAB,
        wordpiece_tokenize,
        wordpiece_tokenize_sql,
    )

    data = [
        (0, "table scan window stream"),
        (1, "key query value batch"),
        (2, "order group row customer"),
        (3, ""),
        (4, None),
    ]
    docs = spark.createDataFrame(data, "doc_id long, text string")
    v = spark.createDataFrame(
        [(p,) for p in WORDPIECE_DEMO_VOCAB], "piece string"
    )
    got = {
        r.doc_id: (list(r.tokens), r.n_tokens, r.n_unk)
        for r in wordpiece_tokenize(docs, v).collect()
    }
    con = duckdb.connect()
    con.register("documents", pd.DataFrame(data, columns=["doc_id", "text"]))
    want = {
        r[0]: (list(r[1]), r[2], r[3])
        for r in con.execute(wordpiece_tokenize_sql()).fetchall()
    }
    assert got == want
    assert got[1][0][0] == "[UNK]"  # 'key': no '##y' continuation
