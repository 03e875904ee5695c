"""Planted-truth tests for the round-3 text-analysis additions: greedy
vocab tokenizer and char-n-gram language ID."""

from pyspark.sql import functions as F


def test_token_count_vocab_known_merges(spark):
    """Greedy longest-match with a hand vocab whose merge behavior is
    known: 'theater' → 'the'+'at'+'er' (3), not 4 ('the' wins over a
    1-char fallback, then 'at', then 'er'); longest match wins where
    vocab entries nest."""
    from comic_text_detector_spark.functions.textstats import (
        token_count_vocab,
    )

    vocab = ("the", "theat", "er", "at", "ion", "tion", "st", " th", "ory")
    df = spark.createDataFrame(
        [
            (1, "theater"),   # theat(5) + er = 2 (longest-match beats the)
            (2, "nation"),    # n + at + ion = 3
            (3, "station"),   # st + at + ion = 3
            (4, "x"),         # 1-char fallback
            (5, ""),          # empty → 0
            (6, None),        # null → 0 (treated as '')
            (7, "the theory"),  # the + ' th'? greedy: the,' th',e,ory = 4
        ],
        "doc_id bigint, text string",
    )
    got = {
        r.doc_id: r.n_tokens_vocab
        for r in token_count_vocab(df, vocab=vocab).collect()
    }
    assert got == {1: 2, 2: 3, 3: 3, 4: 1, 5: 0, 6: 0, 7: 4}


def test_token_count_vocab_default_deterministic(spark):
    from comic_text_detector_spark.functions.textstats import (
        token_count_vocab,
    )

    df = spark.createDataFrame(
        [(1, "the cat sat on the station mat " * 3)],
        "doc_id bigint, text string",
    )
    a = token_count_vocab(df).collect()[0].n_tokens_vocab
    b = token_count_vocab(df.repartition(4)).collect()[0].n_tokens_vocab
    assert a == b and 0 < a < len("the cat sat on the station mat " * 3)


def test_lang_id_ngram_planted(spark):
    from comic_text_detector_spark.functions.textstats import lang_id_ngram

    df = spark.createDataFrame(
        [
            ("en", "the cat is sitting in the house and the dog is there"),
            ("es", "la casa del gobierno es una de las que el pueblo ha"
                   " construido en la ciudad"),
            ("de", "die geschichte der deutschen sprache und der kultur ist"
                   " ein teil des lebens"),
            ("fr", "le gouvernement de la france est une partie de la"
                   " culture et les personnes qui ont"),
            ("short", "ok"),          # < 3 chars of trigrams → unknown
            ("empty", ""),
            ("null", None),
        ],
        "doc_id string, text string",
    )
    got = {r.doc_id: r for r in lang_id_ngram(df).collect()}
    assert got["en"].lang_ngram == "en" and got["en"].confidence > 0.2
    assert got["es"].lang_ngram == "es"
    assert got["de"].lang_ngram == "de"
    assert got["fr"].lang_ngram == "fr"
    for k in ("short", "empty", "null"):
        assert got[k].lang_ngram == "unknown" and got[k].confidence == 0.0

    # the old stopword heuristic whiffs on short stopword-poor docs; the
    # n-gram profile still resolves clearly profiled text
    mixed = spark.createDataFrame(
        [("x", "die sprache und die geschichte")],
        "doc_id string, text string",
    )
    assert lang_id_ngram(mixed).collect()[0].lang_ngram == "de"


def test_bpe_chain_matches_priority_reference_property():
    """The string-rewrite replay (what token_count_bpe / the oracle run)
    must equal the classic priority-loop BPE on arbitrary text — the
    equivalence the valid-training-order merges table licenses."""
    import random

    from comic_text_detector_spark.functions.textstats import (
        BPE_MERGES,
        BPE_SEP,
        bpe_reference_encode,
    )

    def chain_encode(text):
        sep = BPE_SEP
        s = sep * 2 + "".join(c + sep * 2 for c in text.replace(sep, ""))
        for a, b in BPE_MERGES:
            s = s.replace(sep + a + sep + sep + b + sep, sep + a + b + sep)
        toks = [t for t in s.split(sep) if t]
        n = (len(s) - len(s.replace(sep, ""))) // 2 - 1
        return toks, n

    rng = random.Random(0)
    alpha = "abcdefghijklmnopqrstuvwxyz ABC.,!?\n\x1f"
    cases = [
        "".join(rng.choice(alpha) for _ in range(rng.randint(0, 40)))
        for _ in range(1500)
    ] + [
        "the theatre is in the station", "    ", "aaaa", "ttthhhee",
        " th" * 20, "inginging", "ationation", "st st st", "", "x",
        "\x1f\x1fthe\x1f",
    ]
    for t in cases:
        ref = bpe_reference_encode(t)
        toks, cnt = chain_encode(t)
        assert toks == ref and cnt == len(ref), repr(t)


def test_token_count_bpe_spark_known_values(spark):
    from comic_text_detector_spark.functions.textstats import (
        bpe_reference_encode,
        token_count_bpe,
    )

    rows = [
        ("a", "the station is in the sand"),
        ("b", ""),
        ("c", None),
        ("d", "qu ou ea \x1f chst"),
        ("e", " the " * 10),
    ]
    df = spark.createDataFrame(rows, "doc_id string, text string")
    got = {r.doc_id: r.n_tokens_bpe for r in token_count_bpe(df).collect()}
    for k, t in rows:
        assert got[k] == len(bpe_reference_encode(t or "")), (k, t)


def test_train_bpe_merges_learns_and_applies(spark):
    """The learned merges are textbook BPE on a planted corpus, come out
    in valid training order, and plug into token_count_bpe."""
    from comic_text_detector_spark.functions.textstats import (
        bpe_reference_encode,
        token_count_bpe,
        train_bpe_merges,
    )

    df = spark.createDataFrame(
        [("a", "the the theatre"), ("b", "then the thermos")],
        "doc_id string, text string",
    )
    m = train_bpe_merges(df, n_merges=4)
    assert [(a, b) for a, b, _ in m[:3]] == [
        ("h", "e"), ("t", "he"), (" ", "the")
    ]
    assert m[0][2] == 6  # 'he' occurs 6 times
    # valid training order: every multi-char side was created earlier
    created = set()
    for a, b, _ in m:
        for side in (a, b):
            assert len(side) == 1 or side in created, (side, m)
        created.add(a + b)
    learned = tuple((a, b) for a, b, _ in m)
    out = {r.doc_id: r.n_tokens_bpe
           for r in token_count_bpe(df, merges=learned).collect()}
    # count matches an independent priority-loop replay over the same table
    import comic_text_detector_spark.functions.textstats as TS

    orig = TS.BPE_MERGES
    try:
        TS.BPE_MERGES = learned
        assert out["a"] == len(bpe_reference_encode("the the theatre"))
        assert out["b"] == len(bpe_reference_encode("then the thermos"))
    finally:
        TS.BPE_MERGES = orig


def test_train_bpe_merges_stops_when_dry(spark):
    from comic_text_detector_spark.functions.textstats import (
        train_bpe_merges,
    )

    df = spark.createDataFrame(
        [("a", "ab"), ("b", "")], "doc_id string, text string"
    )
    # 'ab' has one pair; after merging it nothing remains
    m = train_bpe_merges(df, n_merges=5)
    assert [(a, b) for a, b, _ in m] == [("a", "b")]


def test_train_bpe_batched_identical_to_sequential_random(spark):
    """The batched trainer's whole point: IDENTICAL merge tables to the
    sequential loop, fewer corpus passes. Randomized small corpora over a
    tiny alphabet maximize pair-count ties, symbol collisions, and
    interacting merges — every case where the batch must stop early."""
    import random

    from comic_text_detector_spark.functions.textstats import (
        train_bpe_merges,
    )

    rng = random.Random(7)
    for trial in range(6):
        docs = [
            (" ".join(
                "".join(rng.choice("ab c") for _ in range(rng.randint(1, 9)))
                for _ in range(rng.randint(1, 6))
            ),)
            for _ in range(12)
        ]
        df = spark.createDataFrame(docs, "text string")
        seq = train_bpe_merges(df, n_merges=6, batch_window=1)
        for window in (2, 4, 8):
            got = train_bpe_merges(df, n_merges=6, batch_window=window)
            assert got == seq, (trial, window, got, seq)


def test_train_bpe_batched_adversarial_cases(spark):
    from comic_text_detector_spark.functions.textstats import (
        train_bpe_merges,
    )

    cases = [
        # overlapping self-pair runs: (a,a) merges left-to-right
        [("aaaa aaa aa",), ("aaaaa",)],
        # interacting top pairs sharing a symbol: batch must stop at 2nd
        [("abc abc abc",), ("bcd bcd",)],
        # merged string collides with later adjacency: "ab" created, then
        # text containing x+"ab" adjacencies through a different route
        [("ab ab ab a b a b",), ("cab cab",)],
        # exact count ties everywhere
        [("xy xy pq pq",), ("xy pq",)],
    ]
    for docs in cases:
        df = spark.createDataFrame(docs, "text string")
        seq = train_bpe_merges(df, n_merges=5, batch_window=1)
        for window in (2, 3, 5):
            got = train_bpe_merges(df, n_merges=5, batch_window=window)
            assert got == seq, (docs, window, got, seq)


def test_train_bpe_batched_contracts(spark):
    import pytest

    from comic_text_detector_spark.functions.textstats import (
        train_bpe_merges,
    )

    df = spark.createDataFrame([("ab",)], "text string")
    with pytest.raises(ValueError):
        train_bpe_merges(df, batch_window=0)


def test_train_bpe_words_matches_fulltext_without_spaces(spark):
    """Single-word documents have no space symbol, so dictionary mode
    (frequency-weighted distinct words) must equal the full-text trainer
    exactly — the weighting is just deduplication."""
    from comic_text_detector_spark.functions.textstats import (
        train_bpe_merges,
        train_bpe_merges_words,
    )

    docs = [("banana",)] * 4 + [("bandana",)] * 3 + [("cabana",)] * 2
    df = spark.createDataFrame(docs, "text string")
    full = train_bpe_merges(df, n_merges=6)
    words = train_bpe_merges_words(df, n_merges=6)
    assert words == full
    # and batching composes in dictionary mode too
    assert train_bpe_merges_words(df, n_merges=6, batch_window=4) == words


def test_train_bpe_words_never_crosses_whitespace(spark):
    """The documented semantic difference: a corpus whose full-text
    argmax is a space pair diverges — dictionary-mode merges never
    contain the space symbol."""
    from comic_text_detector_spark.functions.textstats import (
        train_bpe_merges,
        train_bpe_merges_words,
    )

    df = spark.createDataFrame([("x y x y x y x y",)] * 3, "text string")
    full = train_bpe_merges(df, n_merges=2)
    words = train_bpe_merges_words(df, n_merges=2)
    assert any(" " in a or " " in b for a, b, _ in full)
    assert all(" " not in a and " " not in b for a, b, _ in words)


def test_train_bpe_words_batched_identical_random(spark):
    import random

    from comic_text_detector_spark.functions.textstats import (
        train_bpe_merges_words,
    )

    rng = random.Random(11)
    for _ in range(4):
        docs = [
            (" ".join(
                "".join(rng.choice("abc") for _ in range(rng.randint(2, 7)))
                for _ in range(rng.randint(1, 5))
            ),)
            for _ in range(10)
        ]
        df = spark.createDataFrame(docs, "text string")
        seq = train_bpe_merges_words(df, n_merges=5, batch_window=1)
        for window in (2, 5):
            assert train_bpe_merges_words(
                df, n_merges=5, batch_window=window
            ) == seq


class TestNormalizeText:
    def test_canonical_mode(self, spark):
        from comic_text_detector_spark.functions.textstats import (
            normalize_text,
        )

        df = spark.createDataFrame(
            [(1, "École ÑAÏVE Straße"), (2, None), (3, "Ωμέγα Ćević")],
            "doc_id long, text string",
        )
        got = {r["doc_id"]: r["text_norm"] for r in normalize_text(df).collect()}
        assert got[1] == "ecole naive straße"  # ß is canonical, kept
        assert got[2] == ""                    # null → empty, not a crash
        assert got[3] == "ωμεγα cevic"

    def test_compat_mode_folds_ligatures(self, spark):
        from comic_text_detector_spark.functions.textstats import (
            normalize_text,
        )

        df = spark.createDataFrame(
            [(1, "ﬁn ＡＢＣ №5")], "doc_id long, text string"
        )
        got = normalize_text(df, compat=True).collect()[0]["text_norm"]
        assert got == "fin abc no5"  # NFKD folds; not SQL-replayable

    def test_flags_off_passthrough(self, spark):
        from comic_text_detector_spark.functions.textstats import (
            normalize_text,
        )

        df = spark.createDataFrame([(1, "École")], "doc_id long, text string")
        got = normalize_text(
            df, lower=False, strip_accents=False
        ).collect()[0]["text_norm"]
        assert got == "École"  # NFC of already-composed input


class TestRepetitionSignals:
    def _run(self, spark, rows):
        from comic_text_detector_spark.functions.textstats import (
            repetition_signals,
        )

        df = spark.createDataFrame(rows, "doc_id long, text string")
        return {
            (r["doc_id"], r["n"], r["kind"]): r
            for r in repetition_signals(df).collect()
        }

    def test_dup_overlap_counted_once(self, spark):
        # "alpha beta gamma delta eps zeta" appears twice (pos 1 and 9);
        # the four overlapping dup 5-grams cover word slots 1-6 and 9-14
        # exactly once: 2 * (5+4+5+5+3+4) = 52 of 65 non-ws chars.
        got = self._run(
            spark,
            [(1, "alpha beta gamma delta eps zeta filler one "
                 "alpha beta gamma delta eps zeta tail")],
        )
        for n in (5, 6):
            r = got[(1, n, "dup")]
            assert (r["covered_chars"], r["total_chars"]) == (52, 65)
        assert (1, 7, "dup") not in got  # no duplicated 7-gram

    def test_top_counts_occurrences(self, spark):
        # 'a b' occurs 3 times in "a b a b a b" -> 3 * 2 chars of 6.
        got = self._run(spark, [(1, "a b a b a b")])
        r = got[(1, 2, "top")]
        assert (r["covered_chars"], r["total_chars"]) == (6, 6)
        assert r["frac"] == 1.0

    def test_short_null_and_empty_docs(self, spark):
        got = self._run(spark, [(1, "tiny doc"), (2, None), (3, "")])
        assert got[(1, 2, "top")]["frac"] == 1.0  # the only 2-gram
        keys = {k[0] for k in got}
        assert keys == {1}  # null/empty emit no rows at all

    def test_oracle_parity_planted(self, spark):
        import duckdb
        import pandas as pd

        from comic_text_detector_spark.functions.textstats import (
            repetition_signals,
            repetition_signals_sql,
        )

        rows = [
            (1, "a b c d e a b c d e a b c d e"),
            (2, "x y x y x y z w z w"),
            (3, "one two three four five six seven"),
        ]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        key = ["doc_id", "n", "kind"]
        got = (
            repetition_signals(df).toPandas()
            .sort_values(key).reset_index(drop=True)
        )
        con = duckdb.connect()
        con.register("documents", pd.DataFrame(rows, columns=["doc_id", "text"]))
        ora = (
            con.execute(repetition_signals_sql()).df()
            .sort_values(key).reset_index(drop=True)
        )
        cols = sorted(got.columns)
        assert got[cols].equals(ora[cols].astype(got[cols].dtypes.to_dict()))


def test_split_sentences_rules(spark):
    """Terminator+space+capital splits; lowercase follow does not;
    abbreviation dots are protected and restored; empty docs absent."""
    from comic_text_detector_spark.functions.textstats import split_sentences

    docs = spark.createDataFrame(
        [
            (1, "Mr. Smith left. He ran! Did he scan? yes he did. A one."),
            (2, "No terminator here"),
            (3, ""),
            (4, "e.g. this stays. Whole i.e. sentence."),
        ],
        "doc_id long, text string",
    )
    got = {}
    for r in split_sentences(docs).collect():
        got.setdefault(r.doc_id, []).append((r.sent_idx, r.sentence))
    assert [s for _, s in sorted(got[1])] == [
        "Mr. Smith left.",
        "He ran!",
        "Did he scan? yes he did.",
        "A one.",
    ]
    assert [s for _, s in sorted(got[2])] == ["No terminator here"]
    assert 3 not in got
    assert [s for _, s in sorted(got[4])] == [
        "e.g. this stays.",
        "Whole i.e. sentence.",
    ]


def test_readability_scores(spark):
    from comic_text_detector_spark.functions.textstats import (
        readability_scores,
    )

    rows = [
        (1, "The cat sat. The dog ran!"),     # 2 sents, 6 words, 6 syl
        (2, "xyz 123"),                        # vowel-less words floor
        (3, ""),                               # empty: NULL scores
        (4, "Extraordinary bureaucracy."),     # polysyllabic
    ]
    df = spark.createDataFrame(rows, "doc_id int, text string")
    got = {r.doc_id: r for r in readability_scores(df).collect()}
    a = got[1]
    assert (a.n_sentences, a.n_words, a.n_syllables) == (2, 6, 6)
    # 206835 - 1015*6//2 - 84600*6//6 = 206835 - 3045 - 84600 = 119190
    assert a.flesch_milli == 119190
    assert a.fk_grade_milli == 390 * 6 // 2 + 11800 - 15590
    b = got[2]
    assert b.n_sentences == 1 and b.n_syllables == 2  # one floor each
    c = got[3]
    assert c.n_words == 0 and c.flesch_milli is None
    d = got[4]
    # extraordinary: e-xtrao-rdi-na-ry -> runs: e,ao,i,a,y = 5;
    # bureaucracy: u,eau,a,y = 4
    assert d.n_syllables == 9


def test_script_profile_blocks_and_tiebreak(spark):
    from comic_text_detector_spark.functions.textstats import script_profile

    rows = spark.createDataFrame(
        [
            (0, "hello world"),
            (1, "שלום עולם וברכה"),  # hebrew
            (2, "नमस्ते दुनिया आज"),  # devanagari
            (3, "ab Ёж"),  # latin 2 vs cyrillic 2 → tie → latin first
            (4, "... 123"),
            (5, None),
            (6, "Καλημέρα κόσμε"),
        ],
        "doc_id long, text string",
    )
    got = {r.doc_id: r for r in script_profile(rows).collect()}
    assert got[0].script == "latin" and got[0].n_latin == 10
    assert got[1].script == "hebrew" and got[1].n_hebrew == 13
    assert got[2].script == "devanagari"
    assert got[3].script == "latin"  # priority-order tie-break
    assert got[4].script == "none" and got[4].n_letters == 0
    assert got[5].script == "none"
    assert got[6].script == "greek"


def test_script_profile_matches_sql_twin(spark):
    import duckdb
    import pandas as pd

    from comic_text_detector_spark.functions.textstats import (
        script_profile,
        script_profile_sql,
    )

    data = [
        (0, "mixed Привет text with Ёлка and latin tail"),
        (1, "你好世界 こんにちは 안녕"),
        (2, ""),
        (3, None),
    ]
    df = spark.createDataFrame(data, "doc_id long, text string")
    got = sorted(tuple(r) for r in script_profile(df).collect())
    con = duckdb.connect()
    con.register("documents", pd.DataFrame(data, columns=["doc_id", "text"]))
    want = sorted(tuple(r) for r in con.execute(script_profile_sql()).fetchall())
    assert got == want
