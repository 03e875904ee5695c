"""Curation operators: decontamination + deterministic sampling."""

from pyspark.sql import functions as F

from comic_text_detector_spark.operators.curation import (
    contaminated_docs,
    hash_sample,
    hash_uniform,
)


def test_contaminated_docs_planted(spark):
    bench = spark.createDataFrame(
        [("b0", "the quick brown fox jumps over the lazy dog tonight")],
        "doc_id string, text string",
    )
    corpus = spark.createDataFrame(
        [
            # verbatim inclusion: many shared 5-grams
            ("c0", "intro words then the quick brown fox jumps over the lazy dog tonight and more"),
            # clean doc: zero shared 5-grams
            ("c1", "completely unrelated text about spark plans and shuffles at scale here"),
            # partial: exactly one shared 5-gram
            ("c2", "xx quick brown fox jumps over yy zz aa bb cc"),
        ],
        "doc_id string, text string",
    )
    got = {r.id: r.n_shared for r in contaminated_docs(corpus, bench).collect()}
    assert got["c0"] >= 6  # the 10-word benchmark has 6 distinct 5-grams
    assert got.get("c2") == 1
    assert "c1" not in got


def test_hash_sample_deterministic_and_stratified(spark):
    df = spark.range(2000).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") % 2 == 0, "en").otherwise("zz").alias("lang"),
    )
    out = hash_sample(df, "doc_id", rates_by="lang", rates={"en": 0.5}, salt="t")
    rows1 = sorted(r.doc_id for r in out.collect())
    # reproducible under repartitioning (unlike df.sample)
    rows2 = sorted(
        r.doc_id
        for r in hash_sample(
            df.repartition(7), "doc_id", rates_by="lang", rates={"en": 0.5}, salt="t"
        ).collect()
    )
    assert rows1 == rows2
    assert all(i % 2 == 0 for i in rows1)  # zz stratum dropped entirely
    assert 0.4 < len(rows1) / 1000 < 0.6  # ~rate of the en stratum

    flat = hash_sample(df, "doc_id", rate=0.25, salt="t").count()
    assert 0.2 < flat / 2000 < 0.3


def test_hash_uniform_range(spark):
    stats = (
        spark.range(5000)
        .select(hash_uniform(F.col("id"), "u").alias("u"))
        .agg(F.min("u"), F.max("u"), F.avg("u"))
        .collect()[0]
    )
    assert 0.0 <= stats[0] and stats[1] < 1.0
    assert 0.45 < stats[2] < 0.55


def test_line_freq_dedup_planted(spark):
    from comic_text_detector_spark.operators.curation import line_freq_dedup

    rows = [
        ("a", "unique alpha line\nSUBSCRIBE NOW\nalpha tail"),
        ("b", "unique beta line\nSUBSCRIBE NOW"),
        ("c", "unique gamma line\nSUBSCRIBE NOW"),
        ("d", "SUBSCRIBE NOW"),  # all-boilerplate doc must SURVIVE as ''
    ]
    df = spark.createDataFrame(rows, "doc_id string, text string")
    got = {r.doc_id: r for r in line_freq_dedup(df, max_doc_freq=2).collect()}
    assert len(got) == 4  # no row lost
    assert got["a"].text == "unique alpha line\nalpha tail"
    assert got["b"].text == "unique beta line"
    assert got["d"].text == "" and got["d"].n_lines_kept == 0
    assert got["a"].n_lines_in == 3 and got["a"].n_lines_kept == 2
    # with a looser threshold nothing is boilerplate
    loose = {r.doc_id: r.text for r in line_freq_dedup(df, max_doc_freq=4).collect()}
    assert loose["a"] == rows[0][1]


def test_line_freq_dedup_blank_lines_and_literal_sep(spark):
    """Blank lines are exempt from the frequency drop (they'd strip every
    paragraph break in a real corpus), and a regex-metachar separator is
    treated literally."""
    from comic_text_detector_spark.operators.curation import line_freq_dedup

    rows = [
        ("a", "alpha one\n\nalpha two\nSPAM"),
        ("b", "beta one\n\nbeta two\nSPAM"),
        ("c", "gamma\n\nSPAM"),
    ]
    df = spark.createDataFrame(rows, "doc_id string, text string")
    got = {r.doc_id: r.text for r in line_freq_dedup(df, max_doc_freq=2).collect()}
    assert got["a"] == "alpha one\n\nalpha two"  # paragraph break survives
    assert got["c"] == "gamma\n"

    # '|' is a regex metachar: must split on the literal pipe, not on ''
    pdf = spark.createDataFrame(
        [("x", "keep me|SPAM"), ("y", "also keep|SPAM"), ("z", "third|SPAM")],
        "doc_id string, text string",
    )
    got2 = {
        r.doc_id: r.text
        for r in line_freq_dedup(pdf, sep="|", max_doc_freq=2).collect()
    }
    assert got2["x"] == "keep me"


def test_normalize_url_cases(spark):
    from comic_text_detector_spark.operators.curation import normalize_url

    cases = [
        ("HTTPS://Ex.COM/Path?utm_source=a", "https://ex.com/Path"),
        ("http://h/p?utm_source=a&q=1", "http://h/p?q=1"),
        ("http://h/p?q=1&utm_campaign=b&r=2", "http://h/p?q=1&r=2"),
        ("http://h/p?q=1&gclid=x", "http://h/p?q=1"),
        ("http://h/p#section", "http://h/p"),
        ("http://h/p/", "http://h/p"),
        ("http://h/", "http://h"),
        ("http://h/p?utm_a=1&utm_b=2", "http://h/p"),
        ("http://h/p?fbclid=z&utm_x=1&keep=y", "http://h/p?keep=y"),
        ("http://h/p?q=1", "http://h/p?q=1"),  # untouched
        # review repros: parts are normalized in ISOLATION —
        ("http://h/a&b/c?q=1", "http://h/a&b/c?q=1"),  # literal & in path
        ("http://h/a&gclid=1/b", "http://h/a&gclid=1/b"),  # 'gclid' in path
        ("http://h/p?next=/", "http://h/p?next=/"),  # query value ends in /
        ("http://h/p?q=1/", "http://h/p?q=1/"),
    ]
    df = spark.createDataFrame([(u,) for u, _ in cases], "url string")
    got = [r.n for r in df.select(normalize_url(F.col("url")).alias("n")).collect()]
    assert got == [want for _, want in cases]


def test_word_doc_freq_score(spark):
    from comic_text_detector_spark.operators.curation import word_doc_freq_score

    df = spark.createDataFrame(
        [
            ("common", "the the cat"),   # distinct: the, cat
            ("mixed", "the dog"),
            ("rare", "zyx qwv"),
        ],
        "doc_id string, text string",
    )
    got = {r.doc_id: r for r in word_doc_freq_score(df).collect()}
    # 'the' df=2, 'cat'=1, 'dog'=1, 'zyx'=1, 'qwv'=1
    assert got["common"].n_distinct_words == 2
    assert got["common"].mean_word_df == 1.5   # (2+1)/2
    assert got["mixed"].mean_word_df == 1.5
    assert got["rare"].mean_word_df == 1.0     # gibberish scores lowest


def test_word_doc_freq_empty_tokens(spark):
    """Review repro: '' pseudo-words from null text / space runs must not
    score empty docs as highest quality; wordless docs are absent."""
    from comic_text_detector_spark.operators.curation import word_doc_freq_score

    df = spark.createDataFrame(
        [("a", "x  y"), ("b", " "), ("c", None), ("d", "x")],
        "doc_id string, text string",
    )
    got = {r.doc_id: r for r in word_doc_freq_score(df).collect()}
    assert set(got) == {"a", "d"}  # wordless docs absent, not top-scored
    assert got["a"].n_distinct_words == 2  # '' from the double space gone
    assert got["d"].mean_word_df == 2.0


def test_robots_filter_longest_match(spark):
    from comic_text_detector_spark.operators.curation import robots_filter

    rules = spark.createDataFrame(
        [
            ("h.com", "/private", False),
            ("h.com", "/private/ok", True),   # longer allow carve-out
            ("h.com", "/dup", True),          # IDENTICAL prefix, both
            ("h.com", "/dup", False),         # polarities: allow wins (RFC)
            ("blocked.com", "/", False),
        ],
        "host string, path_prefix string, allow boolean",
    )
    urls = spark.createDataFrame(
        [
            (1, "https://h.com/public/x"),      # no rule matches → allowed
            (2, "https://h.com/private/x"),     # blocked
            (3, "https://h.com/private/ok/x"),  # carve-out allows
            (4, "https://H.com/private/y"),     # host case-insensitive
            (5, "https://blocked.com/anything"),
            (6, "https://unknown.org/x"),       # host with no rules
            (7, "https://blocked.com"),         # empty path → '/'
            (8, "https://h.com/public/x"),      # DUPLICATE of 1: both kept
            (9, "https://h.com/dup/x"),         # equal-length tie → allow
            (10, "https://blocked.com?x=1"),    # query-only path → '/?x=1'
            (11, "https://blocked.com#top"),    # fragment after authority
            (12, "https://user@blocked.com/x"),  # userinfo before host
            (13, None),                          # null url: explicit drop
        ],
        "id int, url string",
    )
    got = sorted(r.id for r in robots_filter(urls, rules).collect())
    assert got == [1, 3, 6, 8, 9]
