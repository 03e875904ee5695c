"""Corpus-curation operators a training-data pipeline runs after dedup:
benchmark decontamination and deterministic downsampling.

Both are pure column-expression plans (no UDF, no driver loop) and both use
the engine-portable md5-derived hash (like operators/dedup.py's md5 mode) so
their outputs are value-checkable against an independent SQL engine.

Scale shapes:

* ``contaminated_docs`` — the benchmark side (eval sets, at most MBs even
  for large suites) broadcasts; the corpus streams through one explode +
  broadcast semi-join + groupBy(doc). No corpus-vs-corpus join exists, so
  cost is linear in corpus n-grams at any corpus size.
* ``hash_sample`` — embarrassingly parallel filter: each row's keep/drop
  decision is a pure function of its key, so the sample is reproducible
  across runs, engines, and repartitioning (unlike ``df.sample``, whose
  output depends on partitioning), and survives resume/backfill without
  double-sampling. This determinism is what training pipelines need for
  auditable mixtures (reference analog: fixed-seed shuffling in
  /root/reference/train_db.py:33-38 — reproducibility by construction).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .dedup import md5_long, shingles


def hash_uniform(key: Column, salt: str = "sample") -> Column:
    """Deterministic uniform in [0, 1): ``md5_long`` of ``salt:key``
    divided by 2^32. Identical arithmetic in DuckDB:
    ``('0x'||substr(md5(s),1,8))::BIGINT / 4294967296.0``."""
    h = md5_long(F.concat_ws(":", F.lit(salt), key.cast("string")))
    return h / F.lit(float(1 << 32))


def hash_sample(
    df: DataFrame,
    key_col: str,
    rate: float | None = None,
    rates_by: str | None = None,
    rates: dict[str, float] | None = None,
    salt: str = "sample",
) -> DataFrame:
    """Deterministic (re-runnable) sample: keep a row iff
    hash_uniform(key) < rate.

    Either a flat ``rate``, or stratified ``rates`` keyed by the values of
    column ``rates_by`` (strata absent from the dict are dropped — explicit
    mixture weights, the usual way a web corpus is rebalanced by
    language/source/quality bucket).
    """
    u = hash_uniform(F.col(key_col), salt)
    if rate is not None:
        return df.filter(u < F.lit(rate))
    if not rates or rates_by is None:
        raise ValueError("need rate= or (rates_by=, rates=)")
    thresh = None
    for value, r in sorted(rates.items()):
        cond = F.col(rates_by) == F.lit(value)
        thresh = F.when(cond, F.lit(r)) if thresh is None else thresh.when(cond, F.lit(r))
    return df.filter(u < thresh.otherwise(F.lit(0.0)))


def normalize_url(url: Column) -> Column:
    """Canonical URL for crawl-level dedup: lowercase scheme+host, strip
    the fragment, strip tracking query params (utm_*, gclid, fbclid), drop
    an empty leftover '?' and any trailing slash on the path (root
    included: 'http://h/' ≡ 'http://h', the RFC-equivalent form).

    The url is SPLIT into scheme+host / path / query first and each part
    is normalized in isolation — a literal '&' or 'gclid=' inside a path
    segment, or a query value ending in '/', must never be touched (the
    one-regex-over-the-whole-string version corrupted exactly those,
    per review). Pure regexp/concat exprs in the RE2∩Java dialect, so
    exact-dedup on the canonical key is oracle-checkable. At 100 TB this
    runs inside the scan projection — no shuffle of its own; the
    downstream dedup shuffles on the SHORTER canonical key.
    """
    u = F.regexp_replace(url, r"#.*$", "")  # fragment
    scheme_host = F.lower(F.regexp_extract(u, r"^([a-zA-Z]+://[^/?]*)", 1))
    rest = F.regexp_replace(u, r"^[a-zA-Z]+://[^/?]*", "")
    path = F.regexp_extract(rest, r"^([^?]*)", 1)
    query = F.regexp_extract(rest, r"\?(.*)$", 1)
    # tracking pairs are stripped from the QUERY only; the sentinel '&'
    # prefix makes every pair '&'-led so one pattern drops any position
    query = F.regexp_replace(
        F.concat(F.lit("&"), query),
        r"&(utm_[a-z]+|gclid|fbclid)=[^&]*",
        "",
    )
    query = F.regexp_replace(query, r"^&", "")
    path = F.regexp_replace(path, r"/$", "")
    return F.concat(
        scheme_host,
        path,
        F.when(query != "", F.concat(F.lit("?"), query)).otherwise(F.lit("")),
    )


def line_freq_dedup(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    sep: str = "\n",
    max_doc_freq: int = 2,
) -> DataFrame:
    """CCNet-style boilerplate line removal: split each document into lines,
    drop every line that occurs in MORE than ``max_doc_freq`` distinct
    documents (cookie banners, nav bars, subscribe prompts), reassemble the
    survivors in original order → (id, text, n_lines_in, n_lines_kept).

    Whitespace-only lines are EXEMPT from the drop decision (they would
    otherwise hit the frequency cap in any real corpus and strip every
    paragraph break corpus-wide); CCNet applies the same short-line
    exemption. ``sep`` is taken literally — regex metachars are escaped
    before the split, matching the literal join on reassembly.

    Shape at scale: explode → one md5 groupBy for per-line document
    frequencies (map-side combined; the frequency table is heavy-hitters
    only in spirit but exact here) → broadcast-free equi-join back on the
    line hash → one groupBy(id) with an ordered array_sort reassembly.
    Three exchanges total, all keyed, none quadratic. Empty documents and
    documents whose every line is boilerplate survive with text='' (the
    row is not lost — losing it would silently shrink the corpus).
    """
    import re

    lines = df.select(
        F.col(id_col).alias("id"),
        F.posexplode_outer(
            F.split(F.coalesce(F.col(text_col), F.lit("")), re.escape(sep))
        ).alias("pos", "line"),
    ).withColumn("h", F.md5(F.col("line")))
    freq = (
        lines.groupBy("h").agg(F.count_distinct("id").alias("df"))
    )
    kept = lines.join(freq, "h", "left").withColumn(
        "keep",
        (F.coalesce(F.col("df"), F.lit(0)) <= max_doc_freq)
        | (F.trim(F.col("line")) == ""),
    )
    return (
        kept.groupBy("id")
        .agg(
            F.count(F.when(F.col("line").isNotNull(), 1)).alias("n_lines_in"),
            F.count(F.when(F.col("keep") & F.col("line").isNotNull(), 1)).alias(
                "n_lines_kept"
            ),
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.when(
                                F.col("keep"),
                                F.struct(F.col("pos"), F.col("line")),
                            )
                        )
                    ),
                    lambda s: s["line"],
                ),
                sep,
            ).alias("text"),
        )
        .select(
            F.col("id").alias(id_col),
            "text",
            F.col("n_lines_in").cast("bigint").alias("n_lines_in"),
            F.col("n_lines_kept").cast("bigint").alias("n_lines_kept"),
        )
    )


def robots_filter(
    urls: DataFrame,
    rules: DataFrame,
    url_col: str = "url",
    host_col: str = "host",
    prefix_col: str = "path_prefix",
    allow_col: str = "allow",
) -> DataFrame:
    """Keep only urls a robots ruleset permits: rules are (host,
    path_prefix, allow) rows; the MOST SPECIFIC (longest) matching prefix
    for the url's host decides, and a host with no matching rule defaults
    to allowed — the standard robots.txt longest-match semantics (RFC
    9309 §2.2.2) as a relational plan.

    Shape: rules tables are tiny next to a crawl (one row per directive),
    so the DECISION is computed per distinct (host, path) — broadcast join
    against the rules, max over (prefix length, allow) structs — and the
    crawl joins the decision table back on its own derived key. Duplicate
    url rows each keep their own row (a per-row window would collapse
    them); the only full-width shuffle is the final keyed join.

    Rows with a null url are DROPPED explicitly (they have no host to
    match, and a null join key would silently vanish in the join-back
    anyway — better an explicit documented drop than a leak).
    """
    # the match-key derivation strips the fragment BEFORE extracting the
    # host (a '#' straight after the authority would otherwise contaminate
    # it and silently bypass every rule for the real host), drops userinfo,
    # and treats an empty or query-only path as '/' (RFC 9309: the match
    # target for 'https://h?x=1' is '/?x=1', which Disallow:/ must catch)
    u0 = F.regexp_replace(F.col(url_col), r"#.*$", "")
    auth = F.regexp_extract(u0, r"^[a-zA-Z]+://([^/?]*)", 1)
    host = F.lower(F.regexp_replace(auth, r"^[^@]*@", ""))
    raw_path = F.regexp_replace(u0, r"^[a-zA-Z]+://[^/?]*", "")
    path = F.when(raw_path == "", F.lit("/")).otherwise(
        F.when(
            raw_path.startswith("?"), F.concat(F.lit("/"), raw_path)
        ).otherwise(raw_path)
    )
    u = (
        urls.filter(F.col(url_col).isNotNull())
        .withColumn("__host", host)
        .withColumn("__path", path)
    )
    r = rules.select(
        F.lower(F.col(host_col)).alias("__host"),
        F.col(prefix_col).alias("__prefix"),
        F.col(allow_col).alias("__allow"),
    )
    decisions = (
        u.select("__host", "__path")
        .distinct()
        .join(F.broadcast(r), "__host", "left")
        .withColumn(
            "__hit",
            F.col("__prefix").isNotNull()
            & F.col("__path").startswith(F.col("__prefix")),
        )
        .groupBy("__host", "__path")
        .agg(
            # longest matching prefix wins; on equal length allow wins
            # (RFC 9309 §2.2.2); no matching rule → allowed
            F.max(
                F.when(
                    F.col("__hit"),
                    F.struct(
                        F.length("__prefix").alias("l"),
                        F.col("__allow").alias("a"),
                    ),
                )
            ).alias("__best")
        )
        .select(
            "__host",
            "__path",
            F.coalesce(F.col("__best.a"), F.lit(True)).alias("__allowed"),
        )
    )
    return (
        u.join(decisions, ["__host", "__path"])
        .filter(F.col("__allowed"))
        .drop("__host", "__path", "__allowed")
    )


def word_doc_freq_score(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(id, n_distinct_words, mean_word_df): mean corpus document-frequency
    of each document's distinct words — the cheap LM-free quality proxy CC
    pipelines use (documents made of common corpus words score high,
    gibberish/boilerplate-of-rare-tokens scores low; threshold per corpus).

    Exact arithmetic end to end (bigint counts, ONE IEEE division at the
    end), so the score is value-checkable against an independent engine at
    full precision. Shape: explode distinct words → one groupBy for corpus
    df → equi-join back → one groupBy(id). All keyed exchanges; the word
    frequency table is vocabulary-sized, not corpus-sized.

    Empty tokens (null text, consecutive/leading/trailing spaces) are
    filtered BEFORE counting — a '' pseudo-word would otherwise have a
    huge corpus df and score empty documents as highest-quality, inverting
    the signal. Documents with no words at all are absent from the output
    (callers decide their fate explicitly; a score would be meaningless).
    """
    words = df.select(
        F.col(id_col).alias("id"),
        F.explode(
            F.array_distinct(F.split(F.coalesce(F.col(text_col), F.lit("")), " "))
        ).alias("w"),
    ).filter(F.col("w") != "")
    # (id, w) pairs are already distinct after array_distinct, so a plain
    # count is exact — no count_distinct hash-dedup pass needed
    freq = words.groupBy("w").agg(F.count("id").alias("wdf"))
    return (
        words.join(freq, "w")
        .groupBy("id")
        .agg(
            F.count("*").cast("bigint").alias("n_distinct_words"),
            (F.sum("wdf") / F.count("*")).alias("mean_word_df"),
        )
        .withColumnRenamed("id", id_col)
    )


def contaminated_docs(
    corpus: DataFrame,
    benchmark: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 5,
) -> DataFrame:
    """(id, n_shared) for every corpus doc sharing at least one word
    ``n``-gram with the benchmark set — the decontamination pass run before
    training so eval data cannot leak into the corpus.

    The benchmark's distinct n-gram set broadcasts (eval suites are tiny
    next to the corpus); corpus docs explode once to distinct n-grams, the
    broadcast inner join keeps only overlapping grams, and a groupBy(doc)
    counts them. ``n_shared`` = number of DISTINCT benchmark n-grams the
    doc contains (the triage signal: 1 shared 5-gram is usually a stock
    phrase, 50 is a verbatim inclusion).
    """
    bgrams = (
        benchmark.select(
            F.explode(F.array_distinct(shingles(F.col(text_col), n))).alias("g")
        )
        .distinct()
    )
    cgrams = corpus.select(
        F.col(id_col).alias("id"),
        F.explode(F.array_distinct(shingles(F.col(text_col), n))).alias("g"),
    )
    return (
        cgrams.join(F.broadcast(bgrams), "g")
        .groupBy("id")
        .agg(F.count("*").alias("n_shared"))
    )
