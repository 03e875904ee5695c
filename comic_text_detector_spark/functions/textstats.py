"""Text-analysis column expressions for training-data pipelines.

All JVM-side built-ins (no UDFs): language-ID (marker heuristic, the F23
language-enum analog — reference utils/textblock.py:9-10, inference.py:117),
quality scoring, token counting, winnowing-style document fingerprints.

Float determinism contract: every expression here is either integer math or
a fixed elementwise IEEE computation (single divisions/products, no
variable-order reductions), so results are bit-identical across engines —
the DuckDB oracles replicate them exactly without rounding fudge.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

EN_MARKERS = ("the", "a", "of", "and", "is")
ES_MARKERS = ("el", "la", "de", "y", "es")
# A word-shaped token or a number — the "BPE-ish" token regex.
TOKEN_REGEX = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"


def words(text_col: Column) -> Column:
    return F.split(text_col, " ")


def _marker_hits(ws: Column, markers: tuple[str, ...]) -> Column:
    arr = F.array(*[F.lit(m) for m in markers])
    return F.size(F.filter(ws, lambda w: F.array_contains(arr, w)))


def lang_id(text_col: Column) -> Column:
    """Marker-count argmax with deterministic tie policy (en beats es only on
    strict majority; ties / no hits → 'unknown')."""
    ws = words(text_col)
    en = _marker_hits(ws, EN_MARKERS)
    es = _marker_hits(ws, ES_MARKERS)
    return (
        F.when((en > es) & (en > 0), F.lit("en"))
        .when((es > en) & (es > 0), F.lit("es"))
        .otherwise(F.lit("unknown"))
    )


def n_words(text_col: Column) -> Column:
    return F.size(words(text_col))


def stopword_ratio(text_col: Column) -> Column:
    ws = words(text_col)
    return _marker_hits(ws, EN_MARKERS).cast("double") / F.size(ws)


def mean_word_len(text_col: Column) -> Column:
    return (
        F.length(F.replace(text_col, F.lit(" "), F.lit(""))).cast("double")
        / F.size(words(text_col))
    )


def quality_score(text_col: Column) -> Column:
    """Length x (1 - stopword ratio) x word-shape sanity, each factor in [0,1].

    Single products/divisions of exact inputs — bit-deterministic.
    """
    lf = F.least(F.lit(1.0), F.size(words(text_col)) / F.lit(100.0))
    sf_ = F.lit(1.0) - stopword_ratio(text_col)
    wl = mean_word_len(text_col)
    shape = F.when((wl >= 2.0) & (wl <= 12.0), F.lit(1.0)).otherwise(F.lit(0.5))
    return lf * sf_ * shape


def token_count_ws(text_col: Column) -> Column:
    """Whitespace token count."""
    return F.size(words(text_col)).cast("bigint")


def token_count_regex(text_col: Column) -> Column:
    """BPE-ish token count: word / number / punct tokens."""
    return F.regexp_count(text_col, F.lit(TOKEN_REGEX)).cast("bigint")


# Deterministic mini-vocab for greedy longest-match token accounting
# (BPE-style merges, embedded so both engines read the same table). Multi-
# char entries only; any unmatched position falls back to a 1-char token.
TOKENIZER_VOCAB = (
    " the", "the", " of", "of ", " and", "and", " to", "to ", " in",
    "ing ", "ing", "ion", "tion", "ation", " a ", "ed ", "er ", "es ",
    " is", "is ", " that", "at ", "en ", " for", "or ", " on", "on ",
    " with", " as", " was", "al ", "ar ", "st ", " re", "nt ", " be",
    " by", "an ", "it ", " not", "ly ", " this", " are", " or", " from",
)


def token_count_vocab(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    vocab: tuple[str, ...] | None = None,
) -> DataFrame:
    """Greedy longest-match vocabulary tokenizer count — the LLM-budget
    token accounting ``token_count_ws``/``token_count_regex`` approximate
    (whitespace and regex counts undercount/overcount BPE merges). At each
    position the longest vocab entry starting there is consumed, else one
    character; the result is (id, n_tokens_vocab).

    Arrow-batched ``mapInPandas`` kernel (greedy scanning is inherently
    sequential per document — exactly the "genuinely can't express it in
    built-ins" case for the vectorized-UDF tier). The ORACLE replays it
    relationally: a per-position jump table (max matching vocab length via
    a substr-equality join) walked by a recursive CTE; token count =
    positions visited. Stateless per document → embarrassingly parallel,
    no shuffle at all at any corpus size."""
    import pandas as pd

    vs = frozenset(vocab if vocab is not None else TOKENIZER_VOCAB)
    lengths = sorted({len(v) for v in vs}, reverse=True)
    id_type = dict(df.dtypes)[id_col]

    def kernel(batches):
        for pdf in batches:
            ids, ns = [], []
            for i, t in zip(pdf[id_col], pdf[text_col]):
                t = t or ""
                p, n = 0, 0
                while p < len(t):
                    step = 1
                    for ln in lengths:
                        seg = t[p : p + ln]
                        if len(seg) == ln and seg in vs:
                            step = ln
                            break
                    p += step
                    n += 1
                ids.append(i)
                ns.append(n)
            yield pd.DataFrame({id_col: ids, "n_tokens_vocab": ns})

    return df.select(id_col, text_col).mapInPandas(
        kernel, f"{id_col} {id_type}, n_tokens_vocab bigint"
    )


# True pair-merge BPE merges table, in VALID TRAINING ORDER: every
# non-single-char side of a merge is the output of an EARLIER merge. That
# ordering is what licenses the sequential replay below — for such tables,
# applying merges one at a time in rank order (each exhaustively,
# left-to-right) is equivalent to the classic priority loop ("repeatedly
# merge the lowest-rank adjacent pair present"), because a pair of rank k
# can only become newly adjacent through a merge of rank < k, never
# re-appear after merge k has been exhausted. Space is an ordinary symbol
# (GPT-2-style " t…" merges), so no pre-tokenization split is needed.
# (Property-tested against the priority-loop reference implementation.)
BPE_MERGES = (
    ("t", "h"), ("th", "e"), ("i", "n"), ("a", "n"), ("an", "d"),
    ("e", "r"), ("o", "n"), ("r", "e"), ("a", "t"), ("e", "n"),
    ("o", "r"), ("e", "s"), ("t", "o"), ("i", "s"), ("o", "f"),
    ("in", "g"), (" ", "t"), (" t", "h"), (" th", "e"), (" ", "a"),
    (" a", "n"), (" an", "d"), (" ", "o"), (" o", "f"), (" ", "i"),
    (" i", "n"), (" ", "s"), ("e", "d"), ("i", "on"), ("at", "ion"),
    ("l", "y"), (" ", "w"), (" ", "b"), ("c", "h"), ("s", "t"),
    (" s", "t"), ("q", "u"), ("o", "u"), ("e", "a"), (" ", "c"),
)
# Symbol-boundary sentinel for the string-rewrite replay. Input text is
# stripped of it first (a U+001F in crawl text is mojibake, not content).
BPE_SEP = "\x1f"


def _bpe_boundary_string(text: Column) -> Column:
    """Encode a string as boundary-delimited single-char symbols:
    'ab' → '␟␟a␟␟b␟␟' (each boundary is TWO sentinels). A pair merge
    (a, b) is then EXACTLY one literal replace of '␟a␟␟b␟' with '␟ab␟':
    the pattern consumes the inner half of each flanking boundary, so
    consecutive occurrences never share matched characters and one
    non-overlapping left-to-right replace pass merges every disjoint
    adjacent pair — which is precisely BPE's exhaustive merge step (a
    merge can never create a new occurrence of its own pair). The
    double-sided anchor also makes mid-symbol false matches impossible."""
    cleaned = F.replace(
        F.coalesce(text, F.lit("")), F.lit(BPE_SEP), F.lit("")
    )
    return F.concat(
        F.lit(BPE_SEP * 2),
        F.regexp_replace(cleaned, r"(?s)(.)", "$1" + BPE_SEP * 2),
    )


def token_count_bpe(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    merges: tuple[tuple[str, str], ...] | None = None,
) -> DataFrame:
    """True byte-pair-encoding token count — the real LLM-budget
    accounting that ``token_count_vocab``'s greedy longest-match
    approximates. PURE COLUMN EXPRESSIONS end to end: the boundary
    encoding plus one literal ``replace`` per merge (see
    ``_bpe_boundary_string``), so the whole tokenizer runs JVM-side
    inside whole-stage codegen, shuffle-free at any corpus size, and the
    DuckDB oracle replays the identical string algebra bit-for-bit
    (``bpe_chain_sql``). ``merges`` overrides the embedded table — e.g.
    one LEARNED by ``train_bpe_merges`` (any valid-training-order table
    keeps the replay equivalence). Output: (id, n_tokens_bpe)."""
    s = _bpe_boundary_string(F.col(text_col))
    for a, b in (merges if merges is not None else BPE_MERGES):
        s = F.replace(
            s,
            F.lit(BPE_SEP + a + BPE_SEP + BPE_SEP + b + BPE_SEP),
            F.lit(BPE_SEP + a + b + BPE_SEP),
        )
    # two projections: CollapseProject keeps multi-referenced non-trivial
    # exprs in their own project, so the 40-replace chain evaluates once
    n_bound = F.length("_bpe_s") - F.length(
        F.replace(F.col("_bpe_s"), F.lit(BPE_SEP), F.lit(""))
    )
    return df.select(id_col, s.alias("_bpe_s")).select(
        id_col,
        F.floor(n_bound / 2 - 1).cast("bigint").alias("n_tokens_bpe"),
    )


def bpe_chain_sql(
    text_expr: str,
    merges: tuple[tuple[str, str], ...] | None = None,
) -> str:
    """The IDENTICAL boundary-encode + merge-replace chain as an ANSI SQL
    expression (DuckDB dialect: \\1 backrefs, 'gs' regexp flags) — the
    oracle twin of ``token_count_bpe``'s ``_bpe_s`` column."""
    sep = BPE_SEP
    s = bpe_encode_sql(text_expr)
    for a, b in (merges if merges is not None else BPE_MERGES):
        s = (
            f"replace({s}, '{sep}{a}{sep}{sep}{b}{sep}',"
            f" '{sep}{a}{b}{sep}')"
        )
    return s


def bpe_reference_encode(text: str) -> list[str]:
    """Priority-loop reference BPE (the classic algorithm: repeatedly merge
    the lowest-rank adjacent pair, all disjoint occurrences left-to-right)
    — the ground truth the string-rewrite replay is property-tested
    against. Test-support only; the operator tier is ``token_count_bpe``."""
    ranks = {p: i for i, p in enumerate(BPE_MERGES)}
    sym = [c for c in text if c != BPE_SEP]
    while len(sym) > 1:
        best = None
        for i in range(len(sym) - 1):
            r = ranks.get((sym[i], sym[i + 1]))
            if r is not None and (best is None or r < best):
                best = r
        if best is None:
            break
        a, b = BPE_MERGES[best]
        out: list[str] = []
        i = 0
        while i < len(sym):
            if i < len(sym) - 1 and sym[i] == a and sym[i + 1] == b:
                out.append(a + b)
                i += 2
            else:
                out.append(sym[i])
                i += 1
        sym = out
    return sym


# Character-trigram language profiles (Cavnar & Trenkle 1994 "N-Gram-Based
# Text Categorization" shape): the most characteristic trigrams per
# language, hand-set and embedded so the SQL oracle reads the same lists.
LANG_PROFILES = {
    "en": (
        " th", "the", "he ", "ing", "ng ", " an", "nd ", "and", " of",
        "of ", " to", "to ", "ed ", " in", "ion", " is", "is ", "er ",
        "at ", " wh", " it", "ent",
    ),
    "es": (
        " de", "de ", " la", "la ", "os ", " el", "el ", "ue ", " qu",
        "que", " en", "en ", "ar ", "ció", "ón ", " es", "ado", " un",
        "una", " co", "nte", "as ",
    ),
    "de": (
        "der", "ie ", "die", " di", "ein", " ei", "ch ", "sch", " sc",
        "und", " un", "cht", "ung", "ich", "das", " da", "ber", "gen",
        "nen", " ge", "eit", "ten",
    ),
    "fr": (
        " le", "le ", "es ", "ent", " et", "et ", " la", "ait", " qu",
        "que", "ons", " pa", "eur", "aux", " au", "oir", "ais", " un",
        "une", " ce", "les", " à ",
    ),
}


def lang_id_ngram(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Character-n-gram profile language ID with a confidence column — the
    F23 upgrade over the ``lang_id`` stopword heuristic (which whiffs on
    short or stopword-poor docs). Counts how many of the doc's lowercase
    char trigrams hit each language's profile; a STRICT unique argmax
    wins, ties or zero hits → 'unknown'. confidence = best_hits /
    n_trigrams (integer counts, ONE IEEE division → engine-exact).

    Pure column expressions: the trigram array materializes once in its
    own projection (Catalyst does not CSE lambda trees — computing it
    inline per profile would re-derive it four times), then four
    size(filter(...)) counts. Zero shuffles; runs inside the scan at any
    corpus size."""
    t = F.lower(F.col(text_col))
    grams = F.when(
        F.length(t) >= 3,
        F.expr(
            f"transform(sequence(1, length(lower(`{text_col}`)) - 2),"
            f" i -> substring(lower(`{text_col}`), i, 3))"
        ),
    ).otherwise(F.array().cast("array<string>"))
    g = df.select(F.col(id_col).alias("id"), grams.alias("g"))

    # factory, NOT a defaulted 2-param lambda: pyspark dispatches a
    # two-parameter lambda as (element, index) and scrambles the closure
    def _in_profile(prof):
        arr = F.array(*[F.lit(p) for p in prof])
        return lambda x: F.array_contains(arr, x)

    hits = g.select(
        "id",
        F.size("g").alias("n_grams"),
        *[
            F.size(F.filter(F.col("g"), _in_profile(prof))).alias(f"h_{lang}")
            for lang, prof in LANG_PROFILES.items()
        ],
    )
    langs = list(LANG_PROFILES)
    best = F.greatest(*[F.col(f"h_{lang}") for lang in langs])
    n_at_best = sum(
        F.when(F.col(f"h_{lang}") == best, 1).otherwise(0) for lang in langs
    )
    pick = None
    for lang in langs:
        cond = F.col(f"h_{lang}") == best
        pick = F.when(cond, F.lit(lang)) if pick is None else pick.when(
            cond, F.lit(lang)
        )
    return hits.select(
        F.col("id").alias(id_col),
        F.when((best > 0) & (n_at_best == 1), pick)
        .otherwise(F.lit("unknown"))
        .alias("lang_ngram"),
        F.when(
            (best > 0) & (n_at_best == 1),
            best.cast("double") / F.col("n_grams"),
        )
        .otherwise(F.lit(0.0))
        .alias("confidence"),
    )


def kgram_fingerprints(
    df: DataFrame, id_col: str, text_col: str, k: int = 8, select_nibble: str = "0"
) -> DataFrame:
    """Winnowing-style document fingerprints (the dedup/attribution primitive).

    md5 over every k-char gram, 1/16 selected by last hex nibble — the
    '0 mod p' selection variant of winnowing. Pure relational: posexplode of
    gram positions, md5, filter, distinct count per doc. An identical-text
    pair shares its full fingerprint set; heavy overlap → near-dup.
    """
    # The 1/16 nibble selection runs INSIDE the array (filter before the
    # explode) so the generator emits ~1/16th of the rows; the md5 work per
    # gram is unchanged but row-at-a-time explode/filter/partial-agg
    # traffic drops 16x. Survivor set (and therefore the aggregate) is
    # identical to filtering after the explode.
    sel = df.select(
        F.col(id_col),
        F.explode(
            F.expr(
                f"filter(transform(sequence(1, greatest(length(`{text_col}`) - {k - 1}, 1)),"
                f" i -> md5(substring(`{text_col}`, i, {k}))),"
                f" h -> endswith(h, '{select_nibble}'))"
            )
        ).alias("gram_hash"),
    )
    return sel.groupBy(id_col).agg(
        F.count_distinct("gram_hash").alias("n_fingerprints"),
        F.min("gram_hash").alias("min_fingerprint"),
    )


def infer_alignment(
    df: DataFrame, group_col: str, left_x: str, center_x: str
) -> DataFrame:
    """F15 alignment inference (reference utils/textblock.py:233-253): per
    group, compare the sample stddev of line left-x vs center-x; the steadier
    one wins ('left' when std(left) <= std(center), else 'center')."""
    agg = df.groupBy(group_col).agg(
        F.stddev_samp(left_x).alias("std_left"),
        F.stddev_samp(center_x).alias("std_center"),
    )
    return agg.select(
        group_col,
        F.when(F.col("std_left") <= F.col("std_center"), F.lit("left"))
        .otherwise(F.lit("center"))
        .alias("alignment"),
    )


# PII patterns restricted to the RE2 ∩ Java-regex common dialect so a
# DuckDB oracle replays them byte-for-byte.
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PHONE_RE = r"\d{3}-\d{4}"


def pii_scrub(text_col: Column) -> Column:
    """Engine-added training-data hygiene: redact email addresses and
    phone-like tokens. Pure JVM-side regexp_replace (global by default in
    Spark; the oracle uses DuckDB's 'g' flag)."""
    return F.regexp_replace(
        F.regexp_replace(text_col, EMAIL_RE, "<EMAIL>"), PHONE_RE, "<PHONE>"
    )


def pii_counts(text_col: Column) -> tuple[Column, Column]:
    """(n_emails, n_phones) per document — audit counters for the scrub."""
    return F.regexp_count(text_col, F.lit(EMAIL_RE)), F.regexp_count(
        text_col, F.lit(PHONE_RE)
    )


def top_bigram_fraction(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Gopher-style repetition signal: per document, OCCURRENCES of the
    most frequent word 2-gram over total 2-grams. (Rae et al. 2021 §A1.1
    uses the fraction of CHARACTERS covered by the top n-gram — a related
    but different statistic; published Gopher thresholds do not transfer
    to this column as-is.) Relational shape: explode 2-grams → count →
    one window max per doc — map-side partial agg, no UDF."""
    from ..operators.dedup import shingles

    grams = df.select(
        F.col(id_col).alias("id"),
        F.explode(shingles(F.col(text_col), 2)).alias("g"),
    )
    counts = grams.groupBy("id", "g").agg(F.count("*").alias("c"))
    w = Window.partitionBy("id")
    return (
        counts.withColumn("mx", F.max("c").over(w))
        .withColumn("tot", F.sum("c").over(w))
        .filter(F.col("c") == F.col("mx"))
        .groupBy("id", "mx", "tot")
        .agg(F.min("g").alias("top_gram"))  # deterministic tie-break
        .select(
            "id",
            "top_gram",
            F.col("mx").alias("top_count"),
            (F.col("mx") / F.col("tot")).alias("top_fraction"),
        )
    )


def repetition_signals(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    top_ns: tuple[int, ...] = (2, 3, 4),
    dup_ns: tuple[int, ...] = (5, 6, 7, 8, 9, 10),
) -> DataFrame:
    """The FULL Gopher repetition battery (Rae et al. 2021 §A1.1) as
    character fractions — ``top_bigram_fraction`` covers only the
    top-2-gram occurrence variant; this one computes, per document:

    - kind='top', n ∈ top_ns: characters covered by all occurrences of
      the MOST FREQUENT word n-gram / total word characters. Tie-break
      is deterministic: max count, then max gram char length (overlap
      between occurrences is not deduplicated for the top stat — the
      published formulation counts occurrences; documented choice).
    - kind='dup', n ∈ dup_ns: characters inside ANY duplicated n-gram
      (count ≥ 2), with overlapping occurrences counted ONCE — the
      paper's "taking care not to count characters that occur in
      overlapping n-grams more than once", done relationally as a
      distinct-position union (explode each occurrence's n word slots,
      distinct, sum those words' lengths).

    Char totals are whitespace-free (sum of word lengths). Every count
    is an exact bigint; ``frac`` is ONE IEEE division, so the whole
    battery replays bit-identically in DuckDB
    (``repetition_signals_sql``). Long format (id, n, kind,
    covered_chars, total_chars, frac); documents with fewer than n
    words emit no row for that n (no gram exists — callers wanting 0.0
    coalesce after a left join). Shape: per n one groupBy + one per-doc
    window ('top') or one window + distinct + pos join ('dup') — all
    keyed by doc id, no driver state, linear at corpus scale.
    """
    words = df.select(
        F.col(id_col).alias("id"),
        F.filter(
            F.split(F.coalesce(F.col(text_col), F.lit("")), " "),
            lambda w: w != "",
        ).alias("ws"),
    ).filter(F.size("ws") > 0)
    base = words.select(
        "id",
        "ws",
        F.aggregate(
            "ws", F.lit(0).cast("long"), lambda a, w: a + F.length(w)
        ).alias("total_chars"),
    )
    wpos = base.select(
        "id", F.posexplode("ws").alias("pos0", "w")
    ).select("id", (F.col("pos0") + 1).alias("p"), F.length("w").alias("wl"))

    def grams(n):
        return base.filter(F.size("ws") >= n).select(
            "id",
            "total_chars",
            F.explode(
                F.transform(
                    F.sequence(F.lit(1), F.size("ws") - n + 1),
                    lambda i: F.struct(
                        i.alias("pos"),
                        F.array_join(F.slice("ws", i, n), " ").alias("g"),
                    ),
                )
            ).alias("x"),
        ).select(
            "id", "total_chars",
            F.col("x.pos").alias("pos"), F.col("x.g").alias("g"),
        )

    parts = []
    wdoc = Window.partitionBy("id")
    for n in top_ns:
        counts = grams(n).groupBy("id", "total_chars", "g").agg(
            F.count("*").alias("c")
        )
        top = (
            counts.withColumn("mx", F.max("c").over(wdoc))
            .filter(F.col("c") == F.col("mx"))
            .groupBy("id", "total_chars")
            .agg(
                F.max("c").alias("mx"),
                (F.max(F.length("g")) - F.lit(n - 1)).alias("gc"),
            )
        )
        parts.append(
            top.select(
                "id",
                F.lit(n).cast("int").alias("n"),
                F.lit("top").alias("kind"),
                (F.col("mx") * F.col("gc")).cast("long").alias(
                    "covered_chars"
                ),
                "total_chars",
                (
                    F.col("mx") * F.col("gc")
                    / F.col("total_chars").cast("double")
                ).alias("frac"),
            )
        )
    for n in dup_ns:
        wgram = Window.partitionBy("id", "g")
        dup = (
            grams(n)
            .withColumn("c", F.count("*").over(wgram))
            .filter(F.col("c") >= 2)
        )
        cov_pos = dup.select(
            "id",
            "total_chars",
            F.explode(
                F.sequence(F.col("pos"), F.col("pos") + F.lit(n - 1))
            ).alias("p"),
        ).distinct()
        cov = cov_pos.join(wpos, ["id", "p"]).groupBy(
            "id", "total_chars"
        ).agg(F.sum("wl").cast("long").alias("covered_chars"))
        parts.append(
            cov.select(
                "id",
                F.lit(n).cast("int").alias("n"),
                F.lit("dup").alias("kind"),
                "covered_chars",
                "total_chars",
                (
                    F.col("covered_chars")
                    / F.col("total_chars").cast("double")
                ).alias("frac"),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.withColumnRenamed("id", id_col)


def repetition_signals_sql(
    corpus: str = "documents",
    id_col: str = "doc_id",
    top_ns: tuple[int, ...] = (2, 3, 4),
    dup_ns: tuple[int, ...] = (5, 6, 7, 8, 9, 10),
) -> str:
    """Oracle twin of ``repetition_signals`` in DuckDB SQL — identical
    gram construction, tie-breaks, coverage union, and float ops."""
    ctes = [
        f"w AS (SELECT {id_col} AS id,"
        " list_filter(string_split(coalesce(text, ''), ' '),"
        " x -> x <> '') AS ws"
        f" FROM {corpus})",
        "b AS (SELECT id, ws, CAST(list_sum(list_transform(ws,"
        " x -> length(x))) AS BIGINT) AS total_chars"
        " FROM w WHERE len(ws) > 0)",
        "wp0 AS (SELECT id, generate_subscripts(ws, 1) AS p,"
        " unnest(ws) AS wd FROM b)",
        "wp AS (SELECT id, p, length(wd) AS wl FROM wp0)",
    ]
    sels = []
    for n in sorted(set(top_ns) | set(dup_ns)):
        ctes.append(
            f"g{n}0 AS (SELECT id, total_chars,"
            f" unnest(generate_series(1, len(ws) - {n} + 1)) AS pos, ws"
            f" FROM b WHERE len(ws) >= {n})"
        )
        ctes.append(
            f"g{n} AS (SELECT id, total_chars, pos,"
            f" array_to_string(list_slice(ws, pos, pos + {n - 1}), ' ')"
            f" AS g FROM g{n}0)"
        )
    for n in top_ns:
        ctes.append(
            f"c{n} AS (SELECT id, total_chars, g,"
            f" CAST(count(*) AS BIGINT) AS c FROM g{n}"
            " GROUP BY id, total_chars, g)"
        )
        ctes.append(
            f"t{n} AS (SELECT id, total_chars, c, length(g) - {n - 1}"
            f" AS gc FROM c{n}"
            " QUALIFY c = max(c) OVER (PARTITION BY id))"
        )
        sels.append(
            f"SELECT id AS {id_col}, CAST({n} AS INTEGER) AS n,"
            " 'top' AS kind,"
            " CAST(max(c) * max(gc) AS BIGINT) AS covered_chars,"
            " total_chars,"
            " max(c) * max(gc) / CAST(total_chars AS DOUBLE) AS frac"
            f" FROM t{n} GROUP BY id, total_chars"
        )
    for n in dup_ns:
        ctes.append(
            f"d{n} AS (SELECT id, total_chars, pos FROM ("
            "SELECT id, total_chars, pos,"
            " count(*) OVER (PARTITION BY id, g) AS c"
            f" FROM g{n}) WHERE c >= 2)"
        )
        ctes.append(
            f"p{n} AS (SELECT DISTINCT id, total_chars, p FROM ("
            "SELECT id, total_chars,"
            f" unnest(generate_series(pos, pos + {n - 1})) AS p"
            f" FROM d{n}))"
        )
        sels.append(
            f"SELECT p{n}.id AS {id_col}, CAST({n} AS INTEGER) AS n,"
            " 'dup' AS kind,"
            " CAST(sum(wl) AS BIGINT) AS covered_chars, total_chars,"
            " CAST(sum(wl) AS BIGINT) / CAST(total_chars AS DOUBLE)"
            f" AS frac FROM p{n}"
            f" JOIN wp ON wp.id = p{n}.id AND wp.p = p{n}.p"
            f" GROUP BY p{n}.id, total_chars"
        )
    return "WITH " + ", ".join(ctes) + " " + " UNION ALL ".join(sels)


def stroke_width_proxy(df: DataFrame, group_col: str, x_col: str) -> DataFrame:
    """F16 stroke width from variance (reference utils/textblock.py:258-265
    takes np.std over sampled pixel colors; the webtext recast is the
    population std of a per-line numeric feature). Computed from EXACT
    decimal sums (sum, sum-of-squares) so the reduction is independent of
    partition/accumulation order and engine-exact — a raw float stddev agg
    would differ across engines in the last bits."""
    d = F.col(x_col).cast("decimal(18,2)")
    agg = df.groupBy(group_col).agg(
        F.count("*").alias("n"),
        F.sum(d).cast("double").alias("s"),
        F.sum(d * d).cast("double").alias("ss"),
    )
    var = (F.col("ss") - F.col("s") * F.col("s") / F.col("n")) / F.col("n")
    return agg.select(
        group_col,
        "n",
        F.sqrt(F.greatest(F.lit(0.0), var)).alias("stroke_width"),
    )


def reading_order_weight(
    x1: Column, y1: Column, page_w: Column, page_h: Column, right_to_left: bool = False
) -> Column:
    """W1 grid reading-order weight (reference utils/textblock.py:267-300):
    weight = grid_idx * page_area + 1.2*dx + dy over a 4x3 grid, with the
    horizontal direction flipped for right-to-left scripts."""
    gx = F.least(F.lit(3), (x1 * 4 / page_w).cast("int"))
    gy = F.least(F.lit(2), (y1 * 3 / page_h).cast("int"))
    if right_to_left:
        gx = F.lit(3) - gx
        dx = page_w - x1
    else:
        dx = x1
    grid_idx = gy * 4 + gx
    return grid_idx.cast("double") * (page_w * page_h) + F.lit(1.2) * dx + y1


def bpe_encode_sql(text_expr: str) -> str:
    """Just the boundary-encode step of ``bpe_chain_sql`` (DuckDB
    dialect) — shared by the scoring chain and the trainer oracle."""
    sep = BPE_SEP
    return (
        f"('{sep}{sep}' || regexp_replace(replace({text_expr}, '{sep}', ''),"
        f" '(.)', '\\1{sep}{sep}', 'gs'))"
    )


def train_bpe_merges(
    df: DataFrame,
    text_col: str = "text",
    n_merges: int = 4,
    batch_window: int = 1,
) -> list[tuple[str, str, int]]:
    """LEARN a BPE merges table from the corpus, in Spark — the training
    counterpart of ``token_count_bpe``: each round counts all adjacent
    symbol pairs (one explode + one map-side-combined groupBy), takes the
    globally ranked pairs (count desc, then lexicographic — deterministic
    tie break), and applies the chosen merges to the whole corpus as
    literal replaces over the boundary encoding. Returns
    [(a, b, count), ...] in training order — by construction a
    valid-training-order table, so it plugs straight into
    ``token_count_bpe(merges=...)`` with the replay equivalence intact.

    ``batch_window=1`` is the textbook sequential loop: one argmax row to
    the driver, one rewrite, one Spark job per merge. ``batch_window=k``
    learns SEVERAL merges per corpus pass — the 40-merge-vocab cost fix —
    while producing the IDENTICAL merge table, because a batch only
    extends across merges that are *provably* what the sequential loop
    would have picked next, judged from the one ranked count table:

    * candidates are taken in the exact sequential ranking (c desc, a, b),
      and the batch stops at the first candidate sharing a symbol with an
      accepted merge — merging (a,b) only changes counts of pairs touching
      a or b, so a symbol-disjoint next candidate keeps its exact count,
      and disjointness also makes the replaces textually non-overlapping
      (an overlap would need a shared boundary symbol);
    * every pair's count can only DECREASE under a disjoint merge, and
      brand-new pairs (x, ab)/(ab, y) inherit counts bounded by their
      progenitors' (x, a)/(b, y) — so no unseen pair can EXCEED the next
      candidate's count. But an inherited count can TIE it, and the new
      pair's lexicographic key is arbitrary (merging (c,u) turns a tied
      (u,st) into (cu,st), which beats a tied candidate (st,o) on lex) —
      so a candidate is only accepted when NO unaccepted visible pair
      with count ≥ the candidate's shares a symbol with the batch (such
      a pair is the only possible progenitor of a tie-winning new pair,
      and count ≥ candidate > horizon keeps it visible);
    * ...UNLESS the merged string ``a+b`` collides with an
      already-existing symbol (then existing (x, ab) counts can
      INCREASE). Multi-char symbols only ever come from merges, so
      freshness is an exact driver-side check against the
      produced-symbol set; a collision ends the batch;
    * candidates at or below the collected slice's horizon (the
      (window+1)-th row's count) end the batch — ties beyond the slice
      would be invisible.

    The per-round driver collect is ≤ window+1 rows; the per-round corpus
    work is one count pass + ONE rewrite projection applying the whole
    accepted batch. Corpus state is ``localCheckpoint``-ed per round
    (iterative DataFrame loops grow their logical plan otherwise).
    Stops early if no adjacent pair remains."""
    if n_merges < 1:
        raise ValueError(f"n_merges must be >= 1, got {n_merges}")
    if batch_window < 1:
        raise ValueError(f"batch_window must be >= 1, got {batch_window}")
    sdf = df.select(
        _bpe_boundary_string(F.col(text_col)).alias("s"),
        F.lit(1).cast("long").alias("freq"),
    ).localCheckpoint()
    return _train_bpe_loop(sdf, n_merges, batch_window)


def train_bpe_merges_words(
    df: DataFrame,
    text_col: str = "text",
    n_merges: int = 4,
    batch_window: int = 1,
) -> list[tuple[str, str, int]]:
    """DICTIONARY-MODE BPE training — the classic Sennrich shape and the
    100 TB path: ONE corpus pass builds the (distinct word, frequency)
    dictionary, then every merge round runs over that dictionary with
    pair counts weighted by word frequency. At web scale the dictionary
    is millions of rows where the corpus is billions, so 40 (or 50k)
    rounds cost ~nothing after the single corpus scan — this is how
    production BPE trainers are actually built.

    SEMANTIC DIFFERENCE from ``train_bpe_merges`` (documented, not a
    bug): merges can never cross whitespace, because words are counted in
    isolation — pairs like (x, ' ') don't exist here. Whenever no
    space-crossing pair would win a round (the overwhelmingly common
    case — real tokenizers pre-split on whitespace for exactly this
    reason), the learned table is IDENTICAL to the full-text trainer's
    (equality-tested). The table is valid-training-order and plugs into
    ``token_count_bpe`` the same way.

    ``batch_window`` composes: the provable-batch argument of
    ``train_bpe_merges`` only uses count monotonicity, which holds
    unchanged for frequency-weighted counts."""
    if n_merges < 1:
        raise ValueError(f"n_merges must be >= 1, got {n_merges}")
    if batch_window < 1:
        raise ValueError(f"batch_window must be >= 1, got {batch_window}")
    words = (
        df.select(
            F.explode(
                F.split(F.coalesce(F.col(text_col), F.lit("")), " ")
            ).alias("w")
        )
        .filter(F.col("w") != "")
        .groupBy("w")
        .agg(F.count("*").cast("long").alias("freq"))
        .select(_bpe_boundary_string(F.col("w")).alias("s"), "freq")
        .localCheckpoint()
    )
    return _train_bpe_loop(words, n_merges, batch_window)


def _train_bpe_loop(
    sdf: DataFrame, n_merges: int, batch_window: int
) -> list[tuple[str, str, int]]:
    """Shared merge-learning loop over (s boundary-string, freq) rows —
    full-text mode passes freq=1 per document, dictionary mode one row
    per distinct word with its corpus frequency."""
    sep2 = BPE_SEP + BPE_SEP
    merges: list[tuple[str, str, int]] = []
    produced = set()  # every multi-char symbol string a merge has created
    while len(merges) < n_merges:
        window = min(batch_window, n_merges - len(merges))
        syms = F.filter(
            F.split(F.col("s"), sep2), lambda x: x != F.lit("")
        )
        pairs = sdf.select(syms.alias("y"), "freq").select(
            F.explode(
                F.when(
                    F.size("y") >= 2,
                    F.zip_with(
                        F.slice("y", 1, F.size("y") - 1),
                        F.slice("y", 2, F.size("y") - 1),
                        lambda a, b: F.struct(
                            a.alias("a"), b.alias("b")
                        ),
                    ),
                ).otherwise(F.array().cast("array<struct<a:string,b:string>>"))
            ).alias("p"),
            "freq",
        )
        top = (
            pairs.groupBy("p.a", "p.b")
            .agg(F.sum("freq").cast("long").alias("c"))
            .orderBy(F.desc("c"), F.asc("a"), F.asc("b"))
            .limit(window + 1)
            .collect()
        )
        if not top:
            break
        # counts at or below the horizon may have invisible ties — a
        # fully-visible slice (fewer rows than asked) has no horizon
        guard = int(top[window].c) if len(top) > window else 0
        batch: list[tuple[str, str, int]] = []
        used: set[str] = set()
        for pos, row in enumerate(top[:window]):
            a, b, c = row.a, row.b, int(row.c)
            if c <= guard or a in used or b in used:
                break
            # tie guard: any unaccepted visible pair with count >= c that
            # touches the batch could transform into a new pair TYING c
            # with an arbitrary (possibly winning) lex key — unprovable
            # without a recount, so the batch ends here. Rows above `pos`
            # are all accepted (or the loop broke), so scan the rest.
            if any(
                int(q.c) >= c and (q.a in used or q.b in used)
                for q in top[pos + 1 :]
            ):
                break
            batch.append((a, b, c))
            used.update((a, b))
            fresh = (a + b) not in produced
            produced.add(a + b)
            if not fresh:
                break  # (x, a+b) counts can now increase: re-count first
        if not batch:  # horizon too tight for even one merge: it IS the
            batch = [  # sequential argmax, always safe alone
                (top[0].a, top[0].b, int(top[0].c))
            ]
            produced.add(top[0].a + top[0].b)
        merges.extend(batch)
        col = F.col("s")
        for a, b, _c in batch:  # disjoint symbols: replaces can't overlap
            col = F.replace(
                col,
                F.lit(BPE_SEP + a + sep2 + b + BPE_SEP),
                F.lit(BPE_SEP + a + b + BPE_SEP),
            )
        sdf = sdf.select(col.alias("s"), "freq").localCheckpoint()
    return merges


def train_bpe_sql(
    text_expr: str, n_merges: int, source: str = "documents"
) -> str:
    """Unrolled oracle twin of ``train_bpe_merges``: per round one
    symbols/pairs/argmax/rewrite CTE quartet; emits (rank, a, b, c)."""
    sep = BPE_SEP
    parts = [
        f"t0 AS (SELECT {bpe_encode_sql(text_expr)} AS s FROM {source}) "
    ]
    selects = []
    for i in range(1, n_merges + 1):
        prev = f"t{i - 1}"
        parts.append(
            f", y{i} AS (SELECT list_filter(string_split(s, '{sep}{sep}'),"
            f" x -> x <> '') AS y FROM {prev})"
            f", q{i} AS (SELECT y, unnest(generate_series(1,"
            f" greatest(len(y) - 1, 0))) AS i FROM y{i})"
            f", p{i} AS (SELECT y[i] AS a, y[i + 1] AS b,"
            f" CAST(count(*) AS BIGINT) AS c FROM q{i} GROUP BY y[i],"
            f" y[i + 1])"
            f", b{i} AS (SELECT a, b, c FROM p{i}"
            f" ORDER BY c DESC, a, b LIMIT 1)"
            f", t{i} AS (SELECT replace(s,"
            f" '{sep}' || (SELECT a FROM b{i}) || '{sep}{sep}' ||"
            f" (SELECT b FROM b{i}) || '{sep}',"
            f" '{sep}' || (SELECT a || b FROM b{i}) || '{sep}') AS s"
            f" FROM {prev})"
        )
        selects.append(
            f"SELECT {i} AS rank, a, b, c FROM b{i}"
        )
    return (
        "WITH " + "".join(parts) + " " + " UNION ALL ".join(selects)
        + " ORDER BY rank"
    )


def train_bpe_words_sql(
    n_merges: int, source: str = "documents", text_col: str = "text"
) -> str:
    """Unrolled oracle twin of ``train_bpe_merges_words``: the word
    dictionary built once, then per round a symbols/pairs/argmax/rewrite
    CTE quartet with frequency-weighted counts; emits (rank, a, b, c)."""
    sep = BPE_SEP
    parts = [
        "words AS (SELECT w, CAST(count(*) AS BIGINT) AS freq FROM"
        f" (SELECT unnest(string_split(coalesce({text_col}, ''), ' '))"
        f" AS w FROM {source}) WHERE w <> '' GROUP BY w), "
        f"t0 AS (SELECT {bpe_encode_sql('w')} AS s, freq FROM words) "
    ]
    selects = []
    for i in range(1, n_merges + 1):
        prev = f"t{i - 1}"
        parts.append(
            f", y{i} AS (SELECT list_filter(string_split(s, '{sep}{sep}'),"
            f" x -> x <> '') AS y, freq FROM {prev})"
            f", q{i} AS (SELECT y, freq, unnest(generate_series(1,"
            f" greatest(len(y) - 1, 0))) AS i FROM y{i})"
            f", p{i} AS (SELECT y[i] AS a, y[i + 1] AS b,"
            f" CAST(sum(freq) AS BIGINT) AS c FROM q{i} GROUP BY y[i],"
            f" y[i + 1])"
            f", b{i} AS (SELECT a, b, c FROM p{i}"
            f" ORDER BY c DESC, a, b LIMIT 1)"
            f", t{i} AS (SELECT replace(s,"
            f" '{sep}' || (SELECT a FROM b{i}) || '{sep}{sep}' ||"
            f" (SELECT b FROM b{i}) || '{sep}',"
            f" '{sep}' || (SELECT a || b FROM b{i}) || '{sep}') AS s,"
            f" freq FROM {prev})"
        )
        selects.append(
            f"SELECT {i} AS rank, a, b, c FROM b{i}"
        )
    return (
        "WITH " + "".join(parts) + " " + " UNION ALL ".join(selects)
        + " ORDER BY rank"
    )


def normalize_text(
    df,
    id_col: str = "doc_id",
    text_col: str = "text",
    lower: bool = True,
    strip_accents: bool = True,
    compat: bool = False,
):
    """Unicode text normalization — the canonicalization step fuzzy dedup
    and token-frequency ops run first so 'École' and 'ecole' share a key.

    Canonical mode (default): NFD-decompose → drop combining marks →
    lowercase → NFC-recompose. This exact pipeline is engine-portable
    (DuckDB: ``nfc_normalize(lower(strip_accents(nfc_normalize(x))))``
    is bit-identical on canonical-decomposition accents — verified over
    Latin/Greek diacritics and digraphs), so the output is
    oracle-checkable. ``compat=True`` switches to NFKD COMPATIBILITY
    folding (ligatures ﬁ→fi, fullwidth ＡＢＣ→abc, № → No) — the richer
    cleanup real pipelines often want, but NOT SQL-replayable (DuckDB's
    strip_accents does no compatibility decomposition), so it is
    pytest-verified only.

    Arrow-batched ``mapInPandas`` kernel (unicodedata has no Spark
    built-in); map-only, no shuffle — normalization cost rides the scan.
    """
    import unicodedata
    from collections.abc import Iterator as _It

    import pandas as pd

    form = "NFKD" if compat else "NFD"

    def _norm(s: str | None) -> str:
        if s is None:
            return ""
        # decompose whenever EITHER fold is requested: strip_accents
        # needs the marks split out, compat needs NFKD applied even when
        # accents are kept (compat=True, strip_accents=False must still
        # fold ligatures/fullwidth — it is not a strip_accents sub-mode)
        if strip_accents or compat:
            s = unicodedata.normalize(form, s)
        if strip_accents:
            s = "".join(c for c in s if not unicodedata.combining(c))
        if lower:
            s = s.lower()
        return unicodedata.normalize("NFC", s)

    def kernel(batches: _It[pd.DataFrame]) -> _It[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "id": pdf[id_col],
                    "text_norm": [_norm(s) for s in pdf[text_col]],
                }
            )

    out = df.select(id_col, text_col).mapInPandas(
        kernel, f"id {dict(df.dtypes)[id_col]}, text_norm string"
    )
    return out.withColumnRenamed("id", id_col)


# known abbreviations whose trailing dot must not end a sentence; masked
# with a sentinel before boundary detection, restored after. A fixed
# public list — extending it is config, not code.
SENT_ABBREVS = ("Mr.", "Mrs.", "Dr.", "Prof.", "St.", "e.g.", "i.e.",
                "vs.", "etc.")
_SENT_SEP = "\x01"
_DOT_MASK = "\x02"


def split_sentences(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Rule-based sentence segmentation: a boundary is a terminator
    ([.!?]) followed by whitespace and an UPPERCASE letter — the
    classic conservative web-text splitter (lowercase follow = no
    split, so '? yes' stays inside its sentence). Returns (id,
    sent_idx, sentence), wordless docs absent.

    Dialect discipline: NO lookarounds (RE2 has none — the boundary
    captures both sides and re-inserts them around a \\x01 sentinel) and
    abbreviation dots are masked by literal replaces before the boundary
    regex, restored after — every step replays in DuckDB with \\1-style
    backrefs and an explicit 'g' flag. Pure column exprs in the scan
    projection; the only shuffle-free fan-out is the sentence explode."""
    t = F.coalesce(F.col(text_col), F.lit(""))
    for a in SENT_ABBREVS:
        t = F.replace(t, F.lit(a), F.lit(a[:-1] + _DOT_MASK))
    t = F.regexp_replace(t, r"([.!?]) +([A-Z])", "$1" + _SENT_SEP + "$2")
    sents = F.filter(
        F.transform(
            F.split(t, _SENT_SEP),
            lambda s: F.trim(F.replace(s, F.lit(_DOT_MASK), F.lit("."))),
        ),
        lambda s: s != "",
    )
    return df.select(
        F.col(id_col).alias("id"),
        F.posexplode(sents).alias("sent_idx", "sentence"),
    ).select(F.col("id").alias(id_col), "sent_idx", "sentence")


def readability_scores(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Integer Flesch readability: (id, n_sentences, n_words,
    n_syllables, flesch_milli, fk_grade_milli) — the curation-tier
    reading-level signal beside quality_score (a corpus skewed to
    grade-2 listicles or grade-19 legalese is a mixture bug).

    Heuristics, stated exactly so the oracle replays them:

    * sentences = non-blank chunks of a ``[.!?]+`` split;
    * words = whitespace tokens;
    * syllables = [aeiouy]+ runs in the lowercased text, plus one per
      vowel-less word (the max(1,·) floor of the classic heuristic —
      runs cannot span words, so the text-level count equals the
      word-level sum);
    * flesch_milli = 206835 − (1015·words) // sentences −
      (84600·syllables) // words, integer floor divisions — NULL when
      a denominator is 0 (no fabricated score for empty text);
      fk_grade_milli is the Flesch-Kincaid grade analogue.

    Pure higher-order column expressions — zero shuffles, zero
    Python; at 10^12 docs the cost is the regexp passes."""
    t = F.coalesce(F.col(text_col).cast("string"), F.lit(""))
    low = F.lower(t)
    sents = F.size(
        F.filter(F.split(t, r"[.!?]+"), lambda s: F.trim(s) != "")
    ).cast("long")
    words_arr = F.filter(F.split(low, r"\s+"), lambda w: w != "")
    words = F.size(words_arr).cast("long")
    runs = F.size(F.regexp_extract_all(low, F.lit("[aeiouy]+"), 0)).cast(
        "long"
    )
    novowel = F.size(
        F.filter(words_arr, lambda w: ~w.rlike("[aeiouy]"))
    ).cast("long")
    syl = runs + novowel
    ok = (sents > 0) & (words > 0)
    flesch = F.when(
        ok,
        F.lit(206835)
        - ((F.lit(1015) * words) / sents).cast("long")
        - ((F.lit(84600) * syl) / words).cast("long"),
    )
    fk = F.when(
        ok,
        ((F.lit(390) * words) / sents).cast("long")
        + ((F.lit(11800) * syl) / words).cast("long")
        - F.lit(15590),
    )
    return df.select(
        F.col(id_col).alias(id_col),
        sents.alias("n_sentences"),
        words.alias("n_words"),
        syl.alias("n_syllables"),
        flesch.alias("flesch_milli"),
        fk.alias("fk_grade_milli"),
    )


# Unicode script blocks (BMP only — deliberately: Java regex walks UTF-16
# code units and RE2 walks code points, which only agree inside the BMP;
# astral chars simply fall outside every class on both engines). Public
# Unicode block ranges; the tuple order IS the dominant-script tie-break.
SCRIPT_BLOCKS: tuple[tuple[str, str], ...] = (
    ("latin", "A-Za-zÀ-ÖØ-öø-ɏ"),
    ("cyrillic", "Ѐ-ӿ"),
    ("greek", "Ͱ-Ͽ"),
    ("arabic", "؀-ۿ"),
    ("hebrew", "֐-׿"),
    ("devanagari", "ऀ-ॿ"),
    ("hangul", "가-힣"),
    ("kana", "぀-ヿ"),
    ("han", "一-鿿"),
)


def script_profile(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Unicode-script detection: per-document letter counts for the nine
    major script blocks plus the dominant script — the routing signal a
    multilingual pipeline applies BEFORE any language model touches the
    text (lang_id's n-gram profiles only separate languages within a
    script; a Cyrillic page fed to a Latin-profile scorer is garbage-in).
    Returns (id, n_latin, ..., n_han, n_letters, script) where script is
    the argmax count with ties broken by SCRIPT_BLOCKS order and 'none'
    when no scripted letter occurs.

    Integer char counts via one regexp_replace strip per block — nine
    regex passes in ONE codegen projection, zero shuffles, zero Python,
    bit-identical across engines (BMP classes, see SCRIPT_BLOCKS note).
    """
    t = F.coalesce(F.col(text_col).cast("string"), F.lit(""))
    counts = {
        name: F.length(F.regexp_replace(t, f"[^{cls}]", "")).cast("long")
        for name, cls in SCRIPT_BLOCKS
    }
    total = None
    for c in counts.values():
        total = c if total is None else total + c
    top = F.greatest(*counts.values())
    script = F.when(total == 0, F.lit("none"))
    for name, _ in SCRIPT_BLOCKS:
        script = script.when(counts[name] == top, F.lit(name))
    return df.select(
        F.col(id_col),
        *[counts[n].alias(f"n_{n}") for n, _ in SCRIPT_BLOCKS],
        total.alias("n_letters"),
        script.alias("script"),
    )


def script_profile_sql(
    table: str = "documents",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> str:
    """DuckDB twin of ``script_profile`` (note the explicit 'g' flag —
    DuckDB's regexp_replace is first-match-only by default where
    Spark's is global)."""
    cnt = ", ".join(
        f"length(regexp_replace(t, '[^{cls}]', '', 'g'))::BIGINT AS n_{n}"
        for n, cls in SCRIPT_BLOCKS
    )
    tot = " + ".join(f"n_{n}" for n, _ in SCRIPT_BLOCKS)
    top = ", ".join(f"n_{n}" for n, _ in SCRIPT_BLOCKS)
    dom = " ".join(
        f"WHEN n_{n} = greatest({top}) THEN '{n}'" for n, _ in SCRIPT_BLOCKS
    )
    return (
        f"WITH b AS (SELECT {id_col},"
        f" coalesce({text_col}, '') AS t FROM {table}),"
        f" c AS (SELECT {id_col}, {cnt} FROM b) "
        f"SELECT *, ({tot})::BIGINT AS n_letters,"
        f" CASE WHEN ({tot}) = 0 THEN 'none' {dom} END AS script FROM c"
    )
