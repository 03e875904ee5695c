"""DSIR — Data Selection via Importance Resampling (Xie et al. 2023,
arXiv:2302.03169) — the standard recipe for picking pretraining documents
that *look like* a small high-quality target set: fit bag-of-hashed-ngram
unigram+bigram models on the target and on the raw pool, weight every raw
document by its log-likelihood ratio under the two models, then take the
top-k (deterministic audit mode) or Gumbel-top-k (the paper's sampling
mode, here with a portable seeded hash so it replays exactly).

Reference lineage: the reference repo ranks detector candidates by a
learned score and keeps the best per region (model/utils/yolov5_utils.py
non-max candidate selection); DSIR is that same score-and-select shape
lifted to corpus level — score = target-likeness, select = top-k.

Determinism contract (house pattern, see operators/retrieval.py): every
count is an exact bigint; each bucket's log-likelihood ratio

    llr[b] = ln((c_t[b] + 1) / (T_t + B)) - ln((c_r[b] + 1) / (T_r + B))

is quantized to integer MICRO units immediately (identical expression
tree in Spark and DuckDB), so the per-document sum is an exact bigint and
the reported ``logw`` is ONE IEEE division. Feature hashing is
``md5_long`` (operators/dedup.py) — the single portable-hash primitive
every oracle twin uses. A last-ulp ``ln`` divergence can flip a rounding
only on a measure-zero boundary.

Scale shape (the 100 TB path): the fitted model is at most ``n_buckets``
rows (default 8192) → broadcast to the scoring join; each side is ONE
explode + ONE groupBy(bucket) with map-side partials; totals ride along
as a 1-row crossJoin (never collected); scoring is one broadcast join +
one groupBy(doc); selection is TakeOrdered top-k, not a global sort. No
driver state anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dedup import md5_long

GUMBEL_DENOM = 4294967296.0  # 2^32: md5_long(.., 8) is uniform on [0, 2^32)


def _words(text_col):
    return F.filter(
        F.split(F.coalesce(text_col, F.lit("")), " "), lambda w: w != ""
    )


def _features(df: DataFrame, text_col: str, ns: tuple[int, ...], keep=()):
    """One row per word n-gram occurrence (column ``g``), all n in ``ns``
    — the hashed-feature stream both model fitting and document scoring
    consume. ``keep`` columns ride along (the doc id for scoring; empty
    for fitting). All n-gram arrays are built in ONE projection and
    exploded from one concatenated array, so the source is scanned once
    per call, not once per n — at corpus scale that halves the passes."""
    words = df.select(*keep, _words(F.col(text_col)).alias("ws"))
    keep_names = words.columns[:-1]

    def grams(n):
        k = F.size("ws") - F.lit(n - 1)
        return F.when(
            k >= 1,
            F.transform(
                F.sequence(F.lit(1), k),
                lambda i: F.concat_ws(" ", F.slice("ws", i, n)),
            ),
        ).otherwise(F.array().cast("array<string>"))

    allg = grams(ns[0])
    for n in ns[1:]:
        allg = F.concat(allg, grams(n))
    return words.select(*keep_names, F.explode(allg).alias("g"))


def dsir_model(
    target: DataFrame,
    raw: DataFrame,
    text_col: str = "text",
    n_buckets: int = 8192,
    ns: tuple[int, ...] = (1, 2),
) -> DataFrame:
    """(bucket, c_target, c_raw, llr_micro): hashed-ngram counts on both
    sides (full outer on bucket, absent side = 0) and the micro-quantized
    add-one-smoothed log-likelihood ratio. Laplace alpha is fixed at 1 —
    part of the oracle contract, not a tunable (the paper's default).

    Only buckets observed in target OR raw appear; a raw document's
    features always hit buckets present in the raw counts, so the
    scoring join below never misses."""

    def counts(df, name):
        return (
            _features(df, text_col, ns)
            .groupBy((md5_long(F.col("g"), 8) % F.lit(n_buckets)).alias("bucket"))
            .agg(F.count("*").cast("long").alias(name))
        )

    ct = counts(target, "c_target")
    cr = counts(raw, "c_raw")
    joined = (
        ct.join(cr, "bucket", "full_outer")
        .select(
            "bucket",
            F.coalesce("c_target", F.lit(0).cast("long")).alias("c_target"),
            F.coalesce("c_raw", F.lit(0).cast("long")).alias("c_raw"),
        )
    )
    # Totals as an unkeyed window over the <=n_buckets-row count table:
    # a separate .agg() branch would force Spark to recompute both count
    # subtrees (two extra corpus passes); the single-partition window is
    # over at most n_buckets rows, never over corpus data.
    from pyspark.sql import Window

    wall = Window.partitionBy()
    withtot = joined.select(
        "bucket",
        "c_target",
        "c_raw",
        F.sum("c_target").over(wall).cast("double").alias("tt"),
        F.sum("c_raw").over(wall).cast("double").alias("tr"),
    )
    bf = F.lit(float(n_buckets))
    llr = F.log(
        (F.col("c_target").cast("double") + F.lit(1.0)) / (F.col("tt") + bf)
    ) - F.log((F.col("c_raw").cast("double") + F.lit(1.0)) / (F.col("tr") + bf))
    return withtot.select(
        "bucket",
        "c_target",
        "c_raw",
        F.round(llr * F.lit(1e6)).cast("long").alias("llr_micro"),
    )


def _weights_micro(
    raw: DataFrame,
    target: DataFrame,
    id_col: str,
    text_col: str,
    n_buckets: int,
    ns: tuple[int, ...],
) -> DataFrame:
    """(id, n_feats, logw_micro): the exact-bigint weight sum shared by
    ``dsir_weights`` (divides straight away) and ``dsir_select`` (keys on
    the micro int — never on a float round-trip)."""
    model = dsir_model(target, raw, text_col, n_buckets, ns)
    feats = _features(raw, text_col, ns, keep=(F.col(id_col).alias("id"),))
    scored = feats.select(
        "id", (md5_long(F.col("g"), 8) % F.lit(n_buckets)).alias("bucket")
    ).join(F.broadcast(model.select("bucket", "llr_micro")), "bucket")
    return scored.groupBy("id").agg(
        F.count("*").cast("long").alias("n_feats"),
        F.sum("llr_micro").alias("logw_micro"),
    )


def dsir_weights(
    raw: DataFrame,
    target: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = 8192,
    ns: tuple[int, ...] = (1, 2),
) -> DataFrame:
    """(id_col, n_feats, logw): importance weight of every raw document
    with at least one feature (empty/null docs are absent — house
    contract). ``logw`` = exact micro-int sum / 1e6; ties in downstream
    selection break on the id, never on float noise."""
    return _weights_micro(raw, target, id_col, text_col, n_buckets, ns).select(
        F.col("id").alias(id_col),
        "n_feats",
        (F.col("logw_micro") / F.lit(1e6)).alias("logw"),
    )


def dsir_select(
    raw: DataFrame,
    target: DataFrame,
    k: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = 8192,
    ns: tuple[int, ...] = (1, 2),
    seed: int | None = None,
) -> DataFrame:
    """Top-k raw documents by importance weight: (id_col, n_feats, logw,
    sel_key). ``seed=None`` is the deterministic audit mode (sel_key =
    logw). With a seed, the paper's Gumbel-top-k sampling: sel_key =
    logw + Gumbel(md5-seeded uniform), micro-quantized so it replays
    exactly in the oracle. Spark plans this as TakeOrdered (per-partition
    top-k then a k-row merge), never a full sort."""
    w = _weights_micro(raw, target, id_col, text_col, n_buckets, ns)
    if seed is None:
        key_micro = F.col("logw_micro")
    else:
        u = (
            md5_long(
                F.concat(F.lit(f"dsir:{seed}:"), F.col("id").cast("string")), 8
            ).cast("double")
            + F.lit(0.5)
        ) / F.lit(GUMBEL_DENOM)
        key_micro = F.col("logw_micro") + F.round(
            -F.log(-F.log(u)) * F.lit(1e6)
        ).cast("long")
    return (
        w.select(
            F.col("id").alias(id_col),
            "n_feats",
            (F.col("logw_micro") / F.lit(1e6)).alias("logw"),
            (key_micro / F.lit(1e6)).alias("sel_key"),
        )
        .orderBy(F.col("sel_key").desc(), F.col(id_col))
        .limit(k)
    )


def _features_sql(source: str, ns: tuple[int, ...], with_id: bool) -> str:
    """Feature-stream CTE body: identical word filter, gram slicing and
    concatenation as ``_features``."""
    idsel = "id, " if with_id else ""
    parts = []
    for n in ns:
        parts.append(
            f"SELECT {idsel}array_to_string(list_slice(ws, i, i + {n - 1}),"
            " ' ') AS g"
            f" FROM ws, unnest(generate_series(1, len(ws) - {n} + 1)) AS t(i)"
            f" WHERE len(ws) >= {n}"
        )
    return (
        f"ws AS (SELECT {idsel}list_filter(string_split(coalesce(text, ''),"
        f" ' '), x -> x <> '') AS ws FROM ({source})),"
        " feats AS (" + " UNION ALL ".join(parts) + ")"
    )


def _weights_micro_sql(
    raw_source: str,
    target_source: str,
    id_col: str,
    n_buckets: int,
    ns: tuple[int, ...],
) -> str:
    """Micro-int weights query (id_col, n_feats, logw_micro) — identical
    feature stream, md5 bucketing, add-one smoothing and quantization as
    the Spark side. ``raw_source`` / ``target_source`` are SELECTs (or
    table names) with columns ({id_col}, text)."""
    b = n_buckets
    tgt_feats = _features_sql(f"SELECT text FROM ({target_source})", ns, False)
    raw_feats = _features_sql(f"SELECT text FROM ({raw_source})", ns, False)
    doc_feats = _features_sql(
        f"SELECT {id_col} AS id, text FROM ({raw_source})", ns, True
    )
    bucket = f"('0x'||substr(md5(g),1,8))::BIGINT % {b}"
    return (
        "WITH"
        f" tc AS (WITH {tgt_feats} SELECT {bucket} AS bucket,"
        " CAST(count(*) AS BIGINT) AS c_target FROM feats GROUP BY 1),"
        f" rc AS (WITH {raw_feats} SELECT {bucket} AS bucket,"
        " CAST(count(*) AS BIGINT) AS c_raw FROM feats GROUP BY 1),"
        " m0 AS (SELECT coalesce(tc.bucket, rc.bucket) AS bucket,"
        " coalesce(c_target, 0) AS c_target, coalesce(c_raw, 0) AS c_raw"
        " FROM tc FULL OUTER JOIN rc ON tc.bucket = rc.bucket),"
        " tot AS (SELECT CAST(sum(c_target) AS DOUBLE) AS tt,"
        " CAST(sum(c_raw) AS DOUBLE) AS tr FROM m0),"
        " model AS (SELECT bucket, CAST(round(("
        f" ln((CAST(c_target AS DOUBLE) + 1.0) / (tt + {float(b)!r}))"
        f" - ln((CAST(c_raw AS DOUBLE) + 1.0) / (tr + {float(b)!r}))"
        " ) * 1e6) AS BIGINT) AS llr_micro FROM m0, tot),"
        f" df AS (WITH {doc_feats} SELECT id, {bucket} AS bucket FROM feats)"
        f" SELECT df.id AS {id_col}, CAST(count(*) AS BIGINT) AS n_feats,"
        " CAST(sum(llr_micro) AS BIGINT) AS logw_micro"
        " FROM df JOIN model ON df.bucket = model.bucket"
        " GROUP BY df.id"
    )


def dsir_weights_sql(
    raw_source: str,
    target_source: str,
    id_col: str = "doc_id",
    n_buckets: int = 8192,
    ns: tuple[int, ...] = (1, 2),
) -> str:
    """Oracle twin of ``dsir_weights``: micro-int sum then ONE division."""
    w = _weights_micro_sql(raw_source, target_source, id_col, n_buckets, ns)
    return (
        f"WITH w AS ({w})"
        f" SELECT {id_col}, n_feats, logw_micro / 1e6 AS logw FROM w"
    )


def dsir_select_sql(
    raw_source: str,
    target_source: str,
    k: int,
    id_col: str = "doc_id",
    n_buckets: int = 8192,
    ns: tuple[int, ...] = (1, 2),
    seed: int | None = None,
) -> str:
    """Oracle twin of ``dsir_select``: micro-int weights CTE + the
    identical micro-int selection key + ORDER BY/LIMIT."""
    w = _weights_micro_sql(raw_source, target_source, id_col, n_buckets, ns)
    if seed is None:
        key = "logw_micro"
    else:
        u = (
            f"((('0x'||substr(md5('dsir:{seed}:'||{id_col}::VARCHAR),1,8))"
            f"::BIGINT::DOUBLE + 0.5) / {GUMBEL_DENOM!r})"
        )
        key = f"logw_micro + CAST(round(-ln(-ln({u})) * 1e6) AS BIGINT)"
    return (
        f"WITH w AS ({w})"
        f" SELECT {id_col}, n_feats, logw_micro / 1e6 AS logw,"
        f" ({key}) / 1e6 AS sel_key FROM w"
        f" ORDER BY sel_key DESC, {id_col} LIMIT {k}"
    )
