"""Multiclass topic/domain classification — the fastText-shape router a
training-data pipeline uses to build domain mixtures (news vs code vs
forums vs reference), sitting beside the binary quality head
(``quality_train.train_quality_logit``) and completing the classifier
family: binary keep/drop + K-way routing.

Reference analog: the reference's two-head forward produces per-pixel
class maps (text/line); the webtext recast's unit is the document and the
"heads" are K linear class scores over hashed bag-of-words features.

Determinism contract (the ``quality_train`` contract extended to softmax):

* features: integer bag counts in md5-hashed buckets — engine-portable;
* weights: integer MILLIweights per (class, bucket); per-(doc, class)
  logits are exact bigint dot products;
* softmax: computed over the per-doc logit LIST in class order — max
  subtraction, exp, and a left-fold sum all walk ascending class index,
  so both engines add the same doubles in the same order — then quantized
  immediately to integer milli-probabilities (round half-away, positive);
* gradients ``Σ (p_milli − 1000·[y=c])·x`` are exact bigints; the update
  is the integer floor step ``w ← w − floor(lr_num·g/(lr_den·N))``.

The only float ops are K exps + one fold per (doc, iteration), quantized
to 1e-3 — the same measure-zero ulp caveat as the binary trainer's
sigmoid, documented there and inherited here.

Scale shape: the labeled sample is small by construction; per iteration
the plan is one broadcast of the (c, b, mw) model onto the persisted
feature frame, two keyed aggregations, and a model-sized driver collect
(n_classes × occupied buckets, hard-capped the same way as the binary
trainer). INFERENCE over the full corpus is one broadcast join + one
(id, c) aggregate + one per-id argmax — no iteration, no collect.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dedup import md5_long
from .quality_train import _features


def _softmax_milli(lms):
    """array<long> milli-logits → array<long> milli-probs, fixed
    ascending-class evaluation order on both engines."""
    mx = F.array_max(lms)
    es = F.transform(lms, lambda l: F.exp((l - mx) / F.lit(1000.0)))
    s = F.aggregate(es, F.lit(0.0), lambda a, v: a + v)
    return F.transform(
        es, lambda e: F.round(F.lit(1000.0) * e / s).cast("long")
    )


def topic_scores(
    df: DataFrame,
    weights: dict[tuple[int, int], int],
    n_classes: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = 1 << 12,
) -> DataFrame:
    """Score every document against a trained (class, bucket) →
    milliweight model: (id, logits array<long> in class order, topic =
    argmax with smallest-class tie-break). Empty documents score all-zero
    logits and route to class 0 — a real row, not a dropped one (the
    mixture accountant needs the denominator)."""
    spark = df.sparkSession
    witems = sorted((c, b, mw) for (c, b), mw in weights.items())
    wdf = F.broadcast(
        spark.createDataFrame(witems, "c int, b long, mw long")
        if witems
        else spark.createDataFrame([], "c int, b long, mw long")
    )
    words = df.select(
        F.col(id_col).alias("id"),
        F.explode_outer(
            F.split(F.coalesce(F.col(text_col), F.lit("")), " ")
        ).alias("w"),
    )
    feats = (
        words.select(
            "id",
            F.when(
                F.col("w") != "", md5_long(F.col("w")) % n_buckets
            ).alias("b"),
        )
        .groupBy("id", "b")
        .agg(F.count(F.col("b")).cast("long").alias("x"))
    )
    percls = (
        feats.join(wdf, "b")
        .groupBy("id", "c")
        .agg(F.sum(F.col("x") * F.col("mw")).alias("lm"))
    )
    dense = percls.groupBy("id").agg(
        F.map_from_entries(
            F.collect_list(F.struct(F.col("c"), F.col("lm")))
        ).alias("m")
    )
    # every input row survives, even docs with no scored bucket
    ids = df.select(F.col(id_col).alias("id")).distinct()
    lms = F.transform(
        F.sequence(F.lit(0), F.lit(n_classes - 1)),
        lambda c: F.coalesce(
            F.element_at(F.col("m"), c.cast("int")), F.lit(0).cast("long")
        ),
    )
    scored = ids.join(dense, "id", "left").select(
        "id", lms.alias("logits")
    )
    mx = F.array_max(F.col("logits"))
    topic = F.array_position(F.col("logits"), mx).cast("int") - 1
    return scored.select(
        F.col("id").alias(id_col),
        "logits",
        topic.alias("topic"),
    )


def train_topic_softmax(
    df: DataFrame,
    n_classes: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    label_col: str = "label",
    n_buckets: int = 1 << 12,
    n_iter: int = 3,
    lr_num: int = 2,
    lr_den: int = 1,
    max_updates_per_iter: int | None = None,
) -> dict[tuple[int, int], int]:
    """Fit (class, bucket) → integer milliweight by batch softmax GD
    (see module docstring). The per-iteration collect is one row per
    occupied (class, bucket) gradient cell; without
    ``max_updates_per_iter`` (top-k by |g| desc, g, c, b — the binary
    trainer's cap, extended with the class key) the hash space is
    asserted ≤ 2^16 so the K-fold fan-out stays model-sized."""
    if n_iter < 1:
        raise ValueError(f"n_iter must be >= 1, got {n_iter}")
    if n_classes < 2:
        raise ValueError(f"n_classes must be >= 2, got {n_classes}")
    if max_updates_per_iter is None:
        if n_buckets > (1 << 16):
            raise ValueError(
                f"n_buckets={n_buckets} > 2^16: the uncapped multiclass"
                " gradient collect is n_classes x occupied buckets — pass"
                " max_updates_per_iter for large hash spaces"
            )
    elif max_updates_per_iter < 1:
        raise ValueError(
            f"max_updates_per_iter must be >= 1, got {max_updates_per_iter}"
        )
    feats = _features(df, id_col, text_col, label_col, n_buckets).persist()
    n_docs = feats.select("id").distinct().count()
    if n_docs == 0:
        feats.unpersist()
        raise ValueError("no labeled documents with at least one word")
    spark = df.sparkSession
    weights: dict[tuple[int, int], int] = {}
    try:
        for _ in range(n_iter):
            if weights:
                wdf = F.broadcast(
                    spark.createDataFrame(
                        sorted((c, b, mw) for (c, b), mw in weights.items()),
                        "c int, b long, mw long",
                    )
                )
                percls = (
                    feats.join(wdf, "b")
                    .groupBy("id", "c")
                    .agg(F.sum(F.col("x") * F.col("mw")).alias("lm"))
                )
                dense = percls.groupBy("id").agg(
                    F.map_from_entries(
                        F.collect_list(F.struct("c", "lm"))
                    ).alias("m")
                )
                base = feats.select("id", "y").distinct().join(
                    dense, "id", "left"
                )
            else:
                base = (
                    feats.select("id", "y")
                    .distinct()
                    .withColumn(
                        "m", F.lit(None).cast("map<int,bigint>")
                    )
                )
            lms = F.transform(
                F.sequence(F.lit(0), F.lit(n_classes - 1)),
                lambda c: F.coalesce(
                    F.element_at(F.col("m"), c.cast("int")),
                    F.lit(0).cast("long"),
                ),
            )
            probs = base.select(
                "id", F.posexplode(_softmax_milli(lms))
            ).select(
                "id",
                F.col("pos").cast("int").alias("c"),
                F.col("col").alias("p"),
            )
            gdf = (
                feats.join(probs, "id")
                .groupBy("c", "b")
                .agg(
                    F.sum(
                        (
                            F.col("p")
                            - F.when(feats["y"] == F.col("c"), 1000)
                            .otherwise(0)
                        )
                        * F.col("x")
                    ).alias("g")
                )
            )
            if max_updates_per_iter is not None:
                gdf = gdf.orderBy(
                    F.abs(F.col("g")).desc(), F.col("g"), F.col("c"), F.col("b")
                ).limit(max_updates_per_iter)
            for r in gdf.collect():
                upd = math.floor(lr_num * r.g / (lr_den * n_docs))
                key = (int(r.c), int(r.b))
                w = weights.get(key, 0) - upd
                if w:
                    weights[key] = w
                else:
                    weights.pop(key, None)
    finally:
        feats.unpersist()
    return weights


def train_topic_softmax_sql(
    n_classes: int,
    n_buckets: int,
    n_iter: int,
    lr_num: int = 2,
    lr_den: int = 1,
    source: str = "labeled",
    max_updates: int | None = None,
) -> str:
    """UNROLLED DuckDB twin of ``train_topic_softmax``: one
    logits/softmax/gradient/weights CTE quartet per iteration over a
    ``source`` relation with columns (id, text, y); selects the final
    (c, b, mw) nonzero weights. The softmax walks the per-doc logit LIST
    in class order (list_transform + list_aggregate 'sum'), matching the
    Spark fold order exactly."""
    feats = (
        "words AS (SELECT id, y, unnest(string_split(coalesce(text, ''),"
        f" ' ')) AS w FROM {source}), "
        "feats AS (SELECT id, y,"
        f" ('0x'||substr(md5(w),1,8))::BIGINT % {n_buckets} AS b,"
        " CAST(count(*) AS BIGINT) AS x FROM words WHERE w <> ''"
        " GROUP BY id, y, ('0x'||substr(md5(w),1,8))::BIGINT"
        f" % {n_buckets}), "
        "docs AS (SELECT DISTINCT id, y FROM feats), "
        "nd AS (SELECT count(*) AS n FROM docs), "
        f"classes AS (SELECT unnest(range({n_classes})) AS c), "
        "w0 AS (SELECT CAST(0 AS INT) AS c, CAST(0 AS BIGINT) AS b,"
        " CAST(0 AS BIGINT) AS mw WHERE false) "
    )
    parts = [feats]
    for i in range(1, n_iter + 1):
        prev = f"w{i - 1}"
        parts.append(
            f", l{i} AS (SELECT f.id, c.c, any_value(f.y) AS y,"
            f" sum(f.x * coalesce(w.mw, 0)) AS lm"
            f" FROM feats f CROSS JOIN classes c"
            f" LEFT JOIN {prev} w ON w.b = f.b AND w.c = c.c"
            f" GROUP BY f.id, c.c)"
            f", d{i} AS (SELECT id, any_value(y) AS y,"
            f" list(lm ORDER BY c) AS lms FROM l{i} GROUP BY id)"
            f", p{i} AS (SELECT id, y, generate_subscripts(pm, 1) - 1 AS c,"
            f" unnest(pm) AS p FROM (SELECT id, y,"
            f" list_transform(es, e -> CAST(round(1000.0 * e / s)"
            f" AS BIGINT)) AS pm FROM (SELECT id, y, es,"
            f" list_aggregate(es, 'sum') AS s FROM (SELECT id, y,"
            f" list_transform(lms, l -> exp((l - list_max(lms)) / 1000.0))"
            f" AS es FROM d{i}))))"
            f", g{i} AS (SELECT p.c, f.b,"
            f" sum((p.p - CASE WHEN f.y = p.c THEN 1000 ELSE 0 END) * f.x)"
            f" AS g FROM feats f JOIN p{i} p USING (id)"
            f" GROUP BY p.c, f.b)"
        )
        gsrc = f"g{i}"
        if max_updates is not None:
            parts.append(
                f", gk{i} AS (SELECT c, b, g FROM g{i}"
                f" ORDER BY abs(g) DESC, g, c, b LIMIT {max_updates})"
            )
            gsrc = f"gk{i}"
        upd = (
            f"SELECT g.c, g.b, coalesce(w.mw, 0) -"
            f" CAST(floor({lr_num} * g.g /"
            f" ({lr_den} * (SELECT n FROM nd))) AS BIGINT) AS mw"
            f" FROM {gsrc} g LEFT JOIN {prev} w"
            f" ON w.c = g.c AND w.b = g.b"
        )
        if max_updates is not None:
            upd += (
                f" UNION ALL SELECT w.c, w.b, w.mw FROM {prev} w"
                f" ANTI JOIN {gsrc} g ON g.c = w.c AND g.b = w.b"
            )
        parts.append(f", w{i} AS ({upd})")
    parts.append(
        f" SELECT CAST(c AS INT) AS c, b, mw FROM w{n_iter} WHERE mw <> 0"
    )
    return "WITH " + "".join(parts)


def topic_scores_sql(
    weights: dict[tuple[int, int], int],
    n_classes: int,
    n_buckets: int,
    source: str = "documents",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> str:
    """DuckDB twin of ``topic_scores`` for a LITERAL weights model."""
    witems = sorted((c, b, mw) for (c, b), mw in weights.items())
    if witems:
        vals = ", ".join(f"({c}, {b}, {mw})" for c, b, mw in witems)
        wcte = f"(SELECT * FROM (VALUES {vals}) AS v(c, b, mw))"
    else:
        wcte = "(SELECT 0 AS c, 0 AS b, 0 AS mw WHERE false)"
    return (
        f"WITH w AS {wcte},"
        f" words AS (SELECT {id_col} AS id,"
        f" unnest(string_split(coalesce({text_col}, ''), ' ')) AS w"
        f" FROM {source}),"
        " feats AS (SELECT id,"
        f" ('0x'||substr(md5(w),1,8))::BIGINT % {n_buckets} AS b,"
        " CAST(count(*) AS BIGINT) AS x FROM words WHERE w <> ''"
        " GROUP BY id, b),"
        " pc AS (SELECT f.id, w.c, sum(f.x * w.mw) AS lm"
        " FROM feats f JOIN w ON w.b = f.b GROUP BY f.id, w.c),"
        f" classes AS (SELECT unnest(range({n_classes})) AS c),"
        f" ids AS (SELECT DISTINCT {id_col} AS id FROM {source}),"
        " grid AS (SELECT i.id, c.c,"
        " CAST(coalesce(pc.lm, 0) AS BIGINT) AS lm"
        " FROM ids i CROSS JOIN classes c"
        " LEFT JOIN pc ON pc.id = i.id AND pc.c = c.c),"
        " dense AS (SELECT id, list(lm ORDER BY c) AS logits"
        " FROM grid GROUP BY id) "
        f"SELECT id AS {id_col}, logits,"
        " CAST(list_position(logits, list_max(logits)) - 1 AS INT)"
        " AS topic FROM dense"
    )
