"""In-Spark training of the hashed-BoW quality classifier — the closing of
the loop around ``curation.quality_logit``: that scorer consumes a trained
``weights`` dict (bucket → integer milliweight) and ``jobs/curate_job.py
--logit-weights`` ships one, but nothing in-repo produced one. This module
fits it with logistic regression as COLUMN-EXPRESSION gradient
aggregations over a labeled sample (reference analog: the training drivers
in /root/reference/train_db.py:59-198 — there a torch fit of the two-head
model, here the fastText-shape linear quality head the webtext recast
uses).

Determinism contract (what makes a TRAINER oracle-checkable at all):

* Features are integer bag counts in hashed buckets (md5, engine-portable).
* Weights live as integer MILLIweights; per-doc logits are exact bigint
  dot products divided once by 1000.
* Per-doc probabilities are rounded to integer MILLI-probabilities
  (``round(1000*sigmoid(logit))``), so every gradient sum
  ``Σ (p_milli − 1000·y)·x`` is an exact bigint — no accumulation-order
  float drift anywhere in the loop.
* The update is an integer floor step: ``w ← w − floor(lr_num·g /
  (lr_den·N))``.

The only float ops are one sigmoid per (doc, iteration), quantized to
1e-3 immediately — a cross-engine last-ulp exp difference flips a rounding
only on a measure-zero boundary. The oracle replays the whole fit as an
UNROLLED chain of CTEs (one logit+gradient+update trio per iteration).

Scale shape: the labeled sample is small by construction (human or LLM
labels — thousands to millions of rows, sampled from the corpus with
``hash_sample``); the feature explode is one pass, the per-iteration cost
is two keyed aggregations plus a broadcast of the current weights, and
only the MODEL (nonzero buckets × 16 bytes) ever reaches the driver —
the same "small state to driver" discipline as the IVF centroids.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dedup import md5_long


def _features(
    df: DataFrame, id_col: str, text_col: str, label_col: str, n_buckets: int
) -> DataFrame:
    """(id, b, x, y): bag-of-hashed-words counts per doc — the identical
    bucket hash ``quality_logit`` scores with."""
    words = df.select(
        F.col(id_col).alias("id"),
        F.col(label_col).cast("long").alias("y"),
        F.explode(
            F.split(F.coalesce(F.col(text_col), F.lit("")), " ")
        ).alias("w"),
    ).filter(F.col("w") != "")
    return (
        words.select(
            "id", "y", (md5_long(F.col("w")) % n_buckets).alias("b")
        )
        .groupBy("id", "b")
        .agg(F.count("*").cast("long").alias("x"), F.first("y").alias("y"))
    )


def train_quality_logit(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    label_col: str = "label",
    n_buckets: int = 1 << 18,
    n_iter: int = 5,
    lr_num: int = 2,
    lr_den: int = 1,
    max_updates_per_iter: int | None = None,
) -> dict[int, int]:
    """Fit bucket → integer milliweight by batch gradient descent (see
    module docstring for the integer-determinism contract). The returned
    dict plugs straight into ``curation.quality_logit(weights=...)`` and
    serializes as the ``curate_job --logit-weights`` JSON.

    The per-iteration driver collect is one row per OCCUPIED gradient
    bucket, so its size is bounded by min(n_buckets, distinct words in
    the sample). ``max_updates_per_iter`` caps it hard: each iteration
    updates only the k buckets with the largest |gradient| (deterministic
    total order — |g| desc, then g, then b — via a distributed
    orderBy+limit, a TakeOrderedAndProject, no global sort), leaving the
    rest of the model untouched that round — greedy coordinate-style
    descent, still integer-deterministic and oracle-replayable. Without
    the cap, ``n_buckets`` is asserted ≤ 2^19 (the documented bound at
    which a dense-vocabulary sample could push a multi-hundred-k-row
    collect per iteration)."""
    if n_iter < 1:
        raise ValueError(f"n_iter must be >= 1, got {n_iter}")
    if max_updates_per_iter is None:
        if n_buckets > (1 << 19):
            raise ValueError(
                f"n_buckets={n_buckets} > 2^19: the uncapped per-iteration"
                " gradient collect could reach one row per bucket — pass"
                " max_updates_per_iter (top-k-by-|gradient| updates) for"
                " large hash spaces"
            )
    elif max_updates_per_iter < 1:
        raise ValueError(
            f"max_updates_per_iter must be >= 1, got {max_updates_per_iter}"
        )
    feats = _features(df, id_col, text_col, label_col, n_buckets)
    feats = feats.persist()
    n_docs = feats.select("id").distinct().count()
    if n_docs == 0:
        feats.unpersist()
        raise ValueError("no labeled documents with at least one word")

    spark = df.sparkSession
    weights: dict[int, int] = {}
    try:
        for _ in range(n_iter):
            if weights:
                wdf = F.broadcast(
                    spark.createDataFrame(sorted(weights.items()), "b long, mw long")
                )
                joined = feats.join(wdf, "b", "left")
            else:
                joined = feats.withColumn("mw", F.lit(None).cast("long"))
            logits = joined.groupBy("id").agg(
                F.sum(F.col("x") * F.coalesce(F.col("mw"), F.lit(0))).alias("lm"),
                F.first("y").alias("y"),
            )
            # milli-probability: the ONE float op per (doc, iter), quantized
            # immediately (positive → HALF_UP == half-away, both engines)
            p = logits.select(
                "id",
                F.round(
                    1000.0 / (1.0 + F.exp(-F.col("lm") / F.lit(1000.0)))
                ).cast("long").alias("p"),
                "y",
            )
            gdf = (
                feats.join(p, "id")
                .groupBy("b")
                .agg(
                    F.sum(
                        (F.col("p") - 1000 * feats["y"]) * F.col("x")
                    ).alias("g")
                )
            )
            if max_updates_per_iter is not None:
                gdf = gdf.orderBy(
                    F.abs(F.col("g")).desc(), F.col("g"), F.col("b")
                ).limit(max_updates_per_iter)
            grads = gdf.collect()
            for r in grads:
                upd = math.floor(lr_num * r.g / (lr_den * n_docs))
                w = weights.get(r.b, 0) - upd
                if w:
                    weights[int(r.b)] = w
                else:
                    weights.pop(int(r.b), None)
    finally:
        feats.unpersist()
    return weights


def train_quality_logit_sql(
    n_buckets: int,
    n_iter: int,
    lr_num: int = 2,
    lr_den: int = 1,
    source: str = "labeled",
    max_updates: int | None = None,
) -> str:
    """The UNROLLED oracle twin of ``train_quality_logit``: one
    logits/probs/gradients/weights CTE quartet per iteration over a
    ``source`` relation with columns (id, text, y). Returns SQL selecting
    the final (b, mw) nonzero weights. DuckDB dialect; every intermediate
    is integer except the quantized sigmoid, mirroring the Spark loop.
    ``max_updates`` mirrors ``max_updates_per_iter``: the gradient CTE is
    cut to the top-k by (|g| desc, g, b) and untouched buckets carry
    their previous weight forward via an anti-join."""
    sep_feats = (
        "words AS (SELECT id, y, unnest(string_split(coalesce(text, ''),"
        " ' ')) AS w FROM "
        f"{source}), "
        "feats AS (SELECT id, y,"
        f" ('0x'||substr(md5(w),1,8))::BIGINT % {n_buckets} AS b,"
        " CAST(count(*) AS BIGINT) AS x FROM words WHERE w <> ''"
        " GROUP BY id, y, ('0x'||substr(md5(w),1,8))::BIGINT"
        f" % {n_buckets}), "
        "nd AS (SELECT count(DISTINCT id) AS n FROM feats), "
        "w0 AS (SELECT b, CAST(0 AS BIGINT) AS mw FROM feats WHERE false) "
    )
    parts = [sep_feats]
    for i in range(1, n_iter + 1):
        prev = f"w{i - 1}"
        parts.append(
            f", l{i} AS (SELECT f.id,"
            f" sum(f.x * coalesce(w.mw, 0)) AS lm, any_value(f.y) AS y"
            f" FROM feats f LEFT JOIN {prev} w USING (b) GROUP BY f.id)"
            f", p{i} AS (SELECT id,"
            f" CAST(round(1000.0 / (1.0 + exp(-lm / 1000.0))) AS BIGINT)"
            f" AS p, y FROM l{i})"
            f", g{i} AS (SELECT f.b,"
            f" sum((p.p - 1000 * f.y) * f.x) AS g"
            f" FROM feats f JOIN p{i} p USING (id) GROUP BY f.b)"
        )
        gsrc = f"g{i}"
        if max_updates is not None:
            parts.append(
                f", gk{i} AS (SELECT b, g FROM g{i}"
                f" ORDER BY abs(g) DESC, g, b LIMIT {max_updates})"
            )
            gsrc = f"gk{i}"
        upd = (
            f"SELECT g.b, coalesce(w.mw, 0) -"
            f" CAST(floor({lr_num} * g.g /"
            f" ({lr_den} * (SELECT n FROM nd))) AS BIGINT) AS mw"
            f" FROM {gsrc} g LEFT JOIN {prev} w USING (b)"
        )
        if max_updates is not None:
            # untouched buckets carry their previous weight forward
            upd += (
                f" UNION ALL SELECT w.b, w.mw FROM {prev} w"
                f" ANTI JOIN {gsrc} g USING (b)"
            )
        parts.append(f", w{i} AS ({upd})")
    parts.append(
        f" SELECT b, mw FROM w{n_iter} WHERE mw <> 0"
    )
    return "WITH " + "".join(parts)
