"""J6/A11 evaluation harness: golden↔predicted greedy matching + global PRF.

The reference's DetectionIoUEvaluator matches ground-truth to detections by
IoU >= 0.5, first-come-first-served in index order (utils/db_utils.py:347-378)
and combines per-image counters into precision/recall/hmean
(``combine_results``, :415-435; pixel P/R/F1 at train_seg.py:38-55). The
engine recast is span-IoU over (url, char_start, char_end): it is the
diagnostic when byte-identity fails (SURVEY.md §5.2 item 3).

Greedy first-come matching is sequential per url → grouped pandas UDF on
tiny per-url sets; the global counters are one agg (A11's shape is exactly
``sum()`` + scalar projections).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

IOU_THRES = 0.5  # reference utils/db_utils.py:356


def _span_iou(a_s: int, a_e: int, b_s: int, b_e: int) -> float:
    inter = max(0, min(a_e, b_e) - max(a_s, b_s))
    union = (a_e - a_s) + (b_e - b_s) - inter
    return inter / union if union > 0 else 0.0


def match_counts(
    golden: DataFrame,
    predicted: DataFrame,
    group_col: str = "url",
    start: str = "char_start",
    end: str = "char_end",
    iou_thres: float = IOU_THRES,
) -> DataFrame:
    """(url, tp, n_gt, n_pred) via per-url greedy first-come matching."""
    g = golden.select(
        F.col(group_col).alias("g"),
        F.col(start).alias("gs"),
        F.col(end).alias("ge"),
        F.lit(1).alias("is_gt"),
    )
    p = predicted.select(
        F.col(group_col).alias("g"),
        F.col(start).alias("gs"),
        F.col(end).alias("ge"),
        F.lit(0).alias("is_gt"),
    )
    both = g.unionByName(p)

    def match_group(pdf: pd.DataFrame) -> pd.DataFrame:
        gts = pdf[pdf["is_gt"] == 1].sort_values(["gs", "ge"]).to_numpy()
        preds = pdf[pdf["is_gt"] == 0].sort_values(["gs", "ge"]).to_numpy()
        used = [False] * len(preds)
        tp = 0
        for grow in gts:
            for j, prow in enumerate(preds):
                if used[j]:
                    continue
                if _span_iou(grow[1], grow[2], prow[1], prow[2]) >= iou_thres:
                    used[j] = True
                    tp += 1
                    break
        return pd.DataFrame(
            {
                "url": [pdf["g"].iloc[0]],
                "tp": [tp],
                "n_gt": [len(gts)],
                "n_pred": [len(preds)],
            }
        )

    return both.groupBy("g").applyInPandas(
        match_group, "url string, tp long, n_gt long, n_pred long"
    )


def prf(counts: DataFrame) -> DataFrame:
    """Global precision/recall/hmean from per-url counters (A11)."""
    agg = counts.agg(
        F.sum("tp").alias("tp"),
        F.sum("n_gt").alias("n_gt"),
        F.sum("n_pred").alias("n_pred"),
    )
    precision = F.when(
        F.col("n_pred") > 0, F.col("tp") / F.col("n_pred")
    ).otherwise(F.lit(0.0))
    recall = F.when(F.col("n_gt") > 0, F.col("tp") / F.col("n_gt")).otherwise(
        F.lit(0.0)
    )
    return agg.select(
        "tp",
        "n_gt",
        "n_pred",
        precision.alias("precision"),
        recall.alias("recall"),
        F.when(
            precision + recall > 0,
            2 * precision * recall / (precision + recall),
        )
        .otherwise(F.lit(0.0))
        .alias("hmean"),
    )


def evaluate_extraction(
    golden_spans: DataFrame, predicted_spans: DataFrame
) -> DataFrame:
    """One-call wrapper: the QuadMetric.measure analog."""
    return prf(match_counts(golden_spans, predicted_spans))


def token_prf(
    gold: DataFrame,
    pred: DataFrame,
    url_col: str = "url",
    text_col: str = "text",
    micro: int = 1_000_000,
) -> DataFrame:
    """Token-multiset precision/recall/F1 per document — the standard
    extraction-quality benchmark grain (how boilerplate-removal tools
    are scored against gold extractions when byte-identity is too
    strict: a one-space drift fails byte-identity but costs ~0 token
    F1). Complements ``evaluate_extraction``'s span-IoU diagnostic.

    Returns (url, inter_n, gold_n, pred_n, p_micro, r_micro, f1_micro)
    with the three metrics as EXACT micro-quantized bigints
    (``(micro·inter) div total``, floor division in both engines), so
    the result is bit-identical across Spark/DuckDB/partitionings —
    the same integer discipline as the rest of the engine.

    * Multiset semantics: a token appearing 2× in gold and 1× in pred
      contributes min(2,1)=1 to the intersection.
    * Tokens are whitespace-split, empties dropped. A url whose BOTH
      sides tokenize to nothing emits no row (drop-not-fake); one
      empty side yields the honest zeros.

    Scale shape: one (url, tok) aggregate per side, one co-keyed outer
    join, one url aggregate — all three exchanges hash on keys whose
    cardinality grows with the corpus, no skew hot-spots beyond the
    stopword (url, 'the') pairs, which stay bounded per url."""

    def toks(df, n_alias):
        return (
            df.select(
                F.col(url_col).alias("url"),
                F.explode(
                    F.split(F.col(text_col).cast("string"), r"\s+")
                ).alias("tok"),
            )
            .filter(F.col("tok") != "")
            .groupBy("url", "tok")
            .agg(F.count("*").alias(n_alias))
        )

    g = toks(gold, "gn")
    p = toks(pred, "pn")
    j = g.join(p, ["url", "tok"], "full_outer").select(
        "url",
        F.coalesce(F.col("gn"), F.lit(0)).alias("gn"),
        F.coalesce(F.col("pn"), F.lit(0)).alias("pn"),
    )
    per_url = j.groupBy("url").agg(
        F.sum(F.least("gn", "pn")).alias("inter_n"),
        F.sum("gn").alias("gold_n"),
        F.sum("pn").alias("pred_n"),
    )
    # exact bigint floor division (`div`), never double `/`: micro·inter
    # can exceed 2^53 at corpus scale and doubles would drift
    m = int(micro)
    pm = F.when(
        F.col("pred_n") > 0,
        F.expr(f"({m}L * inter_n) div pred_n"),
    ).otherwise(F.lit(0).cast("long"))
    rm = F.when(
        F.col("gold_n") > 0,
        F.expr(f"({m}L * inter_n) div gold_n"),
    ).otherwise(F.lit(0).cast("long"))
    out = per_url.select(
        "url",
        "inter_n",
        "gold_n",
        "pred_n",
        pm.alias("p_micro"),
        rm.alias("r_micro"),
    )
    f1 = F.when(
        F.col("p_micro") + F.col("r_micro") > 0,
        F.expr("(2 * p_micro * r_micro) div (p_micro + r_micro)"),
    ).otherwise(F.lit(0).cast("long"))
    return out.select("*", f1.alias("f1_micro"))


def pair_prf(
    found: DataFrame,
    truth: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    micro: int = 1_000_000,
) -> DataFrame:
    """Pair-set precision/recall/F1 — the tuning harness for every
    candidate-pair generator in the engine (minhash bands, simhash
    radius, containment thresholds, fuzzy blocking): run the operator
    against a corpus with PLANTED duplicate pairs and read off what
    the banding actually caught. One row: (tp, fp, fn, p_micro,
    r_micro, f1_micro), metrics as exact ``div`` bigints (empty-side
    zeros, same integer discipline as ``token_prf``).

    Pairs are canonicalized to (least, greatest) on both sides, so
    orientation never miscounts. Two distinct projections + one
    full-outer join on the pair key + one global count — the global
    aggregate is a single row, driver-safe by construction."""

    def canon(df):
        a, b = F.col(id_a), F.col(id_b)
        return df.select(
            F.least(a, b).alias("pa"), F.greatest(a, b).alias("pb")
        ).distinct()

    f = canon(found).withColumn("__f", F.lit(1))
    t = canon(truth).withColumn("__t", F.lit(1))
    j = f.join(t, ["pa", "pb"], "full_outer")
    agg = j.agg(
        F.count(F.when(F.col("__f").isNotNull() & F.col("__t").isNotNull(), 1))
        .cast("long")
        .alias("tp"),
        F.count(F.when(F.col("__f").isNotNull() & F.col("__t").isNull(), 1))
        .cast("long")
        .alias("fp"),
        F.count(F.when(F.col("__f").isNull() & F.col("__t").isNotNull(), 1))
        .cast("long")
        .alias("fn"),
    )
    m = int(micro)
    p = F.when(
        F.col("tp") + F.col("fp") > 0,
        F.expr(f"({m}L * tp) div (tp + fp)"),
    ).otherwise(F.lit(0).cast("long"))
    r = F.when(
        F.col("tp") + F.col("fn") > 0,
        F.expr(f"({m}L * tp) div (tp + fn)"),
    ).otherwise(F.lit(0).cast("long"))
    out = agg.select(
        "tp", "fp", "fn", p.alias("p_micro"), r.alias("r_micro")
    )
    f1 = F.when(
        F.col("p_micro") + F.col("r_micro") > 0,
        F.expr("(2 * p_micro * r_micro) div (p_micro + r_micro)"),
    ).otherwise(F.lit(0).cast("long"))
    return out.select("*", f1.alias("f1_micro"))
