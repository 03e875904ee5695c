"""Sequence packing for pretraining batch assembly — the step after token
accounting in an LLM data pipeline: fill fixed token-budget packs with
documents so training windows waste as little padding as possible.

Exact global first-fit packing is inherently sequential; what real
multi-worker pipelines actually do is pack PER SHARD: distribute docs,
order them deterministically within the shard, and fill sequentially.
That is this operator's shape: hash-bucket → deterministic md5 order key →
greedy sequential fill inside an ``applyInPandas`` kernel (bucket-local,
embarrassingly parallel across buckets — the parallel unit at 100 TB is
the bucket count, and no bucket's state ever crosses an executor).

Greedy rule: a document joins the open pack while the running token total
stays ≤ budget, else it opens the next pack. A document longer than the
budget necessarily gets a pack of its own (its running total blocks every
join) — callers decide whether to truncate or split those downstream.

Determinism: bucket = md5(salt:id) % n_buckets and the in-bucket order key
is the md5 hex digest — reproducible across runs, repartitionings and
engines, so the DuckDB oracle replays the identical fill with a recursive
CTE and matches pack ids exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dedup import md5_long


def pack_sequences(
    df: DataFrame,
    id_col: str = "doc_id",
    tokens_col: str = "n_tokens",
    budget: int = 2048,
    n_buckets: int = 32,
    salt: str = "pack",
    split_long: bool = False,
) -> DataFrame:
    """(id, n_tokens) → (id[, part], bucket, pack_id, pack_pos):
    deterministic greedy sequence packing. ``pack_id`` counts packs within
    a bucket from 0; ``pack_pos`` is the document's position inside its
    pack (0-based). Null/negative token counts are treated as 0 (they
    consume no budget but still occupy a slot — no row is dropped), and
    the EMITTED n_tokens column carries that clamped budget-accounting
    value so ``pack_stats`` sums what was actually packed.

    ``split_long=True`` is what pretraining pipelines do with over-budget
    documents: a doc with t > budget tokens is pre-split into
    ceil(t/budget) parts (each ``budget`` tokens, the last the remainder)
    and the PARTS are packed as atomic units in (order-key, id, part)
    order — so parts stay in order, no token is lost
    (sum over parts == t, invariant-tested), and a full-size part
    naturally fills a pack of its own. The output then carries a ``part``
    column (0 for unsplit docs)."""
    import pandas as pd

    if budget <= 0:
        raise ValueError(f"budget must be positive, got {budget}")
    if n_buckets <= 0:
        # fail eagerly: n_buckets=0 would otherwise surface as an ANSI
        # REMAINDER_BY_ZERO deep inside the job at action time
        raise ValueError(f"n_buckets must be positive, got {n_buckets}")
    id_type = dict(df.dtypes)[id_col]
    okey = F.md5(F.concat_ws(":", F.lit(salt), F.col(id_col).cast("string")))
    src = df.select(
        F.col(id_col).alias("id"),
        F.coalesce(F.col(tokens_col).cast("long"), F.lit(0)).alias("tok"),
        okey.alias("okey"),
        (md5_long(okey) % n_buckets).cast("int").alias("bucket"),
    )
    if split_long:
        n_parts = F.when(
            F.col("tok") > budget, F.ceil(F.col("tok") / F.lit(budget))
        ).otherwise(F.lit(1)).cast("long")
        src = src.select(
            "id", "tok", "okey", "bucket",
            F.explode(F.sequence(F.lit(0), n_parts - 1)).alias("part"),
        ).select(
            "id", "okey", "bucket", "part",
            F.least(
                F.lit(budget).cast("long"),
                F.greatest(
                    F.col("tok") - F.col("part") * F.lit(budget), F.lit(0)
                ),
            ).alias("tok"),
        )
    sort_cols = ["okey", "id"] + (["part"] if split_long else [])

    def fill(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(sort_cols, kind="mergesort")
        packs, poss, toks = [], [], []
        pack, acc, pos = 0, 0, 0
        first = True
        for tok in pdf["tok"]:
            t = max(int(tok), 0)
            if not first and acc + t > budget:
                pack += 1
                acc, pos = 0, 0
            acc += t
            packs.append(pack)
            poss.append(pos)
            toks.append(t)  # the clamped value budget accounting used
            pos += 1
            first = False
        cols = ["id", "bucket"] + (["part"] if split_long else [])
        out = pdf[cols].copy()
        out["tok"] = toks
        out["pack_id"] = packs
        out["pack_pos"] = poss
        return out

    part_ddl = ", part bigint" if split_long else ""
    part_sel = ["part"] if split_long else []
    return (
        src.groupBy("bucket")
        .applyInPandas(
            fill,
            f"id {id_type}, bucket int{part_ddl}, tok bigint,"
            " pack_id bigint, pack_pos bigint",
        )
        .select(
            F.col("id").alias(id_col),
            *part_sel,
            "bucket",
            F.col("tok").alias(tokens_col),
            "pack_id",
            "pack_pos",
        )
    )


def pack_stats(
    packed: DataFrame, budget: int, tokens_col: str = "n_tokens"
) -> DataFrame:
    """Packing-efficiency report over ``pack_sequences`` output:
    (bucket, pack_id, n_docs, pack_tokens, fill_ratio). The corpus-level
    mean fill ratio is THE number a packing strategy is judged by.
    ``tokens_col`` names the token column explicitly — positional access
    would silently sum the wrong column on a reordered frame."""
    return packed.groupBy("bucket", "pack_id").agg(
        F.count("*").cast("bigint").alias("n_docs"),
        F.sum(tokens_col).cast("bigint").alias("pack_tokens"),
        (F.sum(tokens_col) / F.lit(float(budget))).alias("fill_ratio"),
    )


def chunk_sliding(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    chunk: int = 128,
    stride: int = 96,
) -> DataFrame:
    """Sliding-window document chunking — the step BEFORE packing when
    documents exceed the training context: split each document's word
    stream into windows of ``chunk`` tokens advancing by ``stride``
    (``chunk - stride`` tokens of overlap preserve cross-boundary
    context, the standard pretraining windowing).

    Window count is closed-form — ``1 + ceil((n - chunk)/stride)`` for
    n > chunk else 1 — so the plan is one Project + one explode of a
    ``sequence()``: no shuffle, no UDF, embarrassingly parallel, and the
    DuckDB oracle replays it with ``generate_series`` + list slicing.
    With ``stride <= chunk`` (enforced) the last window always starts
    before the stream's end, so no empty chunk is ever emitted.
    Documents with no words yield no chunks (drop-not-fake; callers see
    them vanish rather than receive an empty training row).

    Emits (id, chunk_id, start_word, n_tokens, chunk_text).
    """
    if not 1 <= stride <= chunk:
        raise ValueError("need 1 <= stride <= chunk")
    words = df.select(
        F.col(id_col),
        F.filter(
            F.split(F.coalesce(F.col(text_col), F.lit("")), " "),
            lambda w: w != "",
        ).alias("words"),
    ).filter(F.size("words") > 0)
    n = F.size("words")
    n_chunks = F.when(n <= chunk, F.lit(1)).otherwise(
        F.lit(1) + F.expr(f"(size(words) - {chunk} + {stride} - 1) div {stride}")
    )
    ks = words.select(
        id_col, "words",
        F.explode(F.sequence(F.lit(0), n_chunks - 1)).alias("chunk_id"),
    )
    piece = F.slice(F.col("words"), F.col("chunk_id") * stride + 1, chunk)
    return ks.select(
        id_col,
        F.col("chunk_id").cast("int").alias("chunk_id"),
        (F.col("chunk_id") * stride).cast("int").alias("start_word"),
        F.size(piece).alias("n_tokens"),
        F.array_join(piece, " ").alias("chunk_text"),
    )
