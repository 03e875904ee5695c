"""BM25 relevance scoring over the corpus — the retrieval-side op a
training-data pipeline runs for targeted corpus search (pulling documents
matching a probe query, auditing contamination hits, building eval
retrieval sets). Okapi BM25 with the Lucene idf form:

    score(d, q) = Σ_t idf(t) · tf·(k1+1) / (tf + k1·(1 − b + b·dl/avgdl))
    idf(t) = ln((N − df + 0.5) / (df + 0.5) + 1)

Determinism contract (house pattern): tf, df, dl, N are exact bigints;
``avgdl`` enters as the exact ratio of two bigints evaluated inside the
expression (total_tokens / n_docs, one IEEE division); each per-term
score is quantized to integer MICRO units immediately, so the per-doc sum
is exact and the oracle replays the identical float expression tree
bit-for-bit (a last-ulp ``ln`` divergence flips a rounding only on a
measure-zero boundary).

Scale shape: one token explode filtered TO THE QUERY TERMS at the scan
(the filter prunes the explode output to |q| terms per doc before any
exchange), document frequencies for |q| terms broadcast, one groupBy(doc)
with map-side partials. Only two scalars (corpus size, token total) reach
the driver.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def bm25_score(
    docs: DataFrame,
    query_terms: tuple[str, ...],
    id_col: str = "doc_id",
    text_col: str = "text",
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """(id, dl, n_hit_terms, score): BM25 of each document against the
    bag of ``query_terms`` (documents matching no term are absent —
    same contract as the other scorers). ``dl`` is the whitespace token
    count used for length normalization."""
    if not query_terms:
        raise ValueError("query_terms must be non-empty")
    terms = sorted(set(query_terms))
    toks = docs.select(
        F.col(id_col).alias("id"),
        F.explode(
            F.split(F.coalesce(F.col(text_col), F.lit("")), " ")
        ).alias("w"),
    ).filter(F.col("w") != "")
    dl = toks.groupBy("id").agg(F.count("*").cast("long").alias("dl"))
    totals = dl.agg(
        F.count("*").alias("n"), F.sum("dl").alias("tot")
    ).collect()[0]
    n_docs, tot_tokens = int(totals.n or 0), int(totals.tot or 0)
    if n_docs == 0:
        raise ValueError("no documents with at least one token")
    qt = toks.filter(F.col("w").isin(list(terms)))
    tf = qt.groupBy("id", "w").agg(F.count("*").cast("long").alias("tf"))
    dfreq = tf.groupBy("w").agg(F.count("*").cast("long").alias("df"))
    avgdl = F.lit(float(tot_tokens)) / F.lit(float(n_docs))
    idf = F.log(
        (F.lit(float(n_docs)) - F.col("df") + F.lit(0.5))
        / (F.col("df") + F.lit(0.5))
        + F.lit(1.0)
    )
    denom = F.col("tf") + F.lit(k1) * (
        F.lit(1.0) - F.lit(b) + F.lit(b) * F.col("dl") / avgdl
    )
    term_micro = F.round(
        idf * (F.col("tf") * F.lit(k1 + 1.0)) / denom * F.lit(1e6)
    ).cast("long")
    return (
        tf.join(F.broadcast(dfreq), "w")
        .join(dl, "id")
        .select("id", "dl", term_micro.alias("m"))
        .groupBy("id", "dl")
        .agg(
            F.count("*").cast("long").alias("n_hit_terms"),
            F.sum("m").alias("sum_micro"),
        )
        .select(
            F.col("id").alias(id_col),
            "dl",
            "n_hit_terms",
            (F.col("sum_micro") / F.lit(1e6)).alias("score"),
        )
    )


def bm25_sql(
    query_terms: tuple[str, ...],
    source: str = "documents",
    id_col: str = "doc_id",
    k1: float = 1.2,
    b: float = 0.75,
) -> str:
    """Oracle twin: identical expression tree in DuckDB SQL."""
    terms = sorted(set(query_terms))
    in_list = ", ".join("'" + t.replace("'", "''") + "'" for t in terms)
    return (
        "WITH toks AS (SELECT id, w FROM (SELECT "
        f"{id_col} AS id, unnest(string_split(coalesce(text, ''), ' '))"
        f" AS w FROM {source}) WHERE w <> ''), "
        "dl AS (SELECT id, CAST(count(*) AS BIGINT) AS dl FROM toks"
        " GROUP BY id), "
        "tot AS (SELECT count(*) AS n, sum(dl) AS tot FROM dl), "
        f"tf AS (SELECT id, w, CAST(count(*) AS BIGINT) AS tf FROM toks"
        f" WHERE w IN ({in_list}) GROUP BY id, w), "
        "dfreq AS (SELECT w, CAST(count(*) AS BIGINT) AS df FROM tf"
        " GROUP BY w), "
        "scored AS (SELECT tf.id, dl.dl, CAST(round("
        " ln((CAST((SELECT n FROM tot) AS DOUBLE) - df + 0.5)"
        " / (df + 0.5) + 1.0)"
        f" * (tf * {k1 + 1.0}) / (tf + {k1} * (1.0 - {b} + {b} * dl /"
        " (CAST((SELECT tot FROM tot) AS DOUBLE) /"
        " CAST((SELECT n FROM tot) AS DOUBLE))))"
        " * 1000000.0) AS BIGINT) AS m"
        " FROM tf JOIN dfreq USING (w) JOIN dl ON dl.id = tf.id) "
        f"SELECT id AS {id_col}, dl, CAST(count(*) AS BIGINT)"
        " AS n_hit_terms, sum(m) / 1000000.0 AS score"
        " FROM scored GROUP BY id, dl"
    )
