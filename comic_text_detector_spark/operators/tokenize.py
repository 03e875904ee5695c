"""Token-ID emission — the bridge from token ACCOUNTING (textstats) to
training TENSORS: documents → BPE token strings → integer ids → packed
fixed-length id sequences, the exact shard format a pretraining loader
mmaps. Completes the pipeline end-to-end: curate → tokenize → pack →
write.

Reference lineage: the reference emits final per-image artifacts (boxes +
mask + lines) after its refine stage (inference.py:147-163); this is the
corpus analog — the last stage that turns scored/kept content into the
consumable training artifact.

Tokenization reuses ``textstats``'s boundary-string BPE chain (pure
column expressions, whole-stage codegen, shuffle-free), so the token
STREAM is bit-identical to what ``token_count_bpe`` counts. Ids are
assigned from a vocab table: by default the corpus's own token
inventory, ordered lexicographically — deterministic, engine-portable,
and bounded by |distinct chars| + |merges| (a BPE token is either a
single character or a merge product), so the vocab always broadcasts.

Scale shape: ``tokenize_ids`` does NOT explode the corpus — the vocab
collapses to a ONE-ROW map column (map_from_entries over the tiny vocab
table) cross-joined broadcast onto every doc, and ids come from a
``transform`` lookup inside codegen. Zero corpus shuffles. Packing rides
``packing.pack_sequences`` (bucket-local greedy, split_long) and the
final assembly shuffles each pack's id SLICES once, keyed by
(bucket, pack_id).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.textstats import (
    BPE_MERGES,
    BPE_SEP,
    _bpe_boundary_string,
    bpe_chain_sql,
)
from .packing import pack_sequences


def bpe_token_array(text_col, merges: tuple[tuple[str, str], ...] | None = None):
    """Array of BPE token strings (column expression): the boundary-chain
    split on the double sentinel. Same merge semantics as
    ``token_count_bpe`` — ``size()`` of this array equals its count."""
    s = _bpe_boundary_string(text_col)
    for a, b in (merges if merges is not None else BPE_MERGES):
        s = F.replace(
            s,
            F.lit(BPE_SEP + a + BPE_SEP + BPE_SEP + b + BPE_SEP),
            F.lit(BPE_SEP + a + b + BPE_SEP),
        )
    return F.filter(F.split(s, BPE_SEP + BPE_SEP), lambda t: t != "")


def build_bpe_vocab(
    df: DataFrame,
    text_col: str = "text",
    merges: tuple[tuple[str, str], ...] | None = None,
) -> DataFrame:
    """(token, tid): the corpus's distinct BPE tokens, ids dense from 0
    in lexicographic token order. Bounded by |charset| + |merges| rows;
    the global window runs over that vocab-sized table only."""
    from pyspark.sql import Window

    toks = df.select(
        F.explode_outer(bpe_token_array(F.col(text_col), merges)).alias("token")
    ).filter(F.col("token").isNotNull()).distinct()
    return toks.select(
        "token",
        (F.row_number().over(Window.orderBy("token")) - 1)
        .cast("int")
        .alias("tid"),
    )


def tokenize_ids(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    merges: tuple[tuple[str, str], ...] | None = None,
    vocab: DataFrame | None = None,
    unk_id: int = -1,
) -> DataFrame:
    """(id_col, n_tokens, ids): every document's BPE token-id sequence.
    ``vocab`` defaults to ``build_bpe_vocab`` over ``df`` itself (then no
    token can miss); a supplied vocab maps unseen tokens to ``unk_id`` —
    explicit, never silently dropped, so ``len(ids) == n_tokens`` always.
    Empty/null docs stay present with ``ids = []`` (unlike the scorer
    ops, a shard writer must account for every input row)."""
    if vocab is None:
        vocab = build_bpe_vocab(df, text_col, merges)
    vmap = vocab.agg(
        F.map_from_entries(
            F.collect_list(F.struct(F.col("token"), F.col("tid")))
        ).alias("vmap")
    )
    toks = df.select(
        F.col(id_col),
        bpe_token_array(F.col(text_col), merges).alias("toks"),
    )
    return toks.crossJoin(F.broadcast(vmap)).select(
        id_col,
        F.size("toks").cast("long").alias("n_tokens"),
        F.transform(
            "toks",
            # try_element_at: ANSI mode makes plain element_at THROW on a
            # missing map key; a supplied external vocab must map unseen
            # tokens to unk_id instead
            lambda t: F.coalesce(
                F.try_element_at(F.col("vmap"), t), F.lit(unk_id).cast("int")
            ),
        ).alias("ids"),
    )


def pack_token_ids(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    merges: tuple[tuple[str, str], ...] | None = None,
    budget: int = 2048,
    n_buckets: int = 32,
    salt: str = "pack",
    pad_id: int = -1,
) -> DataFrame:
    """(bucket, pack_id, n_docs, n_tokens, ids): fixed-length training
    sequences. Docs are tokenized, packed with ``split_long=True`` (an
    over-budget doc contributes budget-sized slices in order), each
    pack's slices are concatenated in pack order and padded with
    ``pad_id`` to exactly ``budget`` ids. Invariants: len(ids) == budget
    on every row; sum(n_tokens) over packs == sum of doc token counts
    (no token lost or faked — tested)."""
    tok = tokenize_ids(df, id_col, text_col, merges)
    packed = pack_sequences(
        tok.select(F.col(id_col), "n_tokens"),
        id_col=id_col,
        tokens_col="n_tokens",
        budget=budget,
        n_buckets=n_buckets,
        salt=salt,
        split_long=True,
    )
    sliced = packed.join(
        tok.select(F.col(id_col), F.col("ids").alias("doc_ids")), id_col
    ).select(
        "bucket",
        "pack_id",
        "pack_pos",
        F.col("n_tokens").alias("tok"),
        F.slice(
            "doc_ids",
            (F.col("part") * F.lit(budget) + F.lit(1)).cast("int"),
            F.col("n_tokens").cast("int"),
        ).alias("chunk"),
    )
    flat = F.flatten(
        F.transform(
            F.array_sort(
                F.collect_list(F.struct(F.col("pack_pos"), F.col("chunk")))
            ),
            lambda s: s["chunk"],
        )
    )
    return (
        sliced.groupBy("bucket", "pack_id")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.sum("tok").alias("n_tokens"),
            flat.alias("flat"),
        )
        .select(
            "bucket",
            "pack_id",
            "n_docs",
            "n_tokens",
            F.concat(
                "flat",
                F.array_repeat(
                    F.lit(pad_id).cast("int"),
                    (F.lit(budget) - F.size("flat")).cast("int"),
                ),
            ).alias("ids"),
        )
    )


def _toks_sql(source: str, id_col: str, merges) -> str:
    chain = bpe_chain_sql("coalesce(text, '')", merges)
    return (
        f"t AS (SELECT {id_col} AS id,"
        f" list_filter(string_split({chain}, '{BPE_SEP}{BPE_SEP}'),"
        " x -> x <> '') AS toks"
        f" FROM ({source}))"
    )


def tokenize_ids_sql(
    source: str = "SELECT doc_id, text FROM documents",
    id_col: str = "doc_id",
    merges: tuple[tuple[str, str], ...] | None = None,
    unk_id: int = -1,
) -> str:
    """Oracle twin of ``tokenize_ids`` (corpus-built vocab) with ids
    emitted BOTH as a list and as ``ids_csv`` (comma-joined) — the gate
    compares the csv so the check never depends on engine array-hash
    conventions."""
    return (
        "WITH "
        + _toks_sql(source, id_col, merges)
        + ", u AS (SELECT id, generate_subscripts(toks, 1) AS pos,"
        " unnest(toks) AS token FROM t),"
        " v AS (SELECT token, CAST(row_number() OVER (ORDER BY token) - 1"
        " AS INTEGER) AS tid FROM (SELECT DISTINCT token FROM u)),"
        f" j AS (SELECT u.id, u.pos, coalesce(v.tid, {unk_id}) AS tid"
        " FROM u LEFT JOIN v USING (token)),"
        " g AS (SELECT id, list(tid ORDER BY pos) AS ids FROM j GROUP BY id)"
        f" SELECT t.id AS {id_col}, CAST(len(t.toks) AS BIGINT) AS n_tokens,"
        " array_to_string(coalesce(g.ids, CAST([] AS INTEGER[])), ',')"
        " AS ids_csv"
        " FROM t LEFT JOIN g ON t.id = g.id"
    )


def pack_token_ids_sql(
    source: str = "SELECT doc_id, text FROM documents",
    id_col: str = "doc_id",
    merges: tuple[tuple[str, str], ...] | None = None,
    budget: int = 2048,
    n_buckets: int = 32,
    salt: str = "pack",
    pad_id: int = -1,
) -> str:
    """Oracle twin of ``pack_token_ids``: tokenize + the identical
    split-parts greedy walk (recursive CTE, as the packing oracles) +
    slice/concat/pad assembly, ids as csv."""
    return (
        "WITH RECURSIVE "
        + _toks_sql(source, id_col, merges)
        + ", u AS (SELECT id, generate_subscripts(toks, 1) AS pos,"
        " unnest(toks) AS token FROM t),"
        " v AS (SELECT token, CAST(row_number() OVER (ORDER BY token) - 1"
        " AS INTEGER) AS tid FROM (SELECT DISTINCT token FROM u)),"
        " j AS (SELECT u.id, u.pos, v.tid FROM u JOIN v USING (token)),"
        " gi AS (SELECT id, list(tid ORDER BY pos) AS ids FROM j GROUP BY id),"
        " s AS (SELECT t.id, CAST(len(t.toks) AS BIGINT) AS tok,"
        " coalesce(gi.ids, CAST([] AS INTEGER[])) AS ids"
        " FROM t LEFT JOIN gi ON t.id = gi.id),"
        " p AS (SELECT id, ids, unnest(generate_series(0,"
        f" CAST(CASE WHEN tok > {budget} THEN ceil(tok / {budget}.0)"
        " ELSE 1 END AS BIGINT) - 1)) AS part, tok FROM s),"
        " q AS (SELECT id, ids, part,"
        f" CASE WHEN tok > {budget}"
        f" THEN least({budget}, greatest(tok - part * {budget}, 0))"
        " ELSE tok END AS tok FROM p),"
        " k AS (SELECT id, ids, part, tok,"
        f" md5('{salt}:'||id::VARCHAR) AS okey FROM q),"
        " b AS (SELECT id, ids, part, tok, okey,"
        f" CAST(('0x'||substr(md5(okey),1,8))::BIGINT % {n_buckets} AS INT)"
        " AS bucket FROM k),"
        " r AS MATERIALIZED (SELECT id, ids, part, tok, okey, bucket,"
        " row_number() OVER (PARTITION BY bucket"
        " ORDER BY okey, id, part) AS rn FROM b),"
        " walk AS ("
        " SELECT bucket, rn, CAST(0 AS BIGINT) AS pack, tok AS acc"
        " FROM r WHERE rn = 1"
        " UNION ALL"
        " SELECT r.bucket, r.rn,"
        f"  CASE WHEN w.acc + r.tok > {budget} THEN w.pack + 1"
        "   ELSE w.pack END,"
        f"  CASE WHEN w.acc + r.tok > {budget} THEN r.tok"
        "   ELSE w.acc + r.tok END"
        " FROM walk w JOIN r ON r.bucket = w.bucket AND r.rn = w.rn + 1),"
        " sl AS (SELECT r.bucket, w.pack AS pack_id, r.rn, r.tok,"
        f" list_slice(r.ids, CAST(r.part * {budget} + 1 AS BIGINT),"
        f" CAST(r.part * {budget} + r.tok AS BIGINT)) AS chunk"
        " FROM r JOIN walk w ON r.bucket = w.bucket AND r.rn = w.rn),"
        " asm AS (SELECT bucket, pack_id,"
        " CAST(count(*) AS BIGINT) AS n_docs,"
        " CAST(sum(tok) AS BIGINT) AS n_tokens,"
        " flatten(list(chunk ORDER BY rn)) AS flat"
        " FROM sl GROUP BY bucket, pack_id)"
        " SELECT bucket, pack_id, n_docs, n_tokens,"
        " array_to_string(list_concat(flat,"
        f" list_transform(generate_series(1, {budget} - len(flat)),"
        f" x -> CAST({pad_id} AS INTEGER))), ',') AS ids_csv"
        " FROM asm"
    )
