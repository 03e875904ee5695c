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


def _viterbi_state(word, m, unk_cost: int, max_piece_len: int):
    """DP table for one word as an array<struct<c:long,f:int>> (index
    j+1 holds position j): c = min total cost of segmenting word[:j],
    f = start of the last piece on the chosen path. Runs entirely inside
    ONE expression via ``aggregate`` over positions — a runtime loop,
    not an unrolled plan, so any word length compiles to the same plan.
    Tie-break: ``array_min`` over (cost, start) structs prefers the
    SMALLEST start on equal cost — i.e. the longest final piece — which
    is position-local and therefore replayable by the oracle's identical
    list_min. Multi-char substrings absent from the piece map cost
    ``_BIG`` (an impossible path, never chosen while any per-char
    fallback exists); unknown single chars cost ``unk_cost``."""
    BIG = 1 << 50
    L = max_piece_len

    def piece_cost(s):
        return F.coalesce(
            F.element_at(m, s),
            F.when(F.length(s) == 1, F.lit(int(unk_cost)).cast("long")),
            F.lit(BIG).cast("long"),
        )

    def step(acc, j):
        cands = F.transform(
            F.sequence(F.greatest(F.lit(0), j - L), j - 1),
            lambda i: F.struct(
                (
                    F.element_at(acc, i + 1)["c"]
                    + piece_cost(F.substr(word, i + 1, j - i))
                ).alias("c"),
                i.cast("int").alias("f"),
            ),
        )
        return F.concat(acc, F.array(F.array_min(cands)))

    init = F.array(
        F.struct(
            F.lit(0).cast("long").alias("c"), F.lit(0).cast("int").alias("f")
        )
    )
    return F.aggregate(F.sequence(F.lit(1), F.length(word)), init, step)


def unigram_word_pieces(word, m, unk_cost: int = 20000,
                        max_piece_len: int = 10):
    """Column expression: Viterbi-optimal unigram-LM segmentation of one
    word into an array of piece strings (SentencePiece decoding rule,
    Kudo 2018 — the other half of subword tokenization beside the BPE
    chain above; costs are NEGATED milli-log10 piece probabilities so
    min-cost = max-likelihood). Backtracking is a second bounded
    ``aggregate`` loop over the finished DP table."""
    state = _viterbi_state(word, m, unk_cost, max_piece_len)
    n = F.length(word)

    def back(acc, _):
        cur = F.element_at(state, acc["pos"] + 1)
        return F.when(acc["pos"] <= 0, acc).otherwise(
            F.struct(
                cur["f"].alias("pos"),
                F.concat(
                    F.array(
                        F.substr(word, cur["f"] + 1, acc["pos"] - cur["f"])
                    ),
                    acc["ps"],
                ).alias("ps"),
            )
        )

    init = F.struct(
        n.cast("int").alias("pos"),
        F.array().cast("array<string>").alias("ps"),
    )
    return F.aggregate(F.sequence(F.lit(1), n), init, back)["ps"]


def unigram_tokenize(
    docs: DataFrame,
    pieces: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    unk_cost: int = 20000,
    max_piece_len: int = 10,
) -> DataFrame:
    """Whole-corpus unigram-LM tokenization: (id, tokens array<string>,
    n_tokens, total_cost). ``pieces`` is (piece string, milli_lp long —
    log10 prob × 1000, ≤ 0). Scale shape mirrors ``tokenize_ids``: the
    piece table collapses to a ONE-ROW map (negated costs) cross-joined
    broadcast onto every document, words split and segmented inside one
    projection — ZERO corpus shuffles, no Python, no UDF; the per-word
    DP is O(len × max_piece_len) map lookups inside the JVM. Total cost
    is an exact bigint (sum of negated milli log-probs + unk penalties),
    so the DuckDB recursive-CTE oracle replays tokens AND cost
    bit-for-bit."""
    mrow = pieces.select(
        F.map_from_entries(
            F.collect_list(
                F.struct(
                    F.col("piece"), (-F.col("milli_lp")).cast("long")
                )
            )
        ).alias("__m")
    )
    d = docs.join(F.broadcast(mrow))
    words = F.filter(
        F.split(F.coalesce(F.col(text_col), F.lit("")), " "),
        lambda w: w != "",
    )
    toks = F.flatten(
        F.transform(
            words,
            lambda w: unigram_word_pieces(
                w, F.col("__m"), unk_cost, max_piece_len
            ),
        )
    )
    cost_expr = F.aggregate(
        toks,
        F.lit(0).cast("long"),
        lambda acc, t: acc
        + F.coalesce(
            F.element_at(F.col("__m"), t),
            F.lit(int(unk_cost)).cast("long"),
        ),
    )
    return d.select(
        F.col(id_col),
        toks.alias("tokens"),
        F.size(toks).cast("long").alias("n_tokens"),
        cost_expr.alias("total_cost"),
    )


# demo piece inventory for the oracled query: full ascii-lowercase
# coverage (so only genuinely foreign chars hit the UNK path) plus
# multi-char pieces overlapping the synthetic corpus vocabulary, with
# fixed milli-log10 probabilities. Shared by the Spark query and the SQL
# twin so both sides build the identical model.
UNIGRAM_DEMO_PIECES: tuple[tuple[str, int], ...] = tuple(
    [(c, -2000) for c in "abcdefghijklmnopqrstuvwxyz"]
    + [
        ("ta", -1699), ("ble", -1523), ("table", -1398), ("scan", -1301),
        ("sc", -1699), ("an", -1699), ("row", -1398), ("val", -1699),
        ("ue", -1699), ("batch", -1301), ("wind", -2000), ("ow", -1523),
        ("er", -1699), ("st", -1699), ("ream", -1523), ("qu", -1699),
    ]
)


def unigram_tokenize_sql(
    corpus: str = "documents",
    id_col: str = "doc_id",
    pieces: tuple[tuple[str, int], ...] = UNIGRAM_DEMO_PIECES,
    unk_cost: int = 20000,
    max_piece_len: int = 10,
) -> str:
    """DuckDB twin of ``unigram_tokenize``: the per-word Viterbi DP
    replayed as a recursive CTE whose state carries the whole cost/frm
    table as lists (list comprehensions over the candidate window,
    ``list_aggregate 'min'`` + first-index tie-break = the identical
    longest-piece-on-tie rule), then a recursive backtrack, then per-doc
    reassembly in word order. Bit-exact on tokens, counts and total
    cost."""
    BIG = 1 << 50
    L = max_piece_len
    vals = ", ".join(
        "('" + p.replace("'", "''") + "', " + str(m) + ")" for p, m in pieces
    )
    cand = (
        f"costs[i + 1] + coalesce(map_extract(m, substr(w, i + 1,"
        f" j + 1 - i))[1], CASE WHEN j + 1 - i = 1 THEN {unk_cost}"
        f" ELSE {BIG} END)"
    )
    rng = f"range(greatest(0, j + 1 - {L}), j + 1)"
    return f"""
WITH RECURSIVE
pc AS (SELECT * FROM (VALUES {vals}) AS v(piece, milli_lp)),
pm AS (SELECT map(list(piece ORDER BY piece),
                  list(CAST(-milli_lp AS BIGINT) ORDER BY piece)) AS m
       FROM pc),
wpos AS (SELECT {id_col} AS id, wi, w FROM (
  SELECT {id_col}, generate_subscripts(ws, 1) AS wi, unnest(ws) AS w
  FROM (SELECT {id_col}, string_split(coalesce(text, ''), ' ') AS ws
        FROM {corpus})) WHERE w <> ''),
wd AS (SELECT DISTINCT w FROM wpos),
dp AS (
  SELECT w, 0 AS j, [CAST(0 AS BIGINT)] AS costs, [0] AS frms FROM wd
  UNION ALL
  SELECT w, j + 1, list_append(costs, bc),
    list_append(frms, [i FOR i IN {rng} IF {cand} = bc][1])
  FROM (
    SELECT w, j, costs, frms, m,
      list_aggregate([{cand} FOR i IN {rng}], 'min') AS bc
    FROM dp, pm WHERE j < length(w))
),
dpf AS (SELECT w, costs, frms FROM dp WHERE j = length(w)),
bt AS (
  SELECT w, length(w) AS pos, CAST([] AS VARCHAR[]) AS ps FROM wd
  UNION ALL
  SELECT bt.w, d.frms[bt.pos + 1] AS pos,
    list_prepend(substr(bt.w, d.frms[bt.pos + 1] + 1,
                        bt.pos - d.frms[bt.pos + 1]), bt.ps)
  FROM bt JOIN dpf d ON d.w = bt.w WHERE bt.pos > 0
),
wtok AS (SELECT w, ps FROM bt WHERE pos = 0),
dt AS (SELECT id, flatten(list(ps ORDER BY wi)) AS tokens
       FROM wpos JOIN wtok USING (w) GROUP BY id)
SELECT d.{id_col}, coalesce(t.tokens, []) AS tokens,
  CAST(coalesce(len(t.tokens), 0) AS BIGINT) AS n_tokens,
  CAST(coalesce(list_aggregate([coalesce(map_extract(pm.m, tok)[1],
    {unk_cost}) FOR tok IN t.tokens], 'sum'), 0) AS BIGINT) AS total_cost
FROM (SELECT {id_col} FROM {corpus}) d
LEFT JOIN dt t ON t.id = d.{id_col} CROSS JOIN pm
"""


def _word_occurrences(
    corpus: DataFrame, text_col: str
) -> DataFrame:
    """(w) — every word OCCURRENCE (with multiplicity) in the corpus."""
    return corpus.select(
        F.explode(
            F.filter(
                F.split(F.coalesce(F.col(text_col), F.lit("")), " "),
                lambda w: w != "",
            )
        ).alias("w")
    )


def _all_substrings(w, max_piece_len: int):
    """Array of every substring of ``w`` with length ≤ max_piece_len,
    one entry per (start, length) pair — the unigram seed inventory."""
    n = F.length(w)
    return F.flatten(
        F.transform(
            F.sequence(F.lit(1), n),
            lambda s: F.transform(
                F.sequence(
                    F.lit(1), F.least(F.lit(max_piece_len), n - s + 1)
                ),
                lambda l: F.substr(w, s, l),
            ),
        )
    )


def train_unigram_pieces(
    corpus: DataFrame,
    text_col: str = "text",
    max_piece_len: int = 3,
    min_count: int = 2,
    vocab_size: int = 100,
    n_iter: int = 1,
    unk_cost: int = 20000,
) -> DataFrame:
    """Hard-EM unigram-LM piece training (the Viterbi variant of Kudo
    2018 §3.2 — hard assignments instead of forward–backward
    expectations, the standard web-scale shortcut, and exactly
    replayable because every quantity is an integer count):

    1. SEED: every substring (length ≤ max_piece_len) of every word
       occurrence, kept when count ≥ min_count — single chars always
       kept (full coverage) — with milli_lp = round(log10(c/total)·1e3).
    2. EM × n_iter: Viterbi-tokenize all word occurrences under the
       current piece table (the same aggregate-loop DP as
       ``unigram_tokenize`` — zero Python), count piece USAGE, drop
       unused multi-char pieces, floor unused single chars at count 1
       (coverage must survive), re-estimate probabilities.
    3. PRUNE to ``vocab_size``: single chars always stay; multi-char
       pieces rank by (usage desc, piece asc); probabilities are
       re-normalized over the survivors.

    Scale shape: substring fan-out is ≤ max_piece_len per character of
    corpus — one explode + one groupBy; each EM round is one map-build
    (collect of the piece table — the model, bounded by vocab, NOT the
    corpus), one shuffle-free tokenize pass and one count groupBy; ONE
    scalar total per round. Word-occurrence streams never collect.
    Returns (piece, milli_lp, cnt)."""
    words = _word_occurrences(corpus, text_col).localCheckpoint()
    subs = words.select(
        F.explode(_all_substrings(F.col("w"), max_piece_len)).alias("piece")
    )
    c = subs.groupBy("piece").agg(F.count("*").cast("long").alias("cnt"))
    kept = c.filter(
        (F.length("piece") == 1) | (F.col("cnt") >= min_count)
    ).localCheckpoint()

    def _with_probs(counted: DataFrame) -> DataFrame:
        total = counted.agg(F.sum("cnt").alias("t")).collect()[0].t
        return counted.select(
            "piece",
            F.round(
                F.log10(F.col("cnt") / F.lit(float(total))) * 1000.0
            ).cast("long").alias("milli_lp"),
            "cnt",
        )

    pieces = _with_probs(kept)
    chars = kept.filter(F.length("piece") == 1).select("piece")
    for _ in range(n_iter):
        mrow = pieces.select(
            F.map_from_entries(
                F.collect_list(
                    F.struct(F.col("piece"), (-F.col("milli_lp")).cast("long"))
                )
            ).alias("__m")
        )
        used = (
            words.join(F.broadcast(mrow))
            .select(
                F.explode(
                    unigram_word_pieces(
                        F.col("w"), F.col("__m"), unk_cost, max_piece_len
                    )
                ).alias("piece")
            )
            .groupBy("piece")
            .agg(F.count("*").cast("long").alias("u"))
        )
        merged = (
            chars.join(used, "piece", "full")
            .select(
                "piece",
                F.when(
                    F.col("u").isNull() & (F.length("piece") == 1), F.lit(1)
                ).otherwise(F.coalesce(F.col("u"), F.lit(0)))
                .cast("long").alias("cnt"),
            )
            .filter((F.col("cnt") > 0) | (F.length("piece") == 1))
        )
        pieces = _with_probs(merged).localCheckpoint()
    n_chars = chars.count()
    k = max(0, vocab_size - n_chars)
    from pyspark.sql import Window

    multi = (
        pieces.filter(F.length("piece") > 1)
        .withColumn(
            "rk",
            F.row_number().over(
                Window.orderBy(F.col("cnt").desc(), F.col("piece"))
            ),
        )
        .filter(F.col("rk") <= k)
        .drop("rk")
    )
    final = pieces.filter(F.length("piece") == 1).unionByName(multi)
    return _with_probs(final.select("piece", "cnt"))


def _viterbi_cte(tag: str, pieces_cte: str, unk_cost: int, L: int) -> str:
    """The recursive Viterbi DP + backtrack CTE block, name-spaced by
    ``tag`` so several EM rounds can unroll in one query. Input CTEs:
    ``wd`` (distinct words) and ``{pieces_cte}`` (piece, milli_lp).
    Output CTE: ``wtok_{tag}`` (w, ps)."""
    BIG = 1 << 50
    cand = (
        f"costs[i + 1] + coalesce(map_extract(m, substr(w, i + 1,"
        f" j + 1 - i))[1], CASE WHEN j + 1 - i = 1 THEN {unk_cost}"
        f" ELSE {BIG} END)"
    )
    rng = f"range(greatest(0, j + 1 - {L}), j + 1)"
    t = tag
    return f"""
pm_{t} AS (SELECT map(list(piece ORDER BY piece),
                  list(CAST(-milli_lp AS BIGINT) ORDER BY piece)) AS m
       FROM {pieces_cte}),
dp_{t} AS (
  SELECT w, 0 AS j, [CAST(0 AS BIGINT)] AS costs, [0] AS frms FROM wd
  UNION ALL
  SELECT w, j + 1, list_append(costs, bc),
    list_append(frms, [i FOR i IN {rng} IF {cand} = bc][1])
  FROM (
    SELECT w, j, costs, frms, m,
      list_aggregate([{cand} FOR i IN {rng}], 'min') AS bc
    FROM dp_{t}, pm_{t} WHERE j < length(w))
),
dpf_{t} AS (SELECT w, costs, frms FROM dp_{t} WHERE j = length(w)),
bt_{t} AS (
  SELECT w, length(w) AS pos, CAST([] AS VARCHAR[]) AS ps FROM wd
  UNION ALL
  SELECT b.w, d.frms[b.pos + 1] AS pos,
    list_prepend(substr(b.w, d.frms[b.pos + 1] + 1,
                        b.pos - d.frms[b.pos + 1]), b.ps)
  FROM bt_{t} b JOIN dpf_{t} d ON d.w = b.w WHERE b.pos > 0
),
wtok_{t} AS (SELECT w, ps FROM bt_{t} WHERE pos = 0)"""


def train_unigram_pieces_sql(
    corpus: str = "documents",
    text_col: str = "text",
    max_piece_len: int = 3,
    min_count: int = 2,
    vocab_size: int = 100,
    n_iter: int = 1,
    unk_cost: int = 20000,
) -> str:
    """DuckDB twin of ``train_unigram_pieces`` with every EM round
    UNROLLED (each gets its own recursive Viterbi block) — seed counts,
    usage re-counts, the single-char floor, vocab pruning and both
    probability normalizations replay bit-for-bit."""
    L = max_piece_len
    prob = (
        "round(log10(cnt / CAST((SELECT t FROM {tot}) AS DOUBLE))"
        " * 1000.0)::BIGINT"
    )
    parts = [f"""
wocc AS (SELECT w FROM (
  SELECT unnest(string_split(coalesce({text_col}, ''), ' ')) AS w
  FROM {corpus}) WHERE w <> ''),
wd AS (SELECT DISTINCT w FROM wocc),
subs AS (SELECT unnest(flatten([[substr(w, s, l)
    FOR l IN range(1, 1 + least({L}, length(w) - s + 1))]
    FOR s IN range(1, length(w) + 1)])) AS piece FROM wocc),
k0 AS (SELECT piece, CAST(count(*) AS BIGINT) AS cnt FROM subs
       GROUP BY piece
       HAVING length(piece) = 1 OR count(*) >= {min_count}),
t0 AS (SELECT sum(cnt) AS t FROM k0),
chars AS (SELECT piece FROM k0 WHERE length(piece) = 1),
p0 AS (SELECT piece, {prob.format(tot='t0')} AS milli_lp, cnt FROM k0)"""]
    prev = "p0"
    for r in range(1, n_iter + 1):
        parts.append("," + _viterbi_cte(f"r{r}", prev, unk_cost, L))
        parts.append(f""",
u_r{r} AS (SELECT piece, CAST(count(*) AS BIGINT) AS u FROM (
  SELECT unnest(ps) AS piece FROM wocc JOIN wtok_r{r} USING (w))
  GROUP BY piece),
m_r{r} AS (SELECT coalesce(c.piece, u.piece) AS piece,
  CASE WHEN u.u IS NULL AND length(coalesce(c.piece, u.piece)) = 1
       THEN 1 ELSE coalesce(u.u, 0) END::BIGINT AS cnt
  FROM chars c FULL JOIN u_r{r} u ON u.piece = c.piece
  WHERE coalesce(u.u, 0) > 0 OR length(coalesce(c.piece, u.piece)) = 1),
t_r{r} AS (SELECT sum(cnt) AS t FROM m_r{r}),
p_r{r} AS (SELECT piece, {prob.format(tot=f't_r{r}')} AS milli_lp, cnt
           FROM m_r{r})""")
        prev = f"p_r{r}"
    parts.append(f""",
nch AS (SELECT count(*) AS n FROM chars),
mul AS (SELECT piece, cnt,
  row_number() OVER (ORDER BY cnt DESC, piece) AS rk
  FROM {prev} WHERE length(piece) > 1),
fin AS (SELECT piece, cnt FROM {prev} WHERE length(piece) = 1
  UNION ALL SELECT piece, cnt FROM mul
  WHERE rk <= greatest(0, {vocab_size} - (SELECT n FROM nch))),
tf AS (SELECT sum(cnt) AS t FROM fin)
SELECT piece, {prob.format(tot='tf')} AS milli_lp, cnt FROM fin""")
    return "WITH RECURSIVE " + "".join(parts)


def wordpiece_word_pieces(
    word,
    m,
    max_piece_len: int = 10,
    max_word_len: int = 100,
    unk: str = "[UNK]",
):
    """Column expression: WordPiece greedy longest-match-first
    segmentation of one word (Wu et al. 2016 / the BERT tokenizer rule —
    the third classic subword scheme beside the BPE chain and the
    unigram Viterbi above). From position p, take the LONGEST piece in
    the vocab map ``m`` — prefixed '##' when p > 0 — and advance; if no
    piece matches at any position, or the word exceeds
    ``max_word_len`` chars, the WHOLE word becomes ``unk`` (BERT's
    all-or-nothing rule, not a per-char fallback — this is what makes
    greedy differ observably from Viterbi).

    One ``aggregate`` runtime loop over at most len(word) steps, each
    step an O(max_piece_len) descending scan for the longest map hit —
    zero Python, zero shuffles, compiles to the same plan for any word
    length."""
    L = max_piece_len
    n = F.length(word)

    def piece_at(pos: Column, l: Column) -> Column:
        base = F.substr(word, pos + 1, l)
        return F.when(pos == 0, base).otherwise(F.concat(F.lit("##"), base))

    def step(acc, _):
        pos = acc["pos"]
        live = ~acc["bad"] & (pos < n)
        best_l = F.get(
            F.filter(
                F.sequence(F.least(F.lit(L), n - pos), F.lit(1), F.lit(-1)),
                lambda l: F.element_at(m, piece_at(pos, l)).isNotNull(),
            ),
            0,
        )
        return F.when(~live, acc).otherwise(
            F.when(
                best_l.isNull(),
                F.struct(
                    n.cast("int").alias("pos"),
                    acc["ps"].alias("ps"),
                    F.lit(True).alias("bad"),
                ),
            ).otherwise(
                F.struct(
                    (pos + best_l).cast("int").alias("pos"),
                    F.concat(
                        acc["ps"], F.array(piece_at(pos, best_l))
                    ).alias("ps"),
                    F.lit(False).alias("bad"),
                )
            )
        )

    init = F.struct(
        F.lit(0).cast("int").alias("pos"),
        F.array().cast("array<string>").alias("ps"),
        F.lit(False).alias("bad"),
    )
    out = F.aggregate(F.sequence(F.lit(1), F.greatest(n, F.lit(1))), init, step)
    return F.when(
        (n > max_word_len) | out["bad"], F.array(F.lit(unk))
    ).otherwise(out["ps"])


def wordpiece_tokenize(
    docs: DataFrame,
    vocab: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_piece_len: int = 10,
    max_word_len: int = 100,
    unk: str = "[UNK]",
) -> DataFrame:
    """Whole-corpus WordPiece tokenization: (id, tokens array<string>,
    n_tokens, n_unk). ``vocab`` is one column ``piece`` (continuations
    carry the '##' prefix, exactly the BERT vocab file convention).

    Scale shape mirrors ``unigram_tokenize``: the vocab collapses to a
    ONE-ROW membership map cross-join-broadcast onto every document
    (a 30k-piece BERT vocab is ~400 KB — far under any broadcast
    threshold), words split and segmented inside one projection — ZERO
    corpus shuffles, no UDF; per-word cost is O(len × max_piece_len)
    JVM map lookups. n_unk is the coverage audit signal: at 100 TB you
    watch unk-rate per language shard, not per-doc output."""
    mrow = vocab.select(
        F.map_from_entries(
            F.collect_list(F.struct(F.col("piece"), F.lit(1)))
        ).alias("__m")
    )
    d = docs.join(F.broadcast(mrow))
    words = F.filter(
        F.split(F.coalesce(F.col(text_col), F.lit("")), " "),
        lambda w: w != "",
    )
    toks = F.flatten(
        F.transform(
            words,
            lambda w: wordpiece_word_pieces(
                w, F.col("__m"), max_piece_len, max_word_len, unk
            ),
        )
    )
    return d.select(
        F.col(id_col),
        toks.alias("tokens"),
        F.size(toks).cast("long").alias("n_tokens"),
        F.size(F.filter(toks, lambda t: t == unk))
        .cast("long")
        .alias("n_unk"),
    )


# demo vocab for the oracled query: all single-char START pieces over
# ascii lowercase, all '##' continuation chars EXCEPT '##y' (so words
# with a non-initial 'y' — 'key', 'query' — hit the all-or-nothing UNK
# rule), plus multi-char pieces that make greedy-vs-Viterbi observable.
WORDPIECE_DEMO_VOCAB: tuple[str, ...] = tuple(
    [c for c in "abcdefghijklmnopqrstuvwxyz"]
    + ["##" + c for c in "abcdefghijklmnopqrstuvwxz"]
    + [
        "ta", "table", "##ble", "##able", "scan", "##can", "row", "##ow",
        "val", "##alue", "batch", "##atch", "wind", "##dow", "##ndow",
        "st", "##ream", "qu", "##ery", "gr", "##oup", "##der", "or",
    ]
)


def wordpiece_tokenize_sql(
    corpus: str = "documents",
    id_col: str = "doc_id",
    vocab: tuple[str, ...] = WORDPIECE_DEMO_VOCAB,
    max_piece_len: int = 10,
    max_word_len: int = 100,
    unk: str = "[UNK]",
) -> str:
    """DuckDB twin of ``wordpiece_tokenize``: the greedy loop replayed
    as a recursive CTE over distinct words — each step picks the first
    (longest) matching candidate length via a descending-range list
    comprehension, the same longest-match rule as the Spark aggregate
    loop — then per-doc reassembly in word order."""
    L = max_piece_len
    vals = ", ".join("('" + p.replace("'", "''") + "')" for p in vocab)
    piece = (
        "CASE WHEN pos = 0 THEN substr(w, 1, l)"
        " ELSE '##' || substr(w, pos + 1, l) END"
    )
    return f"""
WITH RECURSIVE
vp AS (SELECT * FROM (VALUES {vals}) AS v(piece)),
vm AS (SELECT list(piece) AS vl FROM vp),
wpos AS (SELECT {id_col} AS id, wi, w FROM (
  SELECT {id_col}, generate_subscripts(ws, 1) AS wi, unnest(ws) AS w
  FROM (SELECT {id_col}, string_split(coalesce(text, ''), ' ') AS ws
        FROM {corpus})) WHERE w <> ''),
wd AS (SELECT DISTINCT w FROM wpos),
g AS (
  SELECT w, 0 AS pos, CAST([] AS VARCHAR[]) AS ps, false AS bad FROM wd
  UNION ALL
  SELECT w,
    CASE WHEN bl IS NULL THEN length(w) ELSE pos + bl END,
    CASE WHEN bl IS NULL THEN ps
         ELSE list_append(ps, CASE WHEN pos = 0 THEN substr(w, 1, bl)
              ELSE '##' || substr(w, pos + 1, bl) END) END,
    bad OR bl IS NULL
  FROM (
    SELECT w, pos, ps, bad,
      [l FOR l IN range(least({L}, length(w) - pos), 0, -1)
       IF list_contains(vl, {piece})][1] AS bl
    FROM g, vm WHERE pos < length(w) AND NOT bad)
),
wt AS (SELECT w,
  CASE WHEN length(w) > {max_word_len} OR bad
       THEN ['{unk}'] ELSE ps END AS ps
  FROM g WHERE pos = length(w)),
dt AS (SELECT id, flatten(list(ps ORDER BY wi)) AS tokens
       FROM wpos JOIN wt USING (w) GROUP BY id)
SELECT d.{id_col}, coalesce(t.tokens, []) AS tokens,
  CAST(coalesce(len(t.tokens), 0) AS BIGINT) AS n_tokens,
  CAST(coalesce(len(list_filter(t.tokens, x -> x = '{unk}')), 0)
       AS BIGINT) AS n_unk
FROM (SELECT {id_col} FROM {corpus}) d
LEFT JOIN dt t ON t.id = d.{id_col}
"""
