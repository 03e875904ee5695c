"""Custom stateful streaming operator: CROSS-BATCH near-duplicate detection.

The streaming complement of the batch minhash/simhash LSH family
(operators/dedup.py): documents arrive as a stream, and a new capture must
be flagged when it is a near-duplicate of a document seen in ANY earlier
micro-batch — something a per-batch join cannot do.

Shape (the same banded-LSH discipline as the batch path, made stateful):

1. A batch-side ``mapInPandas`` stage computes a 64-bit simhash per
   document (deterministic blake2b shingle hashes — pure Python because
   this runs inside the Arrow kernel, not as a column expr) and explodes
   it to 4 x 16-bit band rows.
2. ``applyInPandasWithState`` keyed by ``(band_id, band_val)`` keeps a
   bounded list of (url, simhash) members per bucket. Each incoming row is
   hamming-verified against the bucket's remembered members; matches emit
   (url, matched_url, hamming) rows. State is capped at ``max_members``
   per bucket (the streaming twin of ``bucket_pairs``' size cap): template
   buckets cannot grow state without bound, at the cost of possibly
   missing matches against evicted members — approximate by design, like
   every LSH stage here.

Emitted pairs may repeat across bands; downstream consumers dedupe on
(url, matched_url) — kept in the operator's output so the per-band
evidence is visible.

State TTL: production bounds the store with EventTimeTimeout + a
watermark; tests use availableNow + NoTimeout (ProcessingTimeTimeout makes
availableNow re-trigger forever — see stateful_dedup.py).
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

BANDED_DDL = "url string, simhash long, band_id int, band_val int"
MATCH_DDL = "url string, matched_url string, hamming int, band_id int"
STATE_DDL = "urls array<string>, sigs array<long>"


def _simhash64(text: str, shingle_n: int = 2) -> int:
    """Deterministic 64-bit simhash over word n-gram shingles (blake2b —
    stdlib, stable across processes; the batch path uses xxhash64 exprs,
    this one runs inside Python kernels)."""
    words = (text or "").split()
    votes = [0] * 64
    n = max(0, len(words) - shingle_n + 1)
    for i in range(n):
        sh = " ".join(words[i : i + shingle_n])
        h = int.from_bytes(
            hashlib.blake2b(sh.encode(), digest_size=8).digest(), "big"
        )
        for j in range(64):
            votes[j] += 1 if (h >> j) & 1 else -1
    sig = 0
    for j in range(64):
        if votes[j] > 0:
            sig |= 1 << j
    return sig - (1 << 64) if sig >= (1 << 63) else sig


def banded_simhash(documents: DataFrame, text_col: str = "text") -> DataFrame:
    """(url, text) stream → (url, simhash, band_id, band_val) rows, 4 per
    document (16-bit bands). Arrow-batched; works on streams and batches."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"url": [], "simhash": [], "band_id": [], "band_val": []}
            for url, text in zip(pdf["url"], pdf[text_col]):
                # shingle-less docs (<2 words, empty, null) emit NO band
                # rows — the batch path's explode(shingles) drops them the
                # same way; otherwise every such doc would share sig=0 and
                # pair with every other one at hamming 0
                if len((text or "").split()) < 2:
                    continue
                sig = _simhash64(text)
                u = sig & ((1 << 64) - 1)
                for b in range(4):
                    out["url"].append(url)
                    out["simhash"].append(sig)
                    out["band_id"].append(b)
                    out["band_val"].append((u >> (b * 16)) & 0xFFFF)
            if out["url"]:  # an all-skipped batch yields nothing (an empty
                yield pd.DataFrame(out)  # pandas frame breaks Arrow dtypes)

    return documents.select("url", text_col).mapInPandas(kernel, BANDED_DDL)


def _match_fn_factory(max_hamming: int, max_members: int):
    def match_fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            urls, sigs = list(state.get[0]), list(state.get[1])
        else:
            urls, sigs = [], []
        out = {"url": [], "matched_url": [], "hamming": [], "band_id": []}
        for pdf in pdfs:
            for url, sig in zip(pdf["url"], pdf["simhash"]):
                sig = int(sig)
                for mu, ms in zip(urls, sigs):
                    if mu == url:
                        continue
                    d = bin((sig ^ int(ms)) & ((1 << 64) - 1)).count("1")
                    if d <= max_hamming:
                        out["url"].append(url)
                        out["matched_url"].append(mu)
                        out["hamming"].append(d)
                        out["band_id"].append(int(key[0]))
                # bounded state: drop the oldest member beyond the cap —
                # the streaming twin of bucket_pairs' max_bucket_size.
                # A RECAPTURE of a remembered url refreshes its signature
                # in place instead of appending — otherwise a hot url's
                # recrawls would flood the FIFO and evict every other
                # member.
                if url in urls:
                    sigs[urls.index(url)] = sig
                else:
                    urls.append(url)
                    sigs.append(sig)
                    if len(urls) > max_members:
                        urls.pop(0)
                        sigs.pop(0)
        state.update((urls, sigs))
        if out["url"]:
            yield pd.DataFrame(out)

    return match_fn


def neardup_stream(
    documents_stream: DataFrame,
    text_col: str = "text",
    max_hamming: int = 3,
    max_members: int = 16,
) -> DataFrame:
    """streaming (url, text) → (url, matched_url, hamming, band_id) rows
    whenever a document is a simhash near-duplicate of one remembered from
    any earlier micro-batch (or earlier in the same batch)."""
    banded = banded_simhash(documents_stream, text_col)
    return banded.groupBy("band_id", "band_val").applyInPandasWithState(
        _match_fn_factory(max_hamming, max_members),
        outputStructType=MATCH_DDL,
        stateStructType=STATE_DDL,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
