"""Cross-batch Bloom seen-filter — the BOUNDED-state streaming
frontier dedup. ``stateful_dedup.py`` keeps one state row per distinct
url (exact, but the store grows with the crawl); this operator keys
state by a hash BUCKET and keeps one fixed-size Bloom blob per bucket,
so total state is n_buckets · m_bits/8 bytes FOREVER — the memory
shape a 10^12-url frontier actually needs.

Trade, stated plainly: false POSITIVES suppress a never-seen url
(rate set by m_bits/k against per-bucket load); false negatives never
happen. A production frontier sizes buckets so expected load keeps
the FP rate below its politeness-refetch tolerance, and the exact
operator downstream (or the fetch itself) absorbs the rest.

Hash contract: the SAME salted-md5 positions as the batch operator
(``operators/bloom.py::_positions`` — md5('j:'||url) % m), asserted
in tests, so a batch-built filter and the streaming state agree
bit-for-bit on every url.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from ..operators.dedup import md5_long

OUTPUT_DDL = "url string"
STATE_DDL = "bits binary"


def _positions_py(url: str, m_bits: int, k: int) -> list[int]:
    # mirror of operators/bloom.py::_positions (md5_long(f'{j}:'||url, 15))
    return [
        int(hashlib.md5(f"{j}:{url}".encode()).hexdigest()[:15], 16) % m_bits
        for j in range(k)
    ]


def bloom_filter_stream(
    urls_stream: DataFrame,
    m_bits: int = 1 << 16,
    k: int = 3,
    n_buckets: int = 256,
    url_col: str = "url",
) -> DataFrame:
    """streaming urls → first-seen urls across ALL micro-batches, with
    per-bucket Bloom state (bucket = md5_long(url) % n_buckets, the
    same worker-affinity hash family as the frontier scheduler).

    Within a micro-batch the bucket's urls are processed in sorted
    order (deterministic emissions regardless of partition arrival);
    duplicate urls inside one batch collapse to their first occurrence
    through the same bits they set."""

    def fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        bits = bytearray(state.get[0]) if state.exists else bytearray(
            m_bits // 8
        )
        urls: list[str] = []
        for pdf in pdfs:
            urls.extend(u for u in pdf[url_col] if u is not None)
        out = []
        for u in sorted(set(urls)):
            pos = _positions_py(u, m_bits, k)
            if all(bits[p >> 3] & (1 << (p & 7)) for p in pos):
                continue  # maybe-seen: suppressed (Bloom contract)
            for p in pos:
                bits[p >> 3] |= 1 << (p & 7)
            out.append(u)
        state.update((bytes(bits),))
        if out:
            yield pd.DataFrame({"url": out})

    bucket = (md5_long(F.col(url_col), 8) % n_buckets).alias("__bucket")
    return (
        urls_stream.select(F.col(url_col).alias("url"), bucket)
        .groupBy("__bucket")
        .applyInPandasWithState(
            fn,
            outputStructType=OUTPUT_DDL,
            stateStructType=STATE_DDL,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
