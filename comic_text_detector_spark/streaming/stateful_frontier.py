"""Custom stateful streaming operator: cross-batch politeness scheduling.

The streaming twin of ``operators/curation.py::schedule_frontier``: as
url discoveries stream in (link extraction, sitemap reads), each host's
fetches are spaced ``per_host_delay_ms`` apart and owned by one worker —
but unlike the batch operator, the slot counter LIVES IN STATE, so a
host's schedule keeps advancing across micro-batches instead of
restarting at slot 0 (which would burst-refetch the host every batch —
the politeness failure mode batch scheduling cannot express).

``applyInPandasWithState`` keyed by host; state = one bigint (slots
handed out so far). Within a batch, a host's urls take deterministic
md5-ordered slots (same order key as the batch operator, computed
JVM-side and carried in); across batches, arrival order is authoritative
— that is what a frontier IS. Hostless urls are excluded upstream,
exactly like the batch operator (one '' pseudo-host would serialize
unrelated urls onto one worker).

State TTL: same NoTimeout rationale as ``stateful_dedup``; production
bounds the store with EventTimeTimeout + a watermark on discovery time.
"""

from __future__ import annotations

import hashlib
from collections.abc import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

FRONTIER_OUTPUT_DDL = (
    "url string, host string, worker int, slot bigint, fetch_at_ms bigint"
)
FRONTIER_STATE_DDL = "n_scheduled bigint"


def _md5_long8(s: str) -> int:
    """First 8 md5 hex chars as int — the Python replica of
    ``dedup.md5_long(col, 8)`` (same digest, same width), so the
    streaming worker assignment matches the batch operator's exactly."""
    return int(hashlib.md5(s.encode("utf-8")).hexdigest()[:8], 16)


def _frontier_fn(
    n_workers: int, per_host_delay_ms: int
) -> Callable[[tuple, Iterator[pd.DataFrame], GroupState], Iterator[pd.DataFrame]]:
    def fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        host = key[0]
        start = state.get[0] if state.exists else 0
        frames = [p for p in pdfs if not p.empty]
        if not frames:
            return
        batch = pd.concat(frames, ignore_index=True)
        batch = batch.sort_values(["okey", "url"], kind="mergesort")
        n = len(batch)
        worker = _md5_long8(host) % n_workers
        slots = range(start, start + n)
        out = pd.DataFrame(
            {
                "url": batch["url"].to_numpy(),
                "host": host,
                "worker": worker,
                "slot": list(slots),
                "fetch_at_ms": [s * per_host_delay_ms for s in slots],
            }
        )
        state.update((start + n,))
        yield out

    return fn


def stateful_frontier_stream(
    urls_stream: DataFrame,
    url_col: str = "url",
    n_workers: int = 64,
    per_host_delay_ms: int = 1000,
) -> DataFrame:
    """streaming urls → (url, host, worker, slot, fetch_at_ms) with
    per-host slot counters that SURVIVE across micro-batches. Input needs
    only ``url_col``; host extraction, the hostless-row exclusion, and
    the deterministic order key are applied here (JVM-side) before the
    stateful kernel."""
    if n_workers <= 0:
        raise ValueError(f"n_workers must be positive, got {n_workers}")
    from ..operators.salting import host_of

    prepared = (
        urls_stream.select(
            F.col(url_col).alias("url"),
            host_of(F.col(url_col)).alias("host"),
            F.md5(
                F.concat_ws(":", F.lit("frontier"), F.col(url_col))
            ).alias("okey"),
        )
        .filter(F.coalesce(F.col("host"), F.lit("")) != "")
    )
    return prepared.groupBy("host").applyInPandasWithState(
        _frontier_fn(n_workers, per_host_delay_ms),
        outputStructType=FRONTIER_OUTPUT_DDL,
        stateStructType=FRONTIER_STATE_DDL,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
