"""Custom stateful streaming operator: cross-batch exactly-once per url.

``applyInPandasWithState`` keyed by url keeps a tiny per-url state (seen
flag); a url is emitted the first time it is seen and suppressed on every
later capture — the streaming form of the engine's as-of/exactly-once
discipline that foreachBatch alone cannot give across micro-batches.

State TTL: a production deployment bounds the store with
``EventTimeTimeout`` + a watermark on warc_ts. Under the availableNow
trigger used in tests, processing-time timeouts make the query re-trigger
forever (each ~1s batch only evaluates timeouts), so this module uses
NoTimeout and leaves TTL to the event-time configuration of the caller.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_DDL = "url string, warc_ts timestamp, html binary"
STATE_DDL = "seen boolean"


def _dedup_fn(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    # "First-seen" = the EARLIEST warc_ts among the captures in the first
    # micro-batch where the url appears. Append mode cannot retract an
    # emitted row, so a capture with a smaller warc_ts arriving in a LATER
    # micro-batch does not replace the survivor — that boundary effect is
    # inherent to streaming append semantics (the batch path's asof_dedup is
    # the global latest-wins operator; this one is its streaming complement).
    seen = state.get[0] if state.exists else False
    best: pd.DataFrame | None = None
    for pdf in pdfs:
        if pdf.empty:
            continue
        top = pdf.sort_values("warc_ts", ascending=True).head(1)
        if best is None or top["warc_ts"].iloc[0] < best["warc_ts"].iloc[0]:
            best = top
    state.update((True,))
    if not seen and best is not None:
        yield best[["url", "warc_ts", "html"]]


def stateful_dedup_stream(documents_stream: DataFrame) -> DataFrame:
    """streaming documents → first-seen capture per url across ALL batches
    (earliest warc_ts within the first micro-batch the url appears in; later
    batches are suppressed — see ``_dedup_fn`` for the append-mode caveat).
    """
    return documents_stream.groupBy("url").applyInPandasWithState(
        _dedup_fn,
        outputStructType=OUTPUT_DDL,
        stateStructType=STATE_DDL,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
