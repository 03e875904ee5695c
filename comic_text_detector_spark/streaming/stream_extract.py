"""Structured Streaming analogs (SURVEY.md §2.10).

The north_rule asks for checkpointed BATCH (plans/runner.py is the primary
path); these exist for completeness of the operator inventory:

* ``extract_stream`` — documents arriving as files → watermarked dedup of
  repeat captures → the same fused extraction via foreachBatch → parquet
  sink with a checkpoint (exactly-once via the streaming commit log).
* ``session_counts_stream`` — the streaming form of W3 gap sessionization:
  ``session_window`` event-time aggregation with a watermark.
* ``windowed_counts_stream`` — tumbling event-time windows with a
  watermark: late rows (older than watermark) are DROPPED, finalized
  windows emit exactly once in append mode — the late-data contract a
  100-TB ingest stream relies on (tested across two triggers in
  ``test_watermark_drops_late_data``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..plans.extract import extract_fused
from ..schemas import DOCUMENTS_SCHEMA


def _file_stream(
    spark: SparkSession,
    input_dir: str,
    checkpoint_dir: str,
    handle_batch,
    available_now: bool = True,
):
    """Shared scaffolding for the foreachBatch file-stream pipelines:
    schema-pinned parquet file source → per-batch sink → checkpointed
    trigger. No watermark here — a foreachBatch-only pipeline has no
    stateful operator for a watermark to act on (the windowed/session
    streams below are where watermarks do real work)."""
    stream = spark.readStream.schema(DOCUMENTS_SCHEMA).parquet(input_dir)
    writer = (
        stream.writeStream.foreachBatch(handle_batch)
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def extract_stream(
    spark: SparkSession,
    input_dir: str,
    output_dir: str,
    checkpoint_dir: str,
    available_now: bool = True,
):
    """File-stream extraction.

    Duplicate captures of one url are resolved WITHIN each micro-batch by
    the same as-of rule as the batch path (latest warc_ts wins) — streaming
    dropDuplicates would keep an arbitrary capture. Cross-batch duplicates
    are a documented streaming caveat (exactly-once per url across the
    whole table is the batch runner's job). Delivery is AT-LEAST-ONCE on
    crash replay: the blind append can re-commit a batch whose checkpoint
    did not; the WET stream below shows the idempotent per-batch
    overwrite pattern, and the batch runner remains the exactly-once
    path.
    """
    from ..operators.dedup import asof_dedup

    def handle_batch(batch_df: DataFrame, batch_id: int) -> None:
        extract_fused(asof_dedup(batch_df)).write.mode("append").parquet(output_dir)

    return _file_stream(
        spark, input_dir, checkpoint_dir, handle_batch, available_now
    )


def windowed_counts_stream(
    events: DataFrame, window: str = "10 minutes", watermark: str = "5 minutes"
) -> DataFrame:
    """Tumbling event-time window counts with late-data eviction: in append
    mode a window emits only once its end passes the watermark, and rows
    arriving later than the watermark never resurrect it."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window))
        .agg(F.count("*").alias("n_events"))
        .select(
            F.col("window.start").alias("win_start"),
            "n_events",
        )
    )


def session_counts_stream(
    events: DataFrame, gap: str = "30 minutes", watermark: str = "2 hours"
) -> DataFrame:
    """W3's streaming form: session_window over event time per user."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.col("user_id"), F.session_window("ts", gap))
        .agg(F.count("*").alias("n_events"))
        .select(
            "user_id",
            F.col("session_window.start").alias("session_start"),
            F.col("session_window.end").alias("session_end"),
            "n_events",
        )
    )


def extract_to_wet_stream(
    spark: SparkSession,
    input_dir: str,
    output_dir: str,
    checkpoint_dir: str,
    available_now: bool = True,
):
    """Streaming ingest straight to the ecosystem sink: documents arriving
    as files → in-batch as-of dedup → fused extraction → one
    ``*.warc.wet.gz`` blob row per partition per micro-batch, written as
    parquet partitioned by ``batch_id`` with DYNAMIC PARTITION OVERWRITE
    — a replayed batch overwrites its own partition instead of appending
    duplicates, making delivery idempotent (exactly-once per batch id).
    Capture timestamps ride through to the WARC-Date headers; a
    downstream packager concatenates or renames blobs into CC-layout
    segment files."""
    from ..operators.dedup import asof_dedup
    from ..sources.warc import wet_files

    def handle_batch(batch_df: DataFrame, batch_id: int) -> None:
        deduped = asof_dedup(batch_df)
        extracted = extract_fused(deduped).join(
            deduped.select("url", "warc_ts"), "url"
        )
        (
            wet_files(extracted, ts_col="warc_ts")
            .withColumn("batch_id", F.lit(batch_id).cast("long"))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("batch_id")
            .parquet(output_dir)
        )

    return _file_stream(
        spark, input_dir, checkpoint_dir, handle_batch, available_now
    )
