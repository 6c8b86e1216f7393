"""Structured Streaming extraction mode (SURVEY §2.9 X1-X6).

The reference streams per-token deltas over an mpsc channel with
monotonicity + duplicate guards (crates/server/src/stream.rs:16-374,
crates/core/src/streaming.rs).  The batch-table analog: a file/Kafka stream
of transcript turns, extracted per micro-batch and committed through the
same idempotent MERGE used by the batch job — foreachBatch + MERGE is
exactly the X4 duplicate guard (a replayed micro-batch re-inserts nothing)
and X6 finalize (each epoch commit is the flush).

Watermark/no-late-data note: turns are independent rows here, so no
event-time aggregation exists and no watermark is needed; ordering is
restored by readers (ORDER BY conv_id, turn_idx), not by arrival time.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from deepseek_ocr_rs_spark.operators.extract import extract_turns
from deepseek_ocr_rs_spark.plans.checkpoint import ParquetMergeSink
from deepseek_ocr_rs_spark.schemas import TRANSCRIPTS_SCHEMA


def run_streaming_extraction(
    spark: SparkSession,
    source_dir: str,
    sink: ParquetMergeSink,
    checkpoint_dir: str,
    run_id: str = "stream",
    available_now: bool = True,
    chunk_bytes: int = 4096,
):
    """File-source streaming extraction with foreachBatch MERGE commit.

    ``available_now=True`` drains everything currently in the source and
    stops (the batch-catchup mode); False tails the directory forever.
    Returns the StreamingQuery.
    """
    stream = (
        spark.readStream.schema(TRANSCRIPTS_SCHEMA)
        .option("maxFilesPerTrigger", 8)
        .parquet(source_dir)
    )

    def commit(batch_df: DataFrame, epoch_id: int) -> None:
        # idempotent MERGE: a replayed epoch inserts zero rows (X4 guard)
        extracted = extract_turns(
            batch_df, run_id=f"{run_id}-epoch{epoch_id}", chunk_bytes=chunk_bytes
        ).where("ok")
        sink.merge(extracted)

    writer = (
        stream.writeStream.foreachBatch(commit)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("update")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def streaming_windowed_rates(
    spark: SparkSession,
    source_dir: str,
    checkpoint_dir: str,
    query_name: str = "turn_rates",
    window: str = "5 minutes",
    watermark: str = "10 minutes",
    max_files_per_trigger: int = 1,
    available_now: bool = True,
    output_dir: Optional[str] = None,
):
    """Event-time windowed turn-rate aggregation with a watermark (the A5
    throughput metric in streaming form, with late-data semantics).

    ``withWatermark(ts, W)`` bounds state: a tumbling window finalizes —
    and, in append mode, is emitted exactly once — when the watermark
    passes its end; rows later than W behind the max seen event time are
    DROPPED, never corrupting an already-emitted window.  This is the
    event-time analog of the reference's monotonicity guard on the token
    stream (crates/server/src/stream.rs:277-280): out-of-order data may
    reorder within the tolerance, but can never rewrite committed output.

    Scale note: state size ~ (#open windows x #roles), independent of
    corpus size; the shuffle key is (window, role).
    """
    stream = (
        spark.readStream.schema(TRANSCRIPTS_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(source_dir)
    )
    agg = (
        stream.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("win"), "role")
        .agg(
            F.count(F.lit(1)).alias("n_turns"),
            F.sum(F.length("text")).cast("long").alias("n_chars"),
        )
        .select(
            F.col("win.start").alias("window_start"),
            F.col("win.end").alias("window_end"),
            "role",
            "n_turns",
            "n_chars",
        )
    )
    writer = agg.writeStream.outputMode("append").option(
        "checkpointLocation", checkpoint_dir
    )
    if output_dir is not None:
        # file sink: append-only AND checkpoint-recoverable (the restart /
        # late-data path needs recovery, which the memory sink lacks)
        writer = writer.format("parquet").option("path", output_dir)
    else:
        writer = writer.format("memory").queryName(query_name)
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


EVENTS_SCHEMA = "event_id long, ts timestamp, user_id long, value double"


def streaming_session_stats(
    spark: SparkSession,
    source_dir: str,
    checkpoint_dir: str,
    gap_seconds: int = 1800,
    watermark: str = "30 minutes",
    query_name: str = "session_stats_stream",
    max_files_per_trigger: int = 1,
    available_now: bool = True,
    output_dir: Optional[str] = None,
):
    """The batch sessionizer (operators/sessions.py session_stats) run
    UNCHANGED under Structured Streaming — the point of using the
    engine-native ``F.session_window`` grouping instead of the
    lag-based gaps-and-islands form, which is inexpressible on an
    unbounded stream.

    ``withWatermark`` is the only streaming-specific line: in append
    mode a session is emitted exactly once, when the watermark (max
    event time - tolerance, derived from the PREVIOUS batch — eviction
    lags one micro-batch) passes the session's end.  Late-data
    semantics probed live and pinned by tests/test_sessions.py: while a
    session is still in state, a below-watermark row that overlaps it
    MERGES (session windows do not pre-filter late input); once the
    session has been emitted, a late row is DROPPED — committed output
    is never rewritten, the same discipline as streaming_windowed_rates.
    State per key is the OPEN sessions only, so state size tracks
    active users, not corpus size; the shuffle key is the session key.
    """
    from deepseek_ocr_rs_spark.operators.sessions import session_stats

    stream = (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(source_dir)
    )
    agg = session_stats(
        stream.withWatermark("ts", watermark), gap_seconds=gap_seconds
    )
    writer = agg.writeStream.outputMode("append").option(
        "checkpointLocation", checkpoint_dir
    )
    if output_dir is not None:
        writer = writer.format("parquet").option("path", output_dir)
    else:
        writer = writer.format("memory").queryName(query_name)
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
