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
