"""Custom stateful streaming operator: per-conversation running state.

The reference's only stateful structure is the KV cache — monotone,
append-only, keyed per request (crates/core/src/cache.rs:14-471), with the
out-of-order/duplicate guard on the emission path
(crates/server/src/stream.rs:277-280).  The Structured Streaming analog is
``applyInPandasWithState``: per conv_id, accumulate turn arrivals across
micro-batches and emit the updated conversation summary each time — the
same grow-only per-key state discipline (count, max turn index, char
total), with late/duplicate turn_idx arrivals ignored exactly like the
``count <= last_count`` guard.
"""

from __future__ import annotations

from typing import Any, Iterable, Iterator, Tuple

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from deepseek_ocr_rs_spark.schemas import TRANSCRIPTS_SCHEMA

OUTPUT_SCHEMA = (
    "conv_id string, n_turns_seen long, max_turn_idx int, total_chars long"
)
STATE_SCHEMA = "n_turns_seen long, max_turn_idx int, total_chars long"


def _update(
    key: Tuple[Any, ...],
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    if state.exists:
        n_seen, max_idx, total_chars = state.get
    else:
        n_seen, max_idx, total_chars = 0, -1, 0
    arrivals = []
    for pdf in pdfs:
        for turn_idx, text in zip(pdf["turn_idx"], pdf["text"]):
            arrivals.append(
                (int(turn_idx), len(text) if isinstance(text, str) else 0)
            )
    # rows within a micro-batch arrive unordered: apply the monotone guard
    # over the SORTED batch (same as the reference sorting tile order before
    # emission), then drop anything at or below the committed watermark —
    # a replayed epoch contributes nothing (X4 duplicate guard)
    for ti, n_chars in sorted(arrivals):
        if ti <= max_idx:
            continue
        n_seen += 1
        max_idx = ti
        total_chars += n_chars
    state.update((n_seen, max_idx, total_chars))
    yield pd.DataFrame(
        {
            "conv_id": [key[0]],
            "n_turns_seen": [n_seen],
            "max_turn_idx": [max_idx],
            "total_chars": [total_chars],
        }
    )


def run_stateful_conversation_stream(
    spark: SparkSession,
    source_dir: str,
    checkpoint_dir: str,
    output_dir: str,
    available_now: bool = True,
):
    """File stream of transcript turns -> per-conversation running summary.

    State lives in the streaming state store (RocksDB/HDFS-backed on a
    cluster), keyed by conv_id; each micro-batch emits the refreshed row for
    every conversation it touched (outputMode=update semantics, materialized
    append-per-epoch to parquet for testability).
    """
    stream = (
        spark.readStream.schema(TRANSCRIPTS_SCHEMA)
        .option("maxFilesPerTrigger", 1)  # force multiple micro-batches
        .parquet(source_dir)
    )
    updated = stream.groupBy("conv_id").applyInPandasWithState(
        _update,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )

    def sink(batch_df: DataFrame, epoch_id: int) -> None:
        batch_df.withColumn(
            "epoch", F.lit(epoch_id)
        ).write.mode("append").parquet(output_dir)

    from pyspark.sql import functions as F  # local import for the closure

    writer = (
        updated.writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("update")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
