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


# ------------------------------------------------- incremental text deltas

DELTA_INPUT_SCHEMA = (
    "conv_id string, seq int, snapshot string, is_final boolean"
)
DELTA_OUTPUT_SCHEMA = "conv_id string, seq int, delta string"
DELTA_STATE_SCHEMA = "prev string, last_seq int"


def _delta_update(
    key: Tuple[Any, ...],
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    """X1/X2 live path: per-conversation incremental delta emission.

    The reference streams each request's growing text through
    DeltaTracker::advance (crates/core/src/streaming.rs:20-68), emitting
    only the new clean suffix per tick and holding back a trailing U+FFFD
    until more bytes arrive.  Here the SAME pure tracker
    (functions/delta.py, pytest-pinned reference-exact) runs inside
    applyInPandasWithState: state = (full text so far, last seq), each
    micro-batch replays its arrivals in seq order through the tracker and
    emits one (conv_id, seq, delta) row per non-empty delta.  Replayed or
    out-of-order snapshots (seq <= last_seq) are ignored — the
    stream.rs:277-280 duplicate guard."""
    from deepseek_ocr_rs_spark.functions.delta import DeltaTracker

    if state.exists:
        prev, last_seq = state.get
    else:
        prev, last_seq = "", -1
    tracker = DeltaTracker(prev or "")
    arrivals = []
    for pdf in pdfs:
        for seq, snap, fin in zip(pdf["seq"], pdf["snapshot"],
                                  pdf["is_final"]):
            arrivals.append((int(seq),
                             snap if isinstance(snap, str) else "",
                             bool(fin)))
    out_seq, out_delta = [], []
    for seq, snap, fin in sorted(arrivals):
        if seq <= last_seq:
            continue
        delta = tracker.advance(snap, is_final=fin)
        last_seq = seq
        if delta:
            out_seq.append(seq)
            out_delta.append(delta)
    state.update((tracker.snapshot, last_seq))
    if out_seq:
        yield pd.DataFrame(
            {
                "conv_id": [key[0]] * len(out_seq),
                "seq": out_seq,
                "delta": out_delta,
            }
        )


def run_delta_stream(
    spark: SparkSession,
    source_dir: str,
    checkpoint_dir: str,
    output_dir: str,
    available_now: bool = True,
):
    """File stream of growing per-conversation text snapshots ->
    incremental deltas (the distributed analog of the reference's
    token-streaming emission path).  State per key is the accumulated
    text — bounded by one conversation's length, independent of corpus
    size; emitted deltas concatenate (in seq order) to exactly the final
    snapshot, which is the pytest contract."""
    stream = (
        spark.readStream.schema(DELTA_INPUT_SCHEMA)
        .option("maxFilesPerTrigger", 1)  # force multiple micro-batches
        .parquet(source_dir)
    )
    updated = stream.groupBy("conv_id").applyInPandasWithState(
        _delta_update,
        outputStructType=DELTA_OUTPUT_SCHEMA,
        stateStructType=DELTA_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )

    from pyspark.sql import functions as F

    def sink(batch_df: DataFrame, epoch_id: int) -> None:
        batch_df.withColumn(
            "epoch", F.lit(epoch_id)
        ).write.mode("append").parquet(output_dir)

    writer = (
        updated.writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
