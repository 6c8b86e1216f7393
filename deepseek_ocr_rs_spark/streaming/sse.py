"""SSE completion-event stream (SURVEY §2.9 X3).

The reference streams per-request completion events over an unbounded mpsc
channel rendered as Server-Sent Events (crates/server/src/stream.rs:16-374):
an initial frame (``response.created``, or a chat chunk carrying
``role: assistant`` exactly once), one ``response.output_text.delta`` per
non-empty delta, a terminal ``response.completed`` with the full normalized
text, then the literal ``[DONE]`` data frame.  A monotonic token-count
guard drops duplicate/regressed batches (stream.rs:272-291).

Spark analog: conversations are the requests; per-conversation delta rows
(conv_id, seq, delta, is_final) become an ordered frame table via pure JVM
window functions — no UDF anywhere — and a ``foreachBatch`` sink renders
frames to SSE wire format (``data: {json}\\n\\n``).  The frame *sequencing*
logic (dedup guard, role-once, empty-delta skip, completed + [DONE]
ordering) is oracle-checkable SQL; the wire rendering is pinned by pytest.
"""

from __future__ import annotations

import os
from typing import Optional

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

EVENT_CREATED = "response.created"
EVENT_DELTA = "response.output_text.delta"
EVENT_COMPLETED = "response.completed"
EVENT_DONE = "[DONE]"


def sse_event_frames(
    deltas: DataFrame,
    kind: str = "chat",
    model: str = "deepseek-ocr",
) -> DataFrame:
    """Per-conversation ordered SSE frame table from delta rows.

    Input columns: ``conv_id`` (string), ``seq`` (long, monotonic within a
    conversation), ``delta`` (string), ``is_final`` (boolean).

    Output columns: ``conv_id``, ``frame_idx`` (0-based within the
    conversation), ``event_type``, ``role`` (non-null on exactly ONE frame
    per conversation for chat streams — the initial chunk, stream.rs:149-190),
    ``payload`` (delta text; full concatenated text on the completed frame),
    ``finish_reason`` (chat only, 'stop' on the completed frame), ``model``.

    X4 guard: duplicate seqs keep one row; empty deltas emit no frame
    (``should_emit``, stream.rs:282-299).  Everything is window/aggregate
    JVM expressions — one shuffle on conv_id, no Python.
    """
    if kind not in ("chat", "responses"):
        raise ValueError(f"unknown stream kind: {kind}")
    is_chat = kind == "chat"

    # duplicate-seq guard: the reference drops a batch whose count did not
    # advance; in a (re)played table that is "one frame per seq wins"
    # (min() keeps the choice deterministic when a corrupt replay disagrees)
    dedup = deltas.groupBy("conv_id", "seq").agg(
        F.min("delta").alias("delta"),
        F.max("is_final").alias("is_final"),
    )

    w_seq = Window.partitionBy("conv_id").orderBy("seq")
    # the delta rank is the only per-row window; the conversation's full
    # text moves into the per-conv aggregate below (the old unbounded
    # window materialized the whole concatenation ON EVERY ROW, and the
    # enriched subtree fed four output branches unpersisted — guide §1.2)
    enriched = dedup.select(
        "conv_id",
        "seq",
        "delta",
        "is_final",
        F.sum(F.when(F.col("delta") != "", 1).otherwise(0))
        .over(w_seq)
        .alias("emit_rank"),
    ).persist()  # branches: delta_frames AND the per-conv rollup

    delta_frames = enriched.where(F.col("delta") != "").select(
        "conv_id",
        F.col("emit_rank").cast("int").alias("frame_idx"),
        F.lit(EVENT_DELTA).alias("event_type"),
        F.lit(None).cast("string").alias("role"),
        F.col("delta").alias("payload"),
        F.lit(None).cast("string").alias("finish_reason"),
    )

    # full_text = seq-ordered concat (seq is unique after the dedup
    # aggregate, so the sort order — and the emitted value — is exactly
    # the old window concat's); NULL unless the conversation has a final
    # row, matching max(when(is_final, full_text)) over the old shape
    n_deltas = enriched.groupBy("conv_id").agg(
        F.sum(F.when(F.col("delta") != "", 1).otherwise(0)).alias("n_emitted"),
        F.when(
            F.max("is_final"),
            F.concat_ws(
                "",
                F.transform(
                    F.array_sort(F.collect_list(F.struct("seq", "delta"))),
                    lambda s: s["delta"],
                ),
            ),
        ).alias("full_text"),
        F.max("is_final").alias("any_final"),
    ).persist()  # branches: created, completed, done

    created = n_deltas.select(
        "conv_id",
        F.lit(0).alias("frame_idx"),
        F.lit("chat.completion.chunk" if is_chat else EVENT_CREATED)
        .alias("event_type"),
        (F.lit("assistant") if is_chat else F.lit(None).cast("string"))
        .alias("role"),
        F.lit(None).cast("string").alias("payload"),
        F.lit(None).cast("string").alias("finish_reason"),
    )
    completed = n_deltas.where("any_final").select(
        "conv_id",
        (F.col("n_emitted") + 1).cast("int").alias("frame_idx"),
        F.lit(EVENT_COMPLETED).alias("event_type"),
        F.lit(None).cast("string").alias("role"),
        F.col("full_text").alias("payload"),
        (F.lit("stop") if is_chat else F.lit(None).cast("string"))
        .alias("finish_reason"),
    )
    done = n_deltas.where("any_final").select(
        "conv_id",
        (F.col("n_emitted") + 2).cast("int").alias("frame_idx"),
        F.lit(EVENT_DONE).alias("event_type"),
        F.lit(None).cast("string").alias("role"),
        F.lit(None).cast("string").alias("payload"),
        F.lit(None).cast("string").alias("finish_reason"),
    )

    return (
        created.unionByName(delta_frames)
        .unionByName(completed)
        .unionByName(done)
        .withColumn("model", F.lit(model))
    )


def render_sse_lines(frames: DataFrame) -> DataFrame:
    """Frames -> SSE wire lines: ``data: {json}`` / ``data: [DONE]``.

    JSON is built with to_json over a fixed-order struct (stable bytes for
    a given frame); the terminal frame is the literal ``[DONE]`` exactly as
    the reference sends it (stream.rs:41,346)."""
    body = F.when(
        F.col("event_type") == EVENT_DONE, F.lit(EVENT_DONE)
    ).otherwise(
        F.to_json(
            F.struct(
                F.col("event_type").alias("type"),
                F.col("conv_id").alias("id"),
                F.col("model"),
                F.col("role"),
                F.col("payload"),
                F.col("finish_reason"),
            ),
            {"ignoreNullFields": "true"},
        )
    )
    return frames.select(
        "conv_id",
        "frame_idx",
        F.concat(F.lit("data: "), body).alias("line"),
    )


def run_sse_stream(
    spark: SparkSession,
    source_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    schema,
    kind: str = "chat",
    model: str = "deepseek-ocr",
    available_now: bool = True,
):
    """File-source delta stream -> per-epoch SSE spool files.

    Each micro-batch formats ONLY conversations that reached their final
    delta inside the batch horizon (the batch-catchup analog of the
    reference's per-request channel: frames for one conversation are
    emitted together, in order).  Epoch files are written atomically
    (tmp+rename) so a replayed epoch overwrites rather than duplicates —
    the X4/X6 discipline of the MERGE sinks applied to the event spool.
    """
    stream = spark.readStream.schema(schema).parquet(source_dir)

    def commit(batch_df: DataFrame, epoch_id: int) -> None:
        frames = sse_event_frames(batch_df, kind=kind, model=model)
        # distributed spool write — NO driver collect: each conversation's
        # frames land contiguous and ordered inside one part file
        # (repartition by conv_id + sortWithinPartitions), which is the
        # per-request ordering guarantee the reference's channel gives
        path = os.path.join(out_dir, f"epoch-{epoch_id:06d}")
        (
            render_sse_lines(frames)
            .repartition("conv_id")
            .sortWithinPartitions("conv_id", "frame_idx")
            .select(F.concat(F.col("line"), F.lit("\n")).alias("value"))
            .write.mode("overwrite")
            .text(path)
        )

    writer = (
        stream.writeStream.foreachBatch(commit)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("update")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
