"""applyInPandasWithState: per-conversation state survives micro-batches and
replayed deliveries are no-ops (X4 duplicate guard)."""

from pyspark.sql import Window
from pyspark.sql import functions as F

from deepseek_ocr_rs_spark.sources.transcripts import generate_local
from deepseek_ocr_rs_spark.streaming.stateful import (
    run_stateful_conversation_stream,
)


def test_state_accumulates_and_dedupes_across_microbatches(spark, tmp_path):
    transcripts, _ = generate_local(spark, 6, seed=9, skew_every=0)
    src = str(tmp_path / "src")
    # file 1: the full corpus; file 2: a REPLAY of the same rows.
    # maxFilesPerTrigger=1 forces separate micro-batches; the duplicate
    # guard must make the replay a no-op regardless of processing order.
    transcripts.coalesce(1).write.parquet(src)
    transcripts.coalesce(1).write.mode("append").parquet(src)

    q = run_stateful_conversation_stream(
        spark, src, str(tmp_path / "ckpt"), str(tmp_path / "out")
    )
    q.awaitTermination(180)

    out = spark.read.parquet(str(tmp_path / "out"))
    assert out.select("epoch").distinct().count() >= 2

    final = (
        out.withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy("conv_id").orderBy(F.desc("epoch"))
            ),
        )
        .where("rn = 1")
        .select("conv_id", "n_turns_seen", "max_turn_idx", "total_chars")
    )
    truth = transcripts.groupBy("conv_id").agg(
        F.count(F.lit(1)).alias("n_turns_seen"),
        F.max("turn_idx").alias("max_turn_idx"),
        F.sum(F.length(F.coalesce("text", F.lit("")))).alias("total_chars"),
    )
    diff = final.exceptAll(truth).count() + truth.exceptAll(final).count()
    assert diff == 0


def test_delta_stream_emits_incremental_text(spark, tmp_path):
    """X1/X2 live path: growing snapshots fed across micro-batches emit
    per-conversation deltas that concatenate to EXACTLY the final text;
    a mid-stream U+FFFD (partial codepoint at a chunk boundary) is held
    back, never emitted; replayed snapshots are no-ops."""
    from deepseek_ocr_rs_spark.streaming.stateful import run_delta_stream

    src = str(tmp_path / "dsrc")
    final_a = "Hello 日本語 world🙂 end"
    final_b = "foobar"
    schema = "conv_id string, seq int, snapshot string, is_final boolean"
    batches = [
        [("a", 0, "Hello ", False), ("b", 0, "foo", False)],
        # decoder yields a replacement char for a split codepoint: the
        # tracker must emit only the clean prefix and hold the rest
        [("a", 1, "Hello 日本�", False), ("b", 1, "foo", False)],
        [("a", 0, "Hello ", False)],  # replay -> duplicate guard no-op
        [("a", 2, "Hello 日本語 wor", False)],
        [("a", 3, final_a, True), ("b", 2, final_b, True)],
    ]
    for b in batches:
        spark.createDataFrame(b, schema).coalesce(1).write.mode(
            "append"
        ).parquet(src)

    q = run_delta_stream(
        spark, src, str(tmp_path / "dckpt"), str(tmp_path / "dout")
    )
    q.awaitTermination(180)

    rows = spark.read.parquet(str(tmp_path / "dout")).collect()
    by_conv = {}
    for r in sorted(rows, key=lambda r: (r["conv_id"], r["seq"])):
        by_conv.setdefault(r["conv_id"], []).append(r)
    # deltas concatenate to the final snapshot
    assert "".join(r["delta"] for r in by_conv["a"]) == final_a
    assert "".join(r["delta"] for r in by_conv["b"]) == final_b
    # the partial-codepoint replacement char never leaked into any delta
    assert all("�" not in r["delta"] for r in rows)
    # replay emitted nothing: every (conv, seq) appears at most once and
    # the unchanged 'foo' snapshot produced no row
    seqs_a = [r["seq"] for r in by_conv["a"]]
    assert len(seqs_a) == len(set(seqs_a))
    assert [r["seq"] for r in by_conv["b"]] == [0, 2]
