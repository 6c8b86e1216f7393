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
