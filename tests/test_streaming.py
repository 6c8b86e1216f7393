"""Streaming mode: availableNow drain == batch extraction, and idempotent
re-delivery (X4/X6 analogs)."""

from pyspark.sql import functions as F

from deepseek_ocr_rs_spark.plans.checkpoint import ParquetMergeSink
from deepseek_ocr_rs_spark.sources.transcripts import generate_local
from deepseek_ocr_rs_spark.streaming.stream import run_streaming_extraction


def test_streaming_matches_batch(spark, tmp_path):
    transcripts, fixtures = generate_local(spark, 12, seed=3, skew_every=0)
    src = str(tmp_path / "src")
    transcripts.repartition(4).write.parquet(src)
    total = transcripts.count()

    sink = ParquetMergeSink(str(tmp_path / "out"), keys=["conv_id", "turn_idx"],
                            n_buckets=4)
    q = run_streaming_extraction(
        spark, src, sink, str(tmp_path / "ckpt"), available_now=True
    )
    q.awaitTermination(120)

    out = sink.read(spark)
    assert out.count() == total
    j = out.alias("a").join(fixtures.alias("e"), ["conv_id", "turn_idx"])
    assert j.count() == total
    assert j.where(~F.col("a.text_md").eqNullSafe(F.col("e.text_md"))).count() == 0

    # restart over the same source + fresh checkpoint: MERGE makes redelivery
    # a no-op (no duplicates)
    q2 = run_streaming_extraction(
        spark, src, sink, str(tmp_path / "ckpt2"), available_now=True
    )
    q2.awaitTermination(120)
    assert sink.read(spark).count() == total


def test_streaming_windowed_rates_watermark_drops_late(spark, tmp_path):
    """Watermarked tumbling windows: append mode emits a window exactly once
    when the watermark passes it, and a row arriving later than the
    watermark tolerance is dropped instead of rewriting committed output."""
    import os
    import time as _time

    from deepseek_ocr_rs_spark.streaming.stream import streaming_windowed_rates

    src = str(tmp_path / "wsrc")
    os.makedirs(src)

    def write_file(name, rows):
        df = spark.createDataFrame(
            rows,
            "conv_id string, turn_idx int, role string, text string, "
            "tool string, ts_str string",
        ).withColumn("ts", F.to_timestamp("ts_str")).drop("ts_str")
        df.coalesce(1).write.mode("append").parquet(src)
        _time.sleep(1.1)  # distinct mod times -> deterministic file order

    T = "2024-01-01 10:{:02d}:00"
    ckpt = str(tmp_path / "wckpt")
    # batch 1: two rows in the 10:00 window, plus a row at 10:30 that pushes
    # the watermark to 10:20 (> 10:05), finalizing the 10:00 window
    write_file("f1", [
        ("c1", 0, "user", "abc", None, T.format(0)),
        ("c1", 1, "user", "de", None, T.format(3)),
        ("c2", 0, "assistant", "xyz", None, T.format(30)),
    ])
    outdir = str(tmp_path / "wout")
    q = streaming_windowed_rates(
        spark, src, ckpt, window="5 minutes", watermark="10 minutes",
        available_now=True, output_dir=outdir,
    )
    q.awaitTermination(120)

    # restart from the SAME checkpoint (watermark = 10:20 persisted there)
    # with a LATE row for the already-finalized 10:00 window -> dropped
    write_file("f2", [
        ("c3", 0, "user", "late!", None, T.format(2)),
    ])
    q2 = streaming_windowed_rates(
        spark, src, ckpt, window="5 minutes", watermark="10 minutes",
        available_now=True, output_dir=outdir,
    )
    q2.awaitTermination(120)

    out = {(r["window_start"].strftime("%H:%M"), r["role"]):
           (r["n_turns"], r["n_chars"])
           for r in spark.read.parquet(outdir).collect()}
    # run 1 finalized the 10:00-10:05 user window (watermark 10:20) with
    # exactly the on-time rows; the 10:30 window is still open so append
    # mode has not emitted it; run 2's late c3 row (10:02 << watermark)
    # was DROPPED — no new emission, no rewrite of the committed window
    assert out == {("10:00", "user"): (2, 5)}
