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
