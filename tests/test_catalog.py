"""S8 strict schema-on-read + persisted metrics/lineage sidecars."""

import pytest
from pyspark.sql import functions as F

from deepseek_ocr_rs_spark.schemas import TRANSCRIPTS_SCHEMA
from deepseek_ocr_rs_spark.sources.catalog import (
    SchemaMismatch,
    read_transcripts,
    read_validated,
)
from deepseek_ocr_rs_spark.sources.transcripts import generate_local


def test_read_validated_roundtrip_and_drift(spark, tmp_path):
    transcripts, _ = generate_local(spark, 5, seed=2, skew_every=0)
    p = str(tmp_path / "t")
    transcripts.write.parquet(p)
    ok = read_transcripts(spark, p)
    assert ok.count() == transcripts.count()
    assert [f.name for f in ok.schema.fields] == \
        [f.name for f in TRANSCRIPTS_SCHEMA.fields]

    # extra column allowed (pruned away)
    p2 = str(tmp_path / "extra")
    transcripts.withColumn("extra", F.lit(1)).write.parquet(p2)
    assert "extra" not in read_transcripts(spark, p2).columns

    # missing column fails fast
    p3 = str(tmp_path / "missing")
    transcripts.drop("tool").write.parquet(p3)
    with pytest.raises(SchemaMismatch, match="missing column 'tool'"):
        read_transcripts(spark, p3)

    # retyped column fails fast
    p4 = str(tmp_path / "retyped")
    transcripts.withColumn(
        "turn_idx", F.col("turn_idx").cast("long")).write.parquet(p4)
    with pytest.raises(SchemaMismatch, match="turn_idx"):
        read_transcripts(spark, p4)


def test_sink_writes_metrics_and_lineage_sidecars(spark, tmp_path):
    from deepseek_ocr_rs_spark.plans.checkpoint import ParquetMergeSink
    from deepseek_ocr_rs_spark.plans.pipeline import (
        ExtractionJobConfig,
        run_extraction,
    )

    transcripts, _ = generate_local(spark, 8, seed=5, skew_every=0)
    sink = ParquetMergeSink(str(tmp_path / "out"),
                            keys=["conv_id", "turn_idx"], n_buckets=4)
    run_extraction(spark, transcripts,
                   ExtractionJobConfig(n_partitions=4, run_id="side"),
                   sink=sink)
    metrics = spark.read.parquet(str(tmp_path / "out_metrics"))
    lineage = spark.read.parquet(str(tmp_path / "out_lineage"))
    assert metrics.where("stage = 'extract'").count() > 0
    assert lineage.agg(F.sum("n_turns")).first()[0] == transcripts.count()
