"""Pipeline topology tests: salting, quarantine, metrics/lineage, MERGE resume.

Resume mirrors the reference's cache-if-absent restart safety
(crates/assets/src/lib.rs:248-254) + duplicate guard (stream.rs:277-280):
a second run against a half-committed sink extracts only missing keys and
the final table has no duplicates and full coverage.
"""

import pytest
from pyspark.sql import functions as F

from deepseek_ocr_rs_spark.plans.checkpoint import ParquetMergeSink
from deepseek_ocr_rs_spark.plans.pipeline import ExtractionJobConfig, run_extraction
from deepseek_ocr_rs_spark.sources.transcripts import generate_local

SEED = 7


@pytest.fixture(scope="module")
def corpus(spark):
    transcripts, fixtures = generate_local(spark, 30, seed=SEED, skew_every=20,
                                           skew_turns=80)
    return transcripts.cache(), fixtures.cache()


def test_run_extraction_end_to_end(spark, corpus, tmp_path):
    transcripts, fixtures = corpus
    sink = ParquetMergeSink(str(tmp_path / "extracted"),
                            keys=["conv_id", "turn_idx"], n_buckets=8)
    res = run_extraction(spark, transcripts,
                         ExtractionJobConfig(n_partitions=8, run_id="e2e"),
                         sink=sink)
    assert res.rows_written == transcripts.count()

    # written table matches fixtures exactly
    out = sink.read(spark)
    j = out.alias("a").join(fixtures.alias("e"), ["conv_id", "turn_idx"],
                            "full_outer")
    assert j.count() == transcripts.count()
    mism = j.where(~F.col("a.text_md").eqNullSafe(F.col("e.text_md"))).count()
    assert mism == 0

    # metrics + lineage populated (accumulator-fed)
    metrics = res.metrics()
    lineage = res.lineage()
    assert metrics.where(F.col("stage") == "extract").count() > 0
    assert lineage.agg(F.sum("n_turns")).first()[0] == transcripts.count()
    assert set(r["status"] for r in lineage.collect()) == {"done"}


def test_resume_is_idempotent(spark, corpus, tmp_path):
    transcripts, _ = corpus
    sink = ParquetMergeSink(str(tmp_path / "resume"),
                            keys=["conv_id", "turn_idx"], n_buckets=8)
    total = transcripts.count()

    # simulate a killed run: only half the conversations were committed
    half = transcripts.where(F.hash("conv_id") % 2 == 0)
    n_half = half.count()
    res1 = run_extraction(spark, half,
                          ExtractionJobConfig(n_partitions=4, run_id="r1"),
                          sink=sink)
    assert res1.rows_written == n_half

    # rerun over the FULL input: only the missing keys are extracted/appended
    res2 = run_extraction(spark, transcripts,
                          ExtractionJobConfig(n_partitions=4, run_id="r2"),
                          sink=sink)
    assert res2.rows_written == total - n_half

    out = sink.read(spark)
    assert out.count() == total
    assert out.select("conv_id", "turn_idx").distinct().count() == total

    # third run is a complete no-op
    res3 = run_extraction(spark, transcripts,
                          ExtractionJobConfig(n_partitions=4, run_id="r3"),
                          sink=sink)
    assert res3.rows_written == 0


def test_quarantine_malformed_pdf(spark):
    from deepseek_ocr_rs_spark.schemas import TRANSCRIPTS_SCHEMA
    rows = [
        {"conv_id": "c1", "turn_idx": 0, "role": "user",
         "text": '{"kind":"pdf","pages": [BROKEN', "tool": None, "ts": None},
        {"conv_id": "c1", "turn_idx": 1, "role": "user",
         "text": "fine plain text", "tool": None, "ts": None},
    ]
    df = spark.createDataFrame(rows, TRANSCRIPTS_SCHEMA)
    res = run_extraction(spark, df, ExtractionJobConfig(n_partitions=2,
                                                        run_id="q"))
    ok = res.extracted.collect()
    bad = res.quarantined.collect()
    assert [r["turn_idx"] for r in ok] == [1]
    assert len(bad) == 1 and bad[0]["reason"] == "malformed_payload"


def test_salting_balances_skew(spark, corpus):
    """A conversation with 80 turns must not land in a single partition."""
    transcripts, _ = corpus
    from deepseek_ocr_rs_spark.operators.extract import extract_turns
    salted = transcripts.repartition(
        8, F.pmod(F.hash("conv_id", "turn_idx"), F.lit(8)))
    dist = (
        salted.withColumn("pid", F.spark_partition_id())
        .where(F.col("conv_id").endswith("019"))  # the skewed conv
        .groupBy("pid").count().collect()
    )
    assert len(dist) >= 4  # spread across at least half the partitions
