"""Job topology: config, salted repartition, quarantine, metrics/lineage,
MERGE-style checkpoint/resume."""

from deepseek_ocr_rs_spark.plans.pipeline import ExtractionJobConfig, run_extraction
from deepseek_ocr_rs_spark.plans.checkpoint import ParquetMergeSink

__all__ = ["ExtractionJobConfig", "run_extraction", "ParquetMergeSink"]
