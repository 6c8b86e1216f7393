"""DataFrame-level operators."""

from deepseek_ocr_rs_spark.operators.extract import extract_turns

__all__ = ["extract_turns"]
