from deepseek_ocr_rs_spark.streaming.stream import run_streaming_extraction

__all__ = ["run_streaming_extraction"]
