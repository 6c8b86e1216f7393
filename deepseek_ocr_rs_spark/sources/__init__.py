"""Sources: synthetic transcript corpus generator + parquet catalog readers."""

from deepseek_ocr_rs_spark.sources.transcripts import (
    conv_plan,
    gen_conversation,
    generate_local,
    generate_transcripts_df,
)

__all__ = [
    "conv_plan",
    "gen_conversation",
    "generate_local",
    "generate_transcripts_df",
]
