"""Table schemas (FIXTURES.md §1, §3, §4).

Input ``transcripts`` is exactly BASELINE.json's input_hint shape; outputs
mirror the reference's golden-fixture contract (crates/cli/src/debug.rs:
108-157) and bench/lineage records (crates/core/src/benchmark.rs:62-81).
"""

from __future__ import annotations

from pyspark.sql.types import (
    ArrayType,
    BooleanType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

TRANSCRIPTS_SCHEMA = StructType(
    [
        StructField("conv_id", StringType(), False),
        StructField("turn_idx", IntegerType(), False),
        StructField("role", StringType(), False),
        StructField("text", StringType(), True),
        StructField("tool", StringType(), True),
        StructField("ts", TimestampType(), True),
    ]
)

SPAN_TYPE = StructType(
    [
        StructField("start", IntegerType(), False),
        StructField("end", IntegerType(), False),
        StructField("kind", StringType(), False),
        StructField("block_idx", IntegerType(), False),
    ]
)

EXTRACTED_SCHEMA = StructType(
    [
        StructField("conv_id", StringType(), False),
        StructField("turn_idx", IntegerType(), False),
        StructField("payload_kind", StringType(), False),
        StructField("text_md", StringType(), False),
        StructField("text_plain", StringType(), False),
        StructField("spans", ArrayType(SPAN_TYPE, False), False),
        StructField("n_blocks", IntegerType(), False),
        StructField("n_chars", IntegerType(), False),
        StructField("ok", BooleanType(), False),
        StructField("run_id", StringType(), True),
    ]
)

FIXTURES_SCHEMA = StructType(
    [
        StructField("conv_id", StringType(), False),
        StructField("turn_idx", IntegerType(), False),
        StructField("schema_version", IntegerType(), False),
        StructField("payload_kind", StringType(), False),
        StructField("text_md", StringType(), False),
        StructField("text_plain", StringType(), False),
        StructField("spans", ArrayType(SPAN_TYPE, False), False),
        StructField("n_blocks", IntegerType(), False),
        StructField("n_chars", IntegerType(), False),
    ]
)

METRICS_SCHEMA = StructType(
    [
        StructField("run_id", StringType(), False),
        StructField("partition_id", IntegerType(), False),
        StructField("stage", StringType(), False),  # tokenize|parse|extract|setup
        StructField("n_turns", LongType(), False),
        StructField("ms", DoubleType(), False),
    ]
)

LINEAGE_SCHEMA = StructType(
    [
        StructField("run_id", StringType(), False),
        StructField("partition_id", IntegerType(), False),
        StructField("conv_id_min", StringType(), True),
        StructField("conv_id_max", StringType(), True),
        StructField("n_turns", LongType(), False),
        StructField("status", StringType(), False),
    ]
)

QUARANTINE_SCHEMA = StructType(
    [
        StructField("conv_id", StringType(), False),
        StructField("turn_idx", IntegerType(), False),
        StructField("payload_kind", StringType(), False),
        StructField("reason", StringType(), False),
        StructField("run_id", StringType(), True),
    ]
)
