"""Text-format transcript sources: JSONL and CSV with quarantine (S3/C4).

The reference accepts its payloads through more than one wire format
(file path, data: URL, remote URL — crates/server/src/generation.rs:
271-313) and classifies malformed input as a client error rather than a
crash (routes.rs error mapping, generation.rs:106-118).  The engine
mirrors that at the table level: transcripts arriving as JSON-lines or
CSV parse against the canonical schema, and rows that cannot parse are
ROUTED to a quarantine DataFrame with the raw line preserved — never
silently dropped, never a job failure.

Mechanism: Spark's PERMISSIVE mode with an explicit ``_corrupt_record``
column.  The returned (good, quarantined) pair is the same contract as
the extraction pipeline's quarantine path (plans/pipeline.py C4), so a
production job can union quarantines from parse and extract stages into
one audit table.
"""

from __future__ import annotations

from typing import Tuple

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StringType, StructField, StructType

from deepseek_ocr_rs_spark.schemas import TRANSCRIPTS_SCHEMA

_CORRUPT = "_corrupt_record"


def _with_corrupt(schema: StructType) -> StructType:
    return StructType(
        list(schema.fields) + [StructField(_CORRUPT, StringType(), True)]
    )


def _split_quarantine(df: DataFrame, reason: str
                      ) -> Tuple[DataFrame, DataFrame]:
    # PERMISSIVE parsing leaves _corrupt_record non-null on bad rows; a
    # row can also parse structurally but violate the non-null contract
    # (conv_id/turn_idx/role) — both route to quarantine
    df = df.cache()  # corrupt-record column requires a materialized parse
    bad_parse = F.col(_CORRUPT).isNotNull()
    bad_null = (
        F.col("conv_id").isNull()
        | F.col("turn_idx").isNull()
        | F.col("role").isNull()
    )
    good = df.where(~bad_parse & ~bad_null).drop(_CORRUPT)
    quarantined = df.where(bad_parse | bad_null).select(
        F.coalesce(F.col(_CORRUPT), F.to_json(F.struct("*"))).alias("raw"),
        F.when(bad_parse, F.lit(reason))
        .otherwise(F.lit("null_required_field"))
        .alias("reason"),
    )
    return good, quarantined


def read_transcripts_jsonl(spark: SparkSession, path: str
                           ) -> Tuple[DataFrame, DataFrame]:
    """JSON-lines transcripts -> (good, quarantined).

    Timestamps parse from ISO-8601; unparseable lines land in quarantine
    with the raw line intact."""
    df = (
        spark.read.schema(_with_corrupt(TRANSCRIPTS_SCHEMA))
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", _CORRUPT)
        .option("timestampFormat", "yyyy-MM-dd'T'HH:mm:ss[.SSS][XXX]")
        .json(path)
    )
    return _split_quarantine(df, "malformed_json")


def read_transcripts_csv(spark: SparkSession, path: str, sep: str = ","
                         ) -> Tuple[DataFrame, DataFrame]:
    """Headered CSV transcripts -> (good, quarantined)."""
    df = (
        spark.read.schema(_with_corrupt(TRANSCRIPTS_SCHEMA))
        .option("header", "true")
        .option("sep", sep)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", _CORRUPT)
        .option("timestampFormat", "yyyy-MM-dd HH:mm:ss")
        .csv(path)
    )
    return _split_quarantine(df, "malformed_csv")
