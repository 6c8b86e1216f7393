"""Catalog readers: strict schema-on-read validation (S8 analog).

The reference validates container schemas eagerly on open
(crates/dsq/src/lib.rs:393-494: magic, dtype, offset and length checks
before any tensor is touched).  The Spark analog: read with an EXPECTED
schema and fail fast on drift, instead of letting a silently-widened column
corrupt downstream arithmetic at the 400th task.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType

from deepseek_ocr_rs_spark.schemas import TRANSCRIPTS_SCHEMA


class SchemaMismatch(ValueError):
    pass


def read_validated(
    spark: SparkSession,
    path: str,
    expected: StructType,
    fmt: str = "parquet",
) -> DataFrame:
    """Read ``path`` and verify the on-disk schema covers ``expected``
    exactly (names + types; nullability of the file may be looser).

    Extra columns in the file are allowed and pruned away — column additions
    must never break readers; missing or retyped columns fail fast.
    """
    df = spark.read.format(fmt).load(path)
    actual = {f.name: f.dataType for f in df.schema.fields}
    problems = []
    for f in expected.fields:
        if f.name not in actual:
            problems.append(f"missing column {f.name!r}")
        elif actual[f.name] != f.dataType:
            problems.append(
                f"column {f.name!r}: expected {f.dataType.simpleString()}, "
                f"file has {actual[f.name].simpleString()}"
            )
    if problems:
        raise SchemaMismatch(f"{path}: " + "; ".join(problems))
    return df.select(*[f.name for f in expected.fields])


def read_transcripts(spark: SparkSession, path: str,
                     fmt: str = "parquet") -> DataFrame:
    """The engine's input table (BASELINE.json input_hint shape)."""
    return read_validated(spark, path, TRANSCRIPTS_SCHEMA, fmt)


def read_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Plain catalog read for the benchmark star schema."""
    return spark.read.parquet(f"{sf_dir.rstrip('/')}/{name}.parquet")
