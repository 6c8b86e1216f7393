"""run_extraction — the full job topology (SURVEY.md §3.1 Spark equivalent).

    read transcripts
      -> quarantine split (malformed payloads never fail the job; C4)
      -> salted repartition on (conv_id, turn_idx)   [skew defusal]
      -> mapInPandas extraction                      [the only custom stage]
      -> MERGE into the extracted sink               [checkpoint/resume; C1]
      -> metrics + lineage rows                      [A1/A5/A10 analogs]

Scale reasoning (explicitly, for the 100 TB case):
  * Salting: hash(conv_id, turn_idx) mod n_partitions spreads a 10^6-turn
    conversation over the whole cluster; turns are independent so no
    groupBy-per-conv is ever needed before extraction.  Without this, one
    hot conv_id pins a single task (the reference's MoE dispatch J5 is the
    same pattern: route by key, process, reassemble).
  * The extraction stage itself induces NO shuffle; the only shuffles in the
    job are (a) the explicit repartition (bounded by input size, one pass)
    and (b) the final range sort for output ordering — both linear, both
    AQE-coalesced.
  * Resume: re-running the job against an existing sink anti-joins on the
    merge key, so only missing (conv_id, turn_idx) keys are re-extracted —
    partition-granularity resume falls out of key-granularity MERGE.
  * Metrics/lineage travel via accumulators (bytes per task, not per row) —
    no second pass over the data and no extra action.
"""

from __future__ import annotations

import time
import uuid
from dataclasses import dataclass, field
from typing import List, Optional, Tuple

from pyspark.accumulators import AccumulatorParam
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from deepseek_ocr_rs_spark.operators.extract import extract_turns, reassemble
from deepseek_ocr_rs_spark.plans.checkpoint import ParquetMergeSink
from deepseek_ocr_rs_spark.schemas import (
    LINEAGE_SCHEMA,
    METRICS_SCHEMA,
    QUARANTINE_SCHEMA,
)


class _ListAccum(AccumulatorParam):
    def zero(self, value):
        return []

    def addInPlace(self, v1, v2):
        v1.extend(v2)
        return v1


@dataclass
class ExtractionJobConfig:
    """Driver-resolved job config (AppConfig layering analog,
    crates/config/src/config.rs:330-376: defaults < overrides)."""

    n_partitions: int = 0          # 0 -> 3x default parallelism
    salt_buckets: int = 0          # 0 -> n_partitions (full spread)
    chunk_bytes: int = 4096        # streaming tokenizer chunk size
    sort_output: bool = True       # restore (conv_id, turn_idx) order
    output_partitions: int = 0     # 0 -> n_partitions
    run_id: str = ""               # "" -> deterministic from config+input


@dataclass
class ExtractionResult:
    extracted: DataFrame
    quarantined: DataFrame
    metrics: object    # zero-arg callable -> metrics DataFrame (post-action)
    lineage: object    # zero-arg callable -> lineage DataFrame (post-action)
    run_id: str
    rows_written: Optional[int] = None


def _resolve(spark: SparkSession, cfg: ExtractionJobConfig) -> ExtractionJobConfig:
    par = spark.sparkContext.defaultParallelism
    n_part = cfg.n_partitions or max(2, par * 3)
    return ExtractionJobConfig(
        n_partitions=n_part,
        salt_buckets=cfg.salt_buckets or n_part,
        chunk_bytes=cfg.chunk_bytes,
        sort_output=cfg.sort_output,
        output_partitions=cfg.output_partitions or n_part,
        run_id=cfg.run_id or f"run-{uuid.uuid4().hex[:12]}",
    )


def run_extraction(
    spark: SparkSession,
    transcripts: DataFrame,
    cfg: Optional[ExtractionJobConfig] = None,
    sink: Optional[ParquetMergeSink] = None,
) -> ExtractionResult:
    """Execute the extraction job; returns lazily-evaluated DataFrames unless
    a sink is given (then extracted rows are MERGE-committed eagerly)."""
    cfg = _resolve(spark, cfg or ExtractionJobConfig())
    sc = spark.sparkContext
    metrics_acc = sc.accumulator([], _ListAccum())
    lineage_acc = sc.accumulator([], _ListAccum())

    src = transcripts.select("conv_id", "turn_idx", "text")

    # ---- resume: only keys not already committed are re-extracted (C1)
    if sink is not None:
        existing = sink.existing_keys(spark)
        if existing is not None:
            src = src.join(existing, on=["conv_id", "turn_idx"], how="left_anti")

    # ---- quarantine split: structurally invalid rows (C4). NULL text is a
    # valid empty turn; invalid = missing keys (can't be merged/ordered).
    bad = src.where(F.col("conv_id").isNull() | F.col("turn_idx").isNull())
    quarantined = bad.select(
        F.coalesce("conv_id", F.lit("")).alias("conv_id"),
        F.coalesce("turn_idx", F.lit(-1)).alias("turn_idx"),
        F.lit("unknown").alias("payload_kind"),
        F.lit("null_key").alias("reason"),
        F.lit(cfg.run_id).alias("run_id"),
    )
    good = src.where(F.col("conv_id").isNotNull() & F.col("turn_idx").isNotNull())

    # ---- salted repartition (skew defusal): RoundRobin would also balance
    # but breaks co-location determinism for metrics; hashing the full key
    # spreads long conversations evenly while keeping the op deterministic.
    salted = good.repartition(
        cfg.n_partitions,
        F.pmod(F.hash("conv_id", "turn_idx"), F.lit(cfg.salt_buckets)),
    )

    extracted = extract_turns(
        salted,
        run_id=cfg.run_id,
        chunk_bytes=cfg.chunk_bytes,
        metrics_acc=metrics_acc,
        lineage_acc=lineage_acc,
    )
    # Persist BEFORE the range sort: repartitionByRange samples its child to
    # pick boundaries, which would otherwise execute the extraction stage
    # twice (2x compute + double-fired accumulators).  With the persist, the
    # sampling pass materializes the cache and the shuffle pass reads it.
    if cfg.sort_output or sink is not None:
        from pyspark import StorageLevel

        extracted = extracted.persist(StorageLevel.MEMORY_AND_DISK)
    # payload-level failures (malformed PDF JSON) also route to quarantine
    payload_bad = extracted.where(~F.col("ok")).select(
        "conv_id", "turn_idx", "payload_kind",
        F.lit("malformed_payload").alias("reason"), "run_id",
    )
    quarantined = quarantined.unionByName(payload_bad)
    extracted_ok = extracted.where(F.col("ok"))

    if cfg.sort_output:
        extracted_ok = reassemble(extracted_ok, cfg.output_partitions)

    rows_written: Optional[int] = None
    if sink is not None:
        rows_written = sink.merge(extracted_ok)

    # accumulators are populated only after an action; build the DataFrames
    # lazily from their current contents at call time.  Spark accumulators
    # are at-least-once under task retry / cache miss, so entries are deduped
    # per (run_id, partition_id, stage) keeping the max observation.
    def _dedupe(entries, key_len):
        best = {}
        for e in entries:
            k = e[:key_len]
            if k not in best or e[key_len:] > best[k][key_len:]:
                best[k] = e
        return [best[k] for k in sorted(best)]

    def _metrics_df() -> DataFrame:
        return spark.createDataFrame(
            _dedupe(metrics_acc.value or [], 3), METRICS_SCHEMA)

    def _lineage_df() -> DataFrame:
        return spark.createDataFrame(
            _dedupe(lineage_acc.value or [], 2), LINEAGE_SCHEMA)

    # metrics/lineage are zero-arg builders: call them AFTER an action has
    # materialized `extracted` (the accumulators fill as tasks finish)
    return ExtractionResult(
        extracted=extracted_ok,
        quarantined=quarantined,
        metrics=_metrics_df,
        lineage=_lineage_df,
        run_id=cfg.run_id,
        rows_written=rows_written,
    )
