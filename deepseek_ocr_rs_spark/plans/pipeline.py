"""run_extraction — the full job topology (SURVEY.md §3.1 Spark equivalent).

    read transcripts
      -> quarantine split (malformed payloads never fail the job; C4)
      -> range-partition INPUT on (conv_id, turn_idx)  [skew + order, 1 shuffle]
      -> mapInArrow extraction                         [the only custom stage]
      -> local sortWithinPartitions                    [global order, 0 shuffle]
      -> MERGE into the extracted sink                 [checkpoint/resume; C1]
      -> metrics + lineage rows                        [A1/A5/A10 analogs]

Scale reasoning (explicitly, for the 100 TB case):
  * ONE shuffle total, and it moves the *input*, not the (post-extraction)
    output.  Range partitioning the input on (conv_id, turn_idx):
      - spreads a 10^6-turn conversation across range boundaries (turns are
        independent, so no per-conv grouping is needed — the salting goal,
        achieved without a separate salt column);
      - re-balances pathological input file packing (tiny files);
      - buys the output's global total order with a LOCAL sort, because the
        partitions themselves are range-ordered.  No second shuffle, no
        persist, and the range sampler scans only the two pruned key
        columns of the input — never the extraction.
  * Extraction itself induces NO shuffle and is embarrassingly parallel.
  * Resume: re-running the job against an existing sink anti-joins on the
    merge key, so only missing (conv_id, turn_idx) keys are re-extracted —
    partition-granularity resume falls out of key-granularity MERGE.
  * Metrics/lineage travel via accumulators (bytes per task, not per row) —
    no second pass over the data and no extra action.
  * When the source table is ALREADY clustered by (conv_id, turn_idx)
    (Iceberg sort order), set sort_output=False and skip even that shuffle:
    scan splits preserve clustering and a local sort suffices.
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
    chunk_bytes: int = 0           # 0 = whole-string fast tokenizer;
                                   # >0 = streaming path in chunks that size
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

    # ---- partitioning BEFORE extraction (the load-bearing topology call):
    # range-partition the INPUT on (conv_id, turn_idx).  This simultaneously
    #   (1) defuses long-conversation skew (a 10^6-turn conv splits across
    #       range boundaries — same effect as salting, since turns are
    #       independent),
    #   (2) fixes file-packing under-parallelism (tiny/packed input files),
    #   (3) makes the final global order free: partitions are ordered by
    #       range, so a LOCAL sort after extraction yields a total order —
    #       no shuffle of the (larger) extracted output, no persist, and no
    #       double-computed extraction from the range sampler (the sampler
    #       scans only the two pruned key columns of the INPUT).
    if cfg.sort_output:
        src_parts = good.repartitionByRange(
            cfg.n_partitions, "conv_id", "turn_idx"
        )
    else:
        # source already clustered/partitioned how the caller wants it:
        # zero-shuffle path (scan splits carry the parallelism)
        src_parts = good

    extracted = extract_turns(
        src_parts,
        run_id=cfg.run_id,
        chunk_bytes=cfg.chunk_bytes,
        metrics_acc=metrics_acc,
        lineage_acc=lineage_acc,
    )
    # payload-level failures (malformed PDF JSON) also route to quarantine
    payload_bad = extracted.where(~F.col("ok")).select(
        "conv_id", "turn_idx", "payload_kind",
        F.lit("malformed_payload").alias("reason"), "run_id",
    )
    quarantined = quarantined.unionByName(payload_bad)
    extracted_ok = extracted.where(F.col("ok"))

    if cfg.sort_output:
        # local sort only — global order follows from the input range
        # partitioning above (no second shuffle)
        extracted_ok = extracted_ok.sortWithinPartitions("conv_id", "turn_idx")

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

    rows_written: Optional[int] = None
    if sink is not None:
        rows_written = sink.merge(extracted_ok)
        # north rule: per-partition lineage + metrics rows are persisted
        # alongside the extracted table (the merge action just populated
        # the accumulators).  Parquet sinks get path sidecars; catalog
        # (Iceberg) sinks get sibling tables.
        if hasattr(sink, "path"):
            _metrics_df().write.mode("append").parquet(sink.path + "_metrics")
            _lineage_df().write.mode("append").parquet(sink.path + "_lineage")
        else:
            _metrics_df().write.mode("append").saveAsTable(
                sink.table + "_metrics")
            _lineage_df().write.mode("append").saveAsTable(
                sink.table + "_lineage")

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
