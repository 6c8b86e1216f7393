#!/usr/bin/env python
"""Production extraction job entry for ``spark-submit``.

Launch (cluster)::

    zip -r pyfiles.zip deepseek_ocr_rs_spark
    spark-submit --py-files pyfiles.zip \
        [--master yarn|k8s://... --num-executors N ...] \
        scripts/extract_job.py \
        --input  <transcripts table/path (parquet dir or Iceberg table)> \
        --output <sink path (parquet dir) or Iceberg table name> \
        --run-id r1 [--partitions 4096] [--iceberg] [--quarantine <path>]

The job is the run_extraction topology (one input range shuffle ->
mapInArrow extraction -> local sort -> idempotent MERGE commit) with
per-partition lineage + metrics sidecars; re-submitting after a kill
resumes at key granularity (already-committed (conv_id, turn_idx) keys are
anti-joined away).  Local smoke: tests/test_submit_job.py runs this file
through a real ``spark-submit --py-files`` with the package zipped.
"""

from __future__ import annotations

import argparse
import json
import sys


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description="transcript extraction job")
    ap.add_argument("--input", required=True)
    ap.add_argument("--output", required=True)
    ap.add_argument("--run-id", default="")
    ap.add_argument("--partitions", type=int, default=0,
                    help="range partitions for the input shuffle "
                         "(0 = 3x default parallelism)")
    ap.add_argument("--chunk-bytes", type=int, default=65536)
    ap.add_argument("--iceberg", action="store_true",
                    help="treat --output as an Iceberg table and commit "
                         "via MERGE INTO (requires a configured catalog)")
    ap.add_argument("--no-sort", action="store_true",
                    help="input already clustered by (conv_id, turn_idx): "
                         "skip the range shuffle entirely")
    ap.add_argument("--quarantine", default="",
                    help="parquet path for malformed-payload rows; "
                         "without it quarantined rows are counted and "
                         "DROPPED (stated in the summary line)")
    args = ap.parse_args(argv)

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.appName(f"extract-{args.run_id or 'job'}")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .getOrCreate()
    )

    from deepseek_ocr_rs_spark.plans.checkpoint import (
        IcebergMergeSink,
        ParquetMergeSink,
    )
    from deepseek_ocr_rs_spark.plans.pipeline import (
        ExtractionJobConfig,
        run_extraction,
    )
    from deepseek_ocr_rs_spark.sources.catalog import read_transcripts

    transcripts = (
        spark.read.table(args.input) if args.iceberg
        else read_transcripts(spark, args.input)
    )
    keys = ["conv_id", "turn_idx"]
    sink = (IcebergMergeSink(args.output, keys) if args.iceberg
            else ParquetMergeSink(args.output, keys))
    res = run_extraction(
        spark,
        transcripts,
        ExtractionJobConfig(
            n_partitions=args.partitions,
            chunk_bytes=args.chunk_bytes,
            sort_output=not args.no_sort,
            run_id=args.run_id,
        ),
        sink=sink,
    )
    if args.quarantine:
        res.quarantined.write.mode("overwrite").parquet(args.quarantine)
        n_quarantined = spark.read.parquet(args.quarantine).count()
    else:
        n_quarantined = res.quarantined.count()
    print(json.dumps({
        "run_id": res.run_id,
        "rows_written": res.rows_written,
        "quarantined": n_quarantined,
        "quarantine_path": args.quarantine or None,
        "quarantined_rows_dropped": not args.quarantine,
    }))
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
