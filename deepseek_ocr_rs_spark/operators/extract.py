"""The extraction operator: Arrow-batched mapInPandas over transcript turns.

This is the Spark-side seat of the reference's ``OcrEngine::decode``
(crates/core/src/inference.rs:189-209) — one vectorized stage that takes a
batch of turns and emits the structured extraction rows.  All heavy work is
batch-local Python over Arrow record batches; there is no per-row Python UDF
and no JVM<->Python chatter inside the loop (input_hint: "no per-row Python
anywhere on the hot path").

Scale notes (100 TB / 1000 executors):
  * The operator is embarrassingly parallel per turn — no shuffle of its own.
    Upstream salting (plans/pipeline.py) balances long-conversation skew;
    downstream ordering is a separate range-partitioned sort.
  * Only (conv_id, turn_idx, text) are read — column pruning reaches the
    scan because we .select() before mapInPandas.
  * Per-partition timing + counts are reported through accumulators (tiny,
    driver-bounded), the analog of BenchEvent rows
    (crates/core/src/benchmark.rs:62-81).
"""

from __future__ import annotations

import time
from typing import Iterator, Optional

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from deepseek_ocr_rs_spark.functions.extract_core import (
    DEFAULT_CHUNK_BYTES,
    extract_payload,
)
from deepseek_ocr_rs_spark.schemas import EXTRACTED_SCHEMA


def extract_turns(
    df: DataFrame,
    run_id: Optional[str] = None,
    chunk_bytes: int = DEFAULT_CHUNK_BYTES,
    metrics_acc=None,
    lineage_acc=None,
) -> DataFrame:
    """transcripts(conv_id, turn_idx, ..., text) -> extracted rows.

    ``metrics_acc`` / ``lineage_acc`` are optional Spark accumulators (see
    plans/pipeline.py) fed per task partition.

    Implementation detail: mapInArrow (not mapInPandas), and spans leave the
    Python worker as four FLAT primitive list columns (start/end/kind/
    block_idx) — primitive Arrow buffers are ~4x cheaper to build and to
    convert JVM-side than array<struct>.  The public ``spans`` array<struct>
    column is assembled lazily with JVM-side arrays_zip/transform, so any
    downstream plan that never touches spans also never pays for them
    (Catalyst prunes the flat columns away).
    """
    import pyarrow as pa  # worker-side import

    rid = run_id
    out_schema = pa.schema(
        [
            pa.field("conv_id", pa.string(), nullable=False),
            pa.field("turn_idx", pa.int32(), nullable=False),
            pa.field("payload_kind", pa.string(), nullable=False),
            pa.field("text_md", pa.string(), nullable=False),
            pa.field("text_plain", pa.string(), nullable=False),
            pa.field("start", pa.list_(pa.int32()), nullable=False),
            pa.field("end", pa.list_(pa.int32()), nullable=False),
            pa.field("kind", pa.list_(pa.string()), nullable=False),
            pa.field("block_idx", pa.list_(pa.int32()), nullable=False),
            pa.field("n_blocks", pa.int32(), nullable=False),
            pa.field("n_chars", pa.int32(), nullable=False),
            pa.field("ok", pa.bool_(), nullable=False),
            pa.field("run_id", pa.string(), nullable=True),
        ]
    )
    flat_spark_schema = (
        "conv_id string, turn_idx int, payload_kind string, text_md string, "
        "text_plain string, start array<int>, end array<int>, "
        "kind array<string>, block_idx array<int>, n_blocks int, "
        "n_chars int, ok boolean, run_id string"
    )

    def run(batches: Iterator["pa.RecordBatch"]) -> Iterator["pa.RecordBatch"]:
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId() if TaskContext.get() else -1
        stage_ms = {"extract": 0.0, "tokenize": 0.0, "parse": 0.0}
        n_turns = 0
        conv_min: Optional[str] = None
        conv_max: Optional[str] = None
        for batch in batches:
            t0 = time.perf_counter()
            conv_ids = batch.column("conv_id").to_pylist()
            turn_idxs = batch.column("turn_idx")
            texts = batch.column("text").to_pylist()
            kinds = []
            mds = []
            plains = []
            n_blocks = []
            n_chars = []
            oks = []
            # flat span buffers
            s_start: list = []
            s_end: list = []
            s_kind: list = []
            s_bidx: list = []
            s_offsets = [0]
            html_s = 0.0
            pdf_s = 0.0
            for txt in texts:
                t1 = time.perf_counter()
                r = extract_payload(txt, chunk_bytes=chunk_bytes)
                dt = time.perf_counter() - t1
                k = r["payload_kind"]
                if k == "html":
                    html_s += dt
                elif k == "pdf":
                    pdf_s += dt
                kinds.append(k)
                mds.append(r["text_md"])
                plains.append(r["text_plain"])
                n_blocks.append(r["n_blocks"])
                n_chars.append(r["n_chars"])
                oks.append(r["ok"])
                for sp in r["spans"]:
                    s_start.append(sp["start"])
                    s_end.append(sp["end"])
                    s_kind.append(sp["kind"])
                    s_bidx.append(sp["block_idx"])
                s_offsets.append(len(s_start))
            offsets = pa.array(s_offsets, pa.int32())
            n = len(texts)
            out = pa.RecordBatch.from_arrays(
                [
                    batch.column("conv_id"),
                    turn_idxs.cast(pa.int32()),
                    pa.array(kinds, pa.string()),
                    pa.array(mds, pa.string()),
                    pa.array(plains, pa.string()),
                    pa.ListArray.from_arrays(offsets, pa.array(s_start, pa.int32())),
                    pa.ListArray.from_arrays(offsets, pa.array(s_end, pa.int32())),
                    pa.ListArray.from_arrays(offsets, pa.array(s_kind, pa.string())),
                    pa.ListArray.from_arrays(offsets, pa.array(s_bidx, pa.int32())),
                    pa.array(n_blocks, pa.int32()),
                    pa.array(n_chars, pa.int32()),
                    pa.array(oks, pa.bool_()),
                    pa.array([rid] * n, pa.string()),
                ],
                schema=out_schema,
            )
            n_turns += n
            if conv_ids:
                lo, hi = min(conv_ids), max(conv_ids)
                conv_min = lo if conv_min is None else min(conv_min, lo)
                conv_max = hi if conv_max is None else max(conv_max, hi)
            stage_ms["extract"] += (time.perf_counter() - t0) * 1000.0
            stage_ms["tokenize"] += html_s * 1000.0
            stage_ms["parse"] += pdf_s * 1000.0
            yield out
        if metrics_acc is not None:
            metrics_acc.add(
                [(rid or "", pid, stage, n_turns, ms)
                 for stage, ms in sorted(stage_ms.items())]
            )
        if lineage_acc is not None:
            lineage_acc.add(
                [(rid or "", pid, conv_min, conv_max, n_turns, "done")]
            )

    from deepseek_ocr_rs_spark.operators.rebalance import (
        rebalance_for_arrow,
    )

    # no-op for the headline path (already range-partitioned to 2x cores)
    # and for streaming/multi-split inputs; spreads the doc-fixture gate
    # queries whose single parquet split would starve the extractor
    pruned = rebalance_for_arrow(df.select("conv_id", "turn_idx", "text"))
    flat = pruned.mapInArrow(run, schema=flat_spark_schema)
    # lazy JVM-side struct assembly (arrays_zip IS whole-stage-codegen'd —
    # a transform() lambda here would drop to interpreted evaluation, ~3x
    # slower end-to-end); pruned away when spans go unused
    spans_col = F.arrays_zip("start", "end", "kind", "block_idx")
    return flat.select(
        "conv_id",
        "turn_idx",
        "payload_kind",
        "text_md",
        "text_plain",
        spans_col.alias("spans"),
        "n_blocks",
        "n_chars",
        "ok",
        "run_id",
    )


def salted_repartition(df: DataFrame, num_partitions: int,
                       *key_cols: str) -> DataFrame:
    """Skew-defusing repartition: pmod(hash(keys), n) spreads hot keys.

    Used when a downstream op must co-process rows of one hot key (the
    reference's MoE expert-dispatch pattern, block.rs:1215-1301).  The
    extraction pipeline itself no longer needs it — range partitioning the
    input achieves balance and ordering in one shuffle (plans/pipeline.py).
    """
    cols = list(key_cols) or ["conv_id", "turn_idx"]
    return df.repartition(
        num_partitions,
        F.pmod(F.hash(*[F.col(c) for c in cols]), F.lit(num_partitions)),
    )


def reassemble(extracted: DataFrame, num_partitions: Optional[int] = None) -> DataFrame:
    """Restore the stable (conv_id, turn_idx) global order (W5 contract).

    Range partitioning + within-partition sort = a total order across output
    files without a single-reducer bottleneck.
    """
    if num_partitions:
        return extracted.repartitionByRange(
            num_partitions, "conv_id", "turn_idx"
        ).sortWithinPartitions("conv_id", "turn_idx")
    return extracted.repartitionByRange("conv_id", "turn_idx").sortWithinPartitions(
        "conv_id", "turn_idx"
    )
