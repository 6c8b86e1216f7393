"""Streaming revisit suppression: the real-time CDX latest-capture view.

:mod:`~deepseek_ocr_rs_spark.operators.cdx` diffs *finished* snapshots;
a continuous crawl does not wait for a snapshot boundary — captures
arrive as a stream, most are revisits (unchanged digest), and the
extraction tier must only ever hear about *novelty*.  This is the
stateful-streaming version of the same contract:

* state per SURT key: (last_digest, last_seq, n_captures) — a few dozen
  bytes per distinct page, independent of capture volume;
* a capture whose digest equals the key's last digest is a **revisit
  and emits nothing** — the downstream stream carries added/changed
  rows only, so a steady-state recrawl where ~5% of pages change sends
  ~5% of its volume to extraction (the same economics as
  plans/incremental.py, expressed for a continuous feed);
* the ``seq <= last_seq`` guard makes replayed/out-of-order deliveries
  emit nothing (X4 duplicate discipline — identical to the reference's
  ``count <= last_count`` emission guard,
  crates/server/src/stream.rs:277-280);
* emitted statuses are ``added`` (first capture of a key) and
  ``changed`` (digest flipped); together with per-key ``n_seen`` the
  batch CDX rollup is recoverable, which the pytest contract checks by
  replaying the same capture log through batch ``latest_captures``.

Scale shape: ``applyInPandasWithState`` keyed by SURT — one shuffle on
the key per micro-batch, state store partitioned the same way; no
window, no join, no driver-side anything.
"""

from __future__ import annotations

from typing import Any, Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

__all__ = ["run_capture_stream", "CAPTURE_INPUT_SCHEMA"]

CAPTURE_INPUT_SCHEMA = "surt string, seq long, digest string, url string"
CAPTURE_OUTPUT_SCHEMA = (
    "surt string, seq long, status string, digest string, url string,"
    " n_seen long"
)
CAPTURE_STATE_SCHEMA = "last_digest string, last_seq long, n_seen long"


def _capture_update(
    key: Tuple[Any, ...],
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    if state.exists:
        last_digest, last_seq, n_seen = state.get
    else:
        last_digest, last_seq, n_seen = None, -1, 0
    arrivals = []
    for pdf in pdfs:
        for seq, digest, url in zip(pdf["seq"], pdf["digest"], pdf["url"]):
            arrivals.append((int(seq), digest, url))
    out = {"seq": [], "status": [], "digest": [], "url": [], "n_seen": []}
    # micro-batch rows arrive unordered: apply the monotone guard over
    # the sorted batch; replayed epochs (seq <= last_seq) emit nothing
    for seq, digest, url in sorted(arrivals, key=lambda a: a[0]):
        if seq <= last_seq:
            continue  # duplicate / out-of-order replay (X4)
        n_seen += 1
        last_seq = seq
        # first-seen is n_seen == 1, NOT last_digest is None: a key
        # whose first capture carries a NULL digest must not re-emit
        # 'added' on every later distinct digest (ADVICE r04) — NULL is
        # a legal digest value, absence of state is a separate fact
        if n_seen == 1:
            status = "added"
        elif digest == last_digest:
            last_digest = digest
            continue  # revisit: suppressed, state still advances
        else:
            status = "changed"
        last_digest = digest
        out["seq"].append(seq)
        out["status"].append(status)
        out["digest"].append(digest)
        out["url"].append(url)
        out["n_seen"].append(n_seen)
    state.update((last_digest, last_seq, n_seen))
    if out["seq"]:
        yield pd.DataFrame(
            {
                "surt": [key[0]] * len(out["seq"]),
                **out,
            }
        )


def run_capture_stream(
    spark: SparkSession,
    source_dir: str,
    checkpoint_dir: str,
    output_dir: str,
    available_now: bool = True,
):
    """File stream of capture rows -> added/changed novelty stream.

    Revisits and replays emit nothing; each emitted row carries the
    key's running ``n_seen`` so the batch rollup is recoverable.
    """
    stream = (
        spark.readStream.schema(CAPTURE_INPUT_SCHEMA)
        .option("maxFilesPerTrigger", 1)  # force multiple micro-batches
        .parquet(source_dir)
    )
    updated = stream.groupBy("surt").applyInPandasWithState(
        _capture_update,
        outputStructType=CAPTURE_OUTPUT_SCHEMA,
        stateStructType=CAPTURE_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )

    from pyspark.sql import functions as F

    def sink(batch_df: DataFrame, epoch_id: int) -> None:
        batch_df.withColumn("epoch", F.lit(epoch_id)).write.mode(
            "append"
        ).parquet(output_dir)

    writer = (
        updated.writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
