"""Streaming revisit suppression (streaming/captures.py).

Contract: across micro-batches, only added/changed captures emit;
revisits (same digest) and replays (seq <= committed) are silent while
state still advances; and the novelty stream is CONSISTENT with the
batch CDX rollup — per key, emitted rows count exactly the distinct
digest runs, and the last emitted digest equals batch
latest_captures' last_digest over the same log.
"""

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from deepseek_ocr_rs_spark.streaming.captures import run_capture_stream


def _write_batch(spark, path, rows, mode):
    df = spark.createDataFrame(
        rows, "surt string, seq long, digest string, url string"
    )
    df.coalesce(1).write.mode(mode).parquet(path)


def test_novelty_only_with_replay_guard(spark, tmp_path):
    src = str(tmp_path / "src")
    # batch 1: A and B appear
    _write_batch(
        spark, src,
        [("A", 1, "d1", "u/a"), ("B", 1, "e1", "u/b")],
        "overwrite",
    )
    # batch 2: A revisit (suppressed), B changes, C appears
    batch2 = [("A", 2, "d1", "u/a"), ("B", 2, "e2", "u/b2"),
              ("C", 1, "f1", "u/c")]
    _write_batch(spark, src, batch2, "append")
    # batch 3: exact replay of batch 2 (all suppressed by the seq guard)
    # plus a real change for A
    _write_batch(spark, src, batch2 + [("A", 3, "d2", "u/a3")], "append")

    q = run_capture_stream(
        spark, src, str(tmp_path / "ckpt"), str(tmp_path / "out")
    )
    q.awaitTermination(180)

    out = spark.read.parquet(str(tmp_path / "out"))
    rows = {(r["surt"], r["seq"]): (r["status"], r["digest"], r["n_seen"])
            for r in out.collect()}
    assert rows == {
        ("A", 1): ("added", "d1", 1),
        ("B", 1): ("added", "e1", 1),
        ("B", 2): ("changed", "e2", 2),
        ("C", 1): ("added", "f1", 1),
        # A's revisit at seq 2 advanced n_seen silently; change at seq 3
        ("A", 3): ("changed", "d2", 3),
    }
    # micro-batch separation actually happened
    assert out.select("epoch").distinct().count() >= 2


def test_null_first_digest_then_change_emits_changed(spark, tmp_path):
    """A key whose FIRST capture has a NULL digest must emit 'added'
    once and 'changed' (not 'added' again) when a real digest arrives —
    first-seen is tracked by n_seen, not by last_digest is None
    (ADVICE r04).  NULL->NULL is a revisit and stays silent."""
    src = str(tmp_path / "src")
    _write_batch(spark, src, [("N", 1, None, "u/n")], "overwrite")
    _write_batch(spark, src, [("N", 2, None, "u/n")], "append")  # revisit
    _write_batch(spark, src, [("N", 3, "d1", "u/n")], "append")
    _write_batch(spark, src, [("N", 4, None, "u/n")], "append")  # flips back

    q = run_capture_stream(
        spark, src, str(tmp_path / "ckpt"), str(tmp_path / "out")
    )
    q.awaitTermination(180)

    out = spark.read.parquet(str(tmp_path / "out"))
    rows = {r["seq"]: (r["status"], r["digest"], r["n_seen"])
            for r in out.collect()}
    assert rows == {
        1: ("added", None, 1),
        # seq 2 NULL revisit suppressed, n_seen advanced silently
        3: ("changed", "d1", 3),
        4: ("changed", None, 4),
    }


def test_stream_consistent_with_batch_rollup(spark, tmp_path):
    import datetime as dt

    from deepseek_ocr_rs_spark.operators.cdx import latest_captures

    # a capture log over real URLs: per key, digests run d1 d1 d2 d2 d1
    log = []
    for k in range(6):
        digests = ["d1", "d1", "d2", "d2", "d1"][: 2 + (k % 4)]
        for s, dg in enumerate(digests):
            log.append((f"http://s{k}.com/p", s + 1, f"{dg}-{k}"))
    src = str(tmp_path / "src")

    from deepseek_ocr_rs_spark.operators.cdx import surt_key_col

    raw = spark.createDataFrame(log, "url string, seq long, digest string")
    stream_in = raw.select(
        surt_key_col(F.col("url")).alias("surt"), "seq", "digest",
        F.col("url"),
    )
    stream_in.coalesce(1).write.parquet(src)

    q = run_capture_stream(
        spark, src, str(tmp_path / "ckpt"), str(tmp_path / "out")
    )
    q.awaitTermination(180)
    emitted = spark.read.parquet(str(tmp_path / "out"))

    # batch rollup over the same log
    batch = latest_captures(
        raw.select(
            "url",
            F.timestamp_seconds(F.col("seq")).alias("ts"),
            "digest",
        )
    )
    b = {r["surt"]: r for r in batch.collect()}
    last_emitted = {
        r["surt"]: r
        for r in emitted.withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy("surt").orderBy(F.desc("seq"))
            ),
        )
        .where("rn = 1")
        .collect()
    }
    assert set(last_emitted) == set(b)

    # expected emissions per key = digest RUNS in seq order (revisits
    # are silent), computed independently from the python-side log
    expected_runs: dict = {}
    by_key: dict = {}
    for url, seq, dg in sorted(log, key=lambda r: (r[0], r[1])):
        if by_key.get(url) != dg:
            expected_runs[url] = expected_runs.get(url, 0) + 1
            by_key[url] = dg
    emitted_counts = {
        r["surt"]: r["cnt"]
        for r in emitted.groupBy("surt").agg(F.count("*").alias("cnt")).collect()
    }
    for surt, r in last_emitted.items():
        # the last novelty row carries the batch view's latest digest
        assert r["digest"] == b[surt]["last_digest"], surt
        url = r["url"]
        assert emitted_counts[surt] == expected_runs[url], (surt, url)
