"""session_stats (F.session_window sessionization) unit tests.

The gate checks it against the gaps-and-islands DuckDB oracle at two
SFs; these tests pin the SEMANTIC edges the synthetic data may never
hit: the exact-gap boundary (>= gap opens a new session), microsecond
boundary discipline, multi-key independence, and the plan shape (one
exchange, no self-join).
"""

import datetime as dt

import pytest

from deepseek_ocr_rs_spark.operators.sessions import (
    session_stats,
    session_stats_oracle_sql,
)

T0 = dt.datetime(2024, 1, 1, 0, 0, 0)


def _ev(spark, rows):
    return spark.createDataFrame(
        [(i, t, u, float(v)) for i, (t, u, v) in enumerate(rows)],
        "event_id long, ts timestamp, user_id long, value double",
    )


def _collect(df):
    return sorted(
        (r.user_id, r.session_start, r.session_end, r.n_events, r.value_sum)
        for r in df.collect()
    )


def test_exact_gap_boundary_merges_strictly_greater_splits(spark):
    # Spark's session coalescing is touch-INCLUSIVE: an event at exactly
    # t0+gap merges into the running session; one microsecond beyond
    # splits.  (First observed live — the docstring and oracle encode
    # this, so the test pins it against the engine.)
    df = _ev(
        spark,
        [
            (T0, 1, 10.0),
            (T0 + dt.timedelta(seconds=1800), 1, 20.0),
            (T0, 2, 5.0),
            (T0 + dt.timedelta(seconds=1800, microseconds=1), 2, 5.0),
        ],
    )
    out = _collect(session_stats(df, gap_seconds=1800))
    base = int(T0.replace(tzinfo=dt.timezone.utc).timestamp())
    assert out == [
        # user 1: exact-boundary event merges -> ONE session
        (1, base, base + 3600, 2, 30.0),
        # user 2: 1 us beyond -> TWO sessions
        (2, base, base + 1800, 1, 5.0),
        (2, base + 1800, base + 3600, 1, 5.0),
    ]


def test_chained_extension_beyond_single_gap(spark):
    # each event lands inside the previous event's gap, so one session
    # stretches over 3x the gap — the property a fixed tumbling window
    # cannot express
    rows = [(T0 + dt.timedelta(seconds=1700 * i), 7, 1.0) for i in range(4)]
    out = _collect(session_stats(_ev(spark, rows), gap_seconds=1800))
    base = int(T0.replace(tzinfo=dt.timezone.utc).timestamp())
    assert out == [(7, base, base + 3 * 1700 + 1800, 4, 4.0)]


def test_oracle_parity_on_adversarial_fixture(spark):
    import duckdb

    rows = []
    # per-user random-ish but deterministic gaps straddling the boundary
    for u in range(5):
        t = T0
        for i in range(40):
            step = [1, 1799, 1800, 1801, 3600][(i + u) % 5]
            t = t + dt.timedelta(seconds=step, microseconds=(i * 137) % 1000)
            rows.append((t, u, (i % 7) * 0.25))
    df = _ev(spark, rows)
    got = _collect(session_stats(df, gap_seconds=1800))

    con = duckdb.connect()
    con.execute(
        "CREATE TABLE events (event_id BIGINT, ts TIMESTAMP,"
        " user_id BIGINT, value DOUBLE)"
    )
    con.executemany(
        "INSERT INTO events VALUES (?, ?, ?, ?)",
        [(i, t, u, float(v)) for i, (t, u, v) in enumerate(rows)],
    )
    want = sorted(
        tuple(r)
        for r in con.sql(
            "SELECT user_id, session_start, session_end, n_events, value_sum"
            f" FROM ({session_stats_oracle_sql()})"
        ).fetchall()
    )
    assert got == want


def test_plan_single_exchange_no_join(spark):
    df = _ev(spark, [(T0, 1, 1.0)])
    plan = (
        session_stats(df, gap_seconds=1800)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Join" not in plan
    assert plan.count("Exchange hashpartitioning") == 1


def test_rejects_nonpositive_gap(spark):
    with pytest.raises(ValueError):
        session_stats(_ev(spark, [(T0, 1, 1.0)]), gap_seconds=0)


def test_streaming_matches_batch_and_drops_late(spark, tmp_path):
    """The SAME session_stats expression under readStream: append mode
    emits a session exactly once when the watermark passes its end, the
    emitted rows equal the batch operator over the same events, and an
    event arriving AFTER its session was emitted is dropped instead of
    rewriting the committed row.  (Probed live: while a session is
    still in state, a below-watermark row MERGES — Spark session
    windows do not pre-filter late input; eviction lags one batch
    because the watermark used in batch N derives from batch N-1's max
    event time.  The committed-output guarantee is post-emission.)"""
    import os
    import time as _time

    from pyspark.sql import functions as F

    from deepseek_ocr_rs_spark.streaming.stream import (
        streaming_session_stats,
    )

    src = str(tmp_path / "events")
    os.makedirs(src)

    def write_file(rows):
        df = spark.createDataFrame(
            rows, "event_id long, ts_str string, user_id long, value double"
        ).select(
            "event_id",
            F.to_timestamp("ts_str").alias("ts"),
            "user_id",
            "value",
        )
        df.coalesce(1).write.mode("append").parquet(src)
        _time.sleep(1.1)  # distinct mod times -> deterministic file order

    early = [
        (1, "2024-01-01 10:00:00", 1, 1.0),
        (2, "2024-01-01 10:10:00", 1, 2.0),
        (3, "2024-01-01 10:05:00", 2, 5.0),
    ]
    write_file(early)
    # far-future event: advances the watermark past every early session
    write_file([(4, "2024-01-01 20:00:00", 3, 1.0)])
    # this batch runs WITH watermark 19:30 and therefore EMITS the two
    # early sessions (eviction uses the previous batch's max event time)
    write_file([(5, "2024-01-01 20:30:00", 3, 1.0)])
    # late event AFTER emission: must be dropped, never rewriting the
    # committed session; the companion event keeps the watermark moving
    write_file([
        (6, "2024-01-01 10:20:00", 1, 99.0),
        (7, "2024-01-01 21:00:00", 3, 1.0),
    ])

    q = streaming_session_stats(
        spark, src, str(tmp_path / "ckpt"), gap_seconds=1800,
        watermark="30 minutes", query_name="sess_stream_test",
    )
    q.awaitTermination(180)

    got = sorted(
        tuple(r) for r in spark.sql("SELECT * FROM sess_stream_test").collect()
    )

    # batch reference over ONLY the pre-watermark events (the late row 6
    # is dropped by the stream; user 3's session is still open)
    from deepseek_ocr_rs_spark.operators.sessions import session_stats

    batch = spark.createDataFrame(
        [(i, t, u, v) for (i, t, u, v) in early],
        "event_id long, ts_str string, user_id long, value double",
    )
    from pyspark.sql import functions as F

    batch = batch.select(
        "event_id", F.to_timestamp("ts_str").alias("ts"), "user_id", "value"
    )
    want = sorted(
        tuple(r) for r in session_stats(batch, gap_seconds=1800).collect()
    )
    assert got == want
    assert len(got) == 2  # user 1 (2 events) + user 2; user 3 still open
