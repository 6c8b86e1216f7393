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
