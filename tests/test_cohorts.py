"""Weekly cohort retention matrix (operators/cohorts.py)."""

from datetime import datetime

import duckdb
import pandas as pd

from deepseek_ocr_rs_spark.operators.cohorts import (
    retention_cohorts,
    retention_cohorts_oracle_sql,
)


def _events(spark, rows):
    return spark.createDataFrame(rows, "user_id long, ts timestamp")


def _matrix(spark, rows):
    out = retention_cohorts(_events(spark, rows)).collect()
    # cohort_week is a midnight timestamp (pandas-dtype alignment with the
    # DuckDB oracle's DATE); key the matrix on the date part
    return {
        (str(r.cohort_week)[:10], r.week_offset): (r.n_users, r.retention_bp)
        for r in out
    }


def test_hand_built_matrix(spark):
    # cohort A (week of Jan 1): users 1,2,3; user 3 churns after week 0;
    # user 2 skips week 1 and returns week 2 (resurrection counts)
    # cohort B (week of Jan 8): user 4 only
    rows = [
        (1, datetime(2024, 1, 1)), (1, datetime(2024, 1, 9)),
        (1, datetime(2024, 1, 16)),
        (2, datetime(2024, 1, 2)), (2, datetime(2024, 1, 17)),
        (3, datetime(2024, 1, 3)),
        (4, datetime(2024, 1, 10)), (4, datetime(2024, 1, 15)),
    ]
    got = _matrix(spark, rows)
    assert got == {
        ("2024-01-01", 0): (3, 10000),
        ("2024-01-01", 1): (1, 3333),
        ("2024-01-01", 2): (2, 6666),
        ("2024-01-08", 0): (1, 10000),
        ("2024-01-08", 1): (1, 10000),
    }


def test_week_zero_is_always_full(spark):
    # first-event semantics: every cohort member is active in week 0
    rows = [
        (u, datetime(2024, 1, 1 + (u % 3) * 7)) for u in range(30)
    ] + [(u, datetime(2024, 2, 5)) for u in range(0, 30, 2)]
    out = retention_cohorts(_events(spark, rows)).collect()
    for r in out:
        if r.week_offset == 0:
            assert r.retention_bp == 10000


def test_same_week_multiple_events_count_once(spark):
    rows = [
        (1, datetime(2024, 1, 1)), (1, datetime(2024, 1, 3)),
        (1, datetime(2024, 1, 5)),
    ]
    got = _matrix(spark, rows)
    assert got == {("2024-01-01", 0): (1, 10000)}


def test_null_users_dropped(spark):
    rows = [(None, datetime(2024, 1, 1)), (1, datetime(2024, 1, 2))]
    got = _matrix(spark, rows)
    assert got == {("2024-01-01", 0): (1, 10000)}


def test_oracle_parity_and_partitioning(spark, tmp_path):
    rows = [
        (u % 17, datetime(2024, 1, 1 + (u % 23), 8 + u % 12))
        for u in range(400)
    ]
    path = str(tmp_path / "ev.parquet")
    _events(spark, rows).write.parquet(path)
    df = spark.read.parquet(path)
    a = (
        retention_cohorts(df.coalesce(1)).toPandas()
        .sort_values(["cohort_week", "week_offset"]).reset_index(drop=True)
    )
    b = (
        retention_cohorts(df.repartition(13)).toPandas()
        .sort_values(["cohort_week", "week_offset"]).reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(a, b)
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW rc_ev AS SELECT * FROM parquet_scan('{path}/*.parquet')"
    )
    want = (
        con.execute(retention_cohorts_oracle_sql("rc_ev")).df()
        .sort_values(["cohort_week", "week_offset"]).reset_index(drop=True)
    )
    a["cohort_week"] = a["cohort_week"].astype(str)
    want["cohort_week"] = want["cohort_week"].astype(str)
    pd.testing.assert_frame_equal(
        a,
        want.astype(
            {c: "int64" for c in ["week_offset", "n_users", "retention_bp"]}
        ),
    )
