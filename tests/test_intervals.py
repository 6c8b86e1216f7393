"""Bucketized point-in-interval join: exactness vs the naive theta join.

Pins the three properties that make operators/intervals.py safe to run at
100 TB:

  * row-for-row equality with the theta join at SEVERAL bucket widths
    (the width is a performance knob, never a correctness knob);
  * NULLs and empty intervals behave exactly like the theta join;
  * the physical plan is a hash equi-join on the bucket id — never
    BroadcastNestedLoopJoin (the plan Spark picks for a bare BETWEEN
    join, which is all-pairs and melts at scale).

Reference analog: tile bucketing before per-tile work
(crates/infer-deepseek preprocess tiling) — replicate-to-overlapped-cells
in one dimension.
"""
import datetime as dt

import pytest

from deepseek_ocr_rs_spark.operators.intervals import (
    daily_window_intervals,
    interval_join,
)


def _theta(points, intervals, pc, sc, ec):
    from pyspark.sql import functions as F

    return points.join(
        intervals,
        (points[pc] >= intervals[sc]) & (points[pc] < intervals[ec]),
    )


def _rows(df, cols):
    return sorted(tuple(r[c] for c in cols) for r in df.collect())


@pytest.fixture(scope="module")
def ts_points(spark):
    # 500 deterministic NTZ timestamps spread over ~40 days, including
    # exact window-boundary instants (>= start inclusive, < end exclusive)
    # and NULLs.
    from pyspark.sql import functions as F

    base = dt.datetime(2024, 1, 1)
    rows = []
    for i in range(500):
        t = base + dt.timedelta(minutes=117 * i)
        rows.append((i, t))
    # boundary hits: exactly open and exactly close of day 3
    rows.append((1000, dt.datetime(2024, 1, 4, 10, 0, 0)))
    rows.append((1001, dt.datetime(2024, 1, 4, 16, 0, 0)))
    rows.append((1002, None))
    df = spark.createDataFrame(rows, "pid int, ts timestamp")
    return df.select("pid", F.col("ts").cast("timestamp_ntz").alias("ts"))


@pytest.mark.parametrize("bucket", [3600, 21600, 86400, 7 * 86400])
def test_width_never_changes_answer(spark, ts_points, bucket):
    iv = daily_window_intervals("2024-01-01", 35, 10, 16)(spark)
    got = interval_join(ts_points, iv, "ts", "start_ts", "end_ts",
                        bucket=bucket)
    want = _theta(ts_points, iv, "ts", "start_ts", "end_ts")
    cols = ["pid", "interval_id"]
    g, w = _rows(got, cols), _rows(want, cols)
    assert len(w) > 0, "fixture must be non-vacuous"
    assert g == w


def test_boundaries_null_and_empty_intervals(spark, ts_points):
    from pyspark.sql import functions as F

    iv = daily_window_intervals("2024-01-01", 35, 10, 16)(spark)
    # append an empty interval (end == start) and a NULL-bounded one
    extra = spark.createDataFrame(
        [(900, "2024-01-05 10:00:00", "2024-01-05 10:00:00"),
         (901, None, "2024-01-05 16:00:00")],
        "interval_id int, s string, e string",
    ).select(
        "interval_id",
        F.to_timestamp_ntz("s").alias("start_ts"),
        F.to_timestamp_ntz("e").alias("end_ts"),
    )
    iv2 = iv.unionByName(extra)
    got = _rows(
        interval_join(ts_points, iv2, "ts", "start_ts", "end_ts"),
        ["pid", "interval_id"],
    )
    want = _rows(_theta(ts_points, iv2, "ts", "start_ts", "end_ts"),
                 ["pid", "interval_id"])
    assert got == want
    pids = {p for p, _ in got}
    assert 1000 in pids and 1001 not in pids  # half-open [start, end)
    assert 1002 not in pids                    # NULL point never matches
    assert all(i != 900 and i != 901 for _, i in got)


def test_numeric_mode(spark):
    # plain-number intervals with time_unit_us=1: bucket is in the
    # column's own units
    pts = spark.range(0, 1000).withColumnRenamed("id", "x")
    iv = spark.createDataFrame(
        [(0, 10, 25), (1, 20, 20), (2, 990, 2000), (3, -5, 3)],
        "interval_id int, lo long, hi long",
    )
    got = _rows(interval_join(pts, iv, "x", "lo", "hi",
                              bucket=7, time_unit_us=1),
                ["x", "interval_id"])
    want = _rows(_theta(pts, iv, "x", "lo", "hi"), ["x", "interval_id"])
    assert got == want
    assert (0, 3) in got and (990, 2) in got and (20, 1) not in got


def test_plan_is_hash_equi_join_not_nested_loop(spark, ts_points):
    iv = daily_window_intervals("2024-01-01", 35, 10, 16)(spark)
    plan = interval_join(
        ts_points, iv, "ts", "start_ts", "end_ts"
    )._jdf.queryExecution().executedPlan().toString()
    assert "NestedLoop" not in plan, plan
    assert "HashJoin" in plan, plan
