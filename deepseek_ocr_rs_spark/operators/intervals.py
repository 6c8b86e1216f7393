"""Bucketized point-in-interval join (the distributed range-join plan).

Spark has no native range-join optimization: a bare
``points JOIN intervals ON p BETWEEN s AND e`` with no equi-key compiles
to BroadcastNestedLoopJoin (all-pairs against every point) — fine for a
10-row dim, catastrophic for a large interval set.  The standard scale
plan (what Databricks' range-join hint and every stream-to-table
temporal join do under the hood) is time bucketization:

  * each point lands in exactly ONE bucket of width ``bucket``
    (floor(point / bucket));
  * each interval replicates to EVERY bucket it overlaps (a
    ``sequence`` + ``explode`` — cost proportional to
    interval_length / bucket, pick ``bucket`` ~ the median interval
    length);
  * the join becomes a plain hash equi-join on the bucket id followed by
    the exact range predicate.

Because a point owns exactly one bucket, each (point, interval) pair
meets at most once — no dedup pass is needed and the result is
row-for-row the theta join's.

Exactness discipline: bucket ids are exact integer floor-division of
``unix_micros`` (``(x - pmod(x, b)) div b`` — true floor for any sign,
no double rounding at any epoch), and the final comparison is on the
original columns, so the bucket width can never change the answer — a
property the tests pin by running the same join at several widths.

Reference analog: tile row-major bucketing of the image plane before
per-tile work (crates/infer-deepseek preprocess tiling) — same
replicate-to-overlapped-cells shape, one dimension instead of two.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_BKT = "_iv_bkt"


def _bucket_expr(df: DataFrame, col: str, bucket_us: int) -> Column:
    """Exact floor(value / bucket) as int64.  Timestamp columns are taken
    at microsecond precision; numeric columns are used as-is (then
    ``bucket_us`` is in the column's own units).  TIMESTAMP_NTZ is mapped
    to epoch micros in its own wall-clock space (timestampdiff from the
    NTZ epoch) — never through the session timezone, whose DST folds are
    non-monotone and could strand a point outside its interval's bucket
    range."""
    dtype = dict(df.dtypes).get(col)
    if dtype == "timestamp_ntz":
        base = (
            "timestampdiff(MICROSECOND, "
            f"TIMESTAMP_NTZ '1970-01-01 00:00:00', {col})"
        )
    elif dtype and dtype.startswith("timestamp"):
        base = f"unix_micros({col})"
    else:
        base = f"cast({col} as bigint)"
    return F.expr(
        f"({base} - pmod({base}, {bucket_us}L)) div {bucket_us}L"
    ).cast("long")


def interval_join(
    points: DataFrame,
    intervals: DataFrame,
    point_col: str,
    start_col: str,
    end_col: str,
    bucket: int = 21600,
    time_unit_us: int = 1_000_000,
) -> DataFrame:
    """Inner-join each point row to every interval row with
    ``start <= point < end`` (half-open), without a nested-loop plan.

    ``bucket`` is the bucket width in seconds for timestamp columns
    (``time_unit_us`` microseconds per unit; pass ``time_unit_us=1`` and
    numeric columns to bucket plain numbers).  Rows with NULL point or
    NULL bounds never match — identical to the theta join.  Intervals
    with ``end <= start`` are empty and match nothing.  Result columns:
    all point columns then all interval columns (names must not collide,
    as with any join)."""
    bucket_us = bucket * time_unit_us
    p = points.withColumn(_BKT, _bucket_expr(points, point_col, bucket_us))
    s_bkt = _bucket_expr(intervals, start_col, bucket_us)
    e_bkt = _bucket_expr(intervals, end_col, bucket_us)
    iv = intervals.where(
        F.col(end_col) > F.col(start_col)
    ).withColumn(_BKT, F.explode(F.sequence(s_bkt, e_bkt)))
    return (
        p.join(iv, _BKT)
        .where(
            (F.col(point_col) >= F.col(start_col))
            & (F.col(point_col) < F.col(end_col))
        )
        .drop(_BKT)
    )


def daily_window_intervals(
    spark_range_start: str = "2024-01-01",
    n_days: int = 30,
    open_hour: int = 10,
    close_hour: int = 16,
):
    """(interval_id, start_ts, end_ts) — one deterministic window per day
    (``[day+open_hour, day+close_hour)``), built by pure expressions (no
    driver loop).  Bounds are TIMESTAMP_NTZ to match the testdata's ts
    columns (no tz coercion anywhere in the join).  Returns a builder
    taking a SparkSession."""
    def build(spark) -> DataFrame:
        base = F.to_timestamp_ntz(F.lit(f"{spark_range_start} 00:00:00"))
        return (
            spark.range(n_days)
            .select(
                F.col("id").cast("int").alias("interval_id"),
                (
                    base + F.make_interval(days=F.col("id").cast("int"),
                                           hours=F.lit(open_hour))
                ).alias("start_ts"),
                (
                    base + F.make_interval(days=F.col("id").cast("int"),
                                           hours=F.lit(close_hour))
                ).alias("end_ts"),
            )
        )
    return build


def events_in_windows_oracle_sql(
    events_table: str = "events",
    range_start: str = "2024-01-01",
    n_days: int = 30,
    open_hour: int = 10,
    close_hour: int = 16,
) -> str:
    """DuckDB SQL replicating ``interval_join(events, daily windows)``:
    the NAIVE theta join — the oracle IS the quadratic form the operator
    must reproduce exactly."""
    return f"""
        WITH iv AS (
          SELECT CAST(i AS INTEGER) AS interval_id,
                 TIMESTAMP '{range_start} 00:00:00'
                   + CAST(i AS INTEGER) * INTERVAL 1 DAY
                   + {open_hour} * INTERVAL 1 HOUR AS start_ts,
                 TIMESTAMP '{range_start} 00:00:00'
                   + CAST(i AS INTEGER) * INTERVAL 1 DAY
                   + {close_hour} * INTERVAL 1 HOUR AS end_ts
          FROM UNNEST(range(0, {n_days})) AS u(i)
        )
        SELECT e.event_id, iv.interval_id
        FROM {events_table} e
        JOIN iv ON e.ts >= iv.start_ts AND e.ts < iv.end_ts
    """
