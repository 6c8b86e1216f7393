"""Native session windows: ``F.session_window`` sessionization + rollup.

The batch twin of the streaming sessionizer: the repo already has a
gaps-and-islands form (``w_sessionize`` — lag + flag + running sum, three
window passes), but Spark's own ``session_window`` grouping expression is
the form that carries over verbatim to Structured Streaming (the same
expression works under ``readStream`` + watermark, where the
gaps-and-islands window trick is unavailable because lag() over an
unbounded stream is not expressible).  Reference analog: the per-request
turn grouping with an inactivity cutoff in the server's conversation
handling (crates/server/src/generation.rs:200-244) — re-expressed as the
engine-native declarative grouping.

Semantics (replicated exactly by :func:`session_stats_oracle_sql`):

* a session is a maximal run of a key's events where each event starts
  at most ``gap`` after the previous one — an event at EXACTLY
  ``prev + gap`` MERGES into the running session (Spark's session merge
  is touch-inclusive: windows with ``start <= current_end`` coalesce;
  pinned by tests/test_sessions.py against the live engine);
* ``session_start`` = first event ts, ``session_end`` = last event ts +
  ``gap`` (Spark's half-open ``[start, last+gap)`` window), both emitted
  as floored epoch SECONDS (integer, engine-agnostic);
* the boundary comparison is done in exact integer MICROSECONDS on both
  engines (Spark timestamps are micros natively; the oracle uses
  ``epoch_us``), so a gap within 1 us of the cutoff cannot hash-drift.

Scale shape (100 TB): ONE hash exchange on the session key + a local
sort per partition; Spark plans session_window aggregation as
UpdatingSessionsIterator over the sorted partition — no self-join, no
second shuffle, and map-side partial aggregation still applies to the
rollup.  Skewed keys (one user with millions of events) cost a large
local sort, not a cross-partition explosion.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["session_stats", "session_stats_oracle_sql"]


def session_stats(
    events: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    gap_seconds: int = 1800,
) -> DataFrame:
    """Per-(key, session) rollup via the native session_window grouping.

    Returns ``(key, session_start, session_end, n_events, value_sum)``
    with epoch-second integer bounds and the house 2dp money rounding
    (``floor(x*100 + 0.5)/100`` — engine-round diverges on half-grid
    doubles).
    """
    if gap_seconds <= 0:
        raise ValueError(f"gap_seconds must be positive, got {gap_seconds}")
    from pyspark.sql import types as T

    # parquet timestamps load as TIMESTAMP_NTZ in Spark 4; cast is
    # identity under the UTC session and lets unix_timestamp apply.
    # The cast must be CONDITIONAL: casting an already-TimestampType
    # column builds a new expression without the event-time watermark
    # tag, which breaks the streaming append-mode path (caught live by
    # test_streaming_matches_batch_and_drops_late).
    ts = F.col(ts_col)
    if not isinstance(events.schema[ts_col].dataType, T.TimestampType):
        ts = ts.cast("timestamp")
    ev = events.select(
        F.col(key_col).alias("_key"),
        ts.alias("_ts"),
        F.col(value_col).alias("_val"),
    )
    return (
        ev.groupBy(
            "_key", F.session_window("_ts", f"{gap_seconds} seconds")
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("_val").alias("_vs"),
        )
        .select(
            F.col("_key").alias(key_col),
            F.unix_timestamp(F.col("session_window.start")).alias(
                "session_start"
            ),
            F.unix_timestamp(F.col("session_window.end")).alias(
                "session_end"
            ),
            "n_events",
            (
                F.floor(F.col("_vs") * 100 + F.lit(0.5)) / 100
            ).alias("value_sum"),
        )
    )


def session_stats_oracle_sql(
    table: str = "events",
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    order_tiebreak: str = "event_id",
    gap_seconds: int = 1800,
) -> str:
    """DuckDB gaps-and-islands replica of :func:`session_stats`.

    The island flag uses ``epoch_us`` (exact integer micros) and the
    same strictly-greater new-session rule (a gap of EXACTLY
    ``gap_seconds`` merges — Spark's touch-inclusive session coalescing);
    bounds floor to epoch seconds via integer division.  The tiebreak
    column only stabilizes the running sum's ORDER BY — island
    membership depends on ts alone.
    """
    gap_us = gap_seconds * 1_000_000
    return f"""
WITH o AS (
  SELECT {key_col} AS k, {ts_col} AS ts, {value_col} AS v, {order_tiebreak} AS tb,
         lag({ts_col}) OVER (PARTITION BY {key_col}
                             ORDER BY {ts_col}, {order_tiebreak}) AS pts
  FROM {table}
), f AS (
  SELECT k, ts, v, tb,
         CASE WHEN pts IS NULL
                OR epoch_us(ts) - epoch_us(pts) > {gap_us}
              THEN 1 ELSE 0 END AS new_s
  FROM o
), s AS (
  SELECT k, ts, v,
         SUM(new_s) OVER (PARTITION BY k ORDER BY ts, tb
                          ROWS UNBOUNDED PRECEDING) AS sid
  FROM f
)
SELECT k AS {key_col},
       epoch_us(min(ts)) // 1000000 AS session_start,
       epoch_us(max(ts)) // 1000000 + {gap_seconds} AS session_end,
       count(*) AS n_events,
       floor(sum(v) * 100 + 0.5) / 100 AS value_sum
FROM s
GROUP BY k, sid
""".strip()
