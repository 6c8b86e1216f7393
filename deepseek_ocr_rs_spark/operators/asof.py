"""As-of (temporal) join: attach the nearest right-side row per left row.

The reference pairs each generation request with the most recent completed
prefill state rather than an exact key match (run pairing,
crates/server/src/generation.rs:246-268 — the engine-analog of joining a
fact row to the latest dimension version at its timestamp).  Classic
engines special-case this as ASOF JOIN (DuckDB/kdb); Spark has no builtin,
so this implements the scalable union-and-window form:

  tag left rows side=1 and right rows side=0, union them, and take
  ``last(right_attrs, ignorenulls)`` over a window partitioned by the join
  keys ordered by (ts, side) — right rows at the same timestamp sort
  before left rows, giving INCLUSIVE backward semantics.

Why this shape at 100 TB: ONE shuffle of left+right on the join keys (the
same cost as any equi-join repartition), no range-explosion (a naive
``l.ts >= r.ts`` theta-join is quadratic per key), no per-key driver work,
and skewed keys can reuse the standard salting defenses.  The right side's
attributes ride the window as a single struct so a NULL attribute value is
still a valid match (the struct itself is the non-null marker).
"""

from __future__ import annotations

from typing import List, Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_SIDE = "_asof_side"
_TS = "_asof_ts"
_PAYLOAD = "_asof_payload"


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    left_ts: str = "ts",
    right_ts: str = "ts",
    right_cols: Sequence[str] = ("value",),
    direction: str = "backward",
    strict: bool = False,
) -> DataFrame:
    """For each left row, the latest right row with ``r.ts <= l.ts``
    (direction='backward'; '<' when strict) or the earliest with
    ``r.ts >= l.ts`` (direction='forward'; '>' when strict).

    Right-side duplicates at the same (keys, ts) must be resolved upstream
    (e.g. groupBy keys+ts) — like DuckDB's ASOF JOIN, the winner among
    exact-duplicate timestamps is otherwise unspecified.

    Returns all left columns plus ``right_cols`` (NULL when no match).
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"unknown direction: {direction}")
    on = list(on)
    overlap = set(right_cols) & set(left.columns)
    if overlap:
        raise ValueError(f"right_cols collide with left columns: {overlap}")

    l_tagged = left.withColumn(_TS, F.col(left_ts)).withColumn(
        _PAYLOAD, F.lit(None).cast(
            right.select(
                F.struct(*[F.col(c) for c in right_cols]).alias("s")
            ).schema["s"].dataType
        )
    )
    # a NULL right timestamp can never satisfy any as-of comparison (ASOF
    # semantics: NULL >= / <= is never true) — drop such rows up front,
    # otherwise they'd sort FIRST in the ascending window and backward
    # left rows would silently match them
    r_tagged = right.where(F.col(right_ts).isNotNull()).select(
        *on,
        F.col(right_ts).alias(_TS),
        F.struct(*[F.col(c) for c in right_cols]).alias(_PAYLOAD),
    )
    left_types = {f.name: f.dataType for f in left.schema.fields}
    for c in left.columns:
        if c not in r_tagged.columns:
            r_tagged = r_tagged.withColumn(
                c, F.lit(None).cast(left_types[c])
            )

    # side ordering encodes inclusivity: backward-inclusive wants right
    # rows at ts T visible to left rows at T -> right sorts first (side 0);
    # strict flips the tie so same-ts right rows are NOT visible
    if direction == "backward":
        l_side, r_side = (1, 0) if not strict else (0, 1)
    else:
        l_side, r_side = (0, 1) if not strict else (1, 0)
    l_tagged = l_tagged.withColumn(_SIDE, F.lit(l_side))
    r_tagged = r_tagged.withColumn(_SIDE, F.lit(r_side))

    u = l_tagged.unionByName(r_tagged.select(l_tagged.columns))

    if direction == "backward":
        w = (
            Window.partitionBy(*on)
            .orderBy(F.col(_TS).asc(), F.col(_SIDE).asc())
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        matched = F.last(_PAYLOAD, ignorenulls=True).over(w)
    else:
        w = (
            Window.partitionBy(*on)
            .orderBy(F.col(_TS).asc(), F.col(_SIDE).asc())
            .rowsBetween(Window.currentRow, Window.unboundedFollowing)
        )
        matched = F.first(_PAYLOAD, ignorenulls=True).over(w)

    out = (
        u.withColumn(_PAYLOAD, matched)
        .where(F.col(_SIDE) == l_side)
        .select(
            *left.columns,
            *[F.col(f"{_PAYLOAD}.{c}").alias(c) for c in right_cols],
        )
    )
    return out
