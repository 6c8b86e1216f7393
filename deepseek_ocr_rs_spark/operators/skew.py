"""Hot-key (skew) defenses: salted joins and co-located bucketed joins.

SURVEY §4 notes the reference has no skew handling to port — its only
load-balancing pattern is MoE expert dispatch
(crates/infer-deepseek/src/transformer/block.rs:1215-1301), which SURVEY
maps to salted repartitioning.  The extraction pipeline already salts its
input shuffle (plans/pipeline.py); this module provides the *join* leg:

* ``salted_join`` — for an equi-join whose key distribution is hot (a few
  values hold most rows: low-cardinality keys, boilerplate duplicates,
  null-ish ids) and whose small side is still too big to broadcast.  The
  big side gets a deterministic per-row salt in [0, n_salts); the small
  side is replicated once per salt value; the join runs on
  (key, salt), so one hot key spreads over n_salts reducers instead of
  melting one task.  Result is exactly the plain join (every big row sees
  the full small-side group for its key).

* ``write_bucketed`` / co-located reads — when the SAME key joins again
  and again (fact-to-fact at 100 TB), pre-bucketing both sides by the key
  lets Spark's bucketed scan skip the exchange entirely; see
  tests/test_skew_bucketing.py for the no-Exchange plan assertion.

AQE's skew-join split (spark.sql.adaptive.skewJoin.enabled) handles
*discovered* skew at runtime for sort-merge joins; ``salted_join`` is the
explicit, planner-independent defense for *known-hot* keys and for
broadcast-ineligible dimension sides.
"""

from __future__ import annotations

from typing import List, Optional, Sequence, Union

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_SALT = "_skew_salt"


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: Union[str, Sequence[str]],
    n_salts: int = 16,
    how: str = "inner",
    row_key: Optional[Union[str, Sequence[str]]] = None,
) -> DataFrame:
    """Skew-defused equi-join of ``big`` against ``small`` on ``on``.

    The salt is deterministic per row (retry/partitioning-safe, no
    nondeterministic rand()) and uniform enough to spread a hot key.  The
    small side explodes into all n_salts values, so each (key, salt)
    bucket holds the complete small-side group: the join result is
    row-for-row identical to the unsalted join.  Cost: small side is
    materialized n_salts times — size the salt count to
    (hot-key rows / target task size), not higher.

    ``row_key`` names the column(s) whose hash drives the salt.  Pass a
    unique per-row id (file/offset, event_id, monotonically-increasing id)
    when the hot key's rows may be *exact duplicates*: the default salts
    by a hash of ALL big-side columns, so identical rows always draw the
    same salt and a hot key made of boilerplate duplicate rows would still
    land on a single (key, salt) reducer — correct but un-spread.  With a
    unique row_key the spread is uniform regardless of content duplication.

    ``how`` supports 'inner' and 'left' (every big row carries a salt and
    the small side covers all salts, so left semantics are preserved)."""
    if how not in ("inner", "left", "left_outer"):
        raise ValueError(f"salted_join supports inner/left, got {how!r}")
    keys: List[str] = [on] if isinstance(on, str) else list(on)
    if row_key is None:
        salt_cols = [F.col(c) for c in big.columns]
    else:
        names = [row_key] if isinstance(row_key, str) else list(row_key)
        salt_cols = [F.col(c) for c in names]
    salt = F.pmod(F.hash(*salt_cols), F.lit(n_salts))
    b = big.withColumn(_SALT, salt)
    s = small.withColumn(
        _SALT, F.explode(F.array(*[F.lit(i) for i in range(n_salts)]))
    )
    return b.join(s, keys + [_SALT], how).drop(_SALT)


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_col: str,
    n_buckets: int = 8,
    sort_col: Optional[str] = None,
) -> None:
    """Persist ``df`` as a bucketed table so future joins/aggregations on
    ``bucket_col`` read pre-partitioned data and skip the exchange — the
    batch analog of co-locating a fact table with its hottest join key.
    (saveAsTable is required: bucket metadata lives in the catalog.)"""
    w = df.write.mode("overwrite").bucketBy(n_buckets, bucket_col)
    if sort_col is not None:
        w = w.sortBy(sort_col)
    w.format("parquet").saveAsTable(table)
