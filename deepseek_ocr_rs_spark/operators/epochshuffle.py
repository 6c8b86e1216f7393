"""Deterministic epoch shuffling: a Feistel format-preserving permutation.

The production question: a 100 TB training corpus needs a DIFFERENT
pseudorandom document order every epoch, and every reader (1000
executors, restarts, stragglers) must agree on it WITHOUT materializing
a permutation table.  The naive answers both fail at scale:

* ``ORDER BY rand()`` — a full global sort of the corpus per epoch, and
  nondeterministic across retries (Spark recomputes lost partitions, the
  rand() draw changes, two readers disagree);
* a materialized ``(id, position)`` table — an extra 100 TB-scale join
  per epoch and a single giant shuffle to build it.

The standard fix (the index-shuffle used by large-scale training
dataloaders, and the classic cycle-walking FPE construction of
Black-Rogaway 2002 "Ciphers with Arbitrary Finite Domains") is a keyed
BIJECTION on the id domain: ``shuffle_key = feistel(seed, epoch, id)``
is a pure O(1) projection — ZERO shuffles, no state, retry-stable,
identical on every reader — and ordering by it IS the epoch's
permutation.  Readers that need physical order sort only their own
shard-local slice; the global permutation itself is never materialized.

Construction (balanced Feistel over the padded domain):

* domain = [0, 2^(2b)) with the smallest b such that 2^(2b) > max(id)
  (b <= 31 so every intermediate product stays inside int64);
* split id into b-bit halves (L, R); ``rounds`` times:
  ``L, R = R, L xor Fk(R)`` with the round function
  ``Fk(x) = ((x * 2654435761 + k) AND mask) xor (x >> 3)``
  (Knuth's multiplicative constant; k derives from seed, epoch, round);
* key = (L << b) | R.  A Feistel network is bijective for ANY round
  function, so keys are distinct iff ids are distinct — bijectivity is
  structural, not statistical, and the pytest gate asserts it.

Ids need not be dense: the permutation is over the padded domain and
restricts to any subset injectively.  Every operation is integer-exact
two's-complement arithmetic, so the DuckDB oracle replicates the keys
bit-for-bit (no float, no hash-library dependence).

100 TB posture: the only non-projection work is ONE 1-row aggregate
(max id -> domain width) broadcast back; epochs explode row-locally.
Compare: rand() ordering costs a terabyte-scale sort PER EPOCH.
Reference analog: the repo-wide determinism discipline
(benchsuite/orchestrator.py:456-521 strict equality gate) — a shuffle
that survives retries must be a pure function of (seed, epoch, id).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Knuth multiplicative hash constant (2654435761 = floor(2^32/phi)).
_MULT = 2654435761
_KEY_MASK = 2147483647  # round keys clamped below 2^31: products fit int64


def _round_key(seed: int, epoch_col: Column, rnd: int) -> Column:
    """Per-(seed, epoch, round) key, < 2^31 so x*_MULT + k fits int64."""
    return (
        F.lit(seed * 1000003).cast("long")
        + epoch_col.cast("long") * F.lit(40503)
        + F.lit(rnd * 1299709)
    ).bitwiseAND(F.lit(_KEY_MASK))


def epoch_shuffle(
    df: DataFrame,
    id_col: str = "doc_id",
    n_epochs: int = 3,
    seed: int = 1337,
    rounds: int = 4,
    n_shards: int = 16,
) -> DataFrame:
    """One row per (id, epoch): the Feistel shuffle key and shard route.

    Output: (id, epoch, shuffle_key, shard) with
    ``shard = shuffle_key mod n_shards`` — the deterministic
    reader-routing that replaces a physical repartition: epoch e's
    reader s scans ``shard = s`` and sorts its slice by shuffle_key
    locally.  shuffle_key is a bijection of id for every epoch
    (distinct ids -> distinct keys, pinned by tests/test_epochshuffle).
    """
    # Domain width from ONE scalar aggregate (broadcast 1-row join —
    # the established bounded-collect-free pattern).  b = ceil(bits/2),
    # clamped to [1, 31]; 2b bits always cover max(id).
    dom = df.agg(F.max(F.col(id_col)).cast("long").alias("_maxid")).select(
        F.least(
            F.greatest(
                F.expr(
                    "(length(bin(greatest(_maxid, 1))) + 1) div 2"
                ).cast("int"),
                F.lit(1),
            ),
            F.lit(31),
        ).alias("_b")
    ).select(
        "_b",
        F.expr("shiftleft(cast(1 as bigint), _b)").alias("_p2b"),
        (F.expr("shiftleft(cast(1 as bigint), _b)") - 1).alias("_mask"),
    )

    epochs = F.explode(
        F.array(*[F.lit(e) for e in range(n_epochs)])
    ).alias("epoch")
    base = (
        df.select(F.col(id_col).cast("long").alias(id_col))
        .crossJoin(F.broadcast(dom))
        .select(id_col, "_p2b", "_mask", epochs)
    )

    # Balanced Feistel: data-dependent half-width b means the halves
    # split with div/pmod on the broadcast 2^b (shiftleft needs a
    # foldable shift amount; multiply/divide by 2^b is the same op).
    left = F.expr(f"{id_col} div _p2b").cast("long")
    right = F.pmod(F.col(id_col), F.col("_p2b"))
    cur = base.select(
        id_col, "epoch", "_p2b", "_mask",
        left.alias("_l"), right.alias("_r"),
    )
    for rnd in range(1, rounds + 1):
        k = _round_key(seed, F.col("epoch"), rnd)
        fx = (
            (F.col("_r") * F.lit(_MULT) + k).bitwiseAND(F.col("_mask"))
        ).bitwiseXOR(F.shiftright(F.col("_r"), 3))
        cur = cur.select(
            id_col, "epoch", "_p2b", "_mask",
            F.col("_r").alias("_l"),
            F.col("_l").bitwiseXOR(fx).alias("_r"),
        )
    return cur.select(
        F.col(id_col).cast("long").alias(id_col),
        F.col("epoch").cast("long").alias("epoch"),
        (F.col("_l") * F.col("_p2b") + F.col("_r")).cast("long").alias(
            "shuffle_key"
        ),
        F.pmod(
            F.col("_l") * F.col("_p2b") + F.col("_r"), F.lit(n_shards)
        ).cast("long").alias("shard"),
    )


def epoch_shuffle_oracle_sql(
    table: str,
    id_col: str = "doc_id",
    n_epochs: int = 3,
    seed: int = 1337,
    rounds: int = 4,
    n_shards: int = 16,
) -> str:
    """DuckDB SQL replicating ``epoch_shuffle`` bit-for-bit (same
    Feistel rounds, same integer arithmetic, same shard pmod)."""
    epoch_values = ", ".join(f"({e})" for e in range(n_epochs))
    prev = "es_r0"
    round_ctes = []
    for rnd in range(1, rounds + 1):
        cte = f"es_r{rnd}"
        round_ctes.append(
            f"""{cte} AS (
          SELECT {id_col}, epoch, p2b, mask,
                 r AS l,
                 xor(l, xor((r * {_MULT} + (({seed} * 1000003
                        + epoch * 40503 + {rnd} * 1299709)
                        & {_KEY_MASK})) & mask,
                     r >> 3)) AS r
          FROM {prev}
        )"""
        )
        prev = cte
    rounds_sql = ",\n        ".join(round_ctes)
    return f"""
        WITH es_dom AS (
          SELECT least(greatest(
                   CAST((length(bin(greatest(max({id_col}), 1))) + 1) // 2
                        AS INTEGER), 1), 31) AS b
          FROM {table}
        ),
        es_p AS (
          SELECT (CAST(1 AS BIGINT) << b) AS p2b,
                 (CAST(1 AS BIGINT) << b) - 1 AS mask
          FROM es_dom
        ),
        es_r0 AS (
          SELECT d.{id_col}, e.epoch, p.p2b, p.mask,
                 d.{id_col} // p.p2b AS l,
                 d.{id_col} % p.p2b AS r
          FROM {table} d
          CROSS JOIN (VALUES {epoch_values}) e(epoch)
          CROSS JOIN es_p p
        ),
        {rounds_sql}
        SELECT CAST({id_col} AS BIGINT) AS {id_col},
               CAST(epoch AS BIGINT) AS epoch,
               CAST(l * p2b + r AS BIGINT) AS shuffle_key,
               CAST((l * p2b + r) % {n_shards} AS BIGINT) AS shard
        FROM {prev}
    """
