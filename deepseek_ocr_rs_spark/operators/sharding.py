"""Deterministic epoch shuffle + training-shard assignment.

The last step of a curation pipeline is materializing the corpus as N
shard files in a pseudorandom order that (a) is reproducible from a seed,
(b) changes every epoch, and (c) never routes through a single node.  The
reference's analog is its fixed-seed generator discipline — every
"random" choice is a pure function of explicit state
(crates/core/src/sampling.rs:104-118), which is exactly what makes a
killed run resumable.

Design for 100 TB:
- The shuffle key is the same 60-bit md5 family the samplers use
  (operators/sampling.py): ``u = int(md5(key ':' epoch)[:15], 16)`` — a
  pure per-row function, stable under retries and partitioning.
- ``shard_id = u % n_shards`` spreads uniformly, so shards are balanced
  to within sampling noise with NO size accounting and no coordination.
- ``shard_pos`` is a ``row_number`` windowed BY SHARD — the only shuffle
  is the hash exchange on shard_id, each window sorts one shard locally,
  and there is no global single-partition window anywhere.  Writing
  shard files is then ``partitionBy(shard_id)`` with an in-shard sort.
- Within a shard, order is (u, key): pseudorandom first, key as the
  total-order tiebreak so the layout is unique and both engines agree.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_HEX_DIGITS = 15  # 60-bit key: fits a signed 64-bit int exactly


def _shuffle_u(key, epoch: int):
    """60-bit uniform hash of (key, epoch) — identical to the SQL oracle."""
    h = F.md5(F.concat_ws(":", key.cast("string"), F.lit(str(epoch))))
    return F.conv(F.substring(h, 1, _HEX_DIGITS), 16, 10).cast("long")


def shard_assignment(
    df: DataFrame,
    key_col: str,
    n_shards: int,
    epoch: int = 0,
) -> DataFrame:
    """Assign every row a ``(shard_id, shard_pos)`` for this epoch.

    shard_pos is 1-based and dense within each shard; the full ordering
    ``ORDER BY shard_id, shard_pos`` is the epoch's global pseudorandom
    permutation (uniform over shard interleavings).  Deterministic:
    independent of input partitioning, task retries, and row order.
    """
    if n_shards <= 0:
        raise ValueError(f"n_shards must be positive, got {n_shards}")
    u = _shuffle_u(F.col(key_col), epoch)
    w = Window.partitionBy("shard_id").orderBy("shuffle_u", key_col)
    return (
        df.withColumn("shuffle_u", u)
        .withColumn(
            "shard_id", F.pmod(F.col("shuffle_u"), F.lit(n_shards)).cast("int")
        )
        .withColumn("shard_pos", F.row_number().over(w).cast("long"))
        .drop("shuffle_u")
    )


def shard_assignment_oracle_sql(
    table: str, key_col: str, n_shards: int, epoch: int = 0
) -> str:
    """DuckDB SQL replicating ``shard_assignment`` bit-for-bit (the hash
    is exact integer arithmetic on both engines)."""
    u = (
        f"CAST('0x' || substr(md5(CAST({key_col} AS VARCHAR) || ':{epoch}'),"
        f" 1, {_HEX_DIGITS}) AS BIGINT)"
    )
    return f"""
        SELECT * EXCLUDE (shuffle_u),
               CAST(row_number() OVER (
                    PARTITION BY shard_id ORDER BY shuffle_u, {key_col})
                    AS BIGINT) AS shard_pos
        FROM (
          SELECT *, {u} AS shuffle_u,
                 CAST({u} % {n_shards} AS INTEGER) AS shard_id
          FROM {table}
        )
    """


# --------------------------------------- Contiguous global IDs


def assign_global_ids(
    df: DataFrame, order_col: str, n_ranges: int = 32,
    id_name: str = "global_id",
) -> DataFrame:
    """Contiguous ids 0..n-1 in ``order_col`` order with NO
    single-partition exchange — the distributed zipWithIndex.

    The naive form (``row_number() OVER (ORDER BY k)``) funnels the
    ENTIRE dataset through one reducer; at 100 TB that is the job.
    This version is the classic two-phase rank:

      1. range-partition by the key (``repartitionByRange`` — the same
         distributed-sort exchange an ORDER BY uses, every partition
         holds a contiguous key range) and sort within partitions;
      2. rank WITHIN each partition with no extra exchange of the data:
         ``monotonically_increasing_id`` assigns ``pid << 33 | local_row``
         in partition iteration order, so the partition index and the
         0-based local rank are bit fields of one map-side column (a
         window keyed on ``spark_partition_id`` would re-shuffle the
         full WIDTH of the dataset a second time just to rank rows
         already grouped);
      3. the ranked data is pinned with ``localCheckpoint`` BEFORE it
         forks into the count pass and the final join.  This is load-
         bearing, not an optimization: Spark's range-boundary sampler
         seeds from the runtime RDD id, so two independently compiled
         exchanges over the same input may pick DIFFERENT boundaries at
         scale (the sample is partial beyond ~100 rows/partition) — a
         count pass under different boundaries silently corrupts ids.
         RDD.zipWithIndex gets this stability for free from reusing one
         partitioner object; the DataFrame analog must materialize.
         Then per-partition counts collapse to an O(n_ranges)
         prefix-offset table via a window over that TINY aggregate and
         attach back by broadcast; id = offset + local_rank.

    Each range partition must hold < 2^33 rows (the mono-id record
    field) — at any sane n_ranges that is orders of magnitude above a
    partition that fits a machine anyway.

    Range boundaries come from Spark's deterministic sampler, so two
    branches over the same input see identical partition ids.  Where
    the boundaries land does not affect the result — only which worker
    computes which contiguous block.  ``order_col`` must be UNIQUE:
    a duplicated key that straddles a range boundary would make the
    split (and hence ids among the ties) sampler-dependent, so the
    contract matches the oracle's total order only for unique keys.
    Reference analog: stable (conv_id, turn_idx) reassembly ordering —
    deterministic global positions without a serial pass
    (crates/core/src/streaming.rs:43-62 ordering discipline).
    """
    ranged = df.repartitionByRange(
        n_ranges, F.col(order_col)
    ).sortWithinPartitions(order_col)
    local = ranged.withColumn("_mid", F.monotonically_increasing_id()).select(
        "*",
        F.shiftright("_mid", 33).alias("_pid"),
        F.col("_mid").bitwiseAND(F.lit((1 << 33) - 1)).alias("_lrn"),
    ).localCheckpoint()  # freeze boundaries + ids across the two passes
    offsets = (
        local.groupBy("_pid")
        .agg(F.count("*").alias("_cnt"))
        .select(
            "_pid",
            F.coalesce(
                F.sum("_cnt").over(
                    Window.orderBy("_pid").rowsBetween(
                        Window.unboundedPreceding, -1
                    )
                ),
                F.lit(0),
            ).alias("_off"),
        )
    )
    return (
        local.join(F.broadcast(offsets), "_pid")
        .withColumn(id_name, F.col("_off") + F.col("_lrn"))
        .drop("_mid", "_pid", "_lrn", "_off")
    )


def assign_global_ids_oracle_sql(
    table: str, order_col: str, select: str = "*",
    id_name: str = "global_id",
) -> str:
    """DuckDB SQL: the two-phase rank collapses to a plain dense global
    row_number for unique keys."""
    return f"""
        SELECT {select},
               CAST(row_number() OVER (ORDER BY {order_col}) - 1
                    AS BIGINT) AS {id_name}
        FROM {table}
    """
