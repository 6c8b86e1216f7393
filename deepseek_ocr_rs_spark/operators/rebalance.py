"""Scale-adaptive input rebalance for Arrow batch stages.

A vectorized mapInPandas/mapInArrow stage inherits the scan's split
count.  At cluster scale a 100 TB table yields tens of thousands of
splits and this helper is a no-op; on a small input (or a local bench
at a modest SF) the parquet files pack into fewer splits than the
session has cores, and a CPU-bound Arrow stage then runs on a fraction
of the machine — measured locally: web_surt_latest's canonicalizer pass
ran 1M rows on 4 of 32 cores.

``rebalance_for_arrow`` round-robins the (already column-pruned) input
up to the session's default parallelism ONLY when the current plan has
fewer partitions — derived from the session, never a constant, so the
same code is correct at both bench and cluster scale (guide §2:
scale-adaptive partitioning; the repartition pays one narrow shuffle of
exactly the columns the Arrow stage consumes).
"""

from __future__ import annotations

from pyspark.sql import DataFrame

__all__ = ["rebalance_for_arrow"]


def rebalance_for_arrow(df: DataFrame) -> DataFrame:
    """Round-robin ``df`` up to defaultParallelism iff it is narrower."""
    if df.isStreaming:  # .rdd is illegal on a streaming plan; leave as-is
        return df
    spark = df.sparkSession
    target = spark.sparkContext.defaultParallelism
    try:
        current = df.rdd.getNumPartitions()
    except Exception:  # noqa: BLE001 - planning failure -> leave as-is
        return df
    if current >= target:
        return df
    return df.repartition(target)
