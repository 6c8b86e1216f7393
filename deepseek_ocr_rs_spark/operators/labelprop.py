"""Synchronous label propagation (LPA): host-community detection.

The graph tier's missing member: PageRank ranks, HITS scores, k-core
peels, triangles count — LPA PARTITIONS.  Community structure over the
host link graph drives crawl sharding (keep a community on one worker
to exploit link locality), mirror-cluster grouping (the hreflang /
host-mirror analyses produce pair evidence; LPA turns pair evidence
into clusters), and spam-farm discovery (dense communities with thin
outside connectivity).  Raghavan et al. 2007 ("Near linear time
algorithm to detect community structures in large-scale networks") —
public.

Determinism discipline: the classic LPA is order-dependent; this is
the SYNCHRONOUS variant with a total tie order, so the result is a
pure function of (graph, iters) and the DuckDB oracle replicates it
round by round:

* label_0(v) = v;
* each round, v adopts the label with the MOST votes among its
  neighbors' current labels; ties break to the lexicographically
  SMALLEST label (the min(struct(-count, label)) argmin discipline —
  no window over the vote table);
* fixed ``iters`` rounds (bounded, like the repo's PageRank/k-means:
  termination by construction, not by driver-side convergence polls).

Multi-edges collapse (votes are per distinct neighbor — standard
simple-graph LPA); isolated nodes keep their own label.

100 TB plan shape: the symmetrized edge list is hash-partitioned on
src once and persisted; each round is ONE labels-to-edges equi-join +
two map-side-combinable hash aggregates (vote count, then per-node
argmin) — the Pregel message pattern, zero driver actions, no window.
Hub skew (a node with millions of neighbors) is absorbed by the
partial aggregation on (node, label).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["label_propagation", "label_propagation_oracle_sql"]


def label_propagation(
    edges: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
    iters: int = 3,
) -> DataFrame:
    """(node, label, community_size) after ``iters`` synchronous LPA
    rounds over the undirected simple graph of ``edges``."""
    und = (
        edges.select(F.col(src_col).alias("s"), F.col(dst_col).alias("d"))
        .unionByName(
            edges.select(
                F.col(dst_col).alias("s"), F.col(src_col).alias("d")
            )
        )
        .where(F.col("s") != F.col("d"))
        .distinct()
        .repartition("s")
        .persist()
    )
    labels = und.select(F.col("s").alias("node")).distinct().select(
        "node", F.col("node").alias("label")
    )
    for _ in range(iters):
        votes = (
            und.join(labels, und["d"] == labels["node"])
            .groupBy(F.col("s").alias("n"), "label")
            .agg(F.count(F.lit(1)).alias("c"))
        )
        labels = (
            votes.groupBy(F.col("n").alias("node"))
            .agg(
                F.min(F.struct((-F.col("c")).alias("nc"), "label")).alias(
                    "_w"
                )
            )
            .select("node", F.col("_w.label").alias("label"))
        )
    sizes = labels.groupBy("label").agg(
        F.count(F.lit(1)).cast("long").alias("community_size")
    )
    return labels.join(F.broadcast(sizes), "label").select(
        "node", "label", "community_size"
    )


def label_propagation_oracle_sql(
    edges_sql: str,
    src_col: str = "src",
    dst_col: str = "dst",
    iters: int = 3,
) -> str:
    """DuckDB SQL replicating ``label_propagation`` exactly —
    ``edges_sql`` is a FROM-able relation; rounds unroll as CTEs with
    the identical vote count + (most votes, smallest label) argmin."""
    rounds = []
    prev = "lp_l0"
    for r in range(1, iters + 1):
        cte = f"lp_l{r}"
        rounds.append(
            f"""{cte} AS (
          SELECT n AS node, label FROM (
            SELECT u.s AS n, l.label, count(*) AS c,
                   row_number() OVER (PARTITION BY u.s
                     ORDER BY count(*) DESC, l.label) AS rn
            FROM lp_und u JOIN {prev} l ON u.d = l.node
            GROUP BY u.s, l.label
          ) WHERE rn = 1
        )"""
        )
        prev = cte
    rounds_sql = ",\n        ".join(rounds)
    return f"""
        WITH lp_e AS (SELECT {src_col} AS src, {dst_col} AS dst
                      FROM {edges_sql}),
        lp_und AS (
          SELECT DISTINCT s, d FROM (
            SELECT src AS s, dst AS d FROM lp_e
            UNION ALL
            SELECT dst AS s, src AS d FROM lp_e
          ) WHERE s <> d
        ),
        lp_l0 AS (
          SELECT DISTINCT s AS node, s AS label FROM lp_und
        ),
        {rounds_sql},
        lp_sizes AS (
          SELECT label, count(*) AS community_size FROM {prev} GROUP BY 1
        )
        SELECT l.node, l.label,
               CAST(s.community_size AS BIGINT) AS community_size
        FROM {prev} l JOIN lp_sizes s USING (label)
    """
