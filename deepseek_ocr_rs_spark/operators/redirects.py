"""Redirect-chain resolution by pointer doubling.

A crawl's 3xx responses form a functional graph: each source URL
redirects to at most one target.  Before dedup / extraction the
pipeline must map every URL to its *final* destination — chains
(``a -> b -> c``), abandoned when too long (crawlers cap at ~10-20
hops), and cycles (``a -> b -> a``) all appear in real web data.

:func:`resolve_redirects` resolves every source in one pass of
**pointer doubling**: the hop map is composed with itself, so after
``k`` self-joins each row points ``min(2^k, distance-to-terminal)``
hops ahead.  ``ceil(log2(max_hops + 1))`` rounds cover every chain a
crawler would follow — 4 self-joins for ``max_hops = 8`` where the
naive walk needs 8 — and cycles terminate naturally because a cycle
node never reaches a terminal.

Semantics (replicated exactly by :func:`resolve_redirects_oracle_sql`,
a hop-bounded recursive CTE): a source is ``resolved`` iff following
its chain reaches a node with no outgoing edge in at most ``max_hops``
hops; then ``final_url`` is that node and ``n_hops`` the exact chain
length.  Everything else — longer chains and cycles alike — is
``unresolved`` with NULL final/hops (a crawler gives up; it does not
report partial progress).  Contract: at most one outgoing edge per
source (dedup recaptures upstream, e.g. with
:func:`~deepseek_ocr_rs_spark.operators.cdx.latest_captures`).

Scale shape (100 TB / 1000 executors): the working set is one row per
*redirect source* — a small fraction of the capture log — and stays
constant across rounds; each round is ONE equi-join on the current
pointer (hash-partitioned, AQE-coalesced) plus an eager
``localCheckpoint`` that truncates the otherwise exponentially
self-referencing plan.  O(log max_hops) shuffles total, never
O(max_hops), and never a driver-side collect of the graph.

Reference analog: the reference resolves its asset/model references
through at most one indirection with a hard failure past the bound
(crates/assets/src/lib.rs download-or-cache); the web tier needs the
same give-up-past-K discipline over billions of chains at once.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["resolve_redirects", "resolve_redirects_oracle_sql"]


def resolve_redirects(
    edges: DataFrame,
    max_hops: int = 8,
    src_col: str = "src",
    dst_col: str = "dst",
) -> DataFrame:
    """Redirect edges (one out-edge per src) -> final destination per src.

    Output: ``(src, final_url string, n_hops long, status string)`` —
    ``status`` is ``resolved`` (terminal within max_hops; final_url /
    n_hops set) or ``unresolved`` (chain longer than max_hops, or a
    cycle; final_url / n_hops NULL).
    """
    if max_hops < 1:
        raise ValueError("max_hops must be >= 1")
    # a NULL src has no identity (dropped); a NULL dst is a redirect
    # with an unparseable Location — the src surfaces as unresolved
    # (NULL cur can never pass the terminal probe's isNotNull)
    rep = edges.select(
        F.col(src_col).alias("src"),
        F.col(dst_col).alias("cur"),
        F.lit(1).cast("long").alias("hops"),
    ).where(F.col("src").isNotNull())
    # materialize the edge projection BEFORE the first self-join: both
    # join sides (and the final terminal probe) share this lineage, so an
    # expensive upstream — e.g. the WARC -> HTTP parse feeding
    # web_redirect_from_warc — would otherwise execute once PER SIDE in
    # round 1 (guide §1.2: don't compute the same thing twice; §5:
    # localCheckpoint to cut lineage)
    rep = rep.localCheckpoint(eager=True)
    rounds = 0
    while (1 << rounds) < max_hops + 1:
        rounds += 1
    for _ in range(rounds):
        b = rep.select(
            F.col("src").alias("_bsrc"),
            F.col("cur").alias("_bcur"),
            F.col("hops").alias("_bhops"),
        )
        rep = (
            rep.join(b, rep["cur"] == b["_bsrc"], "left")
            .select(
                "src",
                F.coalesce("_bcur", "cur").alias("cur"),
                (F.col("hops") + F.coalesce("_bhops", F.lit(0))).alias(
                    "hops"
                ),
            )
            # the self-compose doubles the lineage every round; truncate
            # it or the plan itself grows exponentially
            .localCheckpoint(eager=True)
        )
    # one final probe: cur is terminal iff it has no outgoing edge
    outs = rep.select(F.col("src").alias("_osrc")).withColumn(
        "_has_out", F.lit(True)
    )
    probed = rep.join(outs, rep["cur"] == outs["_osrc"], "left")
    resolved = (
        F.col("cur").isNotNull()
        & F.col("_has_out").isNull()
        & (F.col("hops") <= max_hops)
    )
    return probed.select(
        "src",
        F.when(resolved, F.col("cur")).alias("final_url"),
        F.when(resolved, F.col("hops")).alias("n_hops"),
        F.when(resolved, F.lit("resolved"))
        .otherwise(F.lit("unresolved"))
        .alias("status"),
    )


def resolve_redirects_oracle_sql(edges_cte: str, max_hops: int = 8) -> str:
    """DuckDB replica: hop-by-hop recursive walk bounded at max_hops,
    over a CTE/subquery producing ``(src, dst)`` with unique src."""
    return f"""
    WITH RECURSIVE redges AS (
      SELECT * FROM ({edges_cte}) WHERE src IS NOT NULL
    ),
    walk AS (
      SELECT src, dst AS cur, 1 AS hops FROM redges
      UNION ALL
      SELECT w.src, e.dst, w.hops + 1
      FROM walk w JOIN redges e ON w.cur = e.src
      WHERE w.hops <= {max_hops}
    ),
    resolved AS (
      SELECT w.src, w.cur, w.hops
      FROM walk w
      WHERE w.hops <= {max_hops} AND w.cur IS NOT NULL
        AND NOT EXISTS (SELECT 1 FROM redges e WHERE e.src = w.cur)
    )
    SELECT s.src,
           r.cur AS final_url,
           CAST(r.hops AS BIGINT) AS n_hops,
           CASE WHEN r.src IS NULL THEN 'unresolved'
                ELSE 'resolved' END AS status
    FROM (SELECT DISTINCT src FROM redges) s
    LEFT JOIN resolved r ON s.src = r.src
    """
