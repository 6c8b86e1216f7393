"""Cross-host mirror detection (site-level duplication).

Whole-document dedup (operators/dedup.py) answers "which PAGES are
copies"; crawl curation also needs the HOST-level rollup — which site
pairs serve largely the same content (true mirrors, scraper farms, CDN
aliases missed by URL canonicalization).  Common Crawl-class pipelines
use the shared-digest host pair count both to collapse mirrors before
expensive per-page work and as a spam prior (content farms re-hosting
one corpus under many domains).  Same corpus-infrastructure family as
span_dedup / host_template_spans; no single-document analog exists in
the reference — the discipline kept from it is the exact cross-engine
gate (SURVEY §6).

``host_mirror_pairs`` counts, for every unordered host pair, the number
of DISTINCT page digests both hosts serve, and flags pairs where that
overlap clears ``min_pct`` percent of the SMALLER host's distinct-digest
count (containment of the smaller side — a tiny site fully mirrored by
a big portal should flag even though the portal's share is negligible).

100 TB posture:
* the page digest is md5(text) computed map-side; each host counts a
  digest ONCE (distinct (host, digest)) so within-host repetition never
  inflates pair counts;
* pairs come from a self-equi-join KEYED ON THE DIGEST — never host
  all-pairs.  A digest served by h hosts yields C(h,2) pairs, so a
  boilerplate digest ("empty page", parked-domain template) shared by
  thousands of hosts would square: ``max_hosts_per_digest`` (the
  minhash ``bucket_cap`` discipline, default on) DROPS digests above
  the cap before the join — such digests are boilerplate by definition
  and carry no mirror signal;
* per-host distinct-digest totals are a tiny second aggregate broadcast
  onto the pair counts;
* the flag threshold is an integer cross-multiplication (no float
  ratio), exact on every engine.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["host_mirror_pairs", "host_mirror_pairs_oracle_sql"]


def host_mirror_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    host_col: str = "source",
    text_col: str = "text",
    min_shared: int = 2,
    min_pct: int = 30,
    max_hosts_per_digest: int = 16,
) -> DataFrame:
    """(host_a, host_b, n_shared, n_a, n_b) for unordered host pairs
    with ``n_shared`` >= ``min_shared`` distinct common page digests and
    ``n_shared * 100 >= min_pct * least(n_a, n_b)`` (containment of the
    smaller host).  ``host_a < host_b`` lexicographically; ``n_a`` /
    ``n_b`` are each host's distinct-digest counts."""
    hd = (
        df.select(
            F.col(host_col).alias("host"),
            F.md5(F.col(text_col)).alias("digest"),
        )
        .distinct()
    )
    # stop-digest cap: boilerplate shared by > cap hosts would square
    capped = hd.join(
        hd.groupBy("digest")
        .agg(F.count(F.lit(1)).alias("n_hosts"))
        .where(F.col("n_hosts") <= max_hosts_per_digest)
        .select("digest"),
        "digest",
        "semi",
    )
    pairs = (
        capped.alias("x")
        .join(capped.alias("y"), "digest")
        .where(F.col("x.host") < F.col("y.host"))
        .groupBy(
            F.col("x.host").alias("host_a"),
            F.col("y.host").alias("host_b"),
        )
        .agg(F.count(F.lit(1)).alias("n_shared"))
    )
    totals = hd.groupBy("host").agg(F.count(F.lit(1)).alias("n"))
    return (
        pairs.join(
            F.broadcast(totals.withColumnRenamed("host", "host_a")), "host_a"
        )
        .withColumnRenamed("n", "n_a")
        .join(
            F.broadcast(
                totals.withColumnRenamed("host", "host_b").withColumnRenamed(
                    "n", "n_b"
                )
            ),
            "host_b",
        )
        .where(
            (F.col("n_shared") >= min_shared)
            & (
                F.col("n_shared") * 100
                >= F.lit(min_pct) * F.least("n_a", "n_b")
            )
        )
        .select(
            "host_a",
            "host_b",
            F.col("n_shared").cast("long").alias("n_shared"),
            F.col("n_a").cast("long").alias("n_a"),
            F.col("n_b").cast("long").alias("n_b"),
        )
    )


def host_mirror_pairs_oracle_sql(
    table: str = "documents",
    id_col: str = "doc_id",
    host_col: str = "source",
    text_col: str = "text",
    min_shared: int = 2,
    min_pct: int = 30,
    max_hosts_per_digest: int = 16,
) -> str:
    """DuckDB SQL replicating ``host_mirror_pairs`` exactly (same md5
    digest, same stop-digest cap, same integer containment threshold)."""
    return f"""
        WITH hd AS (
          SELECT DISTINCT {host_col} AS host, md5({text_col}) AS digest
          FROM {table}
        ),
        capped AS (
          SELECT host, digest FROM hd
          WHERE digest IN (
            SELECT digest FROM hd GROUP BY digest
            HAVING count(*) <= {max_hosts_per_digest}
          )
        ),
        pairs AS (
          SELECT x.host AS host_a, y.host AS host_b, count(*) AS n_shared
          FROM capped x JOIN capped y USING (digest)
          WHERE x.host < y.host
          GROUP BY 1, 2
        ),
        totals AS (
          SELECT host, count(*) AS n FROM hd GROUP BY host
        )
        SELECT p.host_a, p.host_b,
               CAST(p.n_shared AS BIGINT) AS n_shared,
               CAST(a.n AS BIGINT) AS n_a,
               CAST(b.n AS BIGINT) AS n_b
        FROM pairs p
        JOIN totals a ON p.host_a = a.host
        JOIN totals b ON p.host_b = b.host
        WHERE p.n_shared >= {min_shared}
          AND p.n_shared * 100 >= {min_pct} * least(a.n, b.n)
    """
