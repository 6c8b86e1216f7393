"""Bottom-k (KMV) sketches: which sources overlap, before any dedup.

The curation-planning question at 100 TB: given 20 ingest sources, how
much CONTENT do they share — should CommonCrawl-2023 even be deduped
against Wikipedia, or are they disjoint?  Answering exactly means a
corpus-squared gram join; the standard synopsis is the bottom-k / KMV
sketch (Bar-Yossef et al. 2002; Beyer et al. 2007 "On Synopses for
Distinct-Value Estimation"; Broder's minwise sketches): per source,
keep the k SMALLEST distinct 60-bit gram hashes.  k rows per source
then answer, for every source pair,

* an unbiased distinct-count estimate per source
  (``(k-1) * 2^60 / h_k``, computed here with a two-step shift so the
  arithmetic stays inside int64 and cross-engine exact), and
* the KMV Jaccard estimate: among the K = min(k, |union|) smallest
  hashes of the SKETCH UNION (the bottom-k of a union is computable
  from the two bottom-k's — the closure property that makes KMV
  mergeable), the fraction present in BOTH sketches, in floor basis
  points.

Exactness discipline: the sketch content is a pure function of the
data (md5-derived hashes, no RNG), so the DuckDB oracle replicates
every sketch row and every estimate bit-for-bit — the gate checks the
sketches themselves, not a recall proxy.

100 TB plan shape — the naive per-source ORDER BY h LIMIT k is a
window sort over EVERY distinct gram of a source through one task;
this implementation pins an exact histogram-pruned order statistic
instead:

  1. distinct (source, h) — the one gram-cardinality shuffle (shared
     shape with ngram_novelty);
  2. a 4096-bucket histogram per source (map-side-combinable counts;
     4096 rows per source);
  3. cumulative-count over the TINY histogram finds the bucket holding
     the k-th smallest -> a per-source threshold that provably bounds
     the bottom-k from above;
  4. only the ~n/4096 surviving hashes are window-sorted.

Every stage is fully parallel; the only per-source serial work is the
survivor sort (k-proportional, not corpus-proportional).  The pair
stage runs over n_sources^2 * k rows — thousands, not billions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["kmv_sketches", "kmv_source_overlap", "kmv_overlap_oracle_sql"]

_DOMAIN_BITS = 60
_N_BUCKETS = 4096
_BUCKET_W = (1 << _DOMAIN_BITS) // _N_BUCKETS


def _hash60(col):
    """Top 60 bits of md5 as int64 — the repo's established exact
    cross-engine hash (sampling.py / spancorrupt.py discipline)."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


def kmv_sketches(
    df: DataFrame,
    group_col: str = "source",
    text_col: str = "text",
    k: int = 64,
    shingle_n: int = 3,
) -> DataFrame:
    """(grp, h, rnk) — the k smallest distinct gram hashes per group,
    rnk = 1-based order statistic, via the histogram-pruned exact
    order statistic (see module doc)."""
    from deepseek_ocr_rs_spark.operators.novelty import _grams_expr

    gh = (
        df.select(
            F.col(group_col).alias("grp"),
            F.explode(F.expr(_grams_expr(text_col, shingle_n))).alias(
                "gram"
            ),
        )
        .select("grp", _hash60(F.col("gram")).alias("h"))
        .distinct()
    )
    hist = gh.groupBy(
        "grp", F.expr(f"h div {_BUCKET_W}").cast("long").alias("_b")
    ).agg(F.count(F.lit(1)).alias("_c"))
    cum = Window.partitionBy("grp").orderBy("_b").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    thr = (
        hist.withColumn("_cum", F.sum("_c").over(cum))
        .where(F.col("_cum") >= F.lit(k))
        .groupBy("grp")
        .agg(((F.min("_b") + 1) * F.lit(_BUCKET_W)).alias("_thr"))
    )
    # sources with fewer than k grams never reach cum >= k: keep all
    survivors = gh.join(F.broadcast(thr), "grp", "left").where(
        F.col("_thr").isNull() | (F.col("h") < F.col("_thr"))
    )
    rnk = Window.partitionBy("grp").orderBy("h")
    return (
        survivors.withColumn("rnk", F.row_number().over(rnk))
        .where(F.col("rnk") <= k)
        .select("grp", "h", F.col("rnk").cast("long").alias("rnk"))
    )


def kmv_source_overlap(
    df: DataFrame,
    group_col: str = "source",
    text_col: str = "text",
    k: int = 64,
    shingle_n: int = 3,
) -> DataFrame:
    """(src_a, src_b, n_k, n_shared, jaccard_bp, d_hat_a, d_hat_b) per
    unordered source pair (src_a < src_b lexicographically)."""
    sk = kmv_sketches(df, group_col, text_col, k, shingle_n).cache()
    # per-source stats: sketch size + k-th smallest (h_k); the KMV
    # distinct estimate, shift-scaled so (k-1)<<30 stays inside int64
    stats = sk.groupBy("grp").agg(
        F.count(F.lit(1)).alias("_sz"), F.max("h").alias("_hk")
    ).select(
        "grp",
        "_sz",
        F.when(F.col("_sz") < k, F.col("_sz"))
        .otherwise(
            F.expr(
                f"cast(shiftleft(cast({k} - 1 as bigint), 30)"
                f" div greatest(shiftright(_hk, 30), 1) as bigint)"
            )
        )
        .cast("long")
        .alias("d_hat"),
    )
    srcs = sk.select("grp").distinct()
    pairs = (
        srcs.alias("a")
        .join(srcs.alias("b"), F.col("a.grp") < F.col("b.grp"))
        .select(
            F.col("a.grp").alias("src_a"), F.col("b.grp").alias("src_b")
        )
    )
    side_a = pairs.join(sk, F.col("src_a") == F.col("grp")).select(
        "src_a", "src_b", "h", F.lit(1).alias("_ia"), F.lit(0).alias("_ib")
    )
    side_b = pairs.join(sk, F.col("src_b") == F.col("grp")).select(
        "src_a", "src_b", "h", F.lit(0).alias("_ia"), F.lit(1).alias("_ib")
    )
    merged = (
        side_a.unionByName(side_b)
        .groupBy("src_a", "src_b", "h")
        .agg(F.max("_ia").alias("_ia"), F.max("_ib").alias("_ib"))
    )
    w = Window.partitionBy("src_a", "src_b").orderBy("h")
    bottom = merged.withColumn("_r", F.row_number().over(w)).where(
        F.col("_r") <= k
    )
    scored = bottom.groupBy("src_a", "src_b").agg(
        F.count(F.lit(1)).cast("long").alias("n_k"),
        F.sum(F.col("_ia") * F.col("_ib")).cast("long").alias("n_shared"),
    )
    return (
        scored.join(
            F.broadcast(stats.select(F.col("grp"), F.col("d_hat"))),
            F.col("src_a") == F.col("grp"),
        )
        .drop("grp")
        .withColumnRenamed("d_hat", "d_hat_a")
        .join(
            F.broadcast(stats.select(F.col("grp"), F.col("d_hat"))),
            F.col("src_b") == F.col("grp"),
        )
        .drop("grp")
        .withColumnRenamed("d_hat", "d_hat_b")
        .select(
            "src_a",
            "src_b",
            "n_k",
            "n_shared",
            F.expr("cast((10000 * n_shared) div n_k as bigint)").alias(
                "jaccard_bp"
            ),
            "d_hat_a",
            "d_hat_b",
        )
    )


def kmv_overlap_oracle_sql(
    table: str = "documents",
    group_col: str = "source",
    text_col: str = "text",
    k: int = 64,
    shingle_n: int = 3,
) -> str:
    """DuckDB SQL replicating ``kmv_source_overlap`` exactly — the
    oracle takes the all-rows QUALIFY form (no histogram prune needed
    at oracle scale); sketch content and every estimate are identical
    because the hash and the order statistic are identical."""
    n = shingle_n
    return f"""
        WITH kv_toks AS (
          SELECT {group_col} AS grp,
                 list_filter(string_split_regex(lower({text_col}), '\\s+'),
                             x -> x <> '') AS toks
          FROM {table}
        ),
        kv_gh AS (
          SELECT DISTINCT grp,
                 CAST('0x' || substr(md5(
                   array_to_string(list_slice(toks, i + 1, i + {n}), ' ')
                 ), 1, 15) AS BIGINT) AS h
          FROM kv_toks, UNNEST(range(0, len(toks) - {n} + 1)) AS u(i)
          WHERE len(toks) >= {n}
        ),
        kv_sk AS (
          SELECT grp, h, row_number() OVER (PARTITION BY grp ORDER BY h)
                   AS rnk
          FROM kv_gh
          QUALIFY rnk <= {k}
        ),
        kv_stats AS (
          SELECT grp, count(*) AS sz, max(h) AS hk,
                 CASE WHEN count(*) < {k} THEN count(*)
                      ELSE (CAST({k} - 1 AS BIGINT) << 30)
                           // greatest(max(h) >> 30, 1) END AS d_hat
          FROM kv_sk GROUP BY grp
        ),
        kv_pairs AS (
          SELECT a.grp AS src_a, b.grp AS src_b
          FROM (SELECT DISTINCT grp FROM kv_sk) a
          JOIN (SELECT DISTINCT grp FROM kv_sk) b ON a.grp < b.grp
        ),
        kv_merged AS (
          SELECT src_a, src_b, h,
                 max(ia) AS ia, max(ib) AS ib
          FROM (
            SELECT p.src_a, p.src_b, s.h, 1 AS ia, 0 AS ib
            FROM kv_pairs p JOIN kv_sk s ON s.grp = p.src_a
            UNION ALL
            SELECT p.src_a, p.src_b, s.h, 0 AS ia, 1 AS ib
            FROM kv_pairs p JOIN kv_sk s ON s.grp = p.src_b
          ) GROUP BY 1, 2, 3
        ),
        kv_bottom AS (
          SELECT src_a, src_b, h, ia, ib,
                 row_number() OVER (PARTITION BY src_a, src_b ORDER BY h)
                   AS r
          FROM kv_merged
          QUALIFY r <= {k}
        ),
        kv_scored AS (
          SELECT src_a, src_b, count(*) AS n_k,
                 sum(ia * ib) AS n_shared
          FROM kv_bottom GROUP BY 1, 2
        )
        SELECT s.src_a, s.src_b,
               CAST(s.n_k AS BIGINT) AS n_k,
               CAST(s.n_shared AS BIGINT) AS n_shared,
               CAST(10000 * s.n_shared // s.n_k AS BIGINT) AS jaccard_bp,
               CAST(sa.d_hat AS BIGINT) AS d_hat_a,
               CAST(sb.d_hat AS BIGINT) AS d_hat_b
        FROM kv_scored s
        JOIN kv_stats sa ON sa.grp = s.src_a
        JOIN kv_stats sb ON sb.grp = s.src_b
    """
