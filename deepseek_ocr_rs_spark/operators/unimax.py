"""UniMax budget allocation: fair sampling quotas with an epoch cap.

How many tokens should each source/language contribute to a
fixed-size training budget?  Temperature sampling over-samples small
languages into repetition; proportional sampling drowns them.  UniMax
(Chung et al., ICLR 2023 "UniMax: Fairer and More Effective Language
Sampling for Large-Scale Multilingual Pretraining" — public) is the
waterfilling answer: give every source an equal share of the budget,
EXCEPT that no source may repeat more than ``max_epochs`` times — the
capped small sources return their unused share to the pool, which
redistributes over the rest, largest-last.

Exact integer formulation (the sequential algorithm has a closed
form over the size-sorted prefix):

* sort sources ascending by token count L (ties by name);
* source i is CAPPED iff  E*L_i * (n - i + 1) <= B - P_{i-1}
  where P is the prefix sum of E*L — i.e. even granting everyone at
  least this source's full cap would not exhaust the budget (the
  condition is monotone along the sorted order, so the capped set is
  a prefix);
* capped sources get quota E*L_i; the remaining budget R = B - P_k
  splits evenly over the m uncapped sources as R div m, with the
  R mod m remainder granted one token each to the first uncapped
  sources in sort order — quotas sum EXACTLY to min(B, P_n).

100 TB plan shape: the corpus-sized work is the per-source token
count (one map-side-combinable aggregate); everything after runs on
the n_sources-row table — the single-partition windows are over tens
of rows by construction (sources/languages are few; that is the whole
premise of per-source allocation), and the cap point broadcasts back.
Output is the training-mixture config the mixture/DSIR samplers
consume downstream.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["unimax_quotas", "unimax_quotas_oracle_sql"]


def unimax_quotas(
    sizes: DataFrame,
    budget: int,
    max_epochs: int = 4,
    group_col: str = "source",
    tokens_col: str = "n_tokens",
) -> DataFrame:
    """(source, n_tokens, cap_tokens, quota_tokens, epochs_cbp,
    capped) per source — see module doc.  ``sizes`` is the tiny
    per-source token-count table."""
    e = max_epochs
    w = Window.orderBy("l", "src")
    wall = Window.partitionBy(F.lit(1))
    t = (
        sizes.select(
            F.col(group_col).alias("src"),
            F.col(tokens_col).cast("long").alias("l"),
        )
        .withColumn("i", F.row_number().over(w))
        .withColumn("cap", F.col("l") * e)
        .withColumn("p", F.sum("cap").over(w))
        .withColumn("n", F.count(F.lit(1)).over(wall))
        .withColumn(
            "is_capped_pt",
            F.col("cap") * (F.col("n") - F.col("i") + 1)
            <= F.lit(budget) - (F.col("p") - F.col("cap")),
        )
    )
    k = t.agg(
        F.coalesce(
            F.max(F.when(F.col("is_capped_pt"), F.col("i"))), F.lit(0)
        ).alias("k"),
        F.coalesce(
            F.max(F.when(F.col("is_capped_pt"), F.col("p"))), F.lit(0)
        ).alias("pk"),
    )
    out = t.crossJoin(F.broadcast(k)).select(
        "src",
        "l",
        "cap",
        "i",
        "k",
        F.col("n"),
        (F.lit(budget) - F.col("pk")).alias("r"),
        (F.col("n") - F.col("k")).alias("m"),
    )
    quota = (
        F.when(F.col("i") <= F.col("k"), F.col("cap"))
        .otherwise(
            F.expr("r div m")
            + F.when(
                F.col("i") - F.col("k") <= F.expr("r % m"), F.lit(1)
            ).otherwise(F.lit(0))
        )
        .cast("long")
    )
    return out.select(
        F.col("src").alias(group_col),
        F.col("l").alias("n_tokens"),
        F.col("cap").cast("long").alias("cap_tokens"),
        quota.alias("quota_tokens"),
        F.expr(
            "cast((100 * {q}) div nullif(l, 0) as bigint)".format(
                q="(case when i <= k then cap else r div m + "
                "(case when i - k <= r % m then 1 else 0 end) end)"
            )
        ).alias("epochs_cbp"),
        (F.col("i") <= F.col("k")).alias("capped"),
    )


def unimax_quotas_oracle_sql(
    sizes_sql: str,
    budget: int,
    max_epochs: int = 4,
    group_col: str = "source",
    tokens_col: str = "n_tokens",
) -> str:
    """DuckDB SQL replicating ``unimax_quotas`` exactly (same sorted
    prefix condition, same remainder distribution)."""
    e = max_epochs
    return f"""
        WITH um_t AS (
          SELECT {group_col} AS src,
                 CAST({tokens_col} AS BIGINT) AS l,
                 CAST({tokens_col} AS BIGINT) * {e} AS cap,
                 row_number() OVER (ORDER BY {tokens_col}, {group_col})
                   AS i,
                 sum(CAST({tokens_col} AS BIGINT) * {e})
                   OVER (ORDER BY {tokens_col}, {group_col}) AS p,
                 count(*) OVER () AS n
          FROM {sizes_sql}
        ),
        um_c AS (
          SELECT *,
                 cap * (n - i + 1) <= {budget} - (p - cap) AS is_capped_pt
          FROM um_t
        ),
        um_k AS (
          SELECT coalesce(max(CASE WHEN is_capped_pt THEN i END), 0) AS k,
                 coalesce(max(CASE WHEN is_capped_pt THEN p END), 0) AS pk
          FROM um_c
        )
        SELECT src AS {group_col},
               l AS n_tokens,
               cap AS cap_tokens,
               CAST(CASE WHEN i <= k THEN cap
                    ELSE ({budget} - pk) // (n - k)
                         + (CASE WHEN i - k <= ({budget} - pk) % (n - k)
                                 THEN 1 ELSE 0 END)
                    END AS BIGINT) AS quota_tokens,
               CAST(100 * (CASE WHEN i <= k THEN cap
                    ELSE ({budget} - pk) // (n - k)
                         + (CASE WHEN i - k <= ({budget} - pk) % (n - k)
                                 THEN 1 ELSE 0 END)
                    END) // nullif(l, 0) AS BIGINT) AS epochs_cbp,
               i <= k AS capped
        FROM um_c, um_k
    """
