"""TextRank: PageRank term centrality over the word-adjacency graph.

Keyword extraction for corpus labeling and query expansion (Mihalcea &
Tarau's TextRank): build the undirected word co-occurrence graph from
adjacent-word pairs and rank vertices by PageRank.  This is the repo's
second iterative graph algorithm (after connected components'
large-star/small-star) and follows the same bounded-fixed-rounds
discipline; the reference analog is once more deterministic fixed-point
iteration over explicit state (crates/core/src/sampling.rs:104-118).

Cross-engine exactness:
* The graph: DISTINCT lowercase adjacent-word pairs (the
  operators/lm.py bigram construction), mirrored to both directions,
  self-loops dropped.  Every vertex therefore has degree >= 1 — no
  dangling-mass term in the update.
* rank_0 = 1/N and the (1-d)/N teleport are single correctly-rounded
  divisions; each iteration's incoming-contribution sum folds in FIXED
  source-term order (the bm25/kmeans fold discipline), and the final
  rank = teleport + d * sum is two more single-rounded ops — so ranks
  are bit-identical across engines and partitionings.

Design for 100 TB:
- Vertices/edges are vocabulary-sized — orders of magnitude below the
  corpus.  The corpus is scanned ONCE (bigram distinct); iterations
  touch only the graph.
- Each iteration: one equi-join (edges x ranks, keyed on the source
  term) + one target-keyed aggregation.  ITERS is a fixed constant;
  no driver-side count() per round.
- Top-k output is ORDER BY + LIMIT (TakeOrderedAndProject), no global
  sort.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DAMPING = 0.85


def word_adjacency_edges(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(src, dst): distinct undirected adjacent-word pairs, both
    directions materialized, self-loops dropped."""
    from .lm import _doc_bigrams

    bg = (
        _doc_bigrams(df, id_col, text_col)
        .where(F.col("w1") != F.col("w2"))
        .select("w1", "w2")
        .distinct()
    )
    return (
        bg.select(F.col("w1").alias("src"), F.col("w2").alias("dst"))
        .unionAll(bg.select(F.col("w2").alias("src"), F.col("w1").alias("dst")))
        .distinct()
    )


def textrank_terms(
    df: DataFrame,
    k: int = 30,
    iters: int = 3,
    damping: float = DAMPING,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Top-k terms by PageRank over the word-adjacency graph.

    Returns (term, rank) with rank rounded to 6dp for display; ordering
    happens on the exact double (desc) with term asc tie-break."""
    # loop-invariant tables: every iteration's contrib join references
    # edges AND deg AND the prior ranks chain — unpersisted, the bigram
    # Arrow pass + two distincts re-execute ~3x per iteration (~27x for
    # the default 3 iterations; guide §1.2/§5)
    edges = word_adjacency_edges(df, id_col, text_col).persist()
    deg = edges.groupBy("src").agg(F.count("*").alias("deg")).persist()
    n_nodes = deg.agg(F.count("*").cast("double").alias("n"))
    # rank_0 = 1/N for every vertex
    ranks = deg.crossJoin(F.broadcast(n_nodes)).select(
        F.col("src").alias("term"),
        (F.lit(1.0) / F.col("n")).alias("rank"),
    )
    for _ in range(iters):
        contrib = (
            edges.join(deg, "src")
            .join(ranks, edges.src == ranks.term)
            .select(
                F.col("dst"),
                F.col("src"),
                (F.col("rank") / F.col("deg").cast("double")).alias("c"),
            )
        )
        summed = contrib.groupBy("dst").agg(
            F.aggregate(
                F.array_sort(F.collect_list(F.struct("src", "c"))),
                F.lit(0.0),
                lambda acc, s: acc + s["c"],
            ).alias("s")
        )
        ranks = summed.crossJoin(F.broadcast(n_nodes)).select(
            F.col("dst").alias("term"),
            (
                (F.lit(1.0 - damping) / F.col("n"))
                + F.lit(damping) * F.col("s")
            ).alias("rank"),
        )
    return (
        ranks.orderBy(F.col("rank").desc(), F.col("term"))
        .limit(k)
        .select("term", F.round("rank", 6).alias("rank"))
    )


def textrank_terms_oracle_sql(
    table: str,
    k: int = 30,
    iters: int = 3,
    damping: float = DAMPING,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> str:
    """DuckDB SQL replicating ``textrank_terms`` bit-for-bit (same graph,
    same fold orders, iterations unrolled)."""
    parts = [
        f"""
        toks AS (
          SELECT {id_col},
                 list_filter(string_split_regex(lower({text_col}), '\\s+'),
                             x -> x <> '') AS w
          FROM {table}
        ),
        bg AS (
          SELECT DISTINCT w[i] AS w1, w[i + 1] AS w2
          FROM toks, LATERAL unnest(range(1, len(w))) AS t(i)
          WHERE w[i] <> w[i + 1]
        ),
        edges AS (
          SELECT w1 AS src, w2 AS dst FROM bg
          UNION
          SELECT w2 AS src, w1 AS dst FROM bg
        ),
        deg AS (SELECT src, count(*) AS deg FROM edges GROUP BY src),
        nn AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM deg),
        r0 AS (
          SELECT src AS term, 1.0 / nn.n AS rank
          FROM deg CROSS JOIN nn
        )
        """
    ]
    for it in range(iters):
        parts.append(
            f"""
        c{it} AS (
          SELECT e.dst, e.src, r.rank / CAST(d.deg AS DOUBLE) AS c
          FROM edges e
          JOIN deg d ON e.src = d.src
          JOIN r{it} r ON e.src = r.term
        ),
        s{it} AS (
          SELECT dst,
                 list_reduce(list_prepend(0.0, list(c ORDER BY src)),
                             (acc, x) -> acc + x) AS s
          FROM c{it} GROUP BY dst
        ),
        r{it + 1} AS (
          SELECT s.dst AS term,
                 ({1.0 - damping!r} / nn.n) + {damping!r} * s.s AS rank
          FROM s{it} s CROSS JOIN nn
        )
        """
        )
    return (
        "WITH "
        + ",".join(parts)
        + f"""
        SELECT term, round(rank, 6) AS rank
        FROM r{iters}
        ORDER BY r{iters}.rank DESC, term
        LIMIT {k}
        """
    )
