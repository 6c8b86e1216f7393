"""Word-n-gram repetition signals and benchmark decontamination.

Two curation operators a 100 TB training-data pipeline runs alongside the
dedup/quality tiers (SURVEY §6; same family as operators/textstats.py):

* ``ngram_repetition_signals`` — the Gopher-style repetition family:
  per document, the mass fraction of the single most frequent word n-gram
  (n=2,3) and the fraction of n-gram occurrences that are duplicates
  (n=5).  Boilerplate and spam have high top-2-gram mass; templated spin
  has high duplicate-5-gram mass.
* ``ngram_decontaminate`` — benchmark contamination scoring: the fraction
  of a document's distinct word n-grams (n=5) that also occur in a
  benchmark/eval set.  Train/test leakage control.

Both are pure JVM expression pipelines (split -> lambda transform ->
explode -> aggregate): no Python, map-side partial aggregation, and the
shuffle key is (doc_id, gram) — high cardinality, naturally balanced.  The
benchmark gram set is broadcast (eval sets are tiny next to a corpus), so
decontamination adds NO extra shuffle beyond the per-doc distinct.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _tokens_expr(text_col: str) -> str:
    return f"filter(split({text_col}, '\\\\s+'), x -> x != '')"


def _ngrams_expr(text_col: str, n: int) -> str:
    """SQL expression: array of space-joined word n-grams (empty if too short)."""
    toks = _tokens_expr(text_col)
    return (
        f"CASE WHEN size({toks}) >= {n} THEN "
        f"transform(sequence(0, size({toks}) - {n}), "
        f"i -> array_join(slice({toks}, i + 1, {n}), ' ')) "
        f"ELSE cast(array() AS array<string>) END"
    )


def ngram_repetition_signals(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    top_ns: Sequence[int] = (2, 3),
    dup_ns: Sequence[int] = (5,),
) -> DataFrame:
    """Per-doc repetition fractions, 6dp.

    ``top{n}_frac`` = occurrences of the most frequent n-gram / total
    n-grams; ``dup{n}_frac`` = occurrences belonging to n-grams seen more
    than once / total.  Documents shorter than n tokens score 0.0.
    """
    all_ns = sorted(set(top_ns) | set(dup_ns))
    per_n = [
        df.select(
            F.col(id_col),
            F.lit(n).alias("n"),
            F.explode(F.expr(_ngrams_expr(text_col, n))).alias("gram"),
        )
        for n in all_ns
    ]
    exploded = per_n[0]
    for p in per_n[1:]:
        exploded = exploded.unionByName(p)

    counts = exploded.groupBy(id_col, "n", "gram").count()
    stats = counts.groupBy(id_col, "n").agg(
        F.sum("count").alias("total"),
        F.max("count").alias("top"),
        F.sum(F.when(F.col("count") > 1, F.col("count")).otherwise(0))
        .alias("dup"),
    )

    aggs = []
    for n in top_ns:
        aggs.append(
            F.round(
                F.coalesce(
                    F.max(F.when(F.col("n") == n,
                                 F.col("top") / F.col("total"))),
                    F.lit(0.0),
                ),
                6,
            ).alias(f"top{n}_frac")
        )
    for n in dup_ns:
        aggs.append(
            F.round(
                F.coalesce(
                    F.max(F.when(F.col("n") == n,
                                 F.col("dup") / F.col("total"))),
                    F.lit(0.0),
                ),
                6,
            ).alias(f"dup{n}_frac")
        )
    # left join back so short/empty documents still get 0.0 rows
    return (
        df.select(id_col)
        .join(stats, on=id_col, how="left")
        .groupBy(id_col)
        .agg(*aggs)
    )


def ngram_decontaminate(
    corpus: DataFrame,
    benchmark: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 5,
) -> DataFrame:
    """Per-corpus-doc contamination vs a benchmark set, 6dp.

    ``contamination_frac`` = |distinct n-grams ∩ benchmark n-grams| /
    |distinct n-grams|.  The benchmark gram set is broadcast — eval sets
    are MBs against a corpus of TBs, so the probe join is shuffle-free on
    the corpus side (the only shuffle is the per-doc distinct).
    """
    bench_grams = (
        benchmark.select(
            F.explode(F.expr(_ngrams_expr(text_col, n))).alias("gram")
        )
        .distinct()
        .withColumn("_hit", F.lit(1))
    )
    doc_grams = corpus.select(
        F.col(id_col),
        F.explode(F.expr(_ngrams_expr(text_col, n))).alias("gram"),
    ).distinct()
    scored = (
        doc_grams.join(F.broadcast(bench_grams), on="gram", how="left")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("total_grams"),
            F.coalesce(F.sum("_hit"), F.lit(0)).alias("matched_grams"),
        )
    )
    return (
        corpus.select(id_col)
        .join(scored, on=id_col, how="left")
        .select(
            id_col,
            F.coalesce("total_grams", F.lit(0)).alias("total_grams"),
            F.coalesce("matched_grams", F.lit(0)).alias("matched_grams"),
            F.round(
                F.coalesce(
                    F.col("matched_grams") / F.col("total_grams"), F.lit(0.0)
                ),
                6,
            ).alias("contamination_frac"),
        )
    )
