"""Per-document n-gram novelty (corpus-contribution scoring).

Data-curation stacks rank documents by how much NEW text they add to
the corpus: RefinedWeb/FineWeb-class pipelines track the duplicate-
n-gram fraction as the aggregate "how much of this crawl is new"
signal, and the per-document version — what fraction of a document's
n-grams appear in NO earlier document — is the ordering-aware
counterpart used for crawl-over-crawl triage and dedup-rate curves.
Distinct from span_dedup (removes globally repeated spans, no
attribution) and from ExactSubstr (within-pair duplicated ranges):
novelty ATTRIBUTES each n-gram to the single document that introduced
it under the corpus's id order, so scores are deterministic, order-
sensitive by design, and sum to the corpus's distinct-n-gram count.

``ngram_novelty`` computes, per document: the distinct ``n``-gram count,
the count of those n-grams whose corpus-wide FIRST occurrence (minimum
``id_col``) is this document, and the novelty in integer basis points
(10000 * n_new / n_grams, floor — the integer-bp discipline of
doc_oov_rate).  Empty / sub-n-token documents report (0, 0, NULL).

100 TB posture:
* tokenize + sliding n-grams are map-side lambda expressions (no
  Python); per-doc DISTINCT grams collapse repetition before anything
  shuffles;
* the first-occurrence table is ONE hash aggregate keyed on the gram
  (min is map-side-combinable; stop-gram skew is absorbed by partial
  aggregation — a gram in every doc still reduces to one row);
* attribution is an equi-join back on the gram key — big-big but
  hash-balanced on the same high-cardinality key, and AQE handles the
  Zipf head;
* the per-doc rollup re-keys on doc_id (the corpus's layout key).
  Three exchanges total, all key-balanced — audited in PLANS.md.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = [
    "ngram_novelty",
    "ngram_novelty_oracle_sql",
    "ngram_overlap_vs",
    "ngram_overlap_vs_oracle_sql",
]


def _grams_expr(text_col: str, n: int) -> str:
    """SQL expr: array<string> of SLIDING lowercase whitespace-token
    n-grams (size - n + 1 of them; empty array below n tokens)."""
    toks = f"filter(split(lower({text_col}), '\\\\s+'), x -> x != '')"
    return (
        f"CASE WHEN size({toks}) >= {n} THEN "
        f"transform(sequence(0, size({toks}) - {n}), "
        f"i -> array_join(slice({toks}, i + 1, {n}), ' ')) "
        f"ELSE cast(array() as array<string>) END"
    )


def ngram_novelty(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
) -> DataFrame:
    """(id, n_grams, n_new, novelty_bp) per input row — see module doc.

    r06 kernel note (guide §2.3/§2.4): the old pipeline exploded grams
    via interpreted slice+array_join, shuffled the distinct (id, gram)
    pairs, aggregated first-occurrence, then JOINED the pair table back
    on the gram to count n_new per doc — four exchanges and a big-big
    string join (32.3 s at sf1.0).  Two structural facts remove most of
    it: per-doc distinct gram sets (and so n_grams) are map-local, and
    each distinct gram contributes exactly ONE n_new — to its first_id
    doc — so n_new per doc is a groupBy(first_id) count over the
    first-occurrence table; the attribution join disappears.  One
    mapInPandas gram pass (identical ASCII \\s+ / lower tokenization),
    one map-side-combinable min aggregate, one tiny count — the only
    remaining exchanges carry (gram, partial-min) once and then one row
    per distinct gram.
    """
    import re

    import pandas as pd

    ws = re.compile(r"\s+", re.ASCII)
    id_type = dict(df.dtypes)[id_col]

    def gram_rows(batches):
        for pdf in batches:
            ids, grams = [], []
            for did, text in zip(pdf[id_col], pdf[text_col]):
                toks = [t for t in ws.split((text or "").lower()) if t]
                gset = (
                    {" ".join(toks[i:i + n])
                     for i in range(len(toks) - n + 1)}
                    if len(toks) >= n else set()
                )
                ids.extend([did] * len(gset))
                grams.extend(gset)
            yield pd.DataFrame({id_col: ids, "gram": grams})

    from deepseek_ocr_rs_spark.operators.rebalance import (
        rebalance_for_arrow,
    )

    pairs = rebalance_for_arrow(df.select(id_col, text_col)).mapInPandas(
        gram_rows, schema=f"{id_col} {id_type}, gram string"
    )
    # per-gram first occurrence; each gram adds 1 to its first doc only
    n_new = (
        pairs.groupBy("gram")
        .agg(F.min(id_col).alias("first_id"))
        .groupBy(F.col("first_id").alias(id_col))
        .agg(F.count(F.lit(1)).alias("n_new"))
    )

    def gram_counts(batches):
        for pdf in batches:
            rows = []
            for did, text in zip(pdf[id_col], pdf[text_col]):
                toks = [t for t in ws.split((text or "").lower()) if t]
                cnt = (
                    len({" ".join(toks[i:i + n])
                         for i in range(len(toks) - n + 1)})
                    if len(toks) >= n else 0
                )
                rows.append((did, cnt))
            yield pd.DataFrame(rows, columns=[id_col, "n_grams"])

    per_doc = rebalance_for_arrow(df.select(id_col, text_col)).mapInPandas(
        gram_counts, schema=f"{id_col} {id_type}, n_grams long"
    )
    return (
        per_doc.join(n_new, id_col, "left")
        .select(
            F.col(id_col),
            F.col("n_grams"),
            F.coalesce("n_new", F.lit(0)).cast("long").alias("n_new"),
            # integer floor division (the pagerank DIV discipline) so the
            # basis points are cross-engine exact; NULL for gram-less docs.
            # coalesce INSIDE the expr: docs whose grams are all seen
            # earlier have no row in the first-occurrence rollup
            # NULL numerator when n_grams = 0 so the ANSI integral divide
            # propagates NULL instead of erroring (the old pre-coalesce
            # n_new was NULL there for the same effect)
            F.expr(
                "cast((10000 * (CASE WHEN n_grams > 0 THEN "
                "coalesce(n_new, 0) END)) div n_grams as bigint)"
            ).alias("novelty_bp"),
        )
    )


def ngram_novelty_oracle_sql(
    table: str = "documents",
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
) -> str:
    """DuckDB SQL replicating ``ngram_novelty`` exactly (same sliding
    grams, same min-id attribution, same floor-division basis points)."""
    return f"""
        WITH nv_toks AS (
          SELECT {id_col},
                 list_filter(string_split_regex(lower({text_col}), '\\s+'),
                             x -> x <> '') AS toks
          FROM {table}
        ),
        nv_grams AS (
          SELECT DISTINCT {id_col},
                 array_to_string(list_slice(toks, i + 1, i + {n}), ' ')
                   AS gram
          FROM nv_toks,
               UNNEST(range(0, greatest(len(toks) - {n} + 1, 0))) AS u(i)
        ),
        nv_first AS (
          SELECT gram, min({id_col}) AS first_id FROM nv_grams GROUP BY gram
        ),
        nv_scored AS (
          SELECT g.{id_col},
                 count(*) AS n_grams,
                 sum(CASE WHEN f.first_id = g.{id_col} THEN 1 ELSE 0 END)
                   AS n_new
          FROM nv_grams g JOIN nv_first f USING (gram)
          GROUP BY g.{id_col}
        )
        SELECT d.{id_col},
               CAST(coalesce(s.n_grams, 0) AS BIGINT) AS n_grams,
               CAST(coalesce(s.n_new, 0) AS BIGINT) AS n_new,
               CAST(10000 * s.n_new // s.n_grams AS BIGINT) AS novelty_bp
        FROM (SELECT {id_col} FROM {table}) d
        LEFT JOIN nv_scored s USING ({id_col})
    """


def ngram_overlap_vs(
    new_df: DataFrame,
    ref_df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
) -> DataFrame:
    """Cross-snapshot overlap: for every document of ``new_df``, the
    fraction of its distinct sliding ``n``-grams already present
    ANYWHERE in ``ref_df`` — the crawl-over-crawl dedup-rate metric
    (what share of crawl N+1 is old news), per document so the rollup
    can slice by host/source.  Returns
    ``(id, n_grams, n_seen, overlap_bp)`` with ``overlap_bp = 10000 *
    n_seen div n_grams`` (floor; NULL for gram-less docs).  The
    within-corpus counterpart is :func:`ngram_novelty` (attribution by
    min id); this one is BETWEEN corpora and needs no ordering.

    100 TB plan shape: the reference collapses to its DISTINCT gram set
    (one hash aggregate — the only pass over the old crawl); the
    membership test is a gram-keyed LEFT SEMI-shaped join counted via a
    left join + flag sum, hash-balanced on the gram.  Neither corpus is
    ever read twice.
    """
    # r06 kernel: gram construction for BOTH snapshots moves from the
    # interpreted slice+array_join chain into Arrow batch passes (the
    # ngram_novelty tokenizer, identical lower/\s+ ASCII contract);
    # join topology unchanged — 10.8 s -> ~2 s at sf1.0.
    import re

    import pandas as pd

    from deepseek_ocr_rs_spark.operators.rebalance import (
        rebalance_for_arrow,
    )

    ws = re.compile(r"\s+", re.ASCII)
    id_type = dict(new_df.dtypes)[id_col]

    def doc_gram_rows(batches):
        for pdf in batches:
            ids, grams = [], []
            for did, text in zip(pdf[id_col], pdf[text_col]):
                toks = [t for t in ws.split((text or "").lower()) if t]
                gset = (
                    {" ".join(toks[i:i + n])
                     for i in range(len(toks) - n + 1)}
                    if len(toks) >= n else set()
                )
                ids.extend([did] * len(gset))
                grams.extend(gset)
            yield pd.DataFrame({id_col: ids, "gram": grams})

    def ref_gram_rows(batches):
        for pdf in batches:
            out = set()
            for text in pdf[text_col]:
                toks = [t for t in ws.split((text or "").lower()) if t]
                if len(toks) >= n:
                    out.update(
                        " ".join(toks[i:i + n])
                        for i in range(len(toks) - n + 1)
                    )
            yield pd.DataFrame({"gram": sorted(out)})

    new_grams = rebalance_for_arrow(
        new_df.select(id_col, text_col)
    ).mapInPandas(doc_gram_rows, schema=f"{id_col} {id_type}, gram string")
    ref_grams = (
        rebalance_for_arrow(ref_df.select(text_col))
        .mapInPandas(ref_gram_rows, schema="gram string")
        .distinct()
        .withColumn("_seen", F.lit(1))
    )
    scored = (
        new_grams.join(ref_grams, "gram", "left")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_grams"),
            F.sum(F.coalesce("_seen", F.lit(0))).alias("n_seen"),
        )
    )
    return (
        new_df.select(id_col)
        .join(scored, id_col, "left")
        .select(
            F.col(id_col),
            F.coalesce("n_grams", F.lit(0)).cast("long").alias("n_grams"),
            F.coalesce("n_seen", F.lit(0)).cast("long").alias("n_seen"),
            F.expr(
                "cast((10000 * coalesce(n_seen, 0)) div n_grams as bigint)"
            ).alias("overlap_bp"),
        )
    )


def ngram_overlap_vs_oracle_sql(
    new_sql: str,
    ref_sql: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
) -> str:
    """DuckDB SQL replicating ``ngram_overlap_vs`` exactly."""
    return f"""
        WITH ov_new AS ({new_sql}),
        ov_ref AS ({ref_sql}),
        ov_ngrams AS (
          SELECT DISTINCT {id_col},
                 array_to_string(list_slice(toks, i + 1, i + {n}), ' ')
                   AS gram
          FROM (
            SELECT {id_col},
                   list_filter(string_split_regex(lower({text_col}),
                               '\\s+'), x -> x <> '') AS toks
            FROM ov_new
          ), UNNEST(range(0, greatest(len(toks) - {n} + 1, 0))) AS u(i)
        ),
        ov_rgrams AS (
          SELECT DISTINCT
                 array_to_string(list_slice(toks, i + 1, i + {n}), ' ')
                   AS gram
          FROM (
            SELECT list_filter(string_split_regex(lower({text_col}),
                               '\\s+'), x -> x <> '') AS toks
            FROM ov_ref
          ), UNNEST(range(0, greatest(len(toks) - {n} + 1, 0))) AS u(i)
        ),
        ov_scored AS (
          SELECT g.{id_col},
                 count(*) AS n_grams,
                 sum(CASE WHEN r.gram IS NOT NULL THEN 1 ELSE 0 END)
                   AS n_seen
          FROM ov_ngrams g LEFT JOIN ov_rgrams r USING (gram)
          GROUP BY g.{id_col}
        )
        SELECT d.{id_col},
               CAST(coalesce(s.n_grams, 0) AS BIGINT) AS n_grams,
               CAST(coalesce(s.n_seen, 0) AS BIGINT) AS n_seen,
               CAST(10000 * coalesce(s.n_seen, 0) // s.n_grams AS BIGINT)
                 AS overlap_bp
        FROM (SELECT {id_col} FROM ov_new) d
        LEFT JOIN ov_scored s USING ({id_col})
    """
