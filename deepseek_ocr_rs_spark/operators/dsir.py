"""DSIR-style importance resampling over hashed n-gram features.

Data Selection with Importance Resampling (Xie et al., NeurIPS 2023,
public) selects raw-corpus documents that look like a small target
corpus: featurize each document as a bag of hashed n-grams, estimate the
target and raw bucket distributions, weight every document by the
likelihood ratio of its features, and resample proportionally to the
weight.  This is the standard "make 100 TB of crawl look like Wikipedia"
curation step.

Exactness discipline (the repo contract): no libm.  The paper's
log-likelihood-ratio sum is replaced by the monotone integer analog used
by operators/lm.py — a per-bucket integer ratio score

    w_b = (SCALE * (t_b + 1)) div (r_b + 1)        (Laplace-smoothed)

and a per-document score ``sum over gram occurrences of w_bucket(gram)``,
all exact 64-bit integer arithmetic replicated verbatim in the DuckDB
oracle.  Resampling keeps a document with probability proportional to its
score (score / max_score), decided by the same 60-bit md5 family as
operators/sampling.py — a pure function of (doc_id, seed), so the kept
set is retry/partitioning-stable and row-for-row SQL-checkable.  The
probability comparison multiplies u_mod (< 10^6) by max_score in
DECIMAL(38,0)/HUGEINT so it cannot overflow at any corpus size.

Design for 100 TB:
- featurize = split + zip_with bigrams + explode: pure JVM expressions,
  no Python; cardinality is the corpus token count (same cost class as
  tfidf/posting-list builds).
- bucket stats are two B-row aggregates (map-side combinable); the
  weight table is B rows and broadcast back — no corpus-side shuffle for
  the join.
- the document score is ONE map-side-combinable groupBy(doc_id); the
  max-score scalar is a broadcast cross-join (the q11/q15/q22
  discipline), never a driver collect.

Reference analog: fixed-seed generator discipline — every "random"
choice a pure function of explicit state (crates/core/src/sampling.rs:
104-118).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_SCALE = 1_000_000   # per-bucket ratio fixed-point scale
_BUCKETS_MOD = 1_000_000  # sampling-uniform resolution (sampling.py)
_HEX_DIGITS = 15     # 60-bit md5 keys fit signed int64


def _grams(text: Column) -> Column:
    """Lowercase whitespace unigrams + bigrams as one array column."""
    w = F.filter(F.split(F.lower(text), r"\s+"), lambda x: x != F.lit(""))
    bigrams = F.when(
        F.size(w) >= 2,
        F.zip_with(
            F.slice(w, 1, F.size(w) - 1),
            F.slice(w, 2, F.size(w) - 1),
            lambda a, b: F.concat(a, F.lit(" "), b),
        ),
    ).otherwise(F.array().cast("array<string>"))
    return F.concat(w, bigrams)


def _bucket(term: Column, n_buckets: int) -> Column:
    """60-bit md5 hash bucket — identical to the SQL oracle."""
    u = F.conv(F.substring(F.md5(term), 1, _HEX_DIGITS), 16, 10).cast("long")
    return F.pmod(u, F.lit(n_buckets)).cast("int")


def dsir_resample(
    df: DataFrame,
    target_pred: Column,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = 1024,
    seed: int = 42,
) -> DataFrame:
    """(id, dsir_score, dsir_w, kept) for every document.

    ``target_pred`` marks the target-distribution rows WITHIN ``df`` (the
    small corpus the selection should imitate, e.g. ``col('lang')=='en'``);
    the raw distribution is all of ``df``.  ``dsir_score`` is the exact
    integer importance score, ``dsir_w`` the 6dp display ratio
    score/max_score, ``kept`` the deterministic proportional resample.
    """
    grams = df.select(
        F.col(id_col),
        F.explode(_grams(F.col(text_col))).alias("term"),
    ).withColumn("bucket", _bucket(F.col("term"), n_buckets)).drop("term")

    # the target distribution re-derives grams from the predicate-filtered
    # scan (filter pushed to the source) rather than joining doc ids
    t_counts = (
        df.where(target_pred)
        .select(F.col(id_col), F.explode(_grams(F.col(text_col))).alias("term"))
        .withColumn("bucket", _bucket(F.col("term"), n_buckets))
        .groupBy("bucket")
        .agg(F.count("*").alias("t_cnt"))
    )
    r_counts = grams.groupBy("bucket").agg(F.count("*").alias("r_cnt"))
    weights = (
        r_counts.join(t_counts, "bucket", "left")
        .select(
            "bucket",
            # integer `div`, never floor(double /): exact at any count
            F.expr(
                f"({_SCALE}L * (coalesce(t_cnt, 0L) + 1L)) div (r_cnt + 1L)"
            ).alias("w_b"),
        )
    )

    scores = (
        grams.join(F.broadcast(weights), "bucket")
        .groupBy(id_col)
        .agg(F.sum("w_b").alias("dsir_score"))
    )
    # left join keeps empty-text docs at score 0
    scored = df.select(id_col).join(scores, id_col, "left").select(
        F.col(id_col),
        F.coalesce(F.col("dsir_score"), F.lit(0)).cast("long")
        .alias("dsir_score"),
    )
    max_s = scored.agg(F.max("dsir_score").cast("long").alias("max_s"))
    u = F.conv(
        F.substring(
            F.md5(F.concat_ws(":", F.col(id_col).cast("string"),
                              F.lit(str(seed)))),
            1, _HEX_DIGITS,
        ), 16, 10,
    ).cast("long")
    u_mod = u % _BUCKETS_MOD
    dec = "decimal(38,0)"
    return (
        scored.crossJoin(F.broadcast(max_s))
        .select(
            id_col,
            "dsir_score",
            F.round(
                F.col("dsir_score").cast("double") / F.col("max_s"), 6
            ).alias("dsir_w"),
            (
                u_mod.cast(dec) * F.col("max_s").cast(dec)
                < F.lit(_BUCKETS_MOD).cast(dec)
                * F.col("dsir_score").cast(dec)
            ).alias("kept"),
        )
    )


def dsir_resample_oracle_sql(
    table: str,
    target_pred_sql: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = 1024,
    seed: int = 42,
) -> str:
    """DuckDB SQL replicating ``dsir_resample`` bit-for-bit (exact integer
    bucket hash, ratio weights, HUGEINT proportional-sampling compare)."""
    grams = f"""
        SELECT {id_col},
               CAST(CAST('0x' || substr(md5(g), 1, {_HEX_DIGITS}) AS BIGINT)
                    % {n_buckets} AS INTEGER) AS bucket
        FROM (
          SELECT {id_col},
                 unnest(list_concat(w,
                   list_transform(range(1, len(w)),
                                  i -> w[i] || ' ' || w[i+1]))) AS g
          FROM (
            SELECT {id_col},
                   list_filter(string_split_regex(lower({text_col}),
                                                  '\\s+'),
                               x -> x <> '') AS w
            FROM {table} {{pred}}
          )
        )
    """
    return f"""
        WITH raw_grams AS ({grams.format(pred="")}),
        tgt_grams AS ({grams.format(pred=f"WHERE {target_pred_sql}")}),
        r_counts AS (
          SELECT bucket, count(*) AS r_cnt FROM raw_grams GROUP BY 1
        ),
        t_counts AS (
          SELECT bucket, count(*) AS t_cnt FROM tgt_grams GROUP BY 1
        ),
        weights AS (
          SELECT r.bucket,
                 ({_SCALE}::BIGINT * (COALESCE(t.t_cnt, 0) + 1))
                 // (r.r_cnt + 1) AS w_b
          FROM r_counts r LEFT JOIN t_counts t USING (bucket)
        ),
        scored AS (
          SELECT d.{id_col},
                 CAST(COALESCE(s.dsir_score, 0) AS BIGINT) AS dsir_score
          FROM (SELECT {id_col} FROM {table}) d
          LEFT JOIN (
            SELECT g.{id_col}, SUM(w.w_b) AS dsir_score
            FROM raw_grams g JOIN weights w USING (bucket)
            GROUP BY 1
          ) s USING ({id_col})
        ),
        mx AS (SELECT CAST(MAX(dsir_score) AS BIGINT) AS max_s FROM scored)
        SELECT {id_col}, dsir_score,
               round(CAST(dsir_score AS DOUBLE) / max_s, 6) AS dsir_w,
               (CAST(CAST('0x' || substr(md5(CAST({id_col} AS VARCHAR)
                     || ':{seed}'), 1, {_HEX_DIGITS}) AS BIGINT)
                     % {_BUCKETS_MOD} AS HUGEINT) * max_s)
               < (CAST({_BUCKETS_MOD} AS HUGEINT) * dsir_score) AS kept
        FROM scored CROSS JOIN mx
    """
