"""Trained hashed-n-gram linear classifier (the fastText/CCNet shape).

CCNet-style corpora are filtered by a fastText classifier: hash each
word n-gram into a fixed bucket table, sum the buckets' learned
weights, threshold the score.  This module implements that pipeline's
distributed form end-to-end — TRAIN (count class-conditional bucket
frequencies over a labeled corpus) and PREDICT (argmax of the
class-normalized bucket-count sum) — with arithmetic chosen so the
DuckDB oracle reproduces every prediction bit-for-bit:

* features are word unigrams + bigrams hashed to ``n_buckets`` via the
  repo's 60-bit md5 family (operators/sampling.py discipline), so
  collisions — the hashing trick's defining property — are
  deterministic and identical cross-engine;
* training produces integer counts cnt(label, bucket) and integer
  class totals T(label) — a map-side-combinable groupBy whose shuffle
  carries (bucket, label) pairs only, never text;
* inference scores sum_f cnt(label, bucket(f)) as a pure INTEGER
  aggregation, applying the single class-normalizing division
  score = sum / T(label) only on the final aggregate, so no
  double-precision fold order exists anywhere (log-likelihood — the
  textbook Naive Bayes form — is excluded by the repo's cross-engine
  float contract; the add-only normalized-count score is the same
  argmax family fastText's linear layer computes);
* the model (<= n_buckets x n_classes rows) broadcasts to the probe
  side, the fastText analog of shipping model.bin to every worker —
  a candidate row never shuffles for the lookup; per-document partial
  sums combine map-side before the (doc, label) shuffle.

Docs whose features hit no trained bucket are absent from the output
(no prior — stated, not hidden).  Ties break by (score, label)
lexicographic max on BOTH engines.

Reference analog: deterministic pure-function-of-state scoring,
crates/core/src/sampling.rs:104-118; the classifier tier itself is the
quality/language gate of the large-corpus curation literature (CCNet),
not a reference operator.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _features(text_col) -> "F.Column":
    """array<string>: lowercase word unigrams + '_'-joined bigrams."""
    ws = F.filter(
        F.split(F.lower(text_col), "[^a-z0-9]+"),
        lambda w: w != F.lit(""),
    )
    n = F.greatest(F.lit(0), F.size(ws) - 1)
    bi = F.zip_with(
        F.slice(ws, 1, n),
        F.slice(ws, F.lit(2), n),
        lambda a, b: F.concat_ws("_", a, b),
    )
    return F.concat(ws, bi)


def _bucket_of(col, n_buckets: int, seed: int) -> "F.Column":
    return (
        F.conv(
            F.substring(
                F.md5(F.concat_ws(":", col, F.lit(str(seed)))), 1, 15
            ),
            16, 10,
        ).cast("long") % n_buckets
    )


def train_hashed_ngram_weights(
    df: DataFrame, text_col: str, label_col: str,
    n_buckets: int = 4096, seed: int = 42,
) -> DataFrame:
    """(bucket, label, cnt, total): class-conditional hashed-feature
    counts plus per-class total feature counts.  Both aggregations are
    integer groupBys with map-side combine; result size is bounded by
    n_buckets x n_classes — broadcastable by construction."""
    feats = (
        df.where(F.col(text_col).isNotNull()
                 & F.col(label_col).isNotNull())
        .select(
            F.col(label_col).alias("label"),
            F.explode(_features(F.col(text_col))).alias("feat"),
        )
        .select("label", _bucket_of(F.col("feat"), n_buckets,
                                    seed).alias("bucket"))
    )
    cnts = feats.groupBy("bucket", "label").agg(
        F.count("*").alias("cnt")
    )
    totals = feats.groupBy("label").agg(F.count("*").alias("total"))
    return cnts.join(F.broadcast(totals), "label").select(
        "bucket", "label", "cnt", "total"
    )


def hashed_ngram_predict(
    df: DataFrame, id_col: str, text_col: str, weights: DataFrame,
    n_buckets: int = 4096, seed: int = 42,
) -> DataFrame:
    """(id, pred_label, score): argmax_label sum_f cnt(label,bucket(f))
    / T(label).  Integer sums; ONE final division per (doc, label);
    ties break on (score, label) max.  The weight table attaches by
    broadcast on bucket."""
    probe = (
        df.where(F.col(text_col).isNotNull())
        .select(
            F.col(id_col),
            F.explode(_features(F.col(text_col))).alias("feat"),
        )
        .select(id_col, _bucket_of(F.col("feat"), n_buckets,
                                   seed).alias("bucket"))
    )
    scored = (
        probe.join(F.broadcast(weights), "bucket")
        .groupBy(id_col, "label", "total")
        .agg(F.sum("cnt").alias("hits"))
        .select(
            id_col, "label",
            (F.col("hits").cast("double")
             / F.col("total").cast("double")).alias("score"),
        )
    )
    best = scored.groupBy(id_col).agg(
        F.max(F.struct("score", "label")).alias("b")
    )
    return best.select(
        id_col,
        F.col("b.label").alias("pred_label"),
        # 6dp rounding SPELLED OUT as floor(x*1e6+0.5)/1e6: engine-native
        # round() flips the last digit at representation boundaries
        # (Spark HALF_UP on the binary expansion vs DuckDB rint) — the
        # q2_min_cost_supplier discipline
        (F.floor(F.col("b.score") * 1000000 + 0.5) / 1000000)
        .alias("score"),
    )


def hashclf_oracle_sql(
    train_sql: str, predict_sql: str, id_col: str, text_col: str,
    label_col: str, n_buckets: int = 4096, seed: int = 42,
) -> str:
    """DuckDB SQL replicating train + predict bit-for-bit.
    ``train_sql`` / ``predict_sql`` are subqueries yielding the labeled
    training rows and the rows to classify."""

    def bucket(col):
        return (
            f"(CAST('0x' || substr(md5({col} || ':{seed}'), 1, 15)"
            f" AS BIGINT) % {n_buckets})"
        )

    return f"""
        WITH tr AS (
          SELECT {label_col} AS label,
                 list_filter(string_split_regex(lower({text_col}),
                             '[^a-z0-9]+'), w -> w <> '') AS ws
          FROM ({train_sql}) t
          WHERE {text_col} IS NOT NULL AND {label_col} IS NOT NULL
        ),
        tr_feats AS (
          SELECT label, unnest(
            list_concat(ws,
              list_transform(list_zip(ws[1:len(ws)-1], ws[2:len(ws)]),
                             p -> p[1] || '_' || p[2]))) AS feat
          FROM tr
        ),
        cnts AS (
          SELECT {bucket("feat")} AS bucket, label, count(*) AS cnt
          FROM tr_feats GROUP BY 1, 2
        ),
        totals AS (
          SELECT label, count(*) AS total FROM tr_feats GROUP BY 1
        ),
        pr AS (
          SELECT {id_col},
                 list_filter(string_split_regex(lower({text_col}),
                             '[^a-z0-9]+'), w -> w <> '') AS ws
          FROM ({predict_sql}) p
          WHERE {text_col} IS NOT NULL
        ),
        pr_feats AS (
          SELECT {id_col}, unnest(
            list_concat(ws,
              list_transform(list_zip(ws[1:len(ws)-1], ws[2:len(ws)]),
                             p -> p[1] || '_' || p[2]))) AS feat
          FROM pr
        ),
        pr_buckets AS (
          SELECT {id_col}, {bucket("feat")} AS bucket FROM pr_feats
        ),
        scored AS (
          SELECT b.{id_col}, c.label,
                 CAST(sum(c.cnt) AS DOUBLE)
                   / CAST(any_value(t.total) AS DOUBLE) AS score
          FROM pr_buckets b
          JOIN cnts c USING (bucket)
          JOIN totals t ON c.label = t.label
          GROUP BY b.{id_col}, c.label
        ),
        best AS (
          SELECT {id_col}, label AS pred_label,
                 floor(score * 1000000 + 0.5) / 1000000 AS score,
                 row_number() OVER (PARTITION BY {id_col}
                                    ORDER BY score DESC, label DESC)
                   AS rn
          FROM scored
        )
        SELECT {id_col}, pred_label, score FROM best WHERE rn = 1
    """
