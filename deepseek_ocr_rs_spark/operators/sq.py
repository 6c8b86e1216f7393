"""SQ8 scalar quantization for the embedding column — the fourth ANN
compression tier (brute -> LSH/IVF -> PQ/IVFADC -> SQ8).

Per-dimension affine uint8 quantization, the standard "SQ8" of FAISS /
Milvus: for dimension d with corpus range [mn_d, mx_d],

    code_d(x) = least(255, greatest(0, floor((x - mn_d) * 255.0 / span_d)))
    span_d    = mx_d - mn_d          (span 0 -> code 0, constant dim)

and search scores are the EXACT int64 dot product of code vectors
(symmetric SQ): every step after the min/max scan is integer arithmetic,
so the DuckDB oracle reproduces scores bit-for-bit — the gate checks the
result set exactly, not by recall.

Scale posture (100 TB):
  * the min/max scan is ONE map-side partial aggregate (128 columns for
    dim=64) collapsing to a single driver row — the only collect, bounded
    by dimensionality, never by corpus size (same discipline as the PQ
    codebook collect, operators/pq.py);
  * encoding is a JVM transform() over an array-literal of per-dim
    constants — no Python, no shuffle, pipelines inside the scan;
  * query scoring dots a 64-int literal against each code vector and
    top-k's via TakeOrderedAndProject — at cluster scale the uint8 codes
    are 4x smaller than the float32 vectors, which is the point: the
    rerank tier reads codes only and never moves raw vectors.

Cross-engine float note: (x - mn) * 255.0 / span is evaluated in float64
with the SAME operation order on both engines over bit-identical inputs
(FLOAT column values widened exactly to double), so the floor is
deterministic; mins/maxes themselves come from comparisons, not
arithmetic.  This is the similarity.py parity argument with a strictly
smaller vulnerable set (floor boundaries instead of sign boundaries).
"""

from __future__ import annotations

from typing import List, Sequence, Tuple

import numpy as np

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "sq8_train",
    "sq8_encode_col",
    "sq8_topk",
    "sq8_topk_oracle_sql",
]


def sq8_train(
    emb: DataFrame, vec_col: str = "embedding"
) -> Tuple[List[float], List[float]]:
    """One aggregate pass -> (mins, spans) per dimension.

    Dimensionality is read from one row (bounded collect); the min/max
    scan is a single partial-aggregable job.
    """
    first = emb.select(vec_col).where(F.col(vec_col).isNotNull()).first()
    if first is None:
        raise ValueError("no vectors to train on")
    dim = len(first[0])
    aggs = []
    for i in range(dim):
        x = F.col(vec_col)[i].cast("double")
        aggs.append(F.min(x).alias(f"mn{i}"))
        aggs.append(F.max(x).alias(f"mx{i}"))
    row = emb.where(
        F.col(vec_col).isNotNull() & (F.size(vec_col) == dim)
    ).agg(*aggs).first()
    mins = [float(row[f"mn{i}"]) for i in range(dim)]
    spans = [float(row[f"mx{i}"]) - float(row[f"mn{i}"]) for i in range(dim)]
    return mins, spans


def sq8_encode_col(
    vec_col: Column, mins: Sequence[float], spans: Sequence[float]
) -> Column:
    """vec -> array<int> of uint8 codes (JVM transform, no Python)."""
    mn_lit = F.array(*[F.lit(float(m)) for m in mins])
    sp_lit = F.array(*[F.lit(float(s)) for s in spans])
    idx = F.sequence(F.lit(0), F.lit(len(mins) - 1))
    return F.transform(
        idx,
        lambda i: F.when(sp_lit[i] == 0.0, F.lit(0)).otherwise(
            F.least(
                F.lit(255),
                F.greatest(
                    F.lit(0),
                    F.floor(
                        (vec_col[i].cast("double") - mn_lit[i])
                        * 255.0
                        / sp_lit[i]
                    ).cast("int"),
                ),
            )
        ),
    )


def quantize_query(
    q: Sequence[float], mins: Sequence[float], spans: Sequence[float]
) -> List[int]:
    """Same formula as sq8_encode_col, in float64 scalar ops (IEEE —
    identical results to the SQL expression on identical inputs)."""
    out = []
    for x, mn, sp in zip(q, mins, spans):
        if sp == 0.0:
            out.append(0)
            continue
        c = int(np.floor((np.float64(x) - np.float64(mn))
                         * np.float64(255.0) / np.float64(sp)))
        out.append(max(0, min(255, c)))
    return out


def sq8_topk(
    emb: DataFrame,
    query: Sequence[float],
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Exact-integer SQ8 search: top-k by int64 code dot product,
    ties on id.  Output (vec_id, qscore) — no array columns (driver
    canonicalizer contract).

    qscore is emitted as DOUBLE: the oracle's SUM(BIGINT) is a DuckDB
    HUGEINT, which pandas materializes as float64 — emitting int64 on the
    Spark side makes a dtype-sensitive canonicalizer hash the same exact
    integer two ways (the CORRECTNESS_r05 hash_match=false).  Scores are
    bounded by dim * 255 * 255 (~4.2e6 at dim=64), far below 2^53, so the
    double holds the integer exactly and the computed values are unchanged.
    """
    mins, spans = sq8_train(emb, vec_col)
    qcodes = quantize_query(query, mins, spans)
    codes = sq8_encode_col(F.col(vec_col), mins, spans)
    q_lit = F.array(*[F.lit(int(c)) for c in qcodes])
    score = F.aggregate(
        F.zip_with(codes, q_lit, lambda a, b: a.cast("bigint") * b),
        F.lit(0).cast("bigint"),
        lambda acc, x: acc + x,
    )
    return (
        emb.where(F.col(vec_col).isNotNull() & (F.size(vec_col) == len(mins)))
        .select(F.col(id_col), score.cast("double").alias("qscore"))
        .orderBy(F.desc("qscore"), F.asc(id_col))
        .limit(k)
    )


def sq8_topk_oracle_sql(
    table: str = "embeddings",
    query_id: int = 0,
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> str:
    """DuckDB replica: train (min/max per dim), encode corpus + query with
    the identical affine formula, exact int dot, top-k with id tiebreak."""
    return f"""
WITH valid AS (
  SELECT {id_col}, {vec_col}
  FROM {table}
  WHERE {vec_col} IS NOT NULL
    AND len({vec_col}) = (SELECT len({vec_col}) FROM {table}
                          WHERE {vec_col} IS NOT NULL LIMIT 1)
),
dims AS (
  SELECT i,
         MIN(CAST(v AS DOUBLE)) AS mn,
         MAX(CAST(v AS DOUBLE)) - MIN(CAST(v AS DOUBLE)) AS span
  FROM (SELECT UNNEST({vec_col}) AS v,
               generate_subscripts({vec_col}, 1) AS i
        FROM valid)
  GROUP BY i
),
codes AS (
  SELECT e.{id_col},
         d.i,
         CASE WHEN d.span = 0 THEN 0
              ELSE LEAST(255, GREATEST(0,
                   CAST(FLOOR((CAST(e.{vec_col}[d.i] AS DOUBLE) - d.mn)
                              * 255.0 / d.span) AS INT)))
         END AS c
  FROM valid e, dims d
),
qcodes AS (
  SELECT i, c FROM codes WHERE {id_col} = {query_id}
),
scores AS (
  SELECT codes.{id_col},
         SUM(CAST(codes.c AS BIGINT) * qcodes.c) AS qscore
  FROM codes JOIN qcodes USING (i)
  GROUP BY codes.{id_col}
)
SELECT {id_col}, qscore
FROM scores
ORDER BY qscore DESC, {id_col} ASC
LIMIT {k}
"""
