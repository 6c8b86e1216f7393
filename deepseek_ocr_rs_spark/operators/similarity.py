"""Approximate-nearest-neighbor search over an embedding column.

Three tiers:

  brute_force_topk   exact cosine top-k against a broadcast query vector —
                     JVM-side only (zip_with/aggregate), one pass, no
                     shuffle except the final top-k (TakeOrderedAndProject).
                     The correct baseline and the verify oracle for ANN.

  LSH                random-hyperplane LSH (signed projections -> bit
                     signature -> bucket).  Split API: ``build_lsh_index``
                     computes the signature column ONCE (persist it /
                     cluster the table by it); ``lsh_query`` prunes to the
                     query's bucket (+ hamming-1 multiprobe) using the
                     STORED column — its plan contains no Python stage.
                     At 100 TB the bucket predicate is an IN-list literal,
                     so partition/row-group pruning applies when the table
                     is clustered by lsh_bucket.

  IVF                ``assign_ivf_cells`` + ``ivf_query``: deterministic
                     seed centroids (md5-ordered corpus rows — an order
                     both Spark and the SQL oracle can reproduce), map-side
                     cell assignment with broadcast centroids, search only
                     the query's nprobe nearest cells.  At cluster scale
                     the cell id becomes a partition column.

Oracle parity: the pruning itself is deterministic arithmetic over fixed
constants (hyperplanes from a fixed-seed RNG; centroids from md5 row
order), so ``lsh_oracle_sql`` / ``ivf_oracle_sql`` generate DuckDB SQL that
replicates signature computation, probing, and the exact-cosine rerank —
the driver checks the ANN result sets EXACTLY, not merely by recall.

All float math is float64 and rerank scores are rounded to 6dp so results
are reproducible across partitionings and engines.

Parity fine print (probabilistic, not absolute): the signature sign test
and the IVF cell argmax compare float64 sums computed in different orders
(numpy BLAS pairwise/SIMD vs DuckDB sequential list_sum).  A projection or
cell-sim lying within the ~1e-15-relative cross-engine summation error of
the decision boundary (0 for sign; a tie for argmax) could flip a bucket on
one engine only.  That vulnerable set has measure ~1e-15 per comparison
(~4e-12 across a 500x8-bit oracle corpus) — we deliberately do NOT round
before the comparison: rounding to d decimals moves the vulnerable set to
the half-grid boundaries, whose density (err/10^-d, e.g. ~1e-6 at 9dp) is
ORDERS OF MAGNITUDE larger than the unrounded near-zero set.  Parity is
therefore documented as probabilistic with failure odds ~1e-12, not exact.
"""

from __future__ import annotations

from typing import List, Optional, Sequence

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _nonzero_norm(df: DataFrame, vec_col: str) -> DataFrame:
    """Exclude zero-norm vectors: cosine is undefined for them (the division
    throws under ANSI mode) and a zero vector is never a legitimate
    similarity participant — the vector analog of dedup's _drop_wordless.
    Map-side predicate, no shuffle; every oracle applies the identical
    filter."""
    from deepseek_ocr_rs_spark.operators.rebalance import rebalance_for_arrow

    # every embeddings-tier plan enters through this filter; the local
    # embeddings table is one parquet split, which would serialize the
    # interpreted norm fold AND every downstream signature/cosine stage
    # (no-op at cluster scale — guide §2)
    return rebalance_for_arrow(df).where(
        F.aggregate(F.col(vec_col), F.lit(0.0),
                    lambda acc, x: acc + x.cast("double") * x.cast("double"))
        > 0
    )


def _cosine_col(vec_col, query: Sequence[float]):
    """cosine(embedding, query) as a JVM expression (no UDF).

    dot/norms via F.aggregate in index order -> deterministic float64."""
    q = [float(x) for x in query]
    qnorm = float(np.sqrt(np.sum(np.asarray(q, dtype=np.float64) ** 2)))
    if qnorm == 0.0:
        raise ValueError("query vector has zero norm: cosine undefined")
    qlit = F.array(*[F.lit(x) for x in q])
    dot = F.aggregate(
        F.zip_with(vec_col, qlit, lambda a, b: a.cast("double") * b),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    vnorm = F.sqrt(
        F.aggregate(
            vec_col,
            F.lit(0.0),
            lambda acc, x: acc + x.cast("double") * x.cast("double"),
        )
    )
    return dot / (vnorm * F.lit(qnorm))


def brute_force_topk(
    df: DataFrame,
    query: Sequence[float],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_to: Optional[int] = 6,
) -> DataFrame:
    """Exact cosine top-k. Plan: scan -> project -> TakeOrderedAndProject
    (per-partition top-k then driver merge; no full sort, no wide shuffle).
    Zero-norm corpus vectors are excluded (cosine undefined)."""
    df = _nonzero_norm(df, vec_col)
    sim = _cosine_col(F.col(vec_col), query)
    if round_to is not None:
        sim = F.round(sim, round_to)
    return (
        df.select(F.col(id_col), sim.alias("cosine_sim"))
        .orderBy(F.desc("cosine_sim"), F.col(id_col))
        .limit(k)
    )


# -------------------------------------------------------------------- LSH

def _hyperplanes(dim: int, bits: int) -> np.ndarray:
    rng = np.random.default_rng(0xA11CE)  # fixed family
    return rng.standard_normal((bits, dim))


def lsh_signature(vec: Sequence[float], planes: np.ndarray) -> int:
    proj = planes @ np.asarray(vec, dtype=np.float64)
    sig = 0
    for i, p in enumerate(proj):
        if p > 0:
            sig |= 1 << i
    return sig


def build_lsh_index(
    df: DataFrame, dim: int, bits: int = 12,
    vec_col: str = "embedding",
) -> DataFrame:
    """INDEX BUILD (run once, persist): add the LSH bucket id, vectorized —
    one matmul per Arrow batch.  Write the result out (ideally clustered /
    partitioned by lsh_bucket) and serve every query from the stored
    column via ``lsh_query``."""
    planes = _hyperplanes(dim, bits)

    from pyspark.sql.types import LongType

    @F.pandas_udf(LongType())
    def _sig(batch: pd.Series) -> pd.Series:
        if len(batch) == 0:
            return pd.Series([], dtype="int64")
        mat = np.stack(batch.map(lambda v: np.asarray(v, dtype=np.float64)))
        proj = mat @ planes.T  # [n, bits]
        bitvals = (proj > 0).astype(np.int64) << np.arange(bits, dtype=np.int64)
        return pd.Series(bitvals.sum(axis=1))

    return df.withColumn("lsh_bucket", _sig(F.col(vec_col)))


def lsh_probes(query: Sequence[float], bits: int,
               multiprobe_hamming: int = 1) -> List[int]:
    """The query's bucket plus its hamming-1 neighbors (deterministic)."""
    planes = _hyperplanes(len(query), bits)
    qsig = lsh_signature(query, planes)
    probes = [qsig]
    if multiprobe_hamming >= 1:
        probes += [qsig ^ (1 << i) for i in range(bits)]
    return probes


def lsh_query(
    indexed: DataFrame,
    query: Sequence[float],
    k: int = 10,
    bits: int = 12,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    multiprobe_hamming: int = 1,
    round_to: Optional[int] = 6,
) -> DataFrame:
    """QUERY path: prune on the STORED ``lsh_bucket`` column (an IN-list of
    literal bucket ids — no Python stage, pushdown-able to the scan), then
    exact-cosine rerank inside the candidate set."""
    probes = lsh_probes(query, bits, multiprobe_hamming)
    cand = indexed.where(F.col("lsh_bucket").isin(probes))
    return brute_force_topk(cand, query, k, id_col, vec_col, round_to)


def lsh_bucket_topk(
    df: DataFrame,
    query: Sequence[float],
    k: int = 10,
    bits: int = 12,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    multiprobe_hamming: int = 1,
    round_to: Optional[int] = 6,
) -> DataFrame:
    """One-shot convenience: index build + query in a single plan.  For
    repeated queries, persist ``build_lsh_index`` output and call
    ``lsh_query`` — signatures are then NEVER recomputed."""
    indexed = build_lsh_index(df, len(query), bits, vec_col)
    return lsh_query(indexed, query, k, bits, id_col, vec_col,
                     multiprobe_hamming, round_to)


def batch_lsh_topk(
    indexed: DataFrame,
    indexed_queries: DataFrame,
    k: int = 10,
    bits: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    multiprobe_hamming: int = 1,
    round_to: Optional[int] = 6,
    anti_col: Optional[str] = None,
) -> DataFrame:
    """BATCH ANN: top-k neighbors for EVERY query row at once — the scale
    path for corpus-wide retrieval (dedup mining, hard-negative mining),
    where per-query ``lsh_query`` round-trips would be driver-bound.

    ``anti_col``: contrastive hard-negative mining — candidates must
    DIFFER from the query on this column (e.g. a class label), so each
    query's top-k are the most-similar vectors of OTHER classes: exactly
    the negatives a contrastive objective learns most from.  NULL values
    never match the inequality and are excluded on both sides (labelless
    rows can be neither anchors nor negatives).

    Topology: each query row explodes into its multiprobe bucket set
    (1 + bits int64 values), then ONE equi-join on ``lsh_bucket`` pairs
    queries with candidates — the shuffle key is a single int64, never a
    vector; vectors travel only on the matched pairs into the exact-cosine
    rerank, and the per-query top-k is one window pass.  At 100 TB the
    corpus side can be pre-partitioned/bucketed by ``lsh_bucket`` so the
    join co-locates, and AQE handles hot buckets (skew-join split).

    Both inputs must carry the ``lsh_bucket`` column from
    ``build_lsh_index`` with the SAME (dim, bits) planes.  A corpus row can
    match a query through at most one probe (probes are distinct bucket
    values, each row has one bucket), so no pair dedup is needed."""
    # zero-norm vectors yield 0/0 = NaN cosine, and Spark orders NaN
    # GREATEST under desc — without this filter they'd squat in every
    # top-k.  Mirrors brute_force_topk and batch_lsh_oracle_sql.
    indexed = _nonzero_norm(indexed, vec_col)
    indexed_queries = _nonzero_norm(indexed_queries, vec_col)
    if anti_col is not None:
        indexed = indexed.where(F.col(anti_col).isNotNull())
        indexed_queries = indexed_queries.where(F.col(anti_col).isNotNull())
    q_cols = [
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("q_vec"),
        F.col("lsh_bucket").alias("q_bucket"),
    ]
    if anti_col is not None:
        q_cols.append(F.col(anti_col).alias("q_anti"))
    q = indexed_queries.select(*q_cols)
    probe_cols = [F.col("q_bucket")]
    if multiprobe_hamming >= 1:
        probe_cols += [
            F.col("q_bucket").bitwiseXOR(F.lit(1 << b)) for b in range(bits)
        ]
    qp = q.select(
        "query_id",
        "q_vec",
        *(["q_anti"] if anti_col is not None else []),
        F.explode(F.array(*probe_cols)).alias("probe"),
    )
    join_cond = (F.col("lsh_bucket") == F.col("probe")) & (
        F.col(id_col) != F.col("query_id")
    )
    if anti_col is not None:
        join_cond = join_cond & (F.col(anti_col) != F.col("q_anti"))
    cand = indexed.join(qp, join_cond)
    dot = F.aggregate(
        F.zip_with(F.col(vec_col), F.col("q_vec"),
                   lambda a, b: a.cast("double") * b.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )

    def _norm(c):
        return F.sqrt(
            F.aggregate(c, F.lit(0.0),
                        lambda acc, x: acc + x.cast("double") * x.cast("double"))
        )

    cos = dot / (_norm(F.col(vec_col)) * _norm(F.col("q_vec")))
    if round_to is not None:
        cos = F.round(cos, round_to)
    scored = cand.select(
        "query_id", F.col(id_col), cos.alias("cosine_sim")
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine_sim"), F.asc(id_col)
    )
    return scored.withColumn("rnk", F.row_number().over(w)).where(
        F.col("rnk") <= k
    )


# -------------------------------------------------------------------- IVF

def ivf_centroids(df: DataFrame, n_cells: int,
                  id_col: str = "vec_id",
                  vec_col: str = "embedding") -> np.ndarray:
    """Deterministic 'training': the first n_cells rows in md5(id) order
    (a pseudorandom but engine-independent sample), L2-normalized.
    The ``collect`` is bounded to n_cells rows — never corpus-sized."""
    seed_rows = (
        df.select(id_col, vec_col)
        .orderBy(F.md5(F.col(id_col).cast("string")), F.col(id_col))
        .limit(n_cells)
        .collect()
    )
    centroids = np.stack(
        [np.asarray(r[vec_col], dtype=np.float64) for r in seed_rows]
    )
    norms = np.sqrt((centroids**2).sum(axis=1))
    norms[norms == 0] = 1.0
    return centroids / norms[:, None]


def assign_ivf_cells(df: DataFrame, centroids: np.ndarray,
                     vec_col: str = "embedding") -> DataFrame:
    """INDEX BUILD: map-side nearest-centroid assignment (broadcast
    centroids, one matmul per Arrow batch).  Persist / partition by
    ``ivf_cell`` so queries scan only nprobe/n_cells of the data."""
    from pyspark.sql.types import IntegerType

    @F.pandas_udf(IntegerType())
    def _cell(batch: pd.Series) -> pd.Series:
        if len(batch) == 0:
            return pd.Series([], dtype="int32")
        mat = np.stack(batch.map(lambda v: np.asarray(v, dtype=np.float64)))
        n = np.sqrt((mat**2).sum(axis=1))
        n[n == 0] = 1.0
        sims = (mat / n[:, None]) @ centroids.T
        return pd.Series(sims.argmax(axis=1).astype("int32"))

    return df.withColumn("ivf_cell", _cell(F.col(vec_col)))


def ivf_probe_cells(query: Sequence[float], centroids: np.ndarray,
                    nprobe: int) -> List[int]:
    q = np.asarray(query, dtype=np.float64)
    qn = np.sqrt((q**2).sum()) or 1.0
    sims = centroids @ (q / qn)
    # deterministic order: sim desc, cell index asc
    order = np.lexsort((np.arange(sims.size), -sims))
    return [int(c) for c in order[:nprobe]]


def ivf_query(
    assigned: DataFrame,
    query: Sequence[float],
    centroids: np.ndarray,
    k: int = 10,
    nprobe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_to: Optional[int] = 6,
) -> DataFrame:
    probe = ivf_probe_cells(query, centroids, nprobe)
    cand = assigned.where(F.col("ivf_cell").isin(probe))
    return brute_force_topk(cand, query, k, id_col, vec_col, round_to)


def ivf_topk(
    df: DataFrame,
    query: Sequence[float],
    k: int = 10,
    n_cells: int = 16,
    nprobe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_to: Optional[int] = 6,
) -> DataFrame:
    """One-shot convenience: centroids + assignment + query in one plan.
    For repeated queries, persist ``assign_ivf_cells`` output.
    Zero-norm vectors are excluded BEFORE centroid seeding so index and
    oracle see the same corpus."""
    df = _nonzero_norm(df, vec_col)
    centroids = ivf_centroids(df, n_cells, id_col, vec_col)
    assigned = assign_ivf_cells(df, centroids, vec_col)
    return ivf_query(assigned, query, centroids, k, nprobe, id_col,
                     vec_col, round_to)


# ------------------------------------------------- embedding near-dup

DEFAULT_EMB_BUCKET_CAP = 10_000


def embedding_near_dup_pairs(
    df: DataFrame,
    threshold: float = 0.9,
    bits: int = 8,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_to: int = 6,
    bucket_cap: Optional[int] = DEFAULT_EMB_BUCKET_CAP,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs: LSH-bucket the corpus with
    the fixed hyperplane family, self-join WITHIN buckets only (the shuffle
    key is the single int64 bucket id, never the vector), then exact-cosine
    verify >= threshold.

    Recall note (honest contract): bucket equality requires all ``bits``
    signs to agree, so recall at a given threshold is tunable via ``bits``
    (fewer bits -> bigger buckets -> higher recall, more candidates).  Two
    identical vectors always share a bucket.  The SQL oracle replicates
    bucketing + verify exactly, so the driver checks this operator's
    OUTPUT, not a recall proxy.

    ``bucket_cap`` (DEFAULT ON, 10k): a duplicate-heavy embedding corpus —
    exactly where near-dup runs — collapses every copy of a vector into one
    bucket, making the within-bucket self-join quadratic in a single task.
    Buckets over the cap skip the pairwise join; their members are grouped
    by IDENTICAL vector bytes and emitted as a LINEAR (keeper, other) star
    with cosine_sim 1.0 (what a mega-bucket is made of).  Non-identical
    cross pairs inside an over-cap bucket are dropped — a documented recall
    tradeoff, never a correctness one.  ``bucket_cap=None`` opts out."""
    df = _nonzero_norm(df, vec_col)
    indexed = build_lsh_index(df, dim, bits, vec_col).select(
        F.col(id_col), F.col(vec_col), "lsh_bucket"
    )
    over = None
    if bucket_cap is not None:
        from pyspark.sql import Window

        w = Window.partitionBy("lsh_bucket")
        sized = indexed.withColumn("_bsz", F.count(F.lit(1)).over(w))
        over = sized.where(F.col("_bsz") > bucket_cap).drop("_bsz")
        indexed = sized.where(F.col("_bsz") <= bucket_cap).drop("_bsz")
    l, r = indexed.alias("l"), indexed.alias("r")
    cand = l.join(
        r,
        (F.col("l.lsh_bucket") == F.col("r.lsh_bucket"))
        & (F.col(f"l.{id_col}") < F.col(f"r.{id_col}")),
    )
    dot = F.aggregate(
        F.zip_with(F.col(f"l.{vec_col}"), F.col(f"r.{vec_col}"),
                   lambda a, b: a.cast("double") * b.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )

    def _norm(c):
        return F.sqrt(
            F.aggregate(c, F.lit(0.0),
                        lambda acc, x: acc + x.cast("double") * x.cast("double"))
        )

    cos = F.round(dot / (_norm(F.col(f"l.{vec_col}"))
                         * _norm(F.col(f"r.{vec_col}"))), round_to)
    pairs = (
        cand.select(
            F.col(f"l.{id_col}").alias("id_a"),
            F.col(f"r.{id_col}").alias("id_b"),
            cos.alias("cosine_sim"),
        )
        .where(F.col("cosine_sim") >= threshold)
    )
    if over is not None:
        # mega-bucket path: linear star per identical vector.  Group key is
        # a 16-byte digest of the vector bytes — the vector itself never
        # rides the star shuffle.
        from pyspark.sql import Window

        grp = over.withColumn(
            "_vkey", F.md5(F.to_json(F.struct(F.col(vec_col))))
        )
        w = Window.partitionBy("_vkey")
        star = (
            grp.withColumn("_keep", F.min(id_col).over(w))
            .where(F.col(id_col) != F.col("_keep"))
            .select(
                F.col("_keep").alias("id_a"),
                F.col(id_col).alias("id_b"),
                F.lit(1.0).alias("cosine_sim"),
            )
        )
        pairs = pairs.unionByName(star).dropDuplicates(["id_a", "id_b"])
    return pairs


# ------------------------------------------------------------- SQL oracle

def _sql_double_list(vals) -> str:
    return "[" + ", ".join(repr(float(v)) for v in vals) + "]"


def _sql_cosine(vec_expr: str, q_list: str, qnorm: float) -> str:
    """Sequential-order dot/norm — mirrors the JVM F.aggregate fold."""
    return (
        f"list_sum(list_transform(range(len({vec_expr})), j -> "
        f"{vec_expr}[CAST(j + 1 AS INT)] * ({q_list})[CAST(j + 1 AS INT)])) "
        f"/ (sqrt(list_sum(list_transform({vec_expr}, x -> x * x))) "
        f"* {qnorm!r})"
    )


def lsh_oracle_sql(table: str = "embeddings", id_col: str = "vec_id",
                   vec_col: str = "embedding", dim: int = 64, bits: int = 8,
                   k: int = 10, query_id: int = 0,
                   multiprobe_hamming: int = 1) -> str:
    """DuckDB SQL replicating ``lsh_bucket_topk`` EXACTLY: the fixed
    hyperplane constants are inlined; the query row's signature, the
    multiprobe set, the bucket filter, and the 6dp-rounded cosine rerank
    all evaluate in SQL."""
    planes = _hyperplanes(dim, bits)
    planes_sql = "[" + ", ".join(_sql_double_list(p) for p in planes) + "]"
    # planes live in a one-row CTE: referencing pl as a column avoids
    # re-constructing the literal per evaluated element
    sig_expr = (
        f"list_sum(list_transform(range({bits}), b -> CASE WHEN "
        f"list_sum(list_transform(range({dim}), j -> "
        f"planes.pl[CAST(b + 1 AS INT)][CAST(j + 1 AS INT)] * "
        f"e[CAST(j + 1 AS INT)])) > 0 "
        f"THEN (CAST(1 AS BIGINT) << CAST(b AS INT)) ELSE 0 END))"
    )
    probe_expr = f"list_transform(range(-1, {bits if multiprobe_hamming >= 1 else 0}), i -> CASE WHEN i = -1 THEN qsig ELSE xor(qsig, CAST(1 AS BIGINT) << CAST(i AS INT)) END)"
    return f"""
        WITH planes AS (
          SELECT {planes_sql} AS pl
        ), base AS (
          SELECT {id_col} AS vec_id, CAST({vec_col} AS DOUBLE[]) AS e
          FROM {table}
          WHERE list_sum(list_transform(CAST({vec_col} AS DOUBLE[]),
                                        x -> x * x)) > 0
        ), sigs AS (
          SELECT vec_id, e, {sig_expr} AS sig FROM base, planes
        ), q AS (
          SELECT e AS qe, sig AS qsig,
                 sqrt(list_sum(list_transform(e, x -> x * x))) AS qn
          FROM sigs WHERE vec_id = {query_id}
        ), probes AS (
          SELECT unnest({probe_expr}) AS p FROM q
        )
        SELECT s.vec_id,
               round(list_sum(list_transform(range({dim}), j ->
                       s.e[CAST(j + 1 AS INT)] * q.qe[CAST(j + 1 AS INT)]))
                     / (sqrt(list_sum(list_transform(s.e, x -> x * x)))
                        * q.qn), 6) AS cosine_sim
        FROM sigs s, q
        WHERE s.sig IN (SELECT p FROM probes)
        ORDER BY cosine_sim DESC, s.vec_id ASC
        LIMIT {k}
    """


def batch_lsh_oracle_sql(table: str = "embeddings", id_col: str = "vec_id",
                         vec_col: str = "embedding", dim: int = 64,
                         bits: int = 8, k: int = 3,
                         query_pred: str = "vec_id % 50 = 0",
                         multiprobe_hamming: int = 1,
                         anti_col: Optional[str] = None) -> str:
    """DuckDB SQL replicating ``batch_lsh_topk`` EXACTLY for a query set
    selected by ``query_pred``: signatures for both sides from the same
    inlined hyperplanes, per-query multiprobe expansion, bucket equi-join,
    6dp cosine rerank, per-query row_number top-k.  ``anti_col`` mirrors
    the hard-negative variant (candidate differs on the column; NULLs
    excluded on both sides)."""
    planes = _hyperplanes(dim, bits)
    planes_sql = "[" + ", ".join(_sql_double_list(p) for p in planes) + "]"
    sig_expr = (
        f"list_sum(list_transform(range({bits}), b -> CASE WHEN "
        f"list_sum(list_transform(range({dim}), j -> "
        f"planes.pl[CAST(b + 1 AS INT)][CAST(j + 1 AS INT)] * "
        f"e[CAST(j + 1 AS INT)])) > 0 "
        f"THEN (CAST(1 AS BIGINT) << CAST(b AS INT)) ELSE 0 END))"
    )
    n_flips = bits if multiprobe_hamming >= 1 else 0
    probe_expr = (
        f"list_transform(range(-1, {n_flips}), i -> CASE WHEN i = -1 "
        f"THEN qsig ELSE xor(qsig, CAST(1 AS BIGINT) << CAST(i AS INT)) END)"
    )
    # 'anti' itself is a DuckDB keyword (ANTI JOIN) — alias as neg_key
    anti_base = f", {anti_col} AS neg_key" if anti_col else ""
    anti_null = f" AND {anti_col} IS NOT NULL" if anti_col else ""
    anti_sig = ", neg_key" if anti_col else ""
    anti_q = ", neg_key AS q_neg_key" if anti_col else ""
    anti_probe = ", q_neg_key" if anti_col else ""
    anti_join = " AND s.neg_key <> q.q_neg_key" if anti_col else ""
    return f"""
        WITH planes AS (
          SELECT {planes_sql} AS pl
        ), base AS (
          SELECT {id_col} AS vec_id, CAST({vec_col} AS DOUBLE[]) AS e
                 {anti_base}
          FROM {table}
          WHERE list_sum(list_transform(CAST({vec_col} AS DOUBLE[]),
                                        x -> x * x)) > 0{anti_null}
        ), sigs AS (
          SELECT vec_id, e{anti_sig}, {sig_expr} AS sig FROM base, planes
        ), qs AS (
          SELECT vec_id AS query_id, e AS qe, sig AS qsig{anti_q}
          FROM sigs WHERE {query_pred}
        ), probes AS (
          SELECT query_id, qe{anti_probe}, unnest({probe_expr}) AS p FROM qs
        ), cand AS (
          SELECT q.query_id, q.qe, s.vec_id, s.e
          FROM probes q JOIN sigs s
            ON s.sig = q.p AND s.vec_id <> q.query_id{anti_join}
        ), scored AS (
          SELECT query_id, vec_id,
                 round(list_sum(list_transform(range({dim}), j ->
                         e[CAST(j + 1 AS INT)] * qe[CAST(j + 1 AS INT)]))
                       / (sqrt(list_sum(list_transform(e, x -> x * x)))
                          * sqrt(list_sum(list_transform(qe, x -> x * x)))),
                       6) AS cosine_sim
          FROM cand
        )
        SELECT query_id, vec_id, cosine_sim, CAST(rnk AS INT) AS rnk
        FROM (
          SELECT *, row_number() OVER (PARTITION BY query_id
                    ORDER BY cosine_sim DESC, vec_id ASC) AS rnk
          FROM scored
        )
        WHERE rnk <= {k}
    """


def embedding_near_dup_oracle_sql(
    table: str = "embeddings", id_col: str = "vec_id",
    vec_col: str = "embedding", dim: int = 64, bits: int = 8,
    threshold: float = 0.25,
) -> str:
    """DuckDB SQL replicating ``embedding_near_dup_pairs`` exactly:
    same hyperplane signatures, same bucket-equality candidates, same
    6dp-rounded cosine verify."""
    planes = _hyperplanes(dim, bits)
    planes_sql = "[" + ", ".join(_sql_double_list(p) for p in planes) + "]"
    sig_expr = (
        f"list_sum(list_transform(range({bits}), b -> CASE WHEN "
        f"list_sum(list_transform(range({dim}), j -> "
        f"planes.pl[CAST(b + 1 AS INT)][CAST(j + 1 AS INT)] * "
        f"e[CAST(j + 1 AS INT)])) > 0 "
        f"THEN (CAST(1 AS BIGINT) << CAST(b AS INT)) ELSE 0 END))"
    )
    return f"""
        WITH planes AS (
          SELECT {planes_sql} AS pl
        ), base AS (
          SELECT {id_col} AS vec_id, CAST({vec_col} AS DOUBLE[]) AS e
          FROM {table}
          WHERE list_sum(list_transform(CAST({vec_col} AS DOUBLE[]),
                                        x -> x * x)) > 0
        ), sigs AS (
          SELECT vec_id, e, {sig_expr} AS sig FROM base, planes
        )
        SELECT l.vec_id AS id_a, r.vec_id AS id_b,
               round(list_sum(list_transform(range({dim}), j ->
                       l.e[CAST(j + 1 AS INT)] * r.e[CAST(j + 1 AS INT)]))
                     / (sqrt(list_sum(list_transform(l.e, x -> x * x)))
                        * sqrt(list_sum(list_transform(r.e, x -> x * x)))),
                     6) AS cosine_sim
        FROM sigs l JOIN sigs r
          ON l.sig = r.sig AND l.vec_id < r.vec_id
        WHERE round(list_sum(list_transform(range({dim}), j ->
                l.e[CAST(j + 1 AS INT)] * r.e[CAST(j + 1 AS INT)]))
              / (sqrt(list_sum(list_transform(l.e, x -> x * x)))
                 * sqrt(list_sum(list_transform(r.e, x -> x * x)))), 6)
              >= {threshold}
    """


def ivf_oracle_sql(table: str = "embeddings", id_col: str = "vec_id",
                   vec_col: str = "embedding", dim: int = 64,
                   n_cells: int = 8, nprobe: int = 4, k: int = 10,
                   query_id: int = 0) -> str:
    """DuckDB SQL replicating ``ivf_topk`` EXACTLY: md5-ordered seed rows
    as centroids (normalized), nearest-cell assignment with first-max
    tie-break, nprobe cell probing, 6dp cosine rerank."""
    return f"""
        WITH base AS (
          SELECT {id_col} AS vec_id, CAST({vec_col} AS DOUBLE[]) AS e
          FROM {table}
          WHERE list_sum(list_transform(CAST({vec_col} AS DOUBLE[]),
                                        x -> x * x)) > 0
        ), seeds AS (
          SELECT e, row_number() OVER (
                   ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) AS cell
          FROM base
          ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id
          LIMIT {n_cells}
        ), cents AS (
          SELECT list(list_transform(e, x -> x / (CASE WHEN
                   sqrt(list_sum(list_transform(e, y -> y * y))) = 0
                   THEN 1.0 ELSE
                   sqrt(list_sum(list_transform(e, y -> y * y))) END))
                 ORDER BY cell) AS cl
          FROM seeds
        ), assigned AS (
          SELECT b.vec_id, b.e,
                 list_position(
                   list_transform(range({n_cells}), c ->
                     list_sum(list_transform(range({dim}), j ->
                       (b.e[CAST(j + 1 AS INT)]
                        / (CASE WHEN sqrt(list_sum(list_transform(b.e,
                             y -> y * y))) = 0 THEN 1.0 ELSE
                           sqrt(list_sum(list_transform(b.e,
                             y -> y * y))) END))
                       * cents.cl[CAST(c + 1 AS INT)][CAST(j + 1 AS INT)]))),
                   list_max(
                   list_transform(range({n_cells}), c ->
                     list_sum(list_transform(range({dim}), j ->
                       (b.e[CAST(j + 1 AS INT)]
                        / (CASE WHEN sqrt(list_sum(list_transform(b.e,
                             y -> y * y))) = 0 THEN 1.0 ELSE
                           sqrt(list_sum(list_transform(b.e,
                             y -> y * y))) END))
                       * cents.cl[CAST(c + 1 AS INT)][CAST(j + 1 AS INT)])))))
                 - 1 AS cell
          FROM base b, cents
        ), q AS (
          SELECT e AS qe, sqrt(list_sum(list_transform(e, x -> x * x))) AS qn
          FROM base WHERE vec_id = {query_id}
        ), cellsims AS (
          SELECT c.c AS cell,
                 list_sum(list_transform(range({dim}), j ->
                   cents.cl[CAST(c.c + 1 AS INT)][CAST(j + 1 AS INT)]
                   * (q.qe[CAST(j + 1 AS INT)] / q.qn))) AS sim
          FROM (SELECT unnest(range({n_cells})) AS c) c, cents, q
        ), probecells AS (
          SELECT cell FROM cellsims ORDER BY sim DESC, cell ASC
          LIMIT {nprobe}
        )
        SELECT a.vec_id,
               round(list_sum(list_transform(range({dim}), j ->
                       a.e[CAST(j + 1 AS INT)] * q.qe[CAST(j + 1 AS INT)]))
                     / (sqrt(list_sum(list_transform(a.e, x -> x * x)))
                        * q.qn), 6) AS cosine_sim
        FROM assigned a, q
        WHERE a.cell IN (SELECT cell FROM probecells)
        ORDER BY cosine_sim DESC, a.vec_id ASC
        LIMIT {k}
    """


# ------------------------------------------- benchmark decontamination

def benchmark_decontam(
    corpus: DataFrame,
    bench: DataFrame,
    tau: float = 0.99,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Embedding-space decontamination: for every corpus vector, the max
    cosine against the BENCHMARK set and a ``contaminated`` verdict
    (``max >= tau``) — the semantic companion of the n-gram
    decontaminate (operators/repetition.py), catching paraphrased or
    re-tokenized benchmark leakage that exact n-grams miss (the
    SemDeDup-style screen applied train-vs-eval instead of train-vs-
    train).

    Plan (100 TB posture): benchmark sets are SMALL (thousands of eval
    items), so the right shape is broadcast-everything: the bench
    vectors collapse to a ONE-row sorted array (a bounded aggregate —
    never a driver collect), crossJoin-broadcast to the corpus, and the
    max-cosine fold runs entirely inside JVM higher-order functions
    (zip_with dot + aggregate max) — ZERO corpus shuffles; the corpus
    streams map-side once.  max() is commutative so the fold order
    cannot change the result; each cosine is the same index-order
    float64 fold brute_force_topk uses, rounded to 6dp at the end.

    Zero-norm vectors are excluded on both sides (cosine undefined).
    An empty benchmark yields max = -1.0 / contaminated = false for
    every corpus row.

    r06 kernel note: the corpus x bench cosine matrix used to run as a
    Catalyst higher-order fold (zip_with dot inside an aggregate-max per
    row) — interpreted lambdas, ~|corpus| * |bench| * dim invocations,
    72.7 s at sf1.0 (guide §4.2: hand whole batches to vectorized native
    code instead).  It is now ONE numpy matmul per Arrow batch inside
    mapInPandas; the bench matrix is a bounded collect (eval sets are
    small — the same bounded-broadcast posture the previous one-row
    collect_list aggregate had, just materialized driver-side like the
    PQ codebooks).  The 6dp rounding and the tau compare stay in the JVM
    so the emitted value goes through the identical F.round; the raw
    float64 max differs from the old sequential fold only in the last
    bits (summation order), absorbed by the 6dp round.
    """
    import numpy as np

    bvecs = [
        r[0]
        for r in _nonzero_norm(bench, vec_col).select(vec_col).collect()
    ]
    if bvecs:
        B = np.asarray(
            [[float(x) for x in v] for v in bvecs], dtype=np.float64
        )
        bnorm = np.sqrt((B * B).sum(axis=1))
    else:
        B, bnorm = None, None
    sc = corpus.sparkSession.sparkContext
    bc = sc.broadcast((B, bnorm))
    id_type = dict(corpus.dtypes)[id_col]

    def run(batches):
        Bv, Bn = bc.value
        for pdf in batches:
            if len(pdf) == 0:
                continue
            out = pdf[[id_col]].copy()
            if Bv is None:
                out["_mx"] = -1.0
                yield out
                continue
            X = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            xnorm = np.sqrt((X * X).sum(axis=1))
            S = X @ Bv.T
            S /= xnorm[:, None]
            S /= Bn[None, :]
            out["_mx"] = S.max(axis=1)
            yield out

    raw = (
        _nonzero_norm(corpus, vec_col)
        .select(id_col, vec_col)
        .mapInPandas(run, schema=f"{id_col} {id_type}, _mx double")
    )
    return raw.select(
        F.col(id_col),
        F.round("_mx", 6).alias("max_benchmark_cos"),
        (F.round("_mx", 6) >= F.lit(tau)).alias("contaminated"),
    )


def benchmark_decontam_oracle_sql(
    table: str,
    bench_where: str,
    tau: float = 0.99,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> str:
    """DuckDB replica of :func:`benchmark_decontam` with the benchmark
    side defined as ``SELECT ... FROM table WHERE bench_where``."""
    # parquet embeddings are FLOAT[]; cosine must run in float64 to
    # match the Spark double fold (list_cosine_similarity on FLOAT[]
    # computes in float32 — 9th-decimal drift, caught live by the gate)
    dvec = f"CAST({vec_col} AS DOUBLE[])"
    norm = f"sqrt(list_dot_product({dvec}, {dvec}))"
    return f"""
WITH bd_bench AS (
  SELECT {dvec} AS bvec FROM {table}
  WHERE ({bench_where}) AND {norm} > 0
), bd_corpus AS (
  SELECT {id_col}, {dvec} AS cvec FROM {table} WHERE {norm} > 0
), bd_m AS (
  SELECT c.{id_col},
         round(coalesce(
           max(list_cosine_similarity(c.cvec, b.bvec)), -1.0
         ), 6) AS max_benchmark_cos
  FROM bd_corpus c LEFT JOIN bd_bench b ON true
  GROUP BY c.{id_col}
)
SELECT {id_col}, max_benchmark_cos,
       max_benchmark_cos >= {tau} AS contaminated
FROM bd_m
""".strip()
