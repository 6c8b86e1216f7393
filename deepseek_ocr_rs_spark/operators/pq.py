"""Product quantization (PQ) for compressed-vector ANN.

Jégou, Douze, Schmid, "Product Quantization for Nearest Neighbor
Search" (TPAMI 2011): split each D-dim vector into ``m`` subvectors,
quantize each against a per-subspace codebook of ``k`` centroids, and
store only the ``m`` code bytes.  Queries never touch the raw vectors:
an asymmetric-distance lookup table (LUT) of ``m x k`` query-to-centroid
squared distances is built once per query, and a vector's approximate
distance is the sum of its codes' LUT entries.

Why this matters at 100 TB: a 768-dim float corpus is ~3 KB/vector; PQ
codes are ``m`` small ints (~8-16 B).  The scan that serves a query reads
ONLY (id, code) — the big embedding column never moves after the one-time
encode — and the top-k is TakeOrderedAndProject over a pure-JVM
expression (zero Python, zero shuffle).  Exact rerank then touches just
the top-R candidate vectors via an id equi-join.

Exactness discipline (the DuckDB gate replays every step bit-for-bit):

* codebook "training" = the ``k`` rows with smallest
  ``(md5(id), id)`` — the same engine-independent pseudorandom sample
  the IVF index uses (similarity.py:ivf_centroids); their subvectors,
  cast to float64, are the per-subspace centroids.  Lloyd refinement is
  deliberately NOT fused in (operators/kmeans.py exists for that);
  deterministic-sample codebooks keep the oracle exact.
* every distance is a LEFT FOLD in index order of ``(a-b)*(a-b)`` terms
  over float64 (``F.aggregate`` with 0.0 init here; ``0.0 + t1 + ... ``
  unrolled left-associative in the oracle) — never a pairwise/numpy sum,
  so both engines produce the identical IEEE-754 double.
* argmin tie-break: smallest centroid index (struct-min here,
  ``list_position(dl, list_min(dl))`` there).
* displayed distances round half-up to 6dp AFTER the raw-double ordering.

Reference analog: the quantized-weight lookup path (dequantize = table
lookup per block) in crates/infer-deepseek quantized kernels — same
code-to-table indirection, applied to the data plane.
"""

from __future__ import annotations

from typing import List, Sequence

import numpy as np

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _fold_sq_dist(vec_slice: Column, cent: Sequence[float]) -> Column:
    """Left-fold sum of squared differences, float64, index order."""
    lit = F.array(*[F.lit(float(c)) for c in cent])
    return F.aggregate(
        F.zip_with(vec_slice, lit,
                   lambda a, b: (a.cast("double") - b)
                   * (a.cast("double") - b)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def pq_codebooks(
    df: DataFrame,
    m: int = 8,
    k: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> np.ndarray:
    """(m, k, d/m) float64 codebooks from the md5-ordered first ``k``
    rows (collect bounded to k rows, never corpus-sized).  Every
    subspace uses the same k sample rows — subvector j of sample c is
    centroid (j, c)."""
    seed_rows = (
        df.select(id_col, vec_col)
        .orderBy(F.md5(F.col(id_col).cast("string")), F.col(id_col))
        .limit(k)
        .collect()
    )
    sample = np.stack(
        [np.asarray(r[vec_col], dtype=np.float64) for r in seed_rows]
    )  # (k, D)
    dim = sample.shape[1]
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m={m}")
    dsub = dim // m
    # (m, k, dsub): subspace-major
    return np.stack([sample[:, j * dsub:(j + 1) * dsub] for j in range(m)])


def pq_encode(
    df: DataFrame,
    codebooks: np.ndarray,
    vec_col: str = "embedding",
    code_col: str = "pq_code",
) -> DataFrame:
    """Append ``code_col``: array<int> of length m, code[j] = index of the
    nearest subspace-j centroid (squared L2, ties -> smallest index).
    Pure JVM expressions (m*k literal folds) — no Python on the encode
    scan; at production scale persist (id, code) partitioned however the
    serving scan wants it and drop the raw vectors from the hot path."""
    m, k, dsub = codebooks.shape
    codes = []
    for j in range(m):
        sl = F.slice(F.col(vec_col), j * dsub + 1, dsub)
        cands = F.array(*[
            F.struct(
                _fold_sq_dist(sl, codebooks[j, c]).alias("d"),
                F.lit(c).alias("c"),
            )
            for c in range(k)
        ])
        codes.append(F.array_min(cands)["c"])
    return df.withColumn(code_col, F.array(*codes))


def _lut(query: Sequence[float], codebooks: np.ndarray) -> List[List[float]]:
    """m x k query-to-centroid squared distances, Python-float left fold
    (IEEE double, same fold order as the engines)."""
    m, k, dsub = codebooks.shape
    q = [float(x) for x in query]
    out: List[List[float]] = []
    for j in range(m):
        row = []
        for c in range(k):
            acc = 0.0
            for d in range(dsub):
                t = q[j * dsub + d] - float(codebooks[j, c, d])
                acc = acc + t * t
            row.append(acc)
        out.append(row)
    return out


def pq_adc_topk(
    encoded: DataFrame,
    query: Sequence[float],
    codebooks: np.ndarray,
    k_results: int = 10,
    id_col: str = "vec_id",
    code_col: str = "pq_code",
    dist_col: str = "adc_dist",
) -> DataFrame:
    """Asymmetric-distance top-k over PQ codes: adc = sum_j LUT[j][code_j]
    (left fold over subspaces).  Scan reads only (id, code); ordering on
    the raw double, ties -> id asc; output distance rounded 6dp."""
    lut = _lut(query, codebooks)
    adc = F.lit(0.0)
    for j, row in enumerate(lut):
        adc = adc + F.element_at(
            F.array(*[F.lit(v) for v in row]),
            F.element_at(F.col(code_col), j + 1) + F.lit(1),
        )
    return (
        encoded.select(id_col, code_col)
        .withColumn(dist_col, adc)
        .orderBy(F.col(dist_col).asc(), F.col(id_col).asc())
        .limit(k_results)
        .select(id_col, F.round(dist_col, 6).alias(dist_col))
    )


def pq_rerank_topk(
    encoded: DataFrame,
    query: Sequence[float],
    codebooks: np.ndarray,
    k_results: int = 10,
    r_candidates: int = 50,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """The production two-stage plan: ADC shortlist of ``r_candidates``
    from codes only, then EXACT squared-L2 rerank joining just those ids
    back to their raw vectors (candidate-bounded scan)."""
    short = pq_adc_topk(
        encoded, query, codebooks, k_results=r_candidates,
        id_col=id_col,
    ).select(id_col)
    qlit = [float(x) for x in query]
    exact = _fold_sq_dist(F.col(vec_col), qlit)
    return (
        encoded.join(short, id_col)
        .withColumn("l2_dist", exact)
        .orderBy(F.col("l2_dist").asc(), F.col(id_col).asc())
        .limit(k_results)
        .select(id_col, F.round("l2_dist", 6).alias("l2_dist"))
    )


def ivfpq_topk(
    df: DataFrame,
    query: Sequence[float],
    n_cells: int = 8,
    nprobe: int = 4,
    m: int = 8,
    k: int = 16,
    k_results: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF+PQ — the composed at-scale serving plan (the FAISS IVFADC
    shape): coarse-quantize the corpus into ``n_cells`` cosine cells
    (partition/prune key), PQ-encode within, and answer a query by
    scanning ONLY the ``nprobe`` probed cells' (id, code) pairs with the
    ADC fold.  At 100 TB the encoded table is written partitioned by
    ``ivf_cell``, so the probe is partition pruning, not a filter scan.
    Zero-norm vectors are excluded up front (cosine cell assignment is
    undefined for them), mirroring ivf_topk and the oracle."""
    from deepseek_ocr_rs_spark.operators.similarity import (
        _nonzero_norm,
        assign_ivf_cells,
        ivf_centroids,
        ivf_probe_cells,
    )

    df = _nonzero_norm(df, vec_col)
    cents = ivf_centroids(df, n_cells, id_col, vec_col)
    cb = pq_codebooks(df, m=m, k=k, id_col=id_col, vec_col=vec_col)
    coded = pq_encode(assign_ivf_cells(df, cents, vec_col), cb, vec_col)
    probe = ivf_probe_cells(query, cents, nprobe)
    return pq_adc_topk(
        coded.where(F.col("ivf_cell").isin(probe)),
        query, cb, k_results=k_results, id_col=id_col,
    )


# ------------------------------------------------------------- oracles
#
# The SQL derives the SAME md5-ordered sample codebook from the table
# (codebooks are computed at query time, so the oracle cannot take them
# as literals without trusting the Spark side) and replays encode + ADC
# with the identical left folds: ``list_reduce`` without an init seeds
# the fold with t1, and ``(0.0 + t1) == t1`` exactly for the
# non-negative squared terms, so both folds visit the same IEEE doubles.


def _base_cb_cte(table: str, id_col: str, vec_col: str, k: int) -> str:
    return f"""
        base AS (
          SELECT {id_col} AS vec_id, CAST({vec_col} AS DOUBLE[]) AS e
          FROM {table}
        ), seeds AS (
          SELECT e, row_number() OVER (
                   ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) AS c
          FROM base
          ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id
          LIMIT {k}
        ), cb AS (
          SELECT list(e ORDER BY c) AS cl FROM seeds
        )"""


def _dist_sql(vec: str, j: int, dsub: int, cent: str) -> str:
    """Left-fold squared-L2 between ``vec``'s subspace-j slice and the
    centroid list expression ``cent`` (both DOUBLE[])."""
    return (
        f"list_reduce(list_transform(range({dsub}), d -> "
        f"({vec}[CAST({j * dsub} + d + 1 AS INT)]"
        f" - {cent}[CAST({j * dsub} + d + 1 AS INT)])"
        f" * ({vec}[CAST({j * dsub} + d + 1 AS INT)]"
        f" - {cent}[CAST({j * dsub} + d + 1 AS INT)])), (a, b) -> a + b)"
    )


def _code_sql(j: int, k: int, dsub: int) -> str:
    dl = (
        f"list_transform(range({k}), cc -> "
        + _dist_sql("b.e", j, dsub, "cb.cl[CAST(cc + 1 AS INT)]") + ")"
    )
    return f"(list_position({dl}, list_min({dl})) - 1)"


def pq_codes_oracle_sql(
    table: str = "embeddings",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    m: int = 8,
    k: int = 16,
    dim: int = 64,
) -> str:
    """Replicates pq_codebooks + pq_encode: per-subspace argmin with
    first-min (smallest index) tie-break; codes emitted dash-joined for a
    type-stable cross-engine hash."""
    dsub = dim // m
    joined = " || '-' || ".join(
        f"CAST({_code_sql(j, k, dsub)} AS VARCHAR)" for j in range(m)
    )
    return f"""
        WITH {_base_cb_cte(table, id_col, vec_col, k)}
        SELECT b.vec_id, {joined} AS pq_code_str
        FROM base b, cb
    """


def ivfpq_oracle_sql(
    table: str = "embeddings",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_cells: int = 8,
    nprobe: int = 4,
    m: int = 8,
    k: int = 16,
    dim: int = 64,
    k_results: int = 10,
    query_id: int = 0,
) -> str:
    """Replicates ivfpq_topk end-to-end: zero-norm filter, md5-ordered
    IVF centroids (normalized) with first-max cell assignment, md5-ordered
    PQ codebook, nprobe probe cells (sim desc, cell asc), ADC over probed
    rows only.  Cell math mirrors similarity.ivf_oracle_sql."""
    dsub = dim // m
    codes_sel = ", ".join(
        f"{_code_sql(j, k, dsub)} AS c{j}" for j in range(m)
    )
    adc_terms = " + ".join(
        _dist_sql("q.qe", j, dsub, f"cb.cl[CAST(co.c{j} + 1 AS INT)]")
        for j in range(m)
    )
    vnorm = ("(CASE WHEN sqrt(list_sum(list_transform(b.e, y -> y * y)))"
             " = 0 THEN 1.0 ELSE"
             " sqrt(list_sum(list_transform(b.e, y -> y * y))) END)")
    cell_sims = (
        f"list_transform(range({n_cells}), cc -> "
        f"list_sum(list_transform(range({dim}), j -> "
        f"(b.e[CAST(j + 1 AS INT)] / {vnorm})"
        f" * ic.il[CAST(cc + 1 AS INT)][CAST(j + 1 AS INT)])))"
    )
    return f"""
        WITH base AS (
          SELECT {id_col} AS vec_id, CAST({vec_col} AS DOUBLE[]) AS e
          FROM {table}
          WHERE list_sum(list_transform(CAST({vec_col} AS DOUBLE[]),
                                        x -> x * x)) > 0
        ), seeds AS (
          SELECT e, row_number() OVER (
                   ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) AS c
          FROM base
          ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id
          LIMIT {k}
        ), cb AS (
          SELECT list(e ORDER BY c) AS cl FROM seeds
        ), iseeds AS (
          SELECT list_transform(e, x -> x / (CASE WHEN
                   sqrt(list_sum(list_transform(e, y -> y * y))) = 0
                   THEN 1.0 ELSE
                   sqrt(list_sum(list_transform(e, y -> y * y))) END))
                 AS ne,
                 row_number() OVER (
                   ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) AS c
          FROM base
          ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id
          LIMIT {n_cells}
        ), ic AS (
          SELECT list(ne ORDER BY c) AS il FROM iseeds
        ), assigned AS (
          SELECT b.vec_id, b.e,
                 list_position({cell_sims}, list_max({cell_sims})) - 1
                   AS cell
          FROM base b, ic
        ), q AS (
          SELECT e AS qe,
                 sqrt(list_sum(list_transform(e, x -> x * x))) AS qn
          FROM base WHERE vec_id = {query_id}
        ), cellsims AS (
          SELECT c.c AS cell,
                 list_sum(list_transform(range({dim}), j ->
                   ic.il[CAST(c.c + 1 AS INT)][CAST(j + 1 AS INT)]
                   * (q.qe[CAST(j + 1 AS INT)] / q.qn))) AS sim
          FROM (SELECT unnest(range({n_cells})) AS c) c, ic, q
        ), probecells AS (
          SELECT cell FROM cellsims ORDER BY sim DESC, cell ASC
          LIMIT {nprobe}
        ), coded AS (
          SELECT b.vec_id, a.cell, {codes_sel}
          FROM base b JOIN assigned a ON b.vec_id = a.vec_id, cb
        )
        SELECT co.vec_id, round(0.0 + {adc_terms}, 6) AS adc_dist
        FROM coded co, cb, q
        WHERE co.cell IN (SELECT cell FROM probecells)
        ORDER BY (0.0 + {adc_terms}) ASC, co.vec_id ASC
        LIMIT {k_results}
    """


def pq_adc_oracle_sql(
    table: str = "embeddings",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    m: int = 8,
    k: int = 16,
    dim: int = 64,
    k_results: int = 10,
    query_id: int = 0,
) -> str:
    """Replicates pq_adc_topk with the query vector read from the table
    (row ``query_id``): encode, LUT-equivalent query-to-assigned-centroid
    distances summed left-to-right over subspaces, raw-double ordering,
    6dp display rounding."""
    dsub = dim // m
    codes_sel = ", ".join(
        f"{_code_sql(j, k, dsub)} AS c{j}" for j in range(m)
    )
    adc_terms = " + ".join(
        _dist_sql("q.qe", j, dsub, f"cb.cl[CAST(co.c{j} + 1 AS INT)]")
        for j in range(m)
    )
    return f"""
        WITH {_base_cb_cte(table, id_col, vec_col, k)},
        q AS (
          SELECT e AS qe FROM base WHERE vec_id = {query_id}
        ), coded AS (
          SELECT b.vec_id, {codes_sel} FROM base b, cb
        )
        SELECT co.vec_id, round(0.0 + {adc_terms}, 6) AS adc_dist
        FROM coded co, cb, q
        ORDER BY (0.0 + {adc_terms}) ASC, co.vec_id ASC
        LIMIT {k_results}
    """
