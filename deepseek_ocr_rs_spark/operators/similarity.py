"""Approximate-nearest-neighbor search over an embedding column.

Two tiers:

  brute_force_topk   exact cosine top-k against a broadcast query vector —
                     JVM-side only (zip_with/aggregate), one pass, no
                     shuffle except the final top-k (TakeOrderedAndProject).
                     The correct baseline and the verify oracle for ANN.

  lsh_bucket_topk    random-hyperplane LSH (signed projections -> bit
                     signature -> bucket); candidates = query's bucket
                     (multi-probe: hamming-1 neighbors), exact rerank inside.
                     At 100 TB the bucket join prunes the scan to
                     ~corpus/2^bits per probe; signatures are computed once
                     and stored columnar.

  ivf_topk           IVF-style: k-means-free variant using deterministic
                     seed centroids (hash-sampled rows) — assign each vector
                     to nearest centroid (map-side, broadcast centroids),
                     search only the query's nprobe nearest cells.

All float math is float64 and sums run in index order (F.aggregate /
numpy) so results are deterministic and reproducible across partitionings.
"""

from __future__ import annotations

from typing import List, Optional, Sequence

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _cosine_col(vec_col, query: Sequence[float]):
    """cosine(embedding, query) as a JVM expression (no UDF).

    dot/norms via F.aggregate in index order -> deterministic float64."""
    q = [float(x) for x in query]
    qnorm = float(np.sqrt(np.sum(np.asarray(q, dtype=np.float64) ** 2)))
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
    (per-partition top-k then driver merge; no full sort, no wide shuffle)."""
    sim = _cosine_col(F.col(vec_col), query)
    if round_to is not None:
        sim = F.round(sim, round_to)
    return (
        df.select(F.col(id_col), sim.alias("cosine_sim"))
        .orderBy(F.desc("cosine_sim"), F.col(id_col))
        .limit(k)
    )


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


def with_lsh_signature(
    df: DataFrame, dim: int, bits: int = 12,
    id_col: str = "vec_id", vec_col: str = "embedding",
) -> DataFrame:
    """Add the LSH bucket id, vectorized: one matmul per Arrow batch."""
    planes = _hyperplanes(dim, bits)

    from pyspark.sql.types import LongType

    @F.pandas_udf(LongType())
    def _sig(batch: pd.Series) -> pd.Series:
        import pandas as pd

        if len(batch) == 0:
            return pd.Series([], dtype="int64")
        mat = np.stack(batch.map(lambda v: np.asarray(v, dtype=np.float64)))
        proj = mat @ planes.T  # [n, bits]
        bitvals = (proj > 0).astype(np.int64) << np.arange(bits, dtype=np.int64)
        return pd.Series(bitvals.sum(axis=1))

    return df.withColumn("lsh_bucket", _sig(F.col(vec_col)))


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
    """ANN: prune to the query's LSH bucket (+ hamming-1 probes), exact
    rerank inside.  The bucket predicate is an IN-list literal -> partition/
    row-group pruning applies if the table is clustered by lsh_bucket."""
    dim = len(query)
    planes = _hyperplanes(dim, bits)
    qsig = lsh_signature(query, planes)
    probes = [qsig]
    if multiprobe_hamming >= 1:
        probes += [qsig ^ (1 << i) for i in range(bits)]
    with_sig = with_lsh_signature(df, dim, bits, id_col, vec_col)
    cand = with_sig.where(F.col("lsh_bucket").isin(probes))
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
    """IVF scale path: deterministic centroids (hash-sampled corpus rows),
    map-side cell assignment with broadcast centroids, search nprobe cells.

    At cluster scale the cell id becomes a partition column so a query scans
    only nprobe/n_cells of the data."""
    # deterministic "training": take the first n_cells rows by id hash order
    seed_rows = (
        df.select(id_col, vec_col)
        .orderBy(F.xxhash64(F.col(id_col)))
        .limit(n_cells)
        .collect()
    )
    centroids = np.stack(
        [np.asarray(r[vec_col], dtype=np.float64) for r in seed_rows]
    )
    norms = np.sqrt((centroids**2).sum(axis=1))
    norms[norms == 0] = 1.0
    centroids = centroids / norms[:, None]

    from pyspark.sql.types import IntegerType

    @F.pandas_udf(IntegerType())
    def _cell(batch: pd.Series) -> pd.Series:
        import pandas as pd

        if len(batch) == 0:
            return pd.Series([], dtype="int32")
        mat = np.stack(batch.map(lambda v: np.asarray(v, dtype=np.float64)))
        n = np.sqrt((mat**2).sum(axis=1))
        n[n == 0] = 1.0
        sims = (mat / n[:, None]) @ centroids.T
        return pd.Series(sims.argmax(axis=1).astype("int32"))

    q = np.asarray(query, dtype=np.float64)
    qn = np.sqrt((q**2).sum()) or 1.0
    order = np.argsort(-(centroids @ (q / qn)))
    probe_cells = [int(c) for c in order[:nprobe]]

    assigned = df.withColumn("ivf_cell", _cell(F.col(vec_col)))
    cand = assigned.where(F.col("ivf_cell").isin(probe_cells))
    return brute_force_topk(cand, query, k, id_col, vec_col, round_to)
