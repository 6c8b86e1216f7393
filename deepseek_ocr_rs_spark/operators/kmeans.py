"""Distributed Lloyd k-means over an embedding column (clustering tier).

Corpus organization at scale — domain discovery, cluster-balanced data
mixing, semantic dedup staging — needs k-means over the embedding
column.  This is the iterative-refinement pattern the repo's connected
components already demonstrates (bounded driver-side rounds, all data
movement declarative); the reference's analog is its deterministic
fixed-point iteration discipline (crates/core/src/sampling.rs:104-118).

Cross-engine exactness (the DuckDB oracle matches bit-for-bit):

* Seeds: the first k vectors in ``(md5(vec_id), vec_id)`` order — the
  same engine-independent pseudorandom draw as IVF's centroid training
  (operators/similarity.py:ivf_centroids), expressed relationally (no
  collect).
* Distance: squared L2 folded LEFT-TO-RIGHT over the dimension index
  (``F.zip_with`` + ``F.aggregate`` | DuckDB ``list_transform`` over
  ``range`` + ``list_reduce``), elements cast to double BEFORE
  arithmetic — every op single-rounded IEEE, hence identical everywhere.
* Assignment: argmin by ``(dist, centroid_id)`` — total order, no ties
  left to chance.
* Update: each new centroid component is the member-value sum folded in
  ``vec_id`` order divided once by the member count.  A plain AVG would
  be accumulation-order dependent across partitionings AND engines; the
  fixed fold costs one (cluster, dim)-keyed aggregation and buys
  bit-stable centroids.  ``exact=False`` swaps in plain AVG for
  production runs where bit-stability across engines is not required —
  same plan shape, no per-dim ordered fold.
* Empty clusters (possible when a seed's entire neighborhood prefers a
  lower-id duplicate seed) simply drop out of the centroid table — the
  same relational semantics fall out of GROUP BY in both engines.

Design for 100 TB:
- Centroids live in a k-row DataFrame joined by BROADCAST nested loop
  (k rows against the corpus) — never collected to the driver.
- Per iteration: one broadcast join + one argmin aggregation keyed on
  vec_id + one (cluster, dim) aggregation for means.  ITERS is a fixed
  small constant (the connected-components bounded-rounds discipline) —
  convergence detection would add a count() action per round for no
  correctness gain here.
- The dims explosion for the mean update shuffles rows*dims tuples of
  (int, int, double) — narrow records; with exact=False the fold
  becomes a partial-aggregable AVG.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _sq_l2(a, b):
    """Left fold of (a[i]-b[i])^2 over the dimension index; inputs cast
    to double element-wise before any arithmetic."""
    return F.aggregate(
        F.zip_with(
            a,
            b,
            lambda x, c: (x.cast("double") - c.cast("double"))
            * (x.cast("double") - c.cast("double")),
        ),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def seed_centroids(
    df: DataFrame, k: int, id_col: str = "vec_id", vec_col: str = "embedding"
) -> DataFrame:
    """(cid, centroid): first k vectors in (md5(id), id) order, components
    cast to double.  k rows — broadcast-sized by construction."""
    # TakeOrderedAndProject pulls the k seed rows without a global sort;
    # the row_number window then runs over k rows only
    top = (
        df.select(id_col, vec_col)
        .orderBy(F.md5(F.col(id_col).cast("string")), F.col(id_col))
        .limit(k)
    )
    w = Window.orderBy(F.md5(F.col(id_col).cast("string")), F.col(id_col))
    return (
        top.withColumn("cid", F.row_number().over(w) - 1)
        .select(
            "cid",
            F.transform(F.col(vec_col), lambda v: v.cast("double")).alias(
                "centroid"
            ),
        )
    )


def _assign(df, centroids, id_col, vec_col):
    """(id, vec, cid, dist): nearest centroid per vector, ties to the
    lowest cid.  Kept as the all-JVM reference shape; the hot path is
    :func:`_assign_np` below (same argmin semantics, vectorized)."""
    scored = df.select(id_col, vec_col).join(
        F.broadcast(centroids),
        F.lit(True),
    )
    scored = scored.withColumn(
        "dist", _sq_l2(F.col(vec_col), F.col("centroid"))
    )
    w = Window.partitionBy(id_col).orderBy("dist", "cid")
    return (
        scored.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .select(id_col, vec_col, "cid", "dist")
    )


def _collect_centroids(centroids: DataFrame):
    """Materialize the k-row centroid table driver-side (cid-sorted) —
    a bounded collect of k rows x dim doubles, the PQ-codebook posture."""
    import numpy as np

    rows = sorted(
        centroids.select("cid", "centroid").collect(), key=lambda r: r[0]
    )
    cids = np.asarray([r[0] for r in rows], dtype=np.int64)
    C = np.asarray([list(r[1]) for r in rows], dtype=np.float64)
    return cids, C


def _assign_np(df, cids, C, id_col, vec_col):
    """Vectorized nearest-centroid assignment (guide §4.2): one numpy
    distance matrix per Arrow batch instead of an n x k broadcast
    crossJoin + interpreted zip_with fold + row_number window (which was
    the bulk of the old 4.5 s emb_kmeans_assign wall at sf1.0).

    Semantics match `_assign`: squared-L2 in float64, argmin with ties
    to the lowest cid (np.argmin returns the FIRST minimum and C is
    cid-sorted; exact duplicate centroids produce bit-equal distances in
    both formulations, so the tie-break agrees).  Summation order within
    a distance differs from the sequential fold only in the last bits,
    which the 6dp rounding of the emitted dist absorbs.
    """
    import numpy as np

    id_type = dict(df.dtypes)[id_col]
    vec_type = dict(df.dtypes)[vec_col]

    def run(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            X = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            # ||x-c||^2 expanded pairwise would lose the exact-duplicate
            # bit-equality guarantee; compute the difference directly
            # (B x k x dim is bounded by the Arrow batch size)
            d2 = ((X[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
            j = d2.argmin(axis=1)
            out = pdf[[id_col, vec_col]].copy()
            out["cid"] = cids[j].astype(np.int32)
            out["dist"] = d2[np.arange(len(j)), j]
            yield out

    return df.select(id_col, vec_col).mapInPandas(
        run,
        schema=f"{id_col} {id_type}, {vec_col} {vec_type}, "
               f"cid int, dist double",
    )


def _update(assigned, id_col, vec_col, exact: bool):
    """New centroids: per-(cid, dim) mean of member components."""
    dims = assigned.select(
        id_col, "cid", F.posexplode(vec_col).alias("d", "val")
    ).withColumn("val", F.col("val").cast("double"))
    if exact:
        mean = F.aggregate(
            F.array_sort(F.collect_list(F.struct(id_col, "val"))),
            F.lit(0.0),
            lambda acc, s: acc + s["val"],
        ) / F.count("*").cast("double")
    else:
        mean = F.avg("val")
    per_dim = dims.groupBy("cid", "d").agg(mean.alias("m"))
    return per_dim.groupBy("cid").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("d", "m"))),
            lambda s: s["m"],
        ).alias("centroid")
    )


def kmeans_assign(
    df: DataFrame,
    k: int = 8,
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    exact: bool = True,
) -> DataFrame:
    """Run ``iters`` Lloyd iterations from deterministic seeds; return the
    final assignment (id, cluster, dist rounded 6dp)."""
    # NULL ids order differently across engines (Spark NULLS FIRST,
    # DuckDB NULLS LAST) and NULL vectors poison the distance fold —
    # exclude both, mirrored in the oracle's WHERE
    df = df.where(F.col(id_col).isNotNull() & F.col(vec_col).isNotNull())
    from deepseek_ocr_rs_spark.operators.rebalance import rebalance_for_arrow

    # one narrow exchange before the loop: every round's Python assign
    # pass and the interpreted member-mean fold otherwise inherit the
    # single local parquet split and run serially (no-op at cluster
    # scale)
    df = rebalance_for_arrow(df)
    centroids = seed_centroids(df, k, id_col, vec_col)
    # Driver-side Lloyd loop over a k-row centroid collect per round (the
    # BPE one-row-per-round discipline): each round's assignment runs
    # vectorized in _assign_np against the materialized centroid matrix,
    # while the member-mean update keeps the exact vec_id-ordered JVM
    # fold so centroids stay bit-identical across engines/partitionings.
    for _ in range(iters):
        cids, C = _collect_centroids(centroids)
        assigned = _assign_np(df, cids, C, id_col, vec_col)
        centroids = _update(assigned, id_col, vec_col, exact)
    cids, C = _collect_centroids(centroids)
    final = _assign_np(df, cids, C, id_col, vec_col)
    return final.select(
        id_col,
        F.col("cid").alias("cluster"),
        F.round("dist", 6).alias("dist"),
    )


def kmeans_assign_oracle_sql(
    table: str,
    k: int = 8,
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> str:
    """DuckDB SQL replicating ``kmeans_assign(exact=True)`` bit-for-bit:
    the ``iters`` Lloyd iterations are unrolled into CTE pairs with the
    same fold orders."""
    dist = (
        "list_reduce(list_prepend(0.0, list_transform(range(1, len(v.{vc}) + 1),"
        " i -> (CAST(v.{vc}[i] AS DOUBLE) - c.centroid[i])"
        " * (CAST(v.{vc}[i] AS DOUBLE) - c.centroid[i]))),"
        " (acc, x) -> acc + x)"
    ).format(vc=vec_col)
    parts = [
        f"""
        t_ AS (
          SELECT {id_col}, {vec_col} FROM {table}
          WHERE {id_col} IS NOT NULL AND {vec_col} IS NOT NULL
        ),
        seeds AS (
          SELECT row_number() OVER (ORDER BY md5(CAST({id_col} AS VARCHAR)),
                                    {id_col}) - 1 AS cid,
                 list_transform({vec_col}, x -> CAST(x AS DOUBLE)) AS centroid
          FROM t_
          QUALIFY cid < {k}
        ),
        c0 AS (SELECT cid, centroid FROM seeds)
        """
    ]
    for it in range(iters):
        parts.append(
            f"""
        a{it} AS (
          SELECT v.{id_col}, v.{vec_col}, c.cid, {dist} AS dist
          FROM t_ v CROSS JOIN c{it} c
          QUALIFY row_number() OVER (PARTITION BY v.{id_col}
                                     ORDER BY dist, c.cid) = 1
        ),
        dims{it} AS (
          SELECT {id_col}, cid,
                 generate_subscripts({vec_col}, 1) AS d,
                 CAST(unnest({vec_col}) AS DOUBLE) AS val
          FROM a{it}
        ),
        pd{it} AS (
          SELECT cid, d,
                 list_reduce(list_prepend(0.0, list(val ORDER BY {id_col})),
                             (acc, x) -> acc + x)
                 / CAST(count(*) AS DOUBLE) AS m
          FROM dims{it} GROUP BY cid, d
        ),
        c{it + 1} AS (
          SELECT cid, list(m ORDER BY d) AS centroid
          FROM pd{it} GROUP BY cid
        )
        """
        )
    return (
        "WITH "
        + ",".join(parts)
        + f"""
        SELECT v.{id_col}, c.cid AS cluster, round({dist}, 6) AS dist
        FROM t_ v CROSS JOIN c{iters} c
        QUALIFY row_number() OVER (PARTITION BY v.{id_col}
                                   ORDER BY {dist}, c.cid) = 1
        """
    )
