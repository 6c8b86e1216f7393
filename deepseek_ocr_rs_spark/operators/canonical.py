"""Canonical selection: which copy of a duplicate survives curation.

Deduplication at 100 TB is two decisions, not one: FIND the duplicate
groups (operators/dedup.py, operators/similarity.py) and then PICK the
canonical survivor per group.  Naive pipelines keep ``min(id)``; a
training-data pipeline wants better rules — SemDeDup-style semantic
pruning keeps the cluster OUTLIER (diversity), and quality-aware pruning
keeps the highest-quality near-duplicate copy.  Both operators here are
pure dominance rules over already-bounded pair sets, so they add no new
quadratic term and every verdict is a deterministic function of the data
(the reference discipline: pure-function-of-explicit-state selection,
crates/core/src/sampling.rs:104-118).

* ``semantic_dedup`` — SemDeDup (Abbas et al. 2023, public) re-expressed
  relationally: k-means cells (operators/kmeans.py, bit-exact oracle)
  bound the pairwise stage exactly the way LSH buckets bound MinHash —
  cosine runs ONLY inside a cell, with the cell id as the sole shuffle
  key.  Within a cell, a pair with cosine >= threshold is a semantic
  duplicate; the member closer to the centroid is pruned (the outlier
  is kept — the paper's keep-lowest-centroid-similarity rule), ties on
  the 6dp distance broken by id.  At 100 TB, k grows with the corpus to
  hold the cell size constant (the paper uses ~100k cells for LAION) —
  cells are the unit of parallelism, and the verdict needs no
  cross-cell communication at all.
* ``quality_prune`` — dominance over a VERIFIED near-dup pair set (feed
  it dedup.verify_pairs_ngram_jaccard output, never raw candidates):
  prune a doc iff some partner has strictly better quality, where
  quality orders by (stopword_ratio DESC, punct_ratio ASC, id ASC) —
  the natural-language-ness heuristic from operators/textstats.py,
  already 6dp-rounded and therefore cross-engine exact.  EXISTS
  semantics (a semi-join), so no transitive-closure iteration is
  needed and the plan is one broadcast-sized pair set against itself.

Both oracles compose the already-proven SQL replicas (kmeans unrolled
CTEs, minhash+verify CTEs, the 6dp quality expressions) and check the
operator's OUTPUT exactly — not a recall proxy.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .kmeans import kmeans_assign, kmeans_assign_oracle_sql
from .similarity import _nonzero_norm

# --------------------------------------------------------- semantic dedup


def semantic_dedup(
    df: DataFrame,
    k: int = 8,
    iters: int = 2,
    threshold: float = 0.4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_to: int = 6,
) -> DataFrame:
    """SemDeDup verdict table: (id, cluster, dist, pruned) for every
    non-null nonzero-norm vector.  ``pruned = 1`` iff some same-cluster
    partner with cosine >= threshold sits FARTHER from the centroid
    (rounded-6dp distance; ties by lower id win the keep).

    Plan: kmeans_assign's bounded Lloyd rounds, then ONE grouped Arrow
    stage per cluster computing the pairwise-cosine adjacency and the
    dominance verdict together.

    r06 kernel note: the pair stage used to be a cluster-keyed self-join
    whose 64-dim cosine ran as an interpreted Catalyst higher-order fold
    per candidate pair (~sum over cells of |cell|^2 * dim lambda
    invocations — 77.9 s at sf1.0), followed by a union + distinct +
    left-join verdict chain.  Pairs never leave their cell, so the whole
    pair+verdict computation collapses into applyInPandas on the cluster
    key: one numpy gram matrix per cell, the same round-half-up 6dp
    threshold test, the same (dist DESC, id ASC) dominance rule — and
    the union/distinct/join shuffles disappear with it (guide §4.2 /
    §2.4).  Cells stay bounded at scale because k grows with the corpus
    (the SemDeDup posture above), so the per-group gram matrix is
    bounded too.  The float64 gram entries differ from the old
    sequential fold only in the last bits (summation order), absorbed by
    the 6dp round except on measure-zero boundaries.
    """
    import numpy as np

    base = df.where(
        F.col(id_col).isNotNull() & F.col(vec_col).isNotNull()
    )
    base = _nonzero_norm(base, vec_col)
    assign = kmeans_assign(base, k=k, iters=iters,
                           id_col=id_col, vec_col=vec_col)
    m = assign.join(base.select(id_col, vec_col), id_col)
    id_type = dict(df.dtypes)[id_col]
    scale = float(10 ** round_to)
    thr = float(threshold)

    def verdict(pdf):
        ids = pdf[id_col].to_numpy()
        dist = pdf["dist"].to_numpy(dtype=np.float64)
        out = pdf[[id_col, "cluster", "dist"]].copy()
        n = len(pdf)
        if n <= 1:
            out["pruned"] = np.zeros(n, dtype=np.int32)
            return out
        X = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
        nrm = np.sqrt((X * X).sum(axis=1))
        S = X @ X.T
        S /= nrm[:, None]
        S /= nrm[None, :]
        # round-half-up to 6dp, the JVM/DuckDB round() mode (cosines are
        # in [-1, 1]; negatives round away from zero there too)
        adj = (
            np.sign(S) * np.floor(np.abs(S) * scale + 0.5) / scale
        ) >= thr
        np.fill_diagonal(adj, False)
        better = (dist[None, :] > dist[:, None]) | (
            (dist[None, :] == dist[:, None]) & (ids[None, :] < ids[:, None])
        )
        out["pruned"] = (adj & better).any(axis=1).astype(np.int32)
        return out

    return (
        m.groupBy("cluster")
        .applyInPandas(
            verdict,
            schema=f"{id_col} {id_type}, cluster int, dist double, "
                   f"pruned int",
        )
        .select(id_col, "cluster", "dist", "pruned")
    )


def semantic_dedup_oracle_sql(
    table: str = "embeddings",
    k: int = 8,
    iters: int = 2,
    threshold: float = 0.4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
) -> str:
    """DuckDB SQL replicating ``semantic_dedup`` exactly: the unrolled
    kmeans CTEs over the same nonzero-norm base, the same 6dp cosine
    fold within cells, the same (dist, id) dominance rule."""
    nz = (
        f"(SELECT {id_col}, {vec_col} FROM {table}"
        f" WHERE list_sum(list_transform(CAST({vec_col} AS DOUBLE[]),"
        f" x -> x * x)) > 0) nz"
    )
    ksql = kmeans_assign_oracle_sql(nz, k=k, iters=iters,
                                    id_col=id_col, vec_col=vec_col)
    cos = (
        f"round(list_sum(list_transform(range({dim}), j -> "
        f"l.e[CAST(j + 1 AS INT)] * r.e[CAST(j + 1 AS INT)])) "
        f"/ (sqrt(list_sum(list_transform(l.e, x -> x * x))) "
        f"* sqrt(list_sum(list_transform(r.e, x -> x * x)))), 6)"
    )
    return f"""
        WITH a AS (SELECT * FROM ({ksql}) ka),
        b AS (
          SELECT {id_col}, CAST({vec_col} AS DOUBLE[]) AS e FROM {table}
          WHERE {id_col} IS NOT NULL AND {vec_col} IS NOT NULL
            AND list_sum(list_transform(CAST({vec_col} AS DOUBLE[]),
                                        x -> x * x)) > 0
        ),
        m AS (
          SELECT a.{id_col}, a.cluster, a.dist, b.e
          FROM a JOIN b USING ({id_col})
        ),
        pairs AS (
          SELECT l.{id_col} AS ia, l.dist AS da,
                 r.{id_col} AS ib, r.dist AS db
          FROM m l JOIN m r
            ON l.cluster = r.cluster AND l.{id_col} < r.{id_col}
          WHERE {cos} >= {threshold}
        ),
        nb AS (
          SELECT ia AS me, da AS md, ib AS pid, db AS pd FROM pairs
          UNION ALL
          SELECT ib, db, ia, da FROM pairs
        ),
        dom AS (
          SELECT DISTINCT me FROM nb
          WHERE pd > md OR (pd = md AND pid < me)
        )
        SELECT a.{id_col}, a.cluster, a.dist,
               CAST(CASE WHEN d.me IS NULL THEN 0 ELSE 1 END AS INT)
                 AS pruned
        FROM a LEFT JOIN dom d ON a.{id_col} = d.me
    """


# ---------------------------------------------------------- quality prune


def quality_prune(
    docs: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Quality-aware near-dup verdicts: (id, n_partners, pruned) for each
    doc that appears in >= 1 verified pair.  ``pruned = 1`` iff some
    partner dominates on (stopword_ratio DESC, punct_ratio ASC, id ASC)
    — keep the most natural-language-like copy, deterministically."""
    from .textstats import quality_cols

    punct, stop, _ = quality_cols(F.col(text_col))
    q = docs.select(F.col(id_col).alias("_qid"), punct, stop)
    # the pair set is the whole MinHash+verify chain upstream; it fans
    # out into both union branches and (via nb) into the dominance join
    # AND the partner-count rollup — persist the tiny id-pair table so
    # the chain runs once (r06; 5.5 s -> ~2 s at sf1.0)
    pairs = pairs.select("id_a", "id_b").persist()
    nb = pairs.select(
        F.col("id_a").alias("me"), F.col("id_b").alias("pid")
    ).unionByName(
        pairs.select(F.col("id_b").alias("me"), F.col("id_a").alias("pid"))
    )
    scored = (
        nb.join(
            q.select(
                F.col("_qid").alias("me"),
                F.col("stopword_ratio").alias("ms"),
                F.col("punct_ratio").alias("mp"),
            ),
            "me",
        )
        .join(
            q.select(
                F.col("_qid").alias("pid"),
                F.col("stopword_ratio").alias("ps"),
                F.col("punct_ratio").alias("pp"),
            ),
            "pid",
        )
    )
    dominated = scored.where(
        (F.col("ps") > F.col("ms"))
        | ((F.col("ps") == F.col("ms")) & (F.col("pp") < F.col("mp")))
        | (
            (F.col("ps") == F.col("ms"))
            & (F.col("pp") == F.col("mp"))
            & (F.col("pid") < F.col("me"))
        )
    ).select("me").distinct()
    return (
        nb.groupBy("me")
        .agg(F.count(F.lit(1)).alias("n_partners"))
        .join(dominated.withColumn("_pr", F.lit(1)), "me", "left")
        .select(
            F.col("me").alias(id_col),
            "n_partners",
            F.coalesce("_pr", F.lit(0)).cast("int").alias("pruned"),
        )
    )


def quality_prune_oracle_sql(
    pairs_sql: str,
    table: str = "documents",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> str:
    """DuckDB SQL replicating ``quality_prune`` over ``pairs_sql`` (a
    query yielding id_a, id_b — e.g. minhash_verified_oracle_sql).  The
    quality expressions are the proven doc_quality 6dp replicas."""
    t = f"trim({text_col})"
    stop = (
        f"round(len(regexp_extract_all(lower({t}),"
        f" '\\b(the|a|of|and|to|in|is|on|for|it)\\b'))"
        f" / greatest(CAST(CASE WHEN {t} = '' THEN 0"
        f" ELSE len(regexp_split_to_array({t}, '\\s+'))"
        f" END AS DOUBLE), 1.0), 6)"
    )
    punct = (
        f"round((length({t}) -"
        f" length(regexp_replace({t}, '[^\\w\\s]', '', 'g')))"
        f" / greatest(CAST(length({t}) AS DOUBLE), 1.0), 6)"
    )
    return f"""
        WITH vp AS (SELECT id_a, id_b FROM ({pairs_sql}) vp0),
        q AS (
          SELECT {id_col} AS qid, {stop} AS s, {punct} AS p FROM {table}
        ),
        nb AS (
          SELECT id_a AS me, id_b AS pid FROM vp
          UNION ALL
          SELECT id_b, id_a FROM vp
        ),
        dom AS (
          SELECT DISTINCT nb.me FROM nb
          JOIN q qm ON qm.qid = nb.me
          JOIN q qp ON qp.qid = nb.pid
          WHERE qp.s > qm.s
             OR (qp.s = qm.s AND qp.p < qm.p)
             OR (qp.s = qm.s AND qp.p = qm.p AND nb.pid < nb.me)
        )
        SELECT nb.me AS {id_col},
               CAST(count(*) AS BIGINT) AS n_partners,
               CAST(CASE WHEN max(CASE WHEN d.me IS NULL THEN 0 ELSE 1
                                  END) = 1 THEN 1 ELSE 0 END AS INT)
                 AS pruned
        FROM nb LEFT JOIN dom d ON nb.me = d.me
        GROUP BY nb.me
    """
