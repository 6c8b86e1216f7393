"""Leakage-safe train/val/test split assignment.

Hash-splitting a corpus doc-by-doc leaks near-duplicates across splits:
two 0.9-Jaccard copies of a page land in train AND test, and the eval
score silently measures memorization (the well-documented failure mode
behind benchmark-contamination audits; same threat model as
operators/repetition.py's decontamination).  The fix is to split by
DEDUP CLUSTER, not by doc: every member of a connected near-dup
component hashes on the component representative, so copies are
train-or-eval together, never both.

Mechanics: (doc, component_id) from operators/dedup.py
``connected_components`` (large-star/small-star, O(log^2 n) rounds);
docs in no pair are their own singleton cluster (left join + coalesce).
The split decision reuses the repo's seeded md5 discipline
(operators/sampling.py ``_u_col``): u = md5(rep:seed) mod 100, with
buckets [0, train_pct) -> train, [train_pct, train_pct+val_pct) -> val,
rest -> test.  Per-doc cost is one doc-keyed join (clusters are a
vanishingly small table at real dedup rates) plus a map-side hash —
nothing beyond what dedup already paid.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .sampling import _u_col


def assign_splits(
    docs: DataFrame,
    components: DataFrame,
    id_col: str = "doc_id",
    train_pct: int = 98,
    val_pct: int = 1,
    seed: int = 42,
) -> DataFrame:
    """(id, rep, split) for every doc in ``docs``: ``rep`` is the
    near-dup component representative (the doc itself for singletons),
    ``split`` in {train, val, test} decided by seeded md5 of rep —
    cluster members ALWAYS share a split."""
    if not (0 < train_pct and 0 <= val_pct
            and train_pct + val_pct < 100):
        raise ValueError("need train_pct + val_pct < 100")
    rep = F.coalesce("component_id", F.col(id_col)).alias("rep")
    with_rep = (
        docs.select(id_col)
        .join(components, id_col, "left")
        .select(id_col, rep)
    )
    u = _u_col(F.col("rep"), seed) % 100
    split = (
        F.when(u < train_pct, "train")
        .when(u < train_pct + val_pct, "val")
        .otherwise("test")
    )
    return with_rep.select(id_col, "rep", split.alias("split"))


def splits_oracle_sql(
    components_sql: str,
    table: str = "documents",
    id_col: str = "doc_id",
    train_pct: int = 98,
    val_pct: int = 1,
    seed: int = 42,
) -> str:
    """DuckDB replica of :func:`assign_splits` over the component SQL
    (any SELECT yielding (doc_id, component_id))."""
    return f"""
        WITH comp AS ({components_sql}),
        reps AS (
          SELECT d.{id_col},
                 COALESCE(c.component_id, d.{id_col}) AS rep
          FROM {table} d LEFT JOIN comp c
            ON d.{id_col} = c.{id_col}
        )
        SELECT {id_col}, CAST(rep AS BIGINT) AS rep,
               CASE WHEN u < {train_pct} THEN 'train'
                    WHEN u < {train_pct} + {val_pct} THEN 'val'
                    ELSE 'test' END AS split
        FROM (
          SELECT *,
                 CAST('0x' || substr(md5(CAST(rep AS VARCHAR)
                      || ':' || {seed}), 1, 15) AS BIGINT) % 100 AS u
          FROM reps
        )
    """


def split_leakage(
    assigned: DataFrame,
    id_col: str = "doc_id",
    split_col: str = "split",
    text_col: str = "text",
) -> DataFrame:
    """Cross-split contamination report: every exact-duplicate content
    digest that appears in train AND in an eval split (val/test) — the
    audit that catches what per-doc (non-cluster-aware) splitting
    leaks, and the check every eval suite should run BEFORE trusting
    its numbers (the published decontamination discipline applied to
    the split boundary itself).

    Output per leaked digest:
      (text_md5, n_train, n_val, n_test,
       example_train_id, example_eval_id)

    100 TB plan shape: ONE md5-keyed map-side-combinable hash
    aggregate with conditional counts — no self-join, no window; the
    leak report is |leaked digests|-sized.  Compose with
    ``assign_splits`` (cluster-aware) to verify it reports ZERO, or
    with a naive per-doc split to quantify the damage.
    """
    md5 = F.md5(F.col(text_col)).alias("text_md5")
    s = F.col(split_col)
    agg = (
        assigned.select(
            md5, s.alias("_s"), F.col(id_col).cast("long").alias("_id")
        )
        .groupBy("text_md5")
        .agg(
            F.sum(F.when(F.col("_s") == "train", 1).otherwise(0))
            .cast("long")
            .alias("n_train"),
            F.sum(F.when(F.col("_s") == "val", 1).otherwise(0))
            .cast("long")
            .alias("n_val"),
            F.sum(F.when(F.col("_s") == "test", 1).otherwise(0))
            .cast("long")
            .alias("n_test"),
            F.min(F.when(F.col("_s") == "train", F.col("_id"))).alias(
                "example_train_id"
            ),
            F.min(F.when(F.col("_s") != "train", F.col("_id"))).alias(
                "example_eval_id"
            ),
        )
        .where(
            (F.col("n_train") > 0)
            & ((F.col("n_val") > 0) | (F.col("n_test") > 0))
        )
    )
    return agg


def split_leakage_oracle_sql(
    assigned_sql: str,
    id_col: str = "doc_id",
    split_col: str = "split",
    text_col: str = "text",
) -> str:
    """DuckDB SQL replicating ``split_leakage`` exactly."""
    return f"""
        WITH sl_rows AS (
          SELECT md5({text_col}) AS text_md5,
                 {split_col} AS s,
                 CAST({id_col} AS BIGINT) AS id
          FROM {assigned_sql}
        ),
        sl_agg AS (
          SELECT text_md5,
                 sum(CASE WHEN s = 'train' THEN 1 ELSE 0 END) AS n_train,
                 sum(CASE WHEN s = 'val' THEN 1 ELSE 0 END) AS n_val,
                 sum(CASE WHEN s = 'test' THEN 1 ELSE 0 END) AS n_test,
                 min(CASE WHEN s = 'train' THEN id END)
                   AS example_train_id,
                 min(CASE WHEN s <> 'train' THEN id END)
                   AS example_eval_id
          FROM sl_rows GROUP BY 1
        )
        SELECT text_md5,
               CAST(n_train AS BIGINT) AS n_train,
               CAST(n_val AS BIGINT) AS n_val,
               CAST(n_test AS BIGINT) AS n_test,
               example_train_id, example_eval_id
        FROM sl_agg
        WHERE n_train > 0 AND (n_val > 0 OR n_test > 0)
    """
