"""Canonical selection: SemDeDup semantic pruning + quality-aware
near-dup pruning (operators/canonical.py)."""

import duckdb
import pandas as pd
import pytest

from deepseek_ocr_rs_spark.operators.canonical import (
    quality_prune,
    quality_prune_oracle_sql,
    semantic_dedup,
    semantic_dedup_oracle_sql,
)


# Dyadic components only (exact in float32 AND float64) so Spark's
# array<float> and DuckDB's double lists score identical inputs.
def _vec(base, eps):
    return [base[0] + eps / 16.0, base[1], base[2], base[3]]


SEM_ROWS = (
    # blob A around (8,0,0,0): three near-identical vectors (cos ~ 1)
    [(i, _vec([8.0, 0.0, 0.0, 0.0], i)) for i in range(3)]
    # blob B around (0,8,0,0): two near-identical vectors
    + [(10 + i, _vec([0.0, 8.0, 0.0, 0.0], i)) for i in range(2)]
    # isolated orthogonal-ish vector: no dup partner anywhere
    + [(99, [0.0, 0.0, 8.0, 0.0])]
)


@pytest.fixture(scope="module")
def sem_df(spark):
    return spark.createDataFrame(
        SEM_ROWS, "vec_id bigint, embedding array<float>"
    )


def test_semantic_dedup_prunes_all_but_outlier(sem_df):
    out = {r["vec_id"]: r for r in
           semantic_dedup(sem_df, k=3, iters=2, threshold=0.99).collect()}
    assert len(out) == 6
    # within each dup blob exactly one survivor; the isolated vector
    # is never pruned
    a_kept = [i for i in (0, 1, 2) if out[i]["pruned"] == 0]
    b_kept = [i for i in (10, 11) if out[i]["pruned"] == 0]
    assert len(a_kept) == 1 and len(b_kept) == 1
    assert out[99]["pruned"] == 0
    # the survivor is the member FARTHEST from its centroid (ties: min id)
    for kept, group in ((a_kept[0], (0, 1, 2)), (b_kept[0], (10, 11))):
        dmax = max(out[i]["dist"] for i in group)
        best = min(i for i in group if out[i]["dist"] == dmax)
        assert kept == best


def test_semantic_dedup_oracle_parity_and_invariance(sem_df, spark):
    con = duckdb.connect()
    con.register(
        "embeddings", pd.DataFrame(SEM_ROWS, columns=["vec_id", "embedding"])
    )
    duck = sorted(tuple(r) for r in con.sql(
        semantic_dedup_oracle_sql("embeddings", k=3, iters=2,
                                  threshold=0.99, dim=4)).fetchall())
    for n_parts in (1, 5):
        got = sorted(tuple(r) for r in semantic_dedup(
            sem_df.repartition(n_parts), k=3, iters=2, threshold=0.99
        ).collect())
        assert got == duck


def test_semantic_dedup_zero_norm_and_null_excluded(spark):
    df = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [1.0, 0.0]), (3, [0.0, 0.0]), (None, [1.0, 1.0]),
         (4, None)],
        "vec_id bigint, embedding array<float>",
    )
    out = semantic_dedup(df, k=2, iters=1, threshold=0.99).collect()
    assert {r["vec_id"] for r in out} == {1, 2}
    assert {r["vec_id"]: r["pruned"] for r in out}[2] == 1  # identical pair


DOCS = [
    # group 1: same text family, differing quality
    (1, "the cat sat on the mat and the dog sat too in the sun"),
    (2, "the cat sat on the mat and the dog sat too in the sun!!!!"),
    # group 2: identical quality scores -> id tie-break
    (3, "alpha beta gamma delta epsilon zeta"),
    (4, "alpha beta gamma delta epsilon zeta"),
    # not in any pair
    (5, "completely unrelated text body"),
]
PAIRS = [(1, 2), (3, 4)]


@pytest.fixture(scope="module")
def docs_df(spark):
    return spark.createDataFrame(DOCS, "doc_id bigint, text string")


def test_quality_prune_dominance(docs_df, spark):
    pairs = spark.createDataFrame(PAIRS, "id_a bigint, id_b bigint")
    out = {r["doc_id"]: r for r in quality_prune(docs_df, pairs).collect()}
    assert set(out) == {1, 2, 3, 4}  # doc 5 not in any pair -> absent
    # doc 2 has extra punctuation -> worse (higher punct_ratio) -> pruned
    assert out[1]["pruned"] == 0 and out[2]["pruned"] == 1
    # identical quality -> lower id kept
    assert out[3]["pruned"] == 0 and out[4]["pruned"] == 1
    assert all(r["n_partners"] == 1 for r in out.values())


def test_quality_prune_oracle_parity(docs_df, spark):
    pairs = spark.createDataFrame(PAIRS, "id_a bigint, id_b bigint")
    got = sorted(tuple(r) for r in
                 quality_prune(docs_df, pairs).collect())
    con = duckdb.connect()
    con.register("documents", pd.DataFrame(DOCS, columns=["doc_id", "text"]))
    con.register("cand", pd.DataFrame(PAIRS, columns=["id_a", "id_b"]))
    duck = sorted(tuple(r) for r in con.sql(
        quality_prune_oracle_sql("SELECT id_a, id_b FROM cand")).fetchall())
    assert got == duck


def test_quality_prune_empty_pairs(docs_df, spark):
    pairs = spark.createDataFrame([], "id_a bigint, id_b bigint")
    assert quality_prune(docs_df, pairs).count() == 0
