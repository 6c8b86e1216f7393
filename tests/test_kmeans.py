"""Lloyd k-means: planted-cluster recovery, oracle parity, partitioning
invariance, exact-vs-fast path, degenerate inputs."""

import duckdb
import pandas as pd
import pytest

from deepseek_ocr_rs_spark.operators.kmeans import (
    kmeans_assign,
    kmeans_assign_oracle_sql,
    seed_centroids,
)


def _blob(center, n, start_id):
    # deterministic "noise": tiny id-dependent offsets around the center,
    # in units of 1/16 so every value is EXACT in float32 AND float64 —
    # Spark stores array<float> while DuckDB registers float64 lists, and
    # only dyadic values make both engines score identical inputs (the
    # oracle-parity assertion below is bit-exact, not 6dp-masked)
    rows = []
    for j in range(n):
        v = [c + ((j * 7 + d * 3) % 5 - 2) / 16.0
             for d, c in enumerate(center)]
        rows.append((start_id + j, v))
    return rows


ROWS = (
    _blob([10.0, 0.0, 0.0, 0.0], 20, 0)
    + _blob([0.0, 10.0, 0.0, 0.0], 20, 100)
    + _blob([0.0, 0.0, 10.0, 0.0], 20, 200)
)


@pytest.fixture(scope="module")
def blobs(spark):
    return spark.createDataFrame(
        ROWS, "vec_id bigint, embedding array<float>"
    )


def test_planted_clusters_recovered(blobs):
    out = kmeans_assign(blobs, k=3, iters=3).collect()
    by_blob = {}
    for r in out:
        by_blob.setdefault(r["vec_id"] // 100, set()).add(r["cluster"])
    # every planted blob maps to exactly one cluster, all distinct
    assert all(len(s) == 1 for s in by_blob.values())
    assert len(set.union(*by_blob.values())) == 3
    assert all(r["dist"] < 2.0 for r in out)  # tight within-blob distance


def test_oracle_parity_and_partition_invariance(blobs):
    con = duckdb.connect()
    con.register(
        "embeddings",
        pd.DataFrame(ROWS, columns=["vec_id", "embedding"]),
    )
    duck = sorted(
        tuple(r)
        for r in con.sql(
            kmeans_assign_oracle_sql("embeddings", k=3, iters=2)
        ).fetchall()
    )
    for n_parts in (1, 7):
        got = sorted(
            tuple(r)
            for r in kmeans_assign(
                blobs.repartition(n_parts), k=3, iters=2
            ).collect()
        )
        assert got == duck


def test_fast_path_same_clustering(blobs):
    exact = {r["vec_id"]: r["cluster"] for r in
             kmeans_assign(blobs, k=3, iters=2, exact=True).collect()}
    fast = {r["vec_id"]: r["cluster"] for r in
            kmeans_assign(blobs, k=3, iters=2, exact=False).collect()}
    # plain-AVG means differ in last-ulp only; on separated blobs the
    # assignment is identical
    assert exact == fast


def test_seed_determinism(blobs):
    a = seed_centroids(blobs, 3).collect()
    b = seed_centroids(blobs.repartition(5), 3).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
    assert len(a) == 3


def test_k_larger_than_corpus(spark):
    df = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [0.0, 1.0])],
        "vec_id bigint, embedding array<float>",
    )
    out = kmeans_assign(df, k=5, iters=1).collect()
    assert len(out) == 2
    assert {r["dist"] for r in out} == {0.0}  # each point is its own seed


def test_null_rows_excluded_consistently(spark):
    """NULL ids/vectors are dropped on both engines (NULL ordering and
    NULL distance folds are engine-dependent otherwise)."""
    rows = [(1, [1.0, 0.0]), (2, [0.0, 1.0]), (None, [5.0, 5.0]),
            (3, None)]
    df = spark.createDataFrame(rows, "vec_id bigint, embedding array<float>")
    got = sorted(tuple(r) for r in kmeans_assign(df, k=2, iters=1).collect())
    con = duckdb.connect()
    con.register(
        "embeddings",
        pd.DataFrame(
            {"vec_id": pd.array([r[0] for r in rows], dtype="Int64"),
             "embedding": [r[1] for r in rows]},
        ),
    )
    duck = sorted(tuple(r) for r in con.sql(
        kmeans_assign_oracle_sql("embeddings", k=2, iters=1)).fetchall())
    assert got == duck
    assert {r[0] for r in got} == {1, 2}
