"""Synchronous label propagation (operators/labelprop.py)."""

import duckdb
import pandas as pd

from deepseek_ocr_rs_spark.operators.labelprop import (
    label_propagation,
    label_propagation_oracle_sql,
)


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "src string, dst string")


def _labels(spark, pairs, **kw):
    out = label_propagation(_edges(spark, pairs), **kw).collect()
    return {r.node: (r.label, r.community_size) for r in out}


def test_two_cliques_with_bridge_split(spark):
    # K4 cliques {a1..a4} and {b1..b4} joined by one bridge edge:
    # each clique's internal votes outweigh the bridge, so labels
    # converge to the clique's smallest member (stable from round 2)
    import itertools

    a = [f"a{i}" for i in range(1, 5)]
    b = [f"b{i}" for i in range(1, 5)]
    pairs = (
        list(itertools.combinations(a, 2))
        + list(itertools.combinations(b, 2))
        + [("a4", "b1")]
    )
    got = _labels(spark, pairs, iters=4)
    assert {got[n][0] for n in a} == {"a1"}
    assert {got[n][0] for n in b} == {"b1"}
    assert got["a1"][1] == 4 and got["b2"][1] == 4


def test_tie_breaks_to_smallest_label(spark):
    # node m with neighbors x and z: round 1 is a 1-1 vote tie ->
    # lexicographically smallest label wins
    pairs = [("x", "m"), ("z", "m")]
    got = _labels(spark, pairs, iters=1)
    assert got["m"][0] == "x"


def test_star_converges_to_hub_oscillation_bound(spark):
    # star graph: leaves adopt the hub's label in round 1; the hub
    # adopts the smallest leaf label -> synchronous LPA oscillates by
    # design; fixed even iters pins the deterministic snapshot
    pairs = [("hub", f"leaf{i}") for i in range(4)]
    got2 = _labels(spark, pairs, iters=2)
    got4 = _labels(spark, pairs, iters=4)
    assert got2 == got4  # period-2 oscillation, same snapshot
    for i in range(4):
        assert got2[f"leaf{i}"][0] == "leaf0"


def test_self_loops_and_multi_edges_ignored(spark):
    # b's neighbors: z (via a DOUBLED edge) and a.  Votes per DISTINCT
    # neighbor -> 1-1 tie -> 'a'; counting the multi-edge would elect
    # 'z'.  The self-loop must not create a phantom node or vote.
    pairs = [("z", "b"), ("z", "b"), ("a", "b"), ("a", "a")]
    got = _labels(spark, pairs, iters=1)
    assert set(got) == {"a", "b", "z"}
    assert got["b"][0] == "a"


def test_oracle_parity_and_partitioning(spark, tmp_path):
    pairs = []
    for d in range(240):
        blk = d % 3
        pairs.append(
            (f"n{blk * 7 + (d // 3) % 7}", f"n{blk * 7 + ((d // 3) * 2 + 1) % 7}")
        )
        if d % 53 == 0:
            pairs.append((f"n{blk * 7}", f"n{((blk + 1) % 3) * 7}"))
    path = str(tmp_path / "edges.parquet")
    _edges(spark, pairs).write.parquet(path)
    df = spark.read.parquet(path)
    a = (
        label_propagation(df.coalesce(1)).toPandas()
        .sort_values("node").reset_index(drop=True)
    )
    b = (
        label_propagation(df.repartition(13)).toPandas()
        .sort_values("node").reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(a, b)
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW lp_edges AS SELECT * FROM parquet_scan('{path}/*.parquet')"
    )
    want = (
        con.execute(label_propagation_oracle_sql("lp_edges")).df()
        .sort_values("node").reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(
        a, want.astype({"community_size": "int64"})
    )
