"""Integer-exact PageRank (operators/linkgraph.py).

Evidence layers: hand-computed fixed points on tiny graphs (independent
of the DuckDB replica), cross-engine parity on a 24-node graph with
parallel edges and a dangling sink, and partitioning invariance (the
int64 arithmetic is associative, so no grouping order can change it).
"""

import duckdb
import pytest

from deepseek_ocr_rs_spark.operators.linkgraph import (
    pagerank,
    pagerank_oracle_sql,
)

SCALE = 10**12


def _run(spark, edges, **kw):
    df = spark.createDataFrame(edges, "src string, dst string")
    return dict(pagerank(df, **kw).collect())


def test_two_node_cycle_conserves_mass(spark):
    # a<->b: each node's in-flow equals its own rank, so rank stays at
    # scale exactly: 0.15*s + 0.85*s = s (integer DIVs are lossless here).
    r = _run(spark, [("a", "b"), ("b", "a")], iters=5)
    assert r == {"a": SCALE, "b": SCALE}


def test_star_hand_computed(spark):
    # a->b, a->c: outdeg(a)=2.  After one iteration:
    #   a: base (no in-edges)
    #   b=c: base + 85*(scale div 2) div 100
    base = SCALE * 15 // 100
    leaf1 = base + 85 * (SCALE // 2) // 100
    r = _run(spark, [("a", "b"), ("a", "c")], iters=1)
    assert r == {"a": base, "b": leaf1, "c": leaf1}
    # second iteration: a still base; leaves fed by a's new rank
    leaf2 = base + 85 * (base // 2) // 100
    r2 = _run(spark, [("a", "b"), ("a", "c")], iters=2)
    assert r2 == {"a": base, "b": leaf2, "c": leaf2}


def test_parallel_edges_weight_multiply(spark):
    # a->b twice vs once: the doubled edge sends 2 * (rank div 2) mass.
    once = _run(spark, [("a", "b")], iters=1)
    twice = _run(spark, [("a", "b"), ("a", "b")], iters=1)
    base = SCALE * 15 // 100
    assert once["b"] == base + 85 * SCALE // 100
    # outdeg 2, two edges: 2 * (scale div 2) == scale (even scale)
    assert twice["b"] == once["b"]


def test_cross_engine_parity_and_invariance(spark):
    edges_sql = """
    SELECT 'h' || CAST(d % 23 AS VARCHAR) AS src,
           'h' || CAST((d * 7 + 3) % 23 AS VARCHAR) AS dst
    FROM range(500) t(d)
    UNION ALL
    SELECT 'h' || CAST((d * 3 + 1) % 23 AS VARCHAR),
           'h' || CAST((d * 13 + 5) % 23 AS VARCHAR)
    FROM range(500) t(d)
    UNION ALL SELECT 'h0', 'dangling'
    """
    con = duckdb.connect()
    exp = sorted(con.sql(pagerank_oracle_sql(edges_sql, iters=4)).fetchall())
    rows = con.sql(edges_sql).fetchall()
    df = spark.createDataFrame(rows, "src string, dst string")
    got = sorted(tuple(r) for r in pagerank(df, iters=4).collect())
    assert got == exp
    got7 = sorted(
        tuple(r) for r in pagerank(df.repartition(7), iters=4).collect()
    )
    assert got7 == got


def test_checkpoint_every_matches_plain(spark):
    edges = [("a", "b"), ("b", "c"), ("c", "a"), ("c", "b")]
    plain = _run(spark, edges, iters=6)
    chk = _run(spark, edges, iters=6, checkpoint_every=2)
    assert plain == chk


def test_damping_pct_validation(spark):
    df = spark.createDataFrame([("a", "b")], "src string, dst string")
    with pytest.raises(ValueError):
        pagerank(df, damping_pct=0)
    with pytest.raises(ValueError):
        pagerank(df, damping_pct=100)
