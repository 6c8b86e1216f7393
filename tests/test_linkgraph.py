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


# ---------------------------------------------------------------- HITS


def _hits(spark, edges, **kw):
    from deepseek_ocr_rs_spark.operators.linkgraph import hits

    df = spark.createDataFrame(edges, "src string, dst string")
    return {
        r.node: (r.hub_int, r.auth_int) for r in hits(df, **kw).collect()
    }


HSCALE = 10**6


def test_hits_star_hand_computed(spark):
    # hub h points at a, b; one-way edges.  Round 1:
    #   auth_raw: a=scale, b=scale, h=0 -> max=scale -> a=b=scale, h=0
    #   hub_raw:  h=a+b=2*scale, a=b=0  -> max norm -> h=scale, a=b=0
    # Further rounds are fixed: the hub pins at scale, both targets at
    # scale, and the 23-host gate graph's oracle replays the same rule.
    r = _hits(spark, [("h", "a"), ("h", "b")], iters=3)
    assert r == {
        "h": (HSCALE, 0),
        "a": (0, HSCALE),
        "b": (0, HSCALE),
    }


def test_hits_parallel_edges_weight_multiply(spark):
    # x->a twice, y->a once, y->b once: round 1 auth_raw a=3s, b=s ->
    # a=scale, b=s*s div 3s = scale div 3.  hub_raw x=2*scale,
    # y=scale+scale//3 -> x=scale, y=(s+s//3)*s div 2s.
    r = _hits(
        spark, [("x", "a"), ("x", "a"), ("y", "a"), ("y", "b")], iters=1
    )
    a_b = HSCALE // 3
    y_hub = (HSCALE + a_b) * HSCALE // (2 * HSCALE)
    assert r["a"][1] == HSCALE
    assert r["b"][1] == a_b
    assert r["x"][0] == HSCALE
    assert r["y"][0] == y_hub


def test_hits_cross_engine_parity_and_invariance(spark):
    from deepseek_ocr_rs_spark.operators.linkgraph import (
        hits,
        hits_oracle_sql,
    )

    # 24 nodes, parallel edges, a dangling sink (n23 has no out-edges)
    # and a source (n0 gets no in-edges beyond the arithmetic families)
    edges = []
    for i in range(40):
        edges.append((f"n{i % 24}", f"n{(i * 7 + 3) % 24}"))
        edges.append((f"n{(i * 5) % 23}", f"n{(i * 11 + 1) % 24}"))
    df = spark.createDataFrame(edges, "src string, dst string")
    got = sorted(tuple(r) for r in hits(df, iters=4).collect())

    con = duckdb.connect()
    con.execute("CREATE TABLE edges_t (src VARCHAR, dst VARCHAR)")
    con.executemany("INSERT INTO edges_t VALUES (?, ?)", edges)
    want = sorted(
        tuple(r)
        for r in con.sql(
            hits_oracle_sql("SELECT src, dst FROM edges_t", iters=4)
        ).fetchall()
    )
    assert got == want

    # partitioning invariance: int64 sums are associative
    got8 = sorted(
        tuple(r) for r in hits(df.repartition(8), iters=4).collect()
    )
    assert got8 == got


def test_hits_dangling_and_empty_sides(spark):
    # one edge: a is a pure hub, b a pure authority; both pin at scale,
    # the opposite scores are 0 (dangling normalizes via GREATEST(,1))
    r = _hits(spark, [("a", "b")], iters=4)
    assert r == {"a": (HSCALE, 0), "b": (0, HSCALE)}


# ----------------------------------------------------------- triangles


def _tri(spark, edges):
    from deepseek_ocr_rs_spark.operators.linkgraph import triangle_counts

    df = spark.createDataFrame(edges, "src string, dst string")
    return {r.node: r.n_triangles for r in triangle_counts(df).collect()}


def test_triangle_k3_k4_and_open_square(spark):
    # K3: every node in exactly 1 triangle
    assert _tri(spark, [("a", "b"), ("b", "c"), ("c", "a")]) == {
        "a": 1, "b": 1, "c": 1,
    }
    # K4: 4 triangles, each node in C(3,2)=3 of them
    k4 = [("a", "b"), ("a", "c"), ("a", "d"), ("b", "c"), ("b", "d"),
          ("c", "d")]
    assert _tri(spark, k4) == {"a": 3, "b": 3, "c": 3, "d": 3}
    # 4-cycle without diagonals: zero triangles but all nodes reported
    sq = [("a", "b"), ("b", "c"), ("c", "d"), ("d", "a")]
    assert _tri(spark, sq) == {"a": 0, "b": 0, "c": 0, "d": 0}


def test_triangle_direction_multiplicity_selfloops_ignored(spark):
    # same K3 with reversed duplicates, a parallel edge and a self-loop:
    # the induced simple undirected graph is unchanged
    noisy = [
        ("a", "b"), ("b", "a"), ("b", "c"), ("b", "c"), ("c", "a"),
        ("a", "a"),
    ]
    assert _tri(spark, noisy) == {"a": 1, "b": 1, "c": 1}


def test_triangle_cross_engine_parity_and_invariance(spark):
    from deepseek_ocr_rs_spark.operators.linkgraph import (
        triangle_counts,
        triangle_counts_oracle_sql,
    )

    edges = []
    for i in range(60):
        edges.append((f"n{i % 13}", f"n{(i * 5 + 2) % 13}"))
        edges.append((f"n{(i * 3) % 13}", f"n{(i * 7 + 1) % 13}"))
    df = spark.createDataFrame(edges, "src string, dst string")
    got = sorted(tuple(r) for r in triangle_counts(df).collect())
    got8 = sorted(
        tuple(r) for r in triangle_counts(df.repartition(8)).collect()
    )
    assert got8 == got

    con = duckdb.connect()
    con.execute("CREATE TABLE edges_t3 (src VARCHAR, dst VARCHAR)")
    con.executemany("INSERT INTO edges_t3 VALUES (?, ?)", edges)
    want = sorted(
        tuple(r)
        for r in con.sql(
            triangle_counts_oracle_sql("SELECT src, dst FROM edges_t3")
        ).fetchall()
    )
    assert got == want
    assert sum(n for _, n in got) % 3 == 0  # every triangle counted 3x
    assert sum(n for _, n in got) > 0


# --------------------------------------------------------------- k-core


def _kcore(spark, edges, **kw):
    from deepseek_ocr_rs_spark.operators.linkgraph import kcore

    df = spark.createDataFrame(edges, "src string, dst string")
    return {r.node: r.core_deg for r in kcore(df, **kw).collect()}


def test_kcore_k4_with_pendant_tail(spark):
    # K4 plus a tail d-e-f: e and f (deg <= 2) peel in round 1, the K4
    # survives k=3 with within-core degree 3 each (d loses its tail edge)
    k4 = [("a", "b"), ("a", "c"), ("a", "d"), ("b", "c"), ("b", "d"),
          ("c", "d")]
    got = _kcore(spark, k4 + [("d", "e"), ("e", "f")], k=3, rounds=4)
    assert got == {"a": 3, "b": 3, "c": 3, "d": 3}


def test_kcore_cycle_is_its_own_2core(spark):
    cyc = [("a", "b"), ("b", "c"), ("c", "d"), ("d", "a")]
    assert _kcore(spark, cyc, k=2, rounds=3) == {
        "a": 2, "b": 2, "c": 2, "d": 2,
    }


def test_kcore_path_peels_one_layer_per_round(spark):
    # 9-node path, k=2: only the two endpoints peel each round (interior
    # degree 2 >= k until a neighbour goes), one layer per round — the
    # docstring's ceil(n/2) worst-case depth bound.  After 2 rounds the
    # edge set spans n2..n6 and the final deg>=k projection reports the
    # still-2-regular middle {n3, n4, n5}; erosion completes at round 4.
    path = [(f"n{i}", f"n{i+1}") for i in range(8)]
    partial = _kcore(spark, path, k=2, rounds=2)
    assert set(partial) == {"n3", "n4", "n5"}
    assert _kcore(spark, path, k=2, rounds=4) == {}


def test_kcore_direction_multiplicity_selfloops_ignored(spark):
    # reversed duplicates, a parallel edge and a self-loop leave the
    # induced simple undirected graph (a triangle) unchanged
    noisy = [
        ("a", "b"), ("b", "a"), ("b", "c"), ("b", "c"), ("c", "a"),
        ("a", "a"),
    ]
    assert _kcore(spark, noisy, k=2, rounds=3) == {"a": 2, "b": 2, "c": 2}


def test_kcore_rounds_beyond_convergence_idempotent(spark):
    k4 = [("a", "b"), ("a", "c"), ("a", "d"), ("b", "c"), ("b", "d"),
          ("c", "d"), ("d", "e"), ("e", "f")]
    assert _kcore(spark, k4, k=3, rounds=2) == _kcore(
        spark, k4, k=3, rounds=5
    )


def test_kcore_cross_engine_parity_and_invariance(spark):
    from deepseek_ocr_rs_spark.operators.linkgraph import (
        kcore,
        kcore_oracle_sql,
    )

    # the gate graph shape: mixed-modulus family over a ring (peel
    # depth 4; rounds=6 converged, same parameters as graph_host_kcore)
    edges = []
    for d in range(360):
        edges.append((f"h{(d % 72) % 24}", f"h{((d % 72) * 5 + 1) % 36}"))
        edges.append((f"h{d % 48}", f"h{(d + 1) % 48}"))
    df = spark.createDataFrame(edges, "src string, dst string")
    got = sorted(tuple(r) for r in kcore(df, k=5, rounds=6).collect())
    got8 = sorted(
        tuple(r)
        for r in kcore(
            df.repartition(8), k=5, rounds=6, checkpoint_every=3
        ).collect()
    )
    assert got8 == got

    con = duckdb.connect()
    con.execute("CREATE TABLE edges_kc (src VARCHAR, dst VARCHAR)")
    con.executemany("INSERT INTO edges_kc VALUES (?, ?)", edges)
    want = sorted(
        tuple(x)
        for x in con.sql(
            kcore_oracle_sql("SELECT src, dst FROM edges_kc", k=5, rounds=6)
        ).fetchall()
    )
    assert got == want
    # heterogeneous by construction: a real peel happened AND a core kept
    assert 0 < len(got) < 48
    assert all(deg >= 5 for _, deg in got)
