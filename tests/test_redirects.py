"""Redirect-chain resolution (operators/redirects.py).

Evidence layers:

1. semantics — chains inside/at/over the hop bound, self-loops,
   2-cycles, mid-chain sources, give-up semantics (NULL final);
2. cross-engine parity — the pointer-doubling DataFrame result equals
   the hop-by-hop recursive-CTE oracle row-for-row on the same graph;
3. log-round scaling — a 200-hop chain resolves under max_hops=255,
   which takes 8 self-joins doubled vs 200 naive walks (the property
   that makes the operator viable over billions of chains).
"""

import duckdb
import pytest

from deepseek_ocr_rs_spark.operators.redirects import (
    resolve_redirects,
    resolve_redirects_oracle_sql,
)

# chains: a0->a1->a2->T (3 hops), b self-loop, c0<->c1 2-cycle,
# d0..d9->T (10 hops, over the bound of 8), e0->T (1 hop)
EDGES = (
    [("a0", "a1"), ("a1", "a2"), ("a2", "aT")]
    + [("b0", "b0")]
    + [("c0", "c1"), ("c1", "c0")]
    + [(f"d{i}", f"d{i+1}") for i in range(9)]
    + [("d9", "dT")]
    + [("e0", "eT")]
)


def _resolve(spark, edges, max_hops=8):
    df = spark.createDataFrame(edges, "src string, dst string")
    rows = resolve_redirects(df, max_hops=max_hops).collect()
    return {r["src"]: (r["final_url"], r["n_hops"], r["status"]) for r in rows}


def test_semantics(spark):
    out = _resolve(spark, EDGES, max_hops=8)
    assert len(out) == len(EDGES)  # one row per distinct src
    assert out["a0"] == ("aT", 3, "resolved")
    assert out["a2"] == ("aT", 1, "resolved")
    assert out["e0"] == ("eT", 1, "resolved")
    # self-loop and 2-cycle never terminate
    assert out["b0"] == (None, None, "unresolved")
    assert out["c0"] == (None, None, "unresolved")
    assert out["c1"] == (None, None, "unresolved")
    # 10-hop chain: head gives up at 8, the 3rd node resolves in exactly 8
    assert out["d0"] == (None, None, "unresolved")
    assert out["d1"] == (None, None, "unresolved")
    assert out["d2"] == ("dT", 8, "resolved")  # exactly at the bound
    assert out["d9"] == ("dT", 1, "resolved")


def test_cross_engine_parity(spark):
    got = _resolve(spark, EDGES, max_hops=8)
    values = ", ".join(f"('{s}', '{d}')" for s, d in EDGES)
    sql = resolve_redirects_oracle_sql(
        f"SELECT * FROM (VALUES {values}) AS t(src, dst)", max_hops=8
    )
    con = duckdb.connect()
    want = {s: (f, h, st) for s, f, h, st in con.sql(sql).fetchall()}
    assert got == want


def test_long_chain_resolves_in_log_rounds(spark):
    n = 200
    edges = [(f"n{i}", f"n{i+1}") for i in range(n)]  # n200 is terminal
    out = _resolve(spark, edges, max_hops=255)
    assert out["n0"] == (f"n{n}", n, "resolved")
    assert out[f"n{n-1}"] == (f"n{n}", 1, "resolved")
    # same chain under a tight bound gives up from the head
    tight = _resolve(spark, edges[:20], max_hops=4)
    assert tight["n0"] == (None, None, "unresolved")
    assert tight["n16"] == (f"n20", 4, "resolved")


def test_null_handling_matches_oracle(spark):
    # NULL src rows drop; NULL dst (unparseable Location) -> unresolved
    edges = [("a", None), (None, "b"), ("c", "d"), ("e", "c")]
    df = spark.createDataFrame(edges, "src string, dst string")
    got = {
        r["src"]: (r["final_url"], r["n_hops"], r["status"])
        for r in resolve_redirects(df, max_hops=4).collect()
    }
    assert got == {
        "a": (None, None, "unresolved"),
        "c": ("d", 1, "resolved"),
        "e": ("d", 2, "resolved"),
    }
    values = ", ".join(
        "(%s, %s)"
        % tuple("NULL" if v is None else f"'{v}'" for v in (s, d))
        for s, d in edges
    )
    sql = resolve_redirects_oracle_sql(
        f"SELECT * FROM (VALUES {values}) AS t(src, dst)", max_hops=4
    )
    con = duckdb.connect()
    want = {s: (f, h, st) for s, f, h, st in con.sql(sql).fetchall()}
    assert got == want


def test_max_hops_validation(spark):
    df = spark.createDataFrame([("a", "b")], "src string, dst string")
    with pytest.raises(ValueError):
        resolve_redirects(df, max_hops=0)
