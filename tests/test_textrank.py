"""TextRank term centrality: planted hub recovery, oracle parity,
invariance, degenerate corpora."""

import duckdb
import pandas as pd
import pytest

from deepseek_ocr_rs_spark.operators.textrank import (
    textrank_terms,
    textrank_terms_oracle_sql,
    word_adjacency_edges,
)

# "hub" is adjacent to every spoke; spokes only touch the hub
ROWS = [
    (1, "hub alpha hub beta hub gamma"),
    (2, "hub delta hub epsilon"),
    (3, "zeta hub"),
    (4, None),
    (5, "solo"),  # 1 word, no bigram -> not in the graph
    (6, "dup dup dup"),  # self-loops only -> not in the graph
]


@pytest.fixture(scope="module")
def corpus(spark):
    return spark.createDataFrame(ROWS, "doc_id bigint, text string")


def test_hub_ranks_highest(corpus):
    out = textrank_terms(corpus, k=10, iters=3).collect()
    assert out[0]["term"] == "hub"
    assert out[0]["rank"] > out[1]["rank"]
    terms = {r["term"] for r in out}
    assert "solo" not in terms and "dup" not in terms


def test_graph_shape(corpus):
    edges = {(r["src"], r["dst"]) for r in
             word_adjacency_edges(corpus).collect()}
    # undirected: both directions present; no self-loops
    assert all((d, s) in edges for s, d in edges)
    assert all(s != d for s, d in edges)
    assert ("hub", "alpha") in edges and ("alpha", "hub") in edges


def test_oracle_parity_and_invariance(corpus):
    con = duckdb.connect()
    con.register("documents", pd.DataFrame(ROWS, columns=["doc_id", "text"]))
    duck = [tuple(r) for r in con.sql(
        textrank_terms_oracle_sql("documents", k=10, iters=3)).fetchall()]
    for n_parts in (1, 7):
        got = [tuple(r) for r in
               textrank_terms(corpus.repartition(n_parts), k=10,
                              iters=3).collect()]
        assert got == duck


def test_ranks_sum_near_one(corpus):
    # PageRank over a dangling-free graph conserves mass
    out = textrank_terms(corpus, k=100, iters=3).collect()
    assert abs(sum(r["rank"] for r in out) - 1.0) < 1e-3


def test_empty_graph(spark):
    df = spark.createDataFrame(
        [(1, "solo"), (2, None), (3, "dup dup")],
        "doc_id bigint, text string",
    )
    assert textrank_terms(df, k=5, iters=2).count() == 0
