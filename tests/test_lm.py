"""Bigram LM fluency scoring: hand-computed cases, oracle parity,
degenerate inputs, partitioning invariance."""

import duckdb
import pandas as pd
import pytest

from deepseek_ocr_rs_spark.operators.lm import (
    lm_score,
    lm_score_oracle_sql,
)

ROWS = [
    (1, "the cat sat on the mat"),
    (2, "the cat sat on the mat"),  # exact duplicate -> same score
    (3, "mat the on sat cat the"),  # shuffled words -> lower score
    (4, "singleword"),  # no bigram -> excluded
    (5, None),
    (6, ""),
    (7, "  \t  "),
    (8, "The CAT sat"),  # case-folds into doc 1/2's transitions
]


@pytest.fixture(scope="module")
def corpus(spark):
    return spark.createDataFrame(ROWS, "doc_id bigint, text string")


def test_hand_computed_scores(corpus):
    got = {r["doc_id"]: (r["n_bigrams"], r["lm_score"]) for r in
           lm_score(corpus).collect()}
    # corpus transitions: c1(the)=6 {cat:3, mat:2, on:1}, c1(cat)=4
    # {sat:3, the:1}, c1(sat)=3, c1(on)=3, c1(mat)=1.
    # doc 1: the>cat 3/6, cat>sat 3/4, sat>on 2/3, on>the 2/3, the>mat 2/6
    #   -> floor-scaled avg = (500000+750000+666666+666666+333333)/5e6
    exact = (500000 + 750000 + 666666 + 666666 + 333333) / 5 / 1e6
    assert got[1] == (5, round(exact, 4))
    assert got[2] == got[1]  # duplicate doc, identical score
    assert got[3][1] < got[1][1]  # shuffled text is less fluent
    assert 4 not in got and 5 not in got and 6 not in got and 7 not in got
    assert got[8][0] == 2  # "the cat", "cat sat" after case-folding


def test_oracle_parity_and_partition_invariance(corpus):
    con = duckdb.connect()
    con.register("documents", pd.DataFrame(ROWS, columns=["doc_id", "text"]))
    duck = sorted(
        tuple(r) for r in con.sql(lm_score_oracle_sql("documents")).fetchall()
    )
    for n_parts in (1, 7):
        got = sorted(
            tuple(r)
            for r in lm_score(corpus.repartition(n_parts)).collect()
        )
        assert got == duck


def test_all_degenerate_corpus(spark):
    df = spark.createDataFrame(
        [(1, None), (2, ""), (3, "one")], "doc_id bigint, text string"
    )
    assert lm_score(df).count() == 0


def test_score_bounds(corpus):
    for r in lm_score(corpus).collect():
        assert 0.0 < r["lm_score"] <= 1.0
        assert r["n_bigrams"] >= 1
