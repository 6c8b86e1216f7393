"""Per-document n-gram novelty scoring (operators/novelty.py)."""

import duckdb
import pandas as pd
import pytest

from deepseek_ocr_rs_spark.operators.novelty import (
    ngram_novelty,
    ngram_novelty_oracle_sql,
)


def _score(spark, rows, **kw):
    df = spark.createDataFrame(rows, "doc_id long, text string")
    return {
        r.doc_id: (r.n_grams, r.n_new, r.novelty_bp)
        for r in ngram_novelty(df, **kw).collect()
    }


def test_hand_scored_attribution_chain(spark):
    rows = [
        (1, "a b c d"),        # grams {a b c, b c d}: both new
        (2, "a b c x"),        # {a b c (old), b c x (new)}: half
        (3, "a b c d"),        # exact repeat: nothing new
        (4, ""),               # no grams
        (5, "a b"),            # below n tokens: no grams
    ]
    got = _score(spark, rows, n=3)
    assert got == {
        1: (2, 2, 10000),
        2: (2, 1, 5000),
        3: (2, 0, 0),
        4: (0, 0, None),
        5: (0, 0, None),
    }


def test_within_doc_repetition_counts_once(spark):
    # sliding grams of the loop collapse to 3 distinct; all new
    got = _score(spark, [(1, "a b c a b c a b c")], n=3)
    assert got == {1: (3, 3, 10000)}


def test_min_id_wins_regardless_of_row_order(spark):
    # doc 10 repeats doc 2's text: attribution goes to the SMALLER id
    # even though doc 10's row is listed first
    rows = [(10, "x y z"), (2, "x y z"), (7, "fresh words here")]
    got = _score(spark, rows, n=3)
    assert got == {10: (1, 0, 0), 2: (1, 1, 10000), 7: (1, 1, 10000)}


def test_case_and_whitespace_normalized(spark):
    got = _score(spark, [(1, "Alpha  Beta\tGamma"), (2, "alpha beta gamma")], n=3)
    assert got == {1: (1, 1, 10000), 2: (1, 0, 0)}


def test_floor_division_basis_points(spark):
    # 3 distinct grams, 1 new: 10000*1//3 = 3333 exactly on both engines
    rows = [(1, "p q r s"), (2, "p q r s t")]
    # doc2 grams: {p q r (old), q r s (old), r s t (new)} -> 1/3
    got = _score(spark, rows, n=3)
    assert got[2] == (3, 1, 3333)


def test_oracle_parity_and_invariance(spark):
    rows = []
    for i in range(50):
        base = f"w{i % 7} w{(i * 3) % 7} w{(i * 5 + 1) % 7} w{i % 11} tail{i}"
        rows.append((i, base if i % 9 else ""))
    pdf = pd.DataFrame(rows, columns=["doc_id", "text"])
    df = spark.createDataFrame(pdf)

    con = duckdb.connect()
    con.register("docs_nv", pdf)
    want = sorted(
        (tuple(x) for x in con.sql(
            ngram_novelty_oracle_sql("docs_nv", n=3)
        ).fetchall()),
        key=lambda t: t[0],
    )
    got = sorted(
        (tuple(r) for r in ngram_novelty(df, n=3).collect()),
        key=lambda t: t[0],
    )
    got8 = sorted(
        (tuple(r) for r in ngram_novelty(df.repartition(8), n=3).collect()),
        key=lambda t: t[0],
    )
    assert got == want
    assert got8 == got
    # conservation: every distinct gram is attributed to exactly one doc
    n_new_total = sum(t[2] for t in got)
    n_distinct = con.sql(
        """SELECT count(DISTINCT gram) FROM (
             SELECT array_to_string(list_slice(toks, i + 1, i + 3), ' ')
                      AS gram
             FROM (SELECT list_filter(string_split_regex(lower(text),
                          '\\s+'), x -> x <> '') AS toks FROM docs_nv),
                  UNNEST(range(0, greatest(len(toks) - 2, 0))) AS u(i)
           )"""
    ).fetchone()[0]
    assert n_new_total == n_distinct
