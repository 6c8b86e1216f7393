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


# ------------------------------------------------- cross-snapshot overlap


def _overlap(spark, new_rows, ref_rows, **kw):
    from deepseek_ocr_rs_spark.operators.novelty import ngram_overlap_vs

    new = spark.createDataFrame(new_rows, "doc_id long, text string")
    ref = spark.createDataFrame(ref_rows, "doc_id long, text string")
    return {
        r.doc_id: (r.n_grams, r.n_seen, r.overlap_bp)
        for r in ngram_overlap_vs(new, ref, **kw).collect()
    }


def test_overlap_hand_scored(spark):
    ref = [(100, "a b c d"), (101, "x y z")]
    new = [
        (1, "a b c d"),     # fully old
        (2, "a b c q"),     # 1 of 2 grams old
        (3, "p q r s"),     # fully new
        (4, ""),            # gram-less
    ]
    got = _overlap(spark, new, ref)
    assert got == {
        1: (2, 2, 10000),
        2: (2, 1, 5000),
        3: (2, 0, 0),
        4: (0, 0, None),
    }


def test_overlap_ref_multiplicity_and_order_irrelevant(spark):
    # the reference is a SET: duplicated ref docs and ref ids change
    # nothing; new-side ids do not interact with ref ids
    ref1 = [(1, "k l m")]
    ref2 = [(9, "k l m"), (8, "k l m"), (7, "k l m")]
    new = [(1, "k l m n")]
    assert _overlap(spark, new, ref1) == _overlap(spark, new, ref2)


def test_overlap_oracle_parity_and_invariance(spark):
    import duckdb
    import pandas as pd

    from deepseek_ocr_rs_spark.operators.novelty import (
        ngram_overlap_vs,
        ngram_overlap_vs_oracle_sql,
    )

    rows = []
    for i in range(40):
        base = f"s{i % 5} s{(i * 3) % 5} s{(i * 7 + 1) % 5} u{i} u{i + 1}"
        rows.append((i, base if i % 13 else ""))
    pdf = pd.DataFrame(rows, columns=["doc_id", "text"])
    new_p = pdf[pdf.doc_id % 2 == 1]
    ref_p = pdf[pdf.doc_id % 2 == 0]
    new = spark.createDataFrame(new_p)
    ref = spark.createDataFrame(ref_p)

    con = duckdb.connect()
    con.register("ov_n", new_p)
    con.register("ov_r", ref_p)
    want = sorted(
        tuple(x)
        for x in con.sql(
            ngram_overlap_vs_oracle_sql(
                "SELECT * FROM ov_n", "SELECT * FROM ov_r"
            )
        ).fetchall()
    )
    got = sorted(tuple(r) for r in ngram_overlap_vs(new, ref).collect())
    got8 = sorted(
        tuple(r)
        for r in ngram_overlap_vs(
            new.repartition(8), ref.repartition(5)
        ).collect()
    )
    assert got == want
    assert got8 == got
    assert any(t[2] and t[2] > 0 for t in got)   # real overlap present
