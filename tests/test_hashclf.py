"""Trained hashed n-gram classifier: learns separable vocab, oracle
parity, partition invariance, edge cases."""

import duckdb
import pandas as pd
import pytest

from deepseek_ocr_rs_spark.operators.hashclf import (
    hashclf_oracle_sql,
    hashed_ngram_predict,
    train_hashed_ngram_weights,
)


@pytest.fixture(scope="module")
def separable(spark):
    # two classes with disjoint vocabularies + shared stopwords: a
    # classifier that learns anything must get these right
    rows = []
    for i in range(60):
        rows.append((i, f"the apple banana cherry fruit sweet {i % 7}",
                     "fruit"))
        rows.append((100 + i, f"the bolt nut wrench steel torque {i % 7}",
                     "tool"))
    return spark.createDataFrame(rows, "doc_id bigint, text string,"
                                       " label string")


def test_learns_separable_classes(separable):
    tr = separable.where("doc_id % 2 = 0")
    pr = separable.where("doc_id % 2 = 1")
    w = train_hashed_ngram_weights(tr, "text", "label", n_buckets=1024)
    pred = hashed_ngram_predict(pr, "doc_id", "text", w, n_buckets=1024)
    truth = {r["doc_id"]: r["label"] for r in pr.collect()}
    got = {r["doc_id"]: r["pred_label"] for r in pred.collect()}
    assert len(got) == len(truth)
    acc = sum(got[d] == truth[d] for d in truth) / len(truth)
    assert acc == 1.0


def test_oracle_parity_and_partition_invariance(separable):
    con = duckdb.connect()
    con.register(
        "t",
        pd.DataFrame(
            [(r["doc_id"], r["text"], r["label"])
             for r in separable.collect()],
            columns=["doc_id", "text", "label"],
        ),
    )
    duck = sorted(con.sql(hashclf_oracle_sql(
        "SELECT * FROM t WHERE doc_id % 2 = 0",
        "SELECT * FROM t WHERE doc_id % 2 = 1",
        "doc_id", "text", "label", n_buckets=1024,
    )).fetchall())
    for n_parts in (1, 5):
        df = separable.repartition(n_parts)
        w = train_hashed_ngram_weights(
            df.where("doc_id % 2 = 0"), "text", "label", n_buckets=1024
        )
        got = sorted(
            tuple(r) for r in hashed_ngram_predict(
                df.where("doc_id % 2 = 1"), "doc_id", "text", w,
                n_buckets=1024,
            ).collect()
        )
        assert got == duck


def test_edge_cases(spark):
    w = train_hashed_ngram_weights(
        spark.createDataFrame([(1, "alpha beta", "x")],
                              "doc_id bigint, text string, label string"),
        "text", "label", n_buckets=64,
    )
    # single-word doc (no bigrams), unseen-vocab doc (absent from
    # output), NULL text (dropped), empty text (no features)
    pr = spark.createDataFrame(
        [(10, "alpha"), (11, "zzz qqq"), (12, None), (13, "")],
        "doc_id bigint, text string",
    )
    got = {r["doc_id"]: r["pred_label"] for r in
           hashed_ngram_predict(pr, "doc_id", "text", w,
                                n_buckets=64).collect()}
    assert got == {10: "x"}


def test_collisions_shared_deterministically(spark):
    # tiny bucket table forces collisions; predictions must still be
    # identical across runs and match the oracle
    rows = [(i, f"w{i} w{i + 1} w{i + 2}", f"c{i % 3}")
            for i in range(30)]
    df = spark.createDataFrame(rows, "doc_id bigint, text string,"
                                     " label string")
    w = train_hashed_ngram_weights(df, "text", "label", n_buckets=8)
    a = sorted(tuple(r) for r in
               hashed_ngram_predict(df, "doc_id", "text", w,
                                    n_buckets=8).collect())
    b = sorted(tuple(r) for r in
               hashed_ngram_predict(df, "doc_id", "text", w,
                                    n_buckets=8).collect())
    assert a == b
    con = duckdb.connect()
    con.register("t", pd.DataFrame(rows,
                                   columns=["doc_id", "text", "label"]))
    duck = sorted(con.sql(hashclf_oracle_sql(
        "SELECT * FROM t", "SELECT * FROM t",
        "doc_id", "text", "label", n_buckets=8,
    )).fetchall())
    assert a == duck
