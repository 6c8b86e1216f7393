"""Heaps'-law vocabulary growth (operators/vocabgrowth.py)."""

import duckdb
import pandas as pd

from deepseek_ocr_rs_spark.operators.vocabgrowth import (
    vocab_growth,
    vocab_growth_oracle_sql,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_hand_built_growth(spark):
    # 4 docs, 2 bins: bin 0 introduces {a,b,c}, bin 1 adds {d} only
    rows = [
        (0, "a b"), (1, "b c"),
        (2, "a c d"), (3, "d d a"),
    ]
    out = {r.bin: r for r in vocab_growth(_docs(spark, rows),
                                          n_bins=2).collect()}
    assert (out[0].n_docs, out[0].n_tokens, out[0].n_new_words) == (2, 4, 3)
    assert (out[1].n_docs, out[1].n_tokens, out[1].n_new_words) == (2, 6, 1)
    assert out[0].cum_words == 3 and out[1].cum_words == 4


def test_saturated_corpus_flatlines(spark):
    # template corpus: every doc identical -> all vocabulary in bin 0
    rows = [(i, "same tokens every time") for i in range(40)]
    out = sorted(vocab_growth(_docs(spark, rows)).collect(),
                 key=lambda r: r.bin)
    assert out[0].n_new_words == 4
    assert all(r.n_new_words == 0 for r in out[1:])
    assert out[-1].cum_words == 4


def test_diverse_corpus_keeps_growing(spark):
    rows = [(i, f"unique{i}a unique{i}b shared") for i in range(50)]
    out = sorted(vocab_growth(_docs(spark, rows)).collect(),
                 key=lambda r: r.bin)
    assert all(r.n_new_words >= 2 * r.n_docs for r in out[:1])
    assert all(r.n_new_words == 2 * r.n_docs for r in out[1:])
    assert out[-1].cum_words == 2 * 50 + 1


def test_conservation(spark):
    rows = [(i, f"w{i % 7} w{(i * 3) % 13} tail{i % 4}") for i in range(60)]
    df = _docs(spark, rows)
    out = vocab_growth(df).toPandas()
    import pyspark.sql.functions as F
    distinct_words = (
        df.select(F.explode(F.split(F.lower("text"), r"\s+")).alias("w"))
        .where("w != ''").distinct().count()
    )
    assert out["n_new_words"].sum() == distinct_words
    assert out["cum_words"].max() == distinct_words
    assert out["n_docs"].sum() == 60


def test_oracle_parity_and_partitioning(spark, tmp_path):
    rows = [
        (i, f"base{i % 11} mid{(i * 7) % 23} u{i}") for i in range(90)
    ] + [(90, "")]
    path = str(tmp_path / "docs.parquet")
    _docs(spark, rows).write.parquet(path)
    df = spark.read.parquet(path)
    a = (
        vocab_growth(df.coalesce(1)).toPandas()
        .sort_values("bin").reset_index(drop=True)
    )
    b = (
        vocab_growth(df.repartition(13)).toPandas()
        .sort_values("bin").reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(a, b)
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW vg_docs AS SELECT * FROM parquet_scan('{path}/*.parquet')"
    )
    want = (
        con.execute(vocab_growth_oracle_sql("vg_docs")).df()
        .sort_values("bin").reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(a, want.astype("int64"))
