"""DSIR importance resampling: ratio-weight math, proportional keep,
oracle parity, partitioning invariance, degenerate inputs."""

import duckdb
import pytest
from pyspark.sql import functions as F

from deepseek_ocr_rs_spark.operators.dsir import (
    dsir_resample,
    dsir_resample_oracle_sql,
)


@pytest.fixture(scope="module")
def corpus(spark):
    rows = [
        # all non-empty docs have FIVE words (the score is the paper's
        # length-dependent sum over gram occurrences, so monotonicity
        # claims only hold at matched length)
        # target-flavored docs: heavy in 'alpha beta' vocabulary
        (0, "alpha beta alpha beta gamma", "en"),
        (1, "alpha beta beta alpha alpha", "en"),
        (2, "alpha gamma beta alpha beta", "en"),
        # raw-only docs: disjoint vocabulary
        (3, "zeta eta theta iota kappa", "de"),
        (4, "zeta zeta eta eta theta", "de"),
        (5, "nu xi omicron pi rho", "fr"),
        # mixed at the same length
        (6, "alpha zeta beta eta gamma", "fr"),
        (7, "", "en"),          # empty text -> score 0, never kept
        (8, "   ", "de"),       # whitespace only
    ]
    return spark.createDataFrame(rows, "doc_id long, text string, lang string")


def _run(corpus, **kw):
    return {
        r["doc_id"]: r
        for r in dsir_resample(
            corpus, F.col("lang") == "en", **kw
        ).collect()
    }


def test_target_like_docs_outscore_raw_only(corpus):
    got = _run(corpus, n_buckets=512, seed=7)
    tgt = min(got[i]["dsir_score"] for i in (0, 1, 2))
    raw = max(got[i]["dsir_score"] for i in (3, 4, 5))
    assert tgt > raw
    # mixed doc lands strictly between the two vocab extremes
    assert raw < got[6]["dsir_score"]
    # empty docs: zero score, zero weight, never kept
    for i in (7, 8):
        assert got[i]["dsir_score"] == 0
        assert got[i]["dsir_w"] == 0.0
        assert got[i]["kept"] is False
    # max-score doc has dsir_w exactly 1.0
    assert max(r["dsir_w"] for r in got.values()) == 1.0


def test_oracle_parity_and_partitioning_invariance(spark, corpus, tmp_path):
    p = str(tmp_path / "docs.parquet")
    corpus.write.mode("overwrite").parquet(p)
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM '{p}/*.parquet'")
    sql = dsir_resample_oracle_sql(
        "documents", "lang = 'en'", n_buckets=512, seed=7
    )
    oracle = sorted(tuple(r) for r in con.sql(sql).fetchall())
    for reshaped in (corpus, corpus.repartition(7), corpus.coalesce(1)):
        got = sorted(
            tuple(r)
            for r in dsir_resample(
                reshaped, F.col("lang") == "en", n_buckets=512, seed=7
            ).collect()
        )
        assert got == oracle


def test_seed_changes_sample_not_scores(corpus):
    a = _run(corpus, n_buckets=512, seed=7)
    b = _run(corpus, n_buckets=512, seed=8)
    assert all(a[k]["dsir_score"] == b[k]["dsir_score"] for k in a)
    # keep probability is proportional: kept sets may differ across seeds,
    # but the top-weight doc is kept under (almost) every seed because
    # u_mod * max < M * max iff u_mod < M, i.e. always
    top = max(a, key=lambda k: a[k]["dsir_score"])
    assert a[top]["kept"] and b[top]["kept"]


def test_all_rows_match_target_pred(spark):
    df = spark.createDataFrame(
        [(0, "a b", "en"), (1, "a c", "en")], "doc_id long, text string, lang string"
    )
    got = {r["doc_id"]: r for r in
           dsir_resample(df, F.col("lang") == "en").collect()}
    # target == raw: every bucket ratio ~= SCALE, scores ~ token counts
    assert got[0]["dsir_score"] > 0 and got[1]["dsir_score"] > 0


@pytest.mark.parametrize("texts", [
    # unicode words + punctuation boundaries
    ["héllo wörld héllo", "héllo wörld", "日本語 テキスト 日本語", "a b a b"],
    # digits, tabs/newlines as whitespace, repeated single word
    ["1 22 333 1 22", "x\ty\nz  x", "w w w w w w", "solo"],
    # very long word, single-char words, mixed case collapse
    ["A" * 500 + " b", "a A aa AA", "Mixed CASE mixed case"],
])
def test_oracle_parity_hostile_corpora(spark, texts, tmp_path):
    rows = [(i, t, "en" if i % 2 == 0 else "xx") for i, t in enumerate(texts)]
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    p = str(tmp_path / "h.parquet")
    df.write.mode("overwrite").parquet(p)
    con = duckdb.connect()
    con.execute(f"CREATE VIEW hdocs AS SELECT * FROM '{p}/*.parquet'")
    sql = dsir_resample_oracle_sql("hdocs", "lang = 'en'",
                                   n_buckets=64, seed=3)
    oracle = sorted(tuple(r) for r in con.sql(sql).fetchall())
    got = sorted(
        tuple(r)
        for r in dsir_resample(df, F.col("lang") == "en",
                               n_buckets=64, seed=3).collect()
    )
    assert got == oracle
