"""CCNet-style bucketing (operators/ccnet.py): keep-first paragraph
dedup, per-language LM scoring, histogram-quantile bucket cut."""

import duckdb
import pytest
from pyspark.sql import functions as F

from deepseek_ocr_rs_spark.operators.ccnet import (
    ccnet_buckets,
    ccnet_oracle_sql,
)


@pytest.fixture(scope="module")
def corpus(spark):
    # two languages; docs 1 and 2 share their opening 12-word chunk so
    # keep-first must strip it from doc 2 (and only doc 2); doc 5's text
    # is entirely a repeat of doc 4's sole chunk -> doc 5 rebuilds empty
    # and must drop out of the output
    shared = "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu"
    rows = [
        (1, "en", shared + " one two three four five six seven eight nine ten"),
        (2, "en", shared + " uno dos tres cuatro cinco seis"),
        (3, "en", "completely different words here nothing shared at all ok fine yes"),
        (4, "fr", "le chat noir dort sur le tapis rouge pres de la fenetre"),
        (5, "fr", "le chat noir dort sur le tapis rouge pres de la fenetre"),
        (6, "fr", "un deux trois quatre cinq six sept huit neuf dix onze douze"),
        (7, "en", "the quick brown fox jumps over the lazy dog again and again"),
    ]
    return spark.createDataFrame(rows, "doc_id long, lang string, text string")


def test_keep_first_and_empty_drop(corpus):
    out = ccnet_buckets(corpus).toPandas().set_index("doc_id")
    # doc 2 lost its shared 12-word opening chunk, kept only the tail
    assert out.loc[2, "n_paras"] == 2
    assert out.loc[2, "n_kept"] == 1
    # doc 1 (first occurrence) keeps both chunks
    assert out.loc[1, "n_paras"] == 2
    assert out.loc[1, "n_kept"] == 2
    # doc 5 is a full duplicate of doc 4 -> rebuilds empty, drops out
    assert 5 not in out.index
    assert 4 in out.index


def test_buckets_partition_the_languages(corpus):
    out = ccnet_buckets(corpus).toPandas()
    assert set(out["bucket"]) <= {"head", "middle", "tail"}
    # every language with >= 1 scored doc has a tail (the 1/3-quantile
    # bin always contains at least one doc by construction)
    for lang, grp in out.groupby("lang"):
        assert (grp["bucket"] == "tail").any()


def test_matches_oracle_on_fixture(corpus, tmp_path):
    p = str(tmp_path / "docs.parquet")
    corpus.toPandas().to_parquet(p)
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM '{p}'")
    oracle = (
        con.execute(ccnet_oracle_sql()).df()
        .sort_values("doc_id").reset_index(drop=True)
    )
    spark_out = (
        ccnet_buckets(corpus).toPandas()
        .sort_values("doc_id").reset_index(drop=True)
    )
    cols = sorted(spark_out.columns)
    assert list(oracle.sort_index(axis=1).columns) == cols
    for c in cols:
        assert list(spark_out[c]) == list(oracle[c]), c


def test_partitioning_invariance(corpus):
    a = ccnet_buckets(corpus).toPandas().sort_values("doc_id")
    b = (
        ccnet_buckets(corpus.repartition(13, "lang"))
        .toPandas().sort_values("doc_id")
    )
    assert a.reset_index(drop=True).equals(b.reset_index(drop=True))


def test_single_bin_language_is_all_tail(spark):
    # every doc identical score profile -> one histogram bin -> t_lo =
    # t_hi = that bin -> everything 'tail' (ties never straddle a cut)
    rows = [(i, "xx", f"w{i} common common w{i}") for i in range(6)]
    df = spark.createDataFrame(rows, "doc_id long, lang string, text string")
    out = ccnet_buckets(df, span_words=4).toPandas()
    assert set(out["bucket"]) == {"tail"}
