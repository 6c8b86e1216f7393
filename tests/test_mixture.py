"""Temperature mixture sampling: rate math, oracle parity, determinism,
degenerate groups."""

import duckdb
import math

import pandas as pd
import pytest

from deepseek_ocr_rs_spark.operators.mixture import (
    mixture_rates,
    temperature_mixture_oracle_sql,
    temperature_mixture_sample,
)

# 3 sources with 100/25/4 rows: sqrt-weights 10/5/2 -> the small source
# is upweighted 5x relative to proportional sampling
ROWS = (
    [(i, "big") for i in range(100)]
    + [(100 + i, "mid") for i in range(25)]
    + [(125 + i, "rare") for i in range(4)]
    + [(129, None)]  # NULL group: excluded from stats and sample
)


@pytest.fixture(scope="module")
def corpus(spark):
    return spark.createDataFrame(ROWS, "doc_id bigint, source string")


def test_rate_math(corpus):
    got = {r["source"]: (r["n_g"], r["thresh"]) for r in
           mixture_rates(corpus, "source", target_rows=60).collect()}
    w = {"big": 10.0, "mid": 5.0, "rare": 2.0}
    W = 2.0 + 5.0 + 10.0  # fixed fold order is by group name asc
    for g, (n_g, thresh) in got.items():
        rate = min(1.0, (60.0 * w[g]) / (W * n_g))
        assert thresh == math.floor(rate * 1_000_000)
    # sqrt temperature: per-row keep-rate scales as 1/sqrt(n_g), so
    # rare (clamped at 1.0) > mid > big
    assert got["rare"][1] == 1_000_000  # 60*2/(17*4) = 1.76 -> clamp
    assert got["mid"][1] == 705_882  # floor(300/425 * 1e6)
    assert got["big"][1] == 352_941  # floor(600/1700 * 1e6)
    assert None not in got and len(got) == 3


def test_oracle_parity_and_determinism(corpus):
    con = duckdb.connect()
    con.register(
        "documents", pd.DataFrame(ROWS, columns=["doc_id", "source"])
    )
    sql = temperature_mixture_oracle_sql(
        "documents", "source", 60, "doc_id", "d.doc_id, d.source"
    )
    duck = sorted(tuple(r) for r in con.sql(sql).fetchall())
    for n_parts in (1, 7):
        got = sorted(
            tuple(r)
            for r in temperature_mixture_sample(
                corpus.repartition(n_parts), "source", 60, "doc_id"
            ).select("doc_id", "source").collect()
        )
        assert got == duck
    assert len(duck) > 0
    assert all(g is not None for _, g in duck)


def test_target_above_corpus_keeps_everything(corpus):
    out = temperature_mixture_sample(corpus, "source", 10_000, "doc_id")
    # rate clamps at 1.0 for every group -> all non-NULL-group rows kept
    assert out.count() == len(ROWS) - 1


def test_seed_changes_sample(corpus):
    a = {r["doc_id"] for r in
         temperature_mixture_sample(corpus, "source", 60, "doc_id",
                                    seed=1).collect()}
    b = {r["doc_id"] for r in
         temperature_mixture_sample(corpus, "source", 60, "doc_id",
                                    seed=2).collect()}
    assert a != b


def test_null_sampling_keys_dropped(spark):
    """Rows with a NULL sampling key drop out on both engines (their
    md5 hashes would otherwise diverge cross-engine)."""
    rows = [(1, "a"), (2, "a"), (None, "a"), (3, "b")]
    df = spark.createDataFrame(rows, "doc_id bigint, source string")
    got = sorted((r["doc_id"], r["source"]) for r in
                 temperature_mixture_sample(df, "source", 100, "doc_id")
                 .select("doc_id", "source").collect())
    con = duckdb.connect()
    con.register("documents", pd.DataFrame(rows, columns=["doc_id", "source"]))
    duck = sorted(tuple(r) for r in con.sql(temperature_mixture_oracle_sql(
        "documents", "source", 100, "doc_id", "d.doc_id, d.source")).fetchall())
    assert got == duck
    assert all(k is not None for k, _ in got)
