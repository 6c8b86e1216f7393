"""UniMax budget allocation (operators/unimax.py)."""

import duckdb
import pandas as pd

from deepseek_ocr_rs_spark.operators.unimax import (
    unimax_quotas,
    unimax_quotas_oracle_sql,
)


def _sizes(spark, rows):
    return spark.createDataFrame(rows, "source string, n_tokens long")


def _quotas(spark, rows, budget, e=4):
    out = unimax_quotas(_sizes(spark, rows), budget, max_epochs=e).collect()
    return {r.source: (r.quota_tokens, r.capped) for r in out}


def test_hand_waterfill(spark):
    # L = 10, 100, 100; E=2; B=150.  caps: 20, 200, 200.
    # i=1: 20*3 = 60 <= 150 -> capped (quota 20)
    # i=2: 200*2 = 400 > 150-20=130 -> uncapped
    # remaining 130 over 2: 65 each
    got = _quotas(spark, [("a", 10), ("b", 100), ("c", 100)], 150, e=2)
    assert got == {"a": (20, True), "b": (65, False), "c": (65, False)}


def test_remainder_goes_to_first_uncapped_in_order(spark):
    # B=100, three equal sources, none capped: 33/33/34? remainder 1
    # goes to the FIRST uncapped source in (size, name) order
    got = _quotas(spark, [("a", 50), ("b", 50), ("c", 50)], 100, e=1)
    assert got == {"a": (34, False), "b": (33, False), "c": (33, False)}
    assert sum(q for q, _ in got.values()) == 100


def test_budget_exceeds_all_caps(spark):
    # B huge: everyone capped at E*L, quota sum = P_n not B
    got = _quotas(spark, [("a", 10), ("b", 20)], 10_000, e=3)
    assert got == {"a": (30, True), "b": (60, True)}


def test_tiny_budget_splits_evenly(spark):
    got = _quotas(spark, [("a", 100), ("b", 100), ("c", 100)], 2, e=4)
    assert sum(q for q, _ in got.values()) == 2
    assert not any(c for _, c in got.values())


def test_quota_conservation_and_oracle_parity(spark, tmp_path):
    rows = [(f"s{i:02d}", (i * 37) % 90 + 10) for i in range(15)]
    total = sum(l for _, l in rows)
    budget = 2 * total
    path = str(tmp_path / "sizes.parquet")
    _sizes(spark, rows).write.parquet(path)
    df = spark.read.parquet(path)
    a = (
        unimax_quotas(df, budget).toPandas()
        .sort_values("source").reset_index(drop=True)
    )
    b = (
        unimax_quotas(df.repartition(7), budget).toPandas()
        .sort_values("source").reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(a, b)
    # conservation: quotas sum exactly to min(B, E*total)
    assert a["quota_tokens"].sum() == min(budget, 4 * total)
    # capped set is a prefix of the size order
    srt = a.sort_values(["n_tokens", "source"]).reset_index(drop=True)
    flags = srt["capped"].tolist()
    assert flags == sorted(flags, reverse=True)
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW um_sz AS SELECT * FROM parquet_scan('{path}/*.parquet')"
    )
    want = (
        con.execute(unimax_quotas_oracle_sql("um_sz", budget)).df()
        .sort_values("source").reset_index(drop=True)
    )
    num = ["n_tokens", "cap_tokens", "quota_tokens", "epochs_cbp"]
    pd.testing.assert_frame_equal(
        a.astype({c: "int64" for c in num}),
        want.astype({c: "int64" for c in num}),
    )
