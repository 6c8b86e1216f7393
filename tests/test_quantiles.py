"""Exact per-group discrete quantiles (operators/quantiles.py)."""

import duckdb

from deepseek_ocr_rs_spark.operators.quantiles import (
    disc_quantiles_oracle_sql,
    group_disc_quantiles,
)


def _df(spark, rows):
    return spark.createDataFrame(rows, "g string, v long")


def _run(spark, rows, ps=None):
    return {
        r.g: tuple(r)[1:]
        for r in group_disc_quantiles(_df(spark, rows), "g", "v", ps).collect()
    }


def test_hand_computed_ranks(spark):
    # g=a: sorted values 1,2,3,4 (n=4): p50 -> rank ceil(2)=2 -> 2;
    # p90 -> ceil(3.6)=4 -> 4; p99 -> ceil(3.96)=4 -> 4.
    rows = [("a", 3), ("a", 1), ("a", 4), ("a", 2)]
    assert _run(spark, rows)["a"] == (4, 1, 4, 2, 4, 4)


def test_ties_collapse_into_histogram_buckets(spark):
    # g=b: values 5,5,5,9 (n=4): cum(5)=3 >= rank2 -> p50=5; p90 rank4 -> 9
    rows = [("b", 5), ("b", 5), ("b", 5), ("b", 9)]
    assert _run(spark, rows)["b"] == (4, 5, 9, 5, 9, 9)


def test_single_row_group_and_custom_ps(spark):
    rows = [("c", 7)]
    out = _run(spark, rows, ps=[("p25", 1, 4), ("p75", 3, 4)])
    assert out["c"] == (1, 7, 7, 7, 7)


def test_null_values_excluded(spark):
    df = spark.createDataFrame(
        [("d", 1), ("d", None), ("d", 3)], "g string, v long"
    )
    r = group_disc_quantiles(df, "g", "v").collect()[0]
    # n_rows counts non-NULL only; p50 of {1,3} is rank ceil(1)=1 -> 1
    assert (r.n_rows, r.min_v, r.max_v, r.p50) == (2, 1, 3, 1)


def test_oracle_parity_many_groups_with_ties(spark):
    rows = [("g%d" % (i % 4), (i * i) % 23) for i in range(200)]
    rows += [("lone", 42)]
    got = sorted(
        tuple(r) for r in group_disc_quantiles(_df(spark, rows), "g", "v").collect()
    )
    con = duckdb.connect()
    con.execute("CREATE TABLE q (g VARCHAR, v BIGINT)")
    con.executemany("INSERT INTO q VALUES (?, ?)", rows)
    want = sorted(
        tuple(r)
        for r in con.sql(
            disc_quantiles_oracle_sql("SELECT g, v FROM q", "g", "v")
        ).fetchall()
    )
    assert got == want


def test_matches_duckdb_percentile_disc_semantics(spark):
    # Independent cross-check: our rank rule IS percentile_disc.
    rows = [("x", v) for v in [1, 1, 2, 3, 5, 8, 13, 21, 34]]
    out = _run(spark, rows)["x"]
    con = duckdb.connect()
    con.execute("CREATE TABLE pd (v BIGINT)")
    con.executemany("INSERT INTO pd VALUES (?)", [(v,) for _, v in rows])
    want = con.sql(
        "SELECT quantile_disc(v, 0.5), quantile_disc(v, 0.9),"
        " quantile_disc(v, 0.99) FROM pd"
    ).fetchall()[0]
    assert (out[3], out[4], out[5]) == want
