"""Learned URL-parameter semantics / DUST detection (operators/urlparams.py)."""

import duckdb
import pandas as pd

from deepseek_ocr_rs_spark.operators.urlparams import (
    url_param_stats,
    url_param_stats_oracle_sql,
)


def _caps(spark, rows):
    return spark.createDataFrame(rows, "url string, digest string")


def _verdicts(spark, rows, **kw):
    out = url_param_stats(_caps(spark, rows), **kw).collect()
    return {(r.host, r.param): (r.n_groups, r.n_invariant, r.verdict)
            for r in out}


def test_session_param_learned_superfluous(spark):
    # 3 pages x 2 session ids each: sid never changes the digest
    rows = []
    for pg in range(3):
        for sid in range(2):
            rows.append(
                (f"http://a.com/p?page={pg}&sid={sid}", f"d{pg}")
            )
    got = _verdicts(spark, rows, min_groups=3)
    assert got[("a.com", "sid")] == (3, 3, "superfluous")
    # page's groups (per sid) see 3 distinct digests -> content
    assert got[("a.com", "page")] == (2, 0, "insufficient")  # only 2 groups
    got = _verdicts(spark, rows, min_groups=2)
    assert got[("a.com", "page")][2] == "content"


def test_mixed_evidence_stays_between_thresholds(spark):
    # param z: 4 groups, invariant in 3 -> 7500 bp -> neither verdict
    rows = []
    for g in range(4):
        for v in range(2):
            digest = f"d{g}" if g < 3 else f"d{g}{v}"
            rows.append((f"http://m.com/x?k={g}&z={v}", digest))
    got = _verdicts(spark, rows, min_groups=3)
    assert got[("m.com", "z")] == (4, 3, "insufficient")


def test_per_host_isolation(spark):
    # same param name behaves differently per host
    rows = []
    for v in range(2):
        for g in range(3):
            rows.append((f"http://s1.com/p?x={v}&g={g}", f"c{g}"))
            rows.append((f"http://s2.com/p?x={v}&g={g}", f"c{g}{v}"))
    got = _verdicts(spark, rows, min_groups=3)
    assert got[("s1.com", "x")][2] == "superfluous"
    assert got[("s2.com", "x")][2] == "content"


def test_no_query_urls_ignored(spark):
    rows = [("http://a.com/p", "d1"), ("http://a.com/q?k=1", "d2")]
    out = url_param_stats(_caps(spark, rows)).collect()
    assert len(out) == 1 and out[0].param == "k"


def test_residual_is_order_canonical(spark):
    # b=1&a=1 vs a=1&b=1 with c varying: same residual group for c
    rows = [
        ("http://o.com/p?b=1&a=1&c=1", "same"),
        ("http://o.com/p?a=1&b=1&c=2", "same"),
    ]
    out = {r.param: r for r in url_param_stats(_caps(spark, rows)).collect()}
    assert out["c"].n_groups == 1 and out["c"].n_invariant == 1


def test_oracle_parity_and_partitioning(spark, tmp_path):
    rows = []
    for e in range(300):
        u = e % 7
        url = (
            f"http://h{u % 3}.com/p/{u}?page={e % 4}&sid={e % 11}"
            + (f"&ref={e}" if e % 29 == 0 else "")
        )
        rows.append((url, f"dg{u}:{e % 4}"))
    path = str(tmp_path / "caps.parquet")
    _caps(spark, rows).write.parquet(path)
    df = spark.read.parquet(path)
    cols = ["host", "param"]
    a = (
        url_param_stats(df.coalesce(1)).toPandas()
        .sort_values(cols).reset_index(drop=True)
    )
    b = (
        url_param_stats(df.repartition(13)).toPandas()
        .sort_values(cols).reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(a, b)
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW up_caps AS SELECT * FROM parquet_scan('{path}/*.parquet')"
    )
    want = (
        con.execute(url_param_stats_oracle_sql("up_caps")).df()
        .sort_values(cols).reset_index(drop=True)
    )
    num = ["n_urls", "n_groups", "n_invariant"]
    pd.testing.assert_frame_equal(
        a.astype({c: "int64" for c in num})[cols + num + ["verdict"]],
        want.astype({c: "int64" for c in num})[cols + num + ["verdict"]],
    )
    # invariant_bp compared with NULL-tolerant equality
    assert (
        a["invariant_bp"].fillna(-1).astype("int64").tolist()
        == want["invariant_bp"].fillna(-1).astype("int64").tolist()
    )
