"""Deterministic sketches: accuracy in-regime, no-false-negative /
never-underestimate guarantees, oracle parity, partitioning invariance."""

import duckdb
import pandas as pd
import pytest

from deepseek_ocr_rs_spark.operators.sketches import (
    hist_counts,
    hist_quantiles,
    hist_quantiles_oracle_sql,
    bloom_build,
    bloom_probe,
    bloom_probe_oracle_sql,
    cm_estimate,
    cm_estimate_oracle_sql,
    hll_estimate,
    hll_oracle_sql,
)


@pytest.fixture(scope="module")
def keys1000(spark):
    # 1000 distinct keys, each duplicated a varying number of times so
    # distinct-count != row-count
    rows = [(k,) for k in range(1000) for _ in range(1 + k % 3)]
    return spark.createDataFrame(rows, "k bigint")


def test_hll_accuracy_in_regime(keys1000):
    # n=1000 >= 2.5*m for b=5 (m=32): raw estimator within ~3 sigma
    # (1.04/sqrt(32) ~ 18.4%/sigma)
    est = hll_estimate(keys1000, "k", b=5).collect()[0]["hll_estimate"]
    assert 1000 * 0.45 <= est <= 1000 * 1.6
    # duplicates must not move the estimate: HLL sees sets
    dedup = keys1000.distinct()
    est2 = hll_estimate(dedup, "k", b=5).collect()[0]["hll_estimate"]
    assert est == est2


def test_hll_oracle_parity_and_invariance(keys1000):
    con = duckdb.connect()
    con.register(
        "t", pd.DataFrame([(r["k"],) for r in keys1000.collect()],
                          columns=["k"])
    )
    duck = con.sql(hll_oracle_sql("t", "k", b=5)).fetchall()
    for n_parts in (1, 7):
        got = [tuple(r) for r in
               hll_estimate(keys1000.repartition(n_parts), "k",
                            b=5).collect()]
        assert got == duck


def test_bloom_no_false_negatives(spark):
    members = spark.createDataFrame([(i,) for i in range(200)], "k bigint")
    probes = spark.createDataFrame([(i,) for i in range(400)], "k bigint")
    bl = bloom_build(members, "k", m_bits=4096, k=4)
    hits = {r["k"] for r in
            bloom_probe(probes, bl, "k", m_bits=4096, k=4).collect()}
    assert set(range(200)) <= hits  # every true member tests positive
    fps = hits - set(range(200))
    # FP rate at 200*4/4096 fill is small but the SET is deterministic
    assert len(fps) < 100
    hits2 = {r["k"] for r in
             bloom_probe(probes.repartition(7), bl, "k",
                         m_bits=4096, k=4).collect()}
    assert hits == hits2


def test_bloom_duplicate_candidates_keep_members(spark):
    """Regression: a candidate key appearing in >1 row must still test
    positive (duplicates once contributed 2k bit rows and failed the
    == k check — a false NEGATIVE), and every duplicate row is kept."""
    members = spark.createDataFrame([(i,) for i in range(50)], "k bigint")
    probes = spark.createDataFrame([(7,), (7,), (8,), (999,)], "k bigint")
    bl = bloom_build(members, "k", m_bits=4096, k=4)
    out = [r["k"] for r in
           bloom_probe(probes, bl, "k", m_bits=4096, k=4).collect()]
    assert sorted(out)[:3] == [7, 7, 8]  # both rows of the dup survive
    # oracle agrees row-for-row (multiset, duplicates preserved)
    con = duckdb.connect()
    con.register("m", pd.DataFrame([(i,) for i in range(50)], columns=["k"]))
    con.register("p", pd.DataFrame([(7,), (7,), (8,), (999,)],
                                   columns=["k"]))
    duck = sorted(r[0] for r in con.sql(
        bloom_probe_oracle_sql("m", "k", "p", "k", "p.k",
                               m_bits=4096, k=4)).fetchall())
    assert sorted(out) == duck


def test_bloom_oracle_parity(spark):
    members = [(i,) for i in range(200)]
    probes = [(i,) for i in range(400)]
    mdf = spark.createDataFrame(members, "k bigint")
    pdf_ = spark.createDataFrame(probes, "k bigint")
    bl = bloom_build(mdf, "k", m_bits=2048, k=3)
    got = sorted(
        r["k"]
        for r in bloom_probe(pdf_, bl, "k", m_bits=2048, k=3).collect()
    )
    con = duckdb.connect()
    con.register("m", pd.DataFrame(members, columns=["k"]))
    con.register("p", pd.DataFrame(probes, columns=["k"]))
    duck = sorted(
        r[0]
        for r in con.sql(
            bloom_probe_oracle_sql("m", "k", "p", "k", "p.k",
                                   m_bits=2048, k=3)
        ).fetchall()
    )
    assert got == duck


def test_cm_never_underestimates(spark):
    rows = [(f"k{i % 40}",) for i in range(4000)]
    df = spark.createDataFrame(rows, "k string")
    keys = df.distinct()
    est = {r["k"]: r["est"] for r in
           cm_estimate(df, keys, "k", d=3, w=16).collect()}
    true = {f"k{i}": 100 for i in range(40)}
    assert set(est) == set(true)
    assert all(est[k] >= true[k] for k in true)  # CM guarantee
    # with w >> distinct keys, no collisions -> exact
    exact = {r["k"]: r["est"] for r in
             cm_estimate(df, keys, "k", d=3, w=4096).collect()}
    assert exact == true


def test_cm_oracle_parity(spark):
    rows = [(f"k{i % 40}",) for i in range(400)]
    df = spark.createDataFrame(rows, "k string")
    got = sorted(
        tuple(r)
        for r in cm_estimate(df, df.distinct(), "k", d=3, w=16).collect()
    )
    con = duckdb.connect()
    con.register("t", pd.DataFrame(rows, columns=["k"]))
    duck = sorted(
        tuple(r)
        for r in con.sql(
            cm_estimate_oracle_sql("t", "k", "SELECT DISTINCT k FROM t",
                                   d=3, w=16)
        ).fetchall()
    )
    assert got == duck


def test_null_keys_dropped_consistently(spark):
    """NULL keys must be invisible to every sketch on BOTH engines
    (Spark concat_ws skips NULL; SQL '||' nulls the hash out)."""
    rows = [(1,), (2,), (None,)]
    df = spark.createDataFrame(rows, "k bigint")
    con = duckdb.connect()
    con.register(
        "t", pd.DataFrame({"k": pd.array([1, 2, None], dtype="Int64")})
    )
    # HLL: estimate sees exactly 2 keys on both engines
    got = [tuple(r) for r in hll_estimate(df, "k", b=5).collect()]
    duck = con.sql(hll_oracle_sql("t", "k", b=5)).fetchall()
    assert got == duck
    # Bloom: NULL neither builds bits nor probes positive
    bl = bloom_build(df, "k", m_bits=512, k=3)
    hits = bloom_probe(df, bl, "k", m_bits=512, k=3).collect()
    assert sorted(r["k"] for r in hits) == [1, 2]
    duck_hits = sorted(r[0] for r in con.sql(
        bloom_probe_oracle_sql("t", "k", "t", "k", "p.k",
                               m_bits=512, k=3)).fetchall())
    assert sorted(r["k"] for r in hits) == duck_hits
    # Count-Min: NULL neither counts nor estimates
    got_cm = sorted(tuple(r) for r in
                    cm_estimate(df, df, "k", d=2, w=8).collect())
    duck_cm = sorted(tuple(r) for r in con.sql(
        cm_estimate_oracle_sql("t", "k", "SELECT k FROM t",
                               d=2, w=8)).fetchall())
    assert got_cm == duck_cm
    assert all(k is not None for k, _ in got_cm)


def test_hist_quantiles_accuracy_and_merge(spark):
    # values 0..999 uniformly: pXX must land within one bin width (10)
    rows = [(float(v),) for v in range(1000)]
    df = spark.createDataFrame(rows, "v double")
    est = {r["q"]: r["est"] for r in
           hist_quantiles(df, "v", 0.0, 1000.0, 100,
                          [0.5, 0.9]).collect()}
    assert abs(est[0.5] - 500.0) <= 10.0
    assert abs(est[0.9] - 900.0) <= 10.0
    # mergeable: counters of two halves add to the full histogram
    h_full = {(r["bin"]): r["cnt"] for r in
              hist_counts(df, "v", 0.0, 1000.0, 100).collect()}
    lo_half = hist_counts(df.where("v < 500"), "v", 0.0, 1000.0,
                          100).collect()
    hi_half = hist_counts(df.where("v >= 500"), "v", 0.0, 1000.0,
                          100).collect()
    merged = {}
    for r in list(lo_half) + list(hi_half):
        merged[r["bin"]] = merged.get(r["bin"], 0) + r["cnt"]
    assert merged == h_full


def test_hist_quantiles_oracle_parity_and_invariance(spark):
    # clustered + out-of-range values exercise clamping and sparse bins
    rows = [(float(v % 37) * 13.5 - 20.0,) for v in range(500)]
    df = spark.createDataFrame(rows, "v double")
    con = duckdb.connect()
    con.register("t", pd.DataFrame(rows, columns=["v"]))
    duck = sorted(con.sql(
        hist_quantiles_oracle_sql("t", "v", 0.0, 400.0, 64,
                                  [0.1, 0.5, 0.99, 1.0])
    ).fetchall())
    for n_parts in (1, 7):
        got = sorted(
            tuple(r) for r in
            hist_quantiles(df.repartition(n_parts), "v", 0.0, 400.0, 64,
                           [0.1, 0.5, 0.99, 1.0]).collect()
        )
        assert got == duck


def test_hist_nulls_dropped_and_clamped(spark):
    rows = [(None,), (-1e9,), (1e9,), (5.0,)]
    df = spark.createDataFrame(rows, "v double")
    h = {r["bin"]: r["cnt"] for r in
         hist_counts(df, "v", 0.0, 100.0, 10).collect()}
    # NULL dropped; extremes clamp to edge bins; 5.0 -> bin 0
    assert h == {0: 2, 9: 1}


# ------------------------------------------------------ windowed HLL


def test_hll_windowed_merge_equals_direct(spark, keys1000):
    from deepseek_ocr_rs_spark.operators.sketches import hll_windowed

    # split the keys over 3 windows; the ALL row must equal a DIRECT
    # whole-table sketch exactly (register max-merge is lossless)
    df = keys1000.selectExpr("k", "cast(k % 3 as string) as w")
    rows = {r.win: (r.hll_estimate, r.n_registers_used)
            for r in hll_windowed(df, "k", "w", b=5).collect()}
    direct = hll_estimate(keys1000, "k", b=5).collect()[0]
    assert rows["ALL"] == (
        direct["hll_estimate"], direct["n_registers_used"]
    )
    # each window row equals a direct sketch of that window's subset
    for w in ("0", "1", "2"):
        sub = hll_estimate(
            df.where(f"w = '{w}'"), "k", b=5
        ).collect()[0]
        assert rows[w] == (sub["hll_estimate"], sub["n_registers_used"])


def test_hll_windowed_null_and_duplicates(spark):
    from deepseek_ocr_rs_spark.operators.sketches import hll_windowed

    rows = [(1, "a"), (1, "a"), (2, "a"), (None, "a"), (3, None)]
    df = spark.createDataFrame(rows, "k bigint, w string")
    got = {r.win: r.n_registers_used
           for r in hll_windowed(df, "k", "w", b=5).collect()}
    # NULL key and NULL window dropped: only window 'a' (+ ALL) remain,
    # and the duplicate k=1 adds no register
    assert set(got) == {"a", "ALL"}
    ref = {r.win: r.n_registers_used
           for r in hll_windowed(
               spark.createDataFrame([(1, "a"), (2, "a")],
                                     "k bigint, w string"),
               "k", "w", b=5).collect()}
    assert got == ref


def test_hll_windowed_oracle_parity_and_invariance(spark, keys1000):
    from deepseek_ocr_rs_spark.operators.sketches import (
        hll_windowed,
        hll_windowed_oracle_sql,
    )

    df = keys1000.selectExpr("k", "cast(k % 4 as string) as w")
    con = duckdb.connect()
    con.register(
        "tw", pd.DataFrame(
            [(r["k"], r["w"]) for r in df.collect()], columns=["k", "w"]
        )
    )
    want = sorted(
        tuple(x)
        for x in con.sql(hll_windowed_oracle_sql("tw", "k", "w", b=5))
        .fetchall()
    )
    got = sorted(
        tuple(r) for r in hll_windowed(df, "k", "w", b=5).collect()
    )
    got7 = sorted(
        tuple(r)
        for r in hll_windowed(df.repartition(7), "k", "w", b=5).collect()
    )
    assert got == want
    assert got7 == got
