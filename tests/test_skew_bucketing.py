"""Skew defenses: salted join correctness + topology, and bucketed
co-located joins with no exchange on the bucketed sides."""

import pyspark.sql.functions as F

from deepseek_ocr_rs_spark.operators.skew import salted_join, write_bucketed


def _executed_plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_salted_join_matches_plain_join(spark):
    """Adversarially skewed input: 90% of big rows share ONE key.  The
    salted join must return exactly the plain join's multiset, for inner
    and left, including keys missing from the small side."""
    big = spark.range(0, 2000).select(
        F.when(F.col("id") < 1800, F.lit("hot")).otherwise(
            F.concat(F.lit("k"), (F.col("id") % 7).cast("string"))
        ).alias("k"),
        F.col("id").alias("payload"),
    )
    small = spark.createDataFrame(
        [("hot", 1.0), ("k1", 2.0), ("k2", 3.0), ("unmatched", 9.0)],
        "k string, attr double",
    )
    for how in ("inner", "left"):
        got = sorted(
            tuple(r) for r in salted_join(big, small, "k", 8, how).collect()
        )
        want = sorted(tuple(r) for r in big.join(small, "k", how).collect())
        assert got == want, how
    # left join keeps big rows whose key has no small-side match
    left = salted_join(big, small, "k", 8, "left")
    assert left.where(F.col("attr").isNull()).count() == \
        big.join(small, "k", "left").where(F.col("attr").isNull()).count() > 0


def test_salted_join_key_includes_salt(spark):
    """The physical join keys must include the salt column — that's the
    whole defense: a hot key hashes to n_salts distinct reducer keys."""
    big = spark.range(0, 100).select(
        F.lit("hot").alias("k"), F.col("id").alias("v"))
    small = spark.createDataFrame([("hot", 1)], "k string, a int")
    plan = _executed_plan(salted_join(big, small, "k", 4))
    assert "_skew_salt" in plan


def test_salted_join_row_key_spreads_duplicate_rows(spark):
    """Round-3 ADVICE: the default salt hashes ALL big-side columns, so
    exact-duplicate hot rows all draw ONE salt and the skew defense is
    silently ineffective.  With row_key=<unique id> the spread is uniform
    regardless of content duplication — and the result is still exactly
    the plain join."""
    n_salts = 8
    # 800 rows, all with IDENTICAL content columns except a unique rid
    big = spark.range(0, 800).select(
        F.col("id").alias("rid"),
        F.lit("hot").alias("k"),
        F.lit("same-payload").alias("payload"),
    )
    small = spark.createDataFrame([("hot", 1.0)], "k string, attr double")

    # content-hash salt (the documented default contract) is constant on
    # duplicate rows; the rid-hash salt covers all n_salts buckets
    content_salts = big.select(
        F.pmod(F.hash("rid", "k", "payload"), F.lit(n_salts)).alias("s")
    ).distinct().count()
    rid_salts = big.select(
        F.pmod(F.hash("rid"), F.lit(n_salts)).alias("s")
    ).distinct().count()
    assert rid_salts == n_salts
    # (content columns alone — what duplicate rows share — give ONE salt)
    dup_only_salts = big.select(
        F.pmod(F.hash("k", "payload"), F.lit(n_salts)).alias("s")
    ).distinct().count()
    assert dup_only_salts == 1
    assert content_salts == n_salts  # rid participates in default too

    for how in ("inner", "left"):
        got = sorted(tuple(r) for r in salted_join(
            big, small, "k", n_salts, how, row_key="rid").collect())
        want = sorted(tuple(r) for r in big.join(small, "k", how).collect())
        assert got == want, how


def test_salted_join_rejects_unsupported_how(spark):
    import pytest

    big = spark.range(1).select(F.lit("x").alias("k"))
    with pytest.raises(ValueError):
        salted_join(big, big, "k", 4, "full_outer")


def test_bucketed_join_skips_exchange(spark):
    """Two tables bucketed on the same key join WITHOUT any exchange on
    the bucketed sides — the co-location pattern that amortizes the big
    shuffle across every downstream join at 100 TB."""
    a = spark.range(0, 1000).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("va"))
    b = spark.range(0, 1000).select(
        F.col("id").alias("k"), (F.col("id") * 3).alias("vb"))
    write_bucketed(a, "bkt_a", "k", n_buckets=4, sort_col="k")
    write_bucketed(b, "bkt_b", "k", n_buckets=4, sort_col="k")
    try:
        ta, tb = spark.table("bkt_a"), spark.table("bkt_b")
        with_conf = spark.conf
        old = with_conf.get("spark.sql.autoBroadcastJoinThreshold", "10MB")
        with_conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            j = ta.join(tb, "k")
            assert j.count() == 1000
            plan = _executed_plan(j)
            assert "SortMergeJoin" in plan
            assert "Exchange" not in plan  # bucketed scan IS the partitioning
        finally:
            with_conf.set("spark.sql.autoBroadcastJoinThreshold", old)
        # and the same join WITHOUT bucketing does exchange both sides
        plain = a.join(b.withColumnRenamed("vb", "vb2"), "k")
        assert "Exchange" in _executed_plan(plain) or \
            "Broadcast" in _executed_plan(plain)
    finally:
        spark.sql("DROP TABLE IF EXISTS bkt_a")
        spark.sql("DROP TABLE IF EXISTS bkt_b")


def test_moe_topk_dispatch_semantics(spark):
    """T3 dispatch: each token lands on exactly its k best experts
    (tie -> lower expert id), each expert batch respects capacity and
    keeps the highest scores, and the result is partitioning-invariant."""
    from deepseek_ocr_rs_spark.operators.moe import topk_expert_dispatch

    # 6 tokens x 4 experts; token 0 ties experts 0 and 1 at 9.0
    rows = [
        (0, [9.0, 9.0, 1.0, 0.0]),
        (1, [0.0, 8.0, 7.0, 1.0]),
        (2, [5.0, 0.0, 6.0, 1.0]),
        (3, [0.1, 0.2, 0.3, 0.4]),
        (4, [4.0, 4.0, 4.0, 4.0]),
        (5, [1.0, 2.0, 3.0, 9.9]),
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = topk_expert_dispatch(df, n_experts=4, k=2, capacity=2,
                               id_col="vec_id")
    got = {(r["vec_id"], r["expert_id"]): (r["score"], r["slot"])
           for r in out.collect()}
    by_tok = {}
    for (tok, exp) in got:
        by_tok.setdefault(tok, []).append(exp)
    # token 0's tie resolves to experts 0 and 1 (lower index wins)
    assert sorted(by_tok[0]) == [0, 1]
    # per-token at most k experts
    assert all(len(v) <= 2 for v in by_tok.values())
    # expert 3: candidates are tokens 5 (9.9), 3 (0.4) -> both fit cap 2
    assert (5, 3) in got and got[(5, 3)][1] == 1
    # capacity drops the WORST scores: expert 0's candidates are
    # tokens 0 (9.0), 2 (5.0), 4 (4.0); cap 2 keeps 0 and 2, drops 4
    exp0 = [t for (t, e) in got if e == 0]
    assert sorted(exp0) == [0, 2]
    # partitioning invariance
    again = topk_expert_dispatch(df.repartition(7), n_experts=4, k=2,
                                 capacity=2, id_col="vec_id")
    assert sorted(map(tuple, out.collect())) == \
        sorted(map(tuple, again.collect()))


def test_stratified_sample_rates_and_determinism(spark):
    """Per-stratum rates land near their targets, unlisted strata use the
    default, and the sampled set is identical across partitionings."""
    from deepseek_ocr_rs_spark.operators.sampling import stratified_sample

    rows = [(i, ["a", "b", "c"][i % 3]) for i in range(3000)]
    df = spark.createDataFrame(rows, "k long, s string")
    out = stratified_sample(df, "s", {"a": 1.0, "b": 0.2}, "k", seed=3,
                            default_fraction=0.0)
    counts = {r["s"]: r["n"] for r in
              out.groupBy("s").agg(F.count("*").alias("n")).collect()}
    assert counts["a"] == 1000            # fraction 1.0 keeps everything
    assert 140 <= counts.get("b", 0) <= 260   # ~200 of 1000
    assert "c" not in counts              # default 0.0 drops the stratum
    again = stratified_sample(df.repartition(13), "s", {"a": 1.0, "b": 0.2},
                              "k", seed=3, default_fraction=0.0)
    assert sorted(map(tuple, out.collect())) == \
        sorted(map(tuple, again.collect()))


# ----------------------------------------------------- skew diagnostics


def _profile(spark, keys):
    from deepseek_ocr_rs_spark.operators.skew import key_skew_profile

    df = spark.createDataFrame([(k,) for k in keys], "k long")
    return {
        r.bucket: (r.n_keys, r.n_rows, r.rows_bp)
        for r in key_skew_profile(df, "k").collect()
    }


def test_skew_profile_hand_buckets(spark):
    # keys: a=1 row (bucket 0), b=2 and c=3 rows (bucket 1), d=8 rows
    # (bucket 3); total 14 rows
    keys = [1] + [2] * 2 + [3] * 3 + [4] * 8
    got = _profile(spark, keys)
    assert got == {
        0: (1, 1, 10000 * 1 // 14),
        1: (2, 5, 10000 * 5 // 14),
        3: (1, 8, 10000 * 8 // 14),
    }


def test_skew_profile_null_bucket(spark):
    # NULLs are the classic accidental hot key: their own bucket -1
    got = _profile(spark, [None, None, None, 7])
    assert got == {-1: (1, 3, 7500), 0: (1, 1, 2500)}


def test_skew_profile_uniform_vs_hot(spark):
    # a uniform key puts all mass in one low bucket; one hot key moves
    # most mass into a single high bucket — the decision signal
    uniform = _profile(spark, list(range(64)))
    assert set(uniform) == {0} and uniform[0][2] == 10000
    hot = _profile(spark, list(range(16)) + [99] * 48)
    assert hot[5] == (1, 48, 7500)  # 48 rows -> bucket 5, 75% of mass


def test_skew_profile_oracle_parity_and_invariance(spark):
    import duckdb
    import pandas as pd

    from deepseek_ocr_rs_spark.operators.skew import (
        key_skew_profile,
        key_skew_profile_oracle_sql,
    )

    keys = [i % 17 for i in range(200)] + [None] * 9 + [3] * 120
    pdf = pd.DataFrame({"k": pd.array(keys, dtype="Int64")})
    df = spark.createDataFrame([(k,) for k in keys], "k long")

    con = duckdb.connect()
    con.register("ks_t", pdf)
    want = sorted(
        tuple(x)
        for x in con.sql(key_skew_profile_oracle_sql("ks_t", "k")).fetchall()
    )
    got = sorted(
        tuple(r) for r in key_skew_profile(df, "k").collect()
    )
    got8 = sorted(
        tuple(r)
        for r in key_skew_profile(df.repartition(8), "k").collect()
    )
    assert got == want
    assert got8 == got
    # conservation: bucket rows sum to the table size
    assert sum(t[2] for t in got) == len(keys)


class TestJoinExplosionProfile:
    def _ev(self, spark, ks):
        return spark.createDataFrame([(k,) for k in ks], "k long")

    def test_exact_cardinality_and_hot_key(self, spark):
        from deepseek_ocr_rs_spark.operators.skew import (
            join_explosion_profile,
        )

        a = self._ev(spark, [1, 1, 1, 2, 3, None])
        b = self._ev(spark, [1, 1, 2, 2, 4, None])
        out = join_explosion_profile(a, b, "k").collect()
        got = {r.k: (r.n_a, r.n_b, r.contribution, r.total_rows)
               for r in out}
        # 1: 3*2=6, 2: 1*2=2; 3 and 4 don't co-occur; NULLs dropped
        assert got == {1: (3, 2, 6, 8), 2: (1, 2, 2, 8)}
        shares = {r.k: r.share_bp for r in out}
        assert shares == {1: 7500, 2: 2500}
        # matches the actual join exactly
        assert a.join(b, "k").count() == 8

    def test_disjoint_keys_empty_profile(self, spark):
        from deepseek_ocr_rs_spark.operators.skew import (
            join_explosion_profile,
        )

        a = self._ev(spark, [1, 2])
        b = self._ev(spark, [3, 4])
        assert join_explosion_profile(a, b, "k").count() == 0

    def test_topk_order_and_oracle_parity(self, spark, tmp_path):
        import duckdb
        import pandas as pd
        from deepseek_ocr_rs_spark.operators.skew import (
            join_explosion_oracle_sql,
            join_explosion_profile,
        )

        ks = [(e % 17 if e % 3 else 42) for e in range(500)]
        path = str(tmp_path / "ks.parquet")
        self._ev(spark, ks).write.parquet(path)
        df = spark.read.parquet(path)
        a = (
            join_explosion_profile(df, df, "k", top_k=5).toPandas()
            .reset_index(drop=True)
        )
        assert a.loc[0, "k"] == 42  # the planted hot key leads
        assert (a["contribution"].diff().dropna() <= 0).all()
        b = (
            join_explosion_profile(
                df.repartition(13), df.repartition(7), "k", top_k=5
            ).toPandas().reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(a, b)
        con = duckdb.connect()
        con.execute(
            f"CREATE VIEW je_ks AS SELECT * FROM parquet_scan('{path}/*.parquet')"
        )
        want = (
            con.execute(
                join_explosion_oracle_sql("je_ks", "je_ks", "k", top_k=5)
            ).df().reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(a, want.astype("int64"))
