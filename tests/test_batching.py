"""length_bucket_batches (operators/batching.py) unit tests."""

import duckdb
import pytest

from deepseek_ocr_rs_spark.operators.batching import (
    length_bucket_batches,
    length_bucket_batches_oracle_sql,
)


def _df(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, n_tokens long")


def test_bucket_and_batch_arithmetic(spark):
    # width 10, 3 buckets, budget 40: pad targets 10/20/30 ->
    # batch sizes 4/2/1
    rows = [(i, t) for i, t in enumerate([3, 7, 9, 12, 19, 25, 31, 99])]
    out = {
        r.doc_id: r.asDict()
        for r in length_bucket_batches(
            _df(spark, rows),
            "doc_id",
            "n_tokens",
            bucket_width=10,
            n_buckets=3,
            token_budget=40,
        ).collect()
    }
    # bucket ids: <10 -> 0; 10..19 -> 1; everything else capped at 2
    assert [out[i]["bucket_id"] for i in range(8)] == [
        0, 0, 0, 1, 1, 2, 2, 2,
    ]
    assert all(out[i]["pad_target"] == 10 for i in range(3))
    assert out[3]["pad_target"] == 20 and out[5]["pad_target"] == 30
    # bucket 0 fits all 3 in one batch of size 4; bucket 1 fits both in
    # one batch of 2; bucket 2 (size 1 batches) gets 3 batches
    assert {out[i]["batch_id"] for i in range(3)} == {0}
    assert sorted(out[i]["pos_in_batch"] for i in range(3)) == [0, 1, 2]
    assert {out[3]["batch_id"], out[4]["batch_id"]} == {0}
    assert sorted(out[i]["batch_id"] for i in (5, 6, 7)) == [0, 1, 2]
    assert all(out[i]["pos_in_batch"] == 0 for i in (5, 6, 7))
    # pad accounting: overlong docs clamp to the ceiling (waste 0)
    assert out[0]["pad_tokens"] == 7 and out[7]["pad_tokens"] == 0


def test_positions_contiguous_within_batches(spark):
    rows = [(i, 5) for i in range(37)]  # all bucket 0, bsz = 40//10 = 4
    out = length_bucket_batches(
        _df(spark, rows), "doc_id", "n_tokens",
        bucket_width=10, n_buckets=3, token_budget=40,
    ).collect()
    got = sorted((r.batch_id, r.pos_in_batch) for r in out)
    want = sorted((i // 4, i % 4) for i in range(37))
    assert got == want


def test_cross_engine_parity_and_repartition_invariance(spark):
    rows = [(i, (i * 17) % 230) for i in range(300)]
    df = _df(spark, rows)
    got = sorted(
        tuple(r)
        for r in length_bucket_batches(
            df, "doc_id", "n_tokens", seed=3
        ).collect()
    )
    got8 = sorted(
        tuple(r)
        for r in length_bucket_batches(
            df.repartition(8), "doc_id", "n_tokens", seed=3
        ).collect()
    )
    assert got8 == got

    con = duckdb.connect()
    con.execute("CREATE TABLE t (doc_id BIGINT, n_tokens BIGINT)")
    con.executemany("INSERT INTO t VALUES (?, ?)", rows)
    want = sorted(
        tuple(r)
        for r in con.sql(
            length_bucket_batches_oracle_sql("t", "doc_id", "n_tokens", seed=3)
        ).fetchall()
    )
    assert got == want


def test_seed_changes_batch_composition_not_counts(spark):
    rows = [(i, 5) for i in range(40)]
    a = length_bucket_batches(
        _df(spark, rows), "doc_id", "n_tokens", seed=1
    ).collect()
    b = length_bucket_batches(
        _df(spark, rows), "doc_id", "n_tokens", seed=2
    ).collect()
    assert sorted(r.doc_id for r in a) == sorted(r.doc_id for r in b)
    pos_a = {r.doc_id: (r.batch_id, r.pos_in_batch) for r in a}
    pos_b = {r.doc_id: (r.batch_id, r.pos_in_batch) for r in b}
    assert pos_a != pos_b  # the shuffle actually reshuffles


def test_rejects_bad_parameters(spark):
    df = _df(spark, [(1, 5)])
    for kw in (
        {"bucket_width": 0},
        {"n_buckets": 0},
        {"token_budget": 0},
    ):
        with pytest.raises(ValueError):
            length_bucket_batches(df, "doc_id", "n_tokens", **kw)
