"""Sequence packing: two-phase distributed scan vs the naive global scan
(operators/packing.py)."""

import pytest

from deepseek_ocr_rs_spark.operators.packing import pack_sequences


def _rows(df):
    return sorted(
        (r.doc_id, r.n_tokens, r.pack_id, r.pack_off, r.spill)
        for r in df.collect()
    )


@pytest.fixture(scope="module")
def docs(spark):
    # irregular sizes incl. a 0-token doc and one longer than the budget
    sizes = [5, 0, 17, 100, 3, 42, 7, 51, 2, 9, 30, 1, 64, 8, 11]
    rows = [(i, n) for i, n in enumerate(sizes)]
    return spark.createDataFrame(rows, "doc_id long, n_tokens long")


def test_matches_naive_global_scan(spark, docs):
    budget = 32
    got = _rows(pack_sequences(docs, budget=budget, bucket_size=4))
    # expected from a plain python prefix sum (= the oracle semantics)
    sizes = {r.doc_id: r.n_tokens for r in docs.collect()}
    start = 0
    exp = []
    for i in sorted(sizes):
        n = sizes[i]
        pack = start // budget
        exp.append((i, n, pack, start % budget,
                    max(0, start + n - (pack + 1) * budget)))
        start += n
    assert got == sorted(exp)


def test_bucket_size_invariance(spark, docs):
    a = _rows(pack_sequences(docs, budget=32, bucket_size=1))
    b = _rows(pack_sequences(docs, budget=32, bucket_size=7))
    c = _rows(pack_sequences(docs, budget=32, bucket_size=1000))
    assert a == b == c


def test_partitioning_invariance(spark, docs):
    a = _rows(pack_sequences(docs.repartition(8), budget=32, bucket_size=4))
    b = _rows(pack_sequences(docs.coalesce(1), budget=32, bucket_size=4))
    assert a == b


def test_long_doc_straddles_multiple_packs(spark):
    df = spark.createDataFrame(
        [(0, 10), (1, 100), (2, 5)], "doc_id long, n_tokens long"
    )
    out = {r.doc_id: r for r in pack_sequences(
        df, budget=32, bucket_size=2).collect()}
    # doc 1 starts at offset 10 in pack 0 and spills 78 tokens past the
    # first cut (straddling packs 0..3); doc 2 starts at stream offset 110
    assert (out[1].pack_id, out[1].pack_off, out[1].spill) == (0, 10, 78)
    assert (out[2].pack_id, out[2].pack_off) == (3, 14)
    assert out[2].spill == 0
