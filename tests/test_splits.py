"""Leakage-safe split assignment (operators/splits.py)."""

import pytest

from deepseek_ocr_rs_spark.operators.splits import assign_splits


@pytest.fixture(scope="module")
def fixture(spark):
    docs = spark.createDataFrame(
        [(i,) for i in range(1, 201)], "doc_id long"
    )
    # components: {1,2,3} and {10,11}; everything else singleton
    comp = spark.createDataFrame(
        [(1, 1), (2, 1), (3, 1), (10, 10), (11, 10)],
        "doc_id long, component_id long",
    )
    return docs, comp


def test_cluster_members_share_split(spark, fixture):
    docs, comp = fixture
    out = {r.doc_id: (r.rep, r.split)
           for r in assign_splits(docs, comp).collect()}
    assert len(out) == 200
    assert out[1] == out[2] == out[3]
    assert out[10] == out[11]
    # singletons are their own rep
    assert out[42][0] == 42


def test_split_proportions_and_determinism(spark, fixture):
    docs, comp = fixture
    a = sorted(map(tuple, assign_splits(docs, comp).collect()))
    b = sorted(map(tuple, assign_splits(docs.repartition(7), comp).collect()))
    assert a == b
    from collections import Counter
    c = Counter(r[2] for r in a)
    # 98/1/1 over ~197 clusters: train dominates, eval splits small
    assert c["train"] > 180 and c["train"] + c.get("val", 0) + c.get(
        "test", 0) == 200


def test_custom_percentages_and_seed(spark, fixture):
    docs, comp = fixture
    from collections import Counter
    c = Counter(
        r.split
        for r in assign_splits(docs, comp, train_pct=50, val_pct=25).collect()
    )
    # 50/25/25: all three buckets well-populated over 197 clusters
    assert min(c["train"], c["val"], c["test"]) > 20
    a = {r.doc_id: r.split for r in assign_splits(docs, comp, seed=1).collect()}
    b = {r.doc_id: r.split for r in assign_splits(docs, comp, seed=2).collect()}
    assert a != b  # seed moves assignments


def test_bad_percentages_rejected(spark, fixture):
    docs, comp = fixture
    with pytest.raises(ValueError):
        assign_splits(docs, comp, train_pct=99, val_pct=1)
