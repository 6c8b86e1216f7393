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


class TestSplitLeakage:
    def _assigned(self, spark, rows):
        return spark.createDataFrame(
            rows, "doc_id long, text string, split string"
        )

    def test_leak_detected_with_examples(self, spark):
        from deepseek_ocr_rs_spark.operators.splits import split_leakage

        rows = [
            (1, "dup one", "train"), (2, "dup one", "val"),
            (3, "dup two", "train"), (4, "dup two", "test"),
            (5, "dup two", "train"),
            (6, "safe", "train"), (7, "safe", "train"),  # within-split dup
            (8, "eval only", "val"), (9, "eval only", "test"),
        ]
        out = {r.example_train_id: r
               for r in split_leakage(self._assigned(spark, rows)).collect()}
        assert set(out) == {1, 3}
        assert (out[1].n_train, out[1].n_val, out[1].n_test) == (1, 1, 0)
        assert out[1].example_eval_id == 2
        assert (out[3].n_train, out[3].n_test) == (2, 1)
        assert out[3].example_eval_id == 4

    def test_clean_split_reports_zero(self, spark):
        from deepseek_ocr_rs_spark.operators.splits import split_leakage

        rows = [(i, f"text {i}", ["train", "val", "test"][i % 3])
                for i in range(30)]
        assert split_leakage(self._assigned(spark, rows)).count() == 0

    def test_cluster_aware_split_is_leak_free_by_construction(self, spark):
        # the motivating composition: assign_splits routes exact twins
        # by their component rep, so split_leakage reports ZERO even
        # with planted duplicates
        from deepseek_ocr_rs_spark.operators.splits import (
            assign_splits,
            split_leakage,
        )

        docs = spark.createDataFrame(
            [(i, f"twin {i // 2}") for i in range(40)],
            "doc_id long, text string",
        )
        comps = spark.createDataFrame(
            [(i, (i // 2) * 2) for i in range(40)],
            "doc_id long, component_id long",
        )
        assigned = (
            assign_splits(docs, comps, train_pct=60, val_pct=20)
            .join(docs, "doc_id")
            .select("doc_id", "text", "split")
        )
        assert split_leakage(assigned).count() == 0

    def test_oracle_parity(self, spark, tmp_path):
        import duckdb
        import pandas as pd
        from deepseek_ocr_rs_spark.operators.splits import (
            split_leakage,
            split_leakage_oracle_sql,
        )

        rows = [
            (i, f"t {i % 13}", ["train", "train", "val", "test"][i % 4])
            for i in range(120)
        ]
        path = str(tmp_path / "asg.parquet")
        self._assigned(spark, rows).write.parquet(path)
        df = spark.read.parquet(path)
        a = (
            split_leakage(df).toPandas()
            .sort_values("text_md5").reset_index(drop=True)
        )
        b = (
            split_leakage(df.repartition(13)).toPandas()
            .sort_values("text_md5").reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(a, b)
        con = duckdb.connect()
        con.execute(
            f"CREATE VIEW sl_a AS SELECT * FROM parquet_scan('{path}/*.parquet')"
        )
        want = (
            con.execute(split_leakage_oracle_sql("sl_a")).df()
            .sort_values("text_md5").reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(a, want.astype(
            {c: "int64" for c in want.columns if c != "text_md5"}
        ))
