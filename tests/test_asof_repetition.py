"""as-of join (union-and-window form) + repetition/decontamination ops."""

import pytest
from pyspark.sql import functions as F

from deepseek_ocr_rs_spark.operators.asof import asof_join
from deepseek_ocr_rs_spark.operators.repetition import (
    ngram_decontaminate,
    ngram_repetition_signals,
)


@pytest.fixture(scope="module")
def asof_data(spark):
    left = spark.createDataFrame(
        [("a", 5, 100), ("a", 10, 101), ("a", 1, 102), ("b", 3, 103)],
        "k string, ts int, lid int",
    )
    right = spark.createDataFrame(
        # the NULL-ts row must be invisible to every match (ASOF semantics:
        # a NULL timestamp never satisfies the comparison)
        [("a", 4, 40.0), ("a", 5, 50.0), ("a", 9, None), ("b", 7, 70.0),
         ("a", None, 999.0)],
        "k string, ts int, v double",
    )
    return left, right


def _lookup(df):
    return {r.lid: r.v for r in df.collect()}


def test_backward_inclusive(spark, asof_data):
    left, right = asof_data
    out = _lookup(asof_join(left, right, on=["k"], right_cols=["v"]))
    # ts=5 matches the right row AT 5 (inclusive); ts=10 matches ts=9 whose
    # value is NULL — a matched row with a NULL attribute stays NULL (the
    # struct marker distinguishes "matched null" from "no match")
    assert out == {100: 50.0, 101: None, 102: None, 103: None}


def test_backward_strict_excludes_same_ts(spark, asof_data):
    left, right = asof_data
    out = _lookup(
        asof_join(left, right, on=["k"], right_cols=["v"], strict=True)
    )
    assert out[100] == 40.0  # ts=5 now takes the ts=4 row
    assert out[102] is None


def test_forward(spark, asof_data):
    left, right = asof_data
    out = _lookup(
        asof_join(left, right, on=["k"], right_cols=["v"],
                  direction="forward")
    )
    # earliest right with r.ts >= l.ts
    assert out == {100: 50.0, 101: None, 102: 40.0, 103: 70.0}
    # forward-strict: ts=5 skips the ts=5 row, lands on ts=9 (NULL value)
    strict = _lookup(
        asof_join(left, right, on=["k"], right_cols=["v"],
                  direction="forward", strict=True)
    )
    assert strict[100] is None and strict[102] == 40.0


def test_asof_rejects_bad_args(spark, asof_data):
    left, right = asof_data
    with pytest.raises(ValueError):
        asof_join(left, right, on=["k"], direction="sideways")
    with pytest.raises(ValueError):
        asof_join(left, right.withColumnRenamed("v", "lid"),
                  on=["k"], right_cols=["lid"])


def test_asof_plan_is_single_window_no_python(spark, asof_data):
    left, right = asof_data
    plan = asof_join(left, right, on=["k"], right_cols=["v"]) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "Window" in plan
    assert "PythonUDF" not in plan and "MapInPandas" not in plan
    # no range-explosion join anywhere (the naive theta-join form)
    assert "CartesianProduct" not in plan and "BroadcastNestedLoop" not in plan


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(
        [
            (1, "a b a b a b"),          # heavy 2-gram repetition
            (2, "x y z w q r s t"),      # all distinct
            (3, "one two"),              # shorter than n=3
            (4, ""),                     # empty
            (5, "  spaced   out  "),     # whitespace runs
        ],
        "doc_id long, text string",
    )


def test_repetition_signals_values(spark, docs):
    out = {
        r.doc_id: r.asDict()
        for r in ngram_repetition_signals(
            docs, top_ns=(2,), dup_ns=(2,)
        ).collect()
    }
    # doc 1: 2-grams = [a b, b a, a b, b a, a b] -> top 'a b' 3/5; all 5
    # occurrences belong to grams seen > once
    assert out[1]["top2_frac"] == 0.6 and out[1]["dup2_frac"] == 1.0
    assert out[2]["top2_frac"] == pytest.approx(1 / 7, abs=1e-6)
    assert out[2]["dup2_frac"] == 0.0
    assert out[3]["top2_frac"] == 1.0   # single 2-gram
    assert out[4]["top2_frac"] == 0.0 and out[4]["dup2_frac"] == 0.0
    assert out[5]["top2_frac"] == 1.0   # tokens [spaced, out] -> 1 gram
    assert len(out) == 5                # every doc present


def test_decontaminate_fraction(spark, docs):
    bench = spark.createDataFrame([(99, "a b a")], "doc_id long, text string")
    out = {
        r.doc_id: r.asDict()
        for r in ngram_decontaminate(docs, bench, n=2).collect()
    }
    # bench distinct 2-grams: {a b, b a}; doc 1 distinct = {a b, b a} -> 1.0
    assert out[1]["contamination_frac"] == 1.0
    assert out[1]["total_grams"] == 2 and out[1]["matched_grams"] == 2
    assert out[2]["contamination_frac"] == 0.0
    assert out[4]["total_grams"] == 0 and out[4]["contamination_frac"] == 0.0
    assert len(out) == 5
