"""Incremental extraction composition (plans/incremental.py).

The proof obligations, each pinned behaviorally:

1. *reuse, not re-extraction* — unchanged pages carry the STORED text
   even when fresh extraction would produce something different (the
   stored side is a planted sentinel the extractor can never emit);
2. *the extractor only sees added/changed* — every row the extractor
   emits is tagged, and tags appear on exactly the added/changed rows;
   the DataFrame handed to the extractor carries the status filter in
   its plan (the Arrow/Python node sits under it in the real query);
3. *diff semantics* — all four statuses, tombstone NULLs for gone,
   one row per key across both snapshots.
"""

from pyspark.sql import functions as F

from deepseek_ocr_rs_spark.plans.incremental import incremental_extract


def _snap(spark, rows):
    return spark.createDataFrame(rows, "key string, digest string, payload string")


def test_statuses_reuse_and_extractor_scope(spark):
    old = _snap(
        spark,
        [
            ("same", "d1", "old-payload"),
            ("edit", "v1", "old-payload"),
            ("gone", "g1", "old-payload"),
        ],
    ).select("key", "digest")
    new = _snap(
        spark,
        [
            ("same", "d1", "same-payload"),
            ("edit", "v2", "edit-payload"),
            ("new", "n1", "new-payload"),
        ],
    )
    # previous run's sink: a sentinel no extractor invocation can emit
    stored = spark.createDataFrame(
        [("same", "STORED-SENTINEL"), ("edit", "STALE"), ("gone", "STALE")],
        "key string, text_md string",
    )

    seen = {}

    def extractor(todo):
        seen["plan"] = todo._jdf.queryExecution().optimizedPlan().toString()
        return todo.select(
            "key", F.concat(F.lit("FRESH:"), F.col("payload")).alias("text_md")
        )

    out = {
        r["key"]: (r["status"], r["text_md"], r["extracted_now"])
        for r in incremental_extract(old, new, stored, extractor).collect()
    }
    assert out == {
        "same": ("unchanged", "STORED-SENTINEL", False),
        "edit": ("changed", "FRESH:edit-payload", True),
        "new": ("added", "FRESH:new-payload", True),
        "gone": ("gone", None, False),
    }
    # the status filter is already in the plan the extractor receives —
    # in the real pipeline the Arrow/Python node therefore sits above
    # only the added/changed fraction
    assert "added" in seen["plan"] and "changed" in seen["plan"]


def test_empty_snapshots(spark):
    empty = _snap(spark, []).select("key", "digest")
    stored = spark.createDataFrame([], "key string, text_md string")
    calls = []

    def extractor(todo):
        calls.append(1)
        return todo.select("key", F.col("payload").alias("text_md"))

    # everything gone
    old = _snap(spark, [("a", "d", "p")]).select("key", "digest")
    out = incremental_extract(
        old, _snap(spark, []), stored, extractor
    ).collect()
    assert [(r["key"], r["status"], r["text_md"]) for r in out] == [
        ("a", "gone", None)
    ]
    # everything added
    out2 = {
        r["key"]: r["status"]
        for r in incremental_extract(
            empty, _snap(spark, [("b", "d", "p")]), stored, extractor
        ).collect()
    }
    assert out2 == {"b": "added"}
