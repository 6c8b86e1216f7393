"""Bottom-k (KMV) source-overlap sketches (operators/kmv.py)."""

import duckdb
import pandas as pd
import pytest
from pyspark.sql import functions as F

from deepseek_ocr_rs_spark.operators.kmv import (
    kmv_overlap_oracle_sql,
    kmv_sketches,
    kmv_source_overlap,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, source string, text string")


def _corpus(n_shared, n_a, n_b):
    """Two sources with n_shared common words + private tails (each word
    becomes its own gram via 3-word windows over a single long doc)."""
    shared = " ".join(f"common{i} x{i} y{i}" for i in range(n_shared))
    a_txt = shared + " " + " ".join(f"aonly{i} p{i} q{i}" for i in range(n_a))
    b_txt = shared + " " + " ".join(f"bonly{i} r{i} s{i}" for i in range(n_b))
    return [(1, "a", a_txt), (2, "b", b_txt)]


def test_identical_sources_read_10000(spark):
    rows = [(1, "a", "w1 w2 w3 w4 w5 w6"), (2, "b", "w1 w2 w3 w4 w5 w6")]
    out = kmv_source_overlap(_docs(spark, rows), k=8).collect()
    assert len(out) == 1
    r = out[0]
    assert (r.src_a, r.src_b) == ("a", "b")
    assert r.jaccard_bp == 10000 and r.n_shared == r.n_k
    # below-k sketch: the distinct estimate is the EXACT count (4 grams)
    assert r.d_hat_a == 4 and r.d_hat_b == 4


def test_disjoint_sources_read_zero(spark):
    rows = [(1, "a", "p q r s t u"), (2, "b", "x y z w v k")]
    out = kmv_source_overlap(_docs(spark, rows), k=8).collect()
    assert out[0].jaccard_bp == 0 and out[0].n_shared == 0


def test_estimates_track_truth_at_full_sketch(spark):
    # 300 shared + 300 private each -> true J = 900/2700... each word
    # triple is distinct grams; just assert the estimate is in a sane
    # band around truth and the distinct estimate within 35% (k=64)
    rows = _corpus(100, 100, 100)
    out = kmv_source_overlap(_docs(spark, rows), k=64).collect()[0]
    # truth: |A| = |B| ~ 600 grams (2 per planted word triple + overlap
    # at seams); measure exact truth with spark itself
    df = _docs(spark, rows)
    from deepseek_ocr_rs_spark.operators.novelty import _grams_expr
    g = df.select(
        "source", F.explode(F.expr(_grams_expr("text", 3))).alias("g")
    ).distinct()
    a = {r.g for r in g.where("source = 'a'").collect()}
    b = {r.g for r in g.where("source = 'b'").collect()}
    true_j = len(a & b) / len(a | b)
    assert abs(out.jaccard_bp / 10000 - true_j) < 0.15
    assert abs(out.d_hat_a - len(a)) / len(a) < 0.35
    assert abs(out.d_hat_b - len(b)) / len(b) < 0.35


def test_sketch_is_exact_bottom_k(spark):
    # the histogram-pruned path must equal the definitional bottom-k
    rows = _corpus(50, 80, 30)
    sk = kmv_sketches(_docs(spark, rows), k=16).toPandas()
    from deepseek_ocr_rs_spark.operators.kmv import _hash60
    from deepseek_ocr_rs_spark.operators.novelty import _grams_expr
    g = (
        _docs(spark, rows)
        .select(
            F.col("source").alias("grp"),
            F.explode(F.expr(_grams_expr("text", 3))).alias("g"),
        )
        .select("grp", _hash60(F.col("g")).alias("h"))
        .distinct()
        .toPandas()
    )
    for grp, part in g.groupby("grp"):
        want = sorted(part["h"].tolist())[:16]
        got = sk[sk.grp == grp].sort_values("rnk")["h"].tolist()
        assert got == want, grp


def test_union_closure_mergeability(spark):
    # bottom-k of (A union B) is recoverable from the two sketches:
    # the pair stage's K smallest of the sketch union must equal the
    # bottom-k of the true union of distinct gram hashes
    rows = _corpus(40, 60, 60)
    k = 16
    sk = kmv_sketches(_docs(spark, rows), k=k).toPandas()
    merged = sorted(set(sk["h"].tolist()))[:k]
    from deepseek_ocr_rs_spark.operators.kmv import _hash60
    from deepseek_ocr_rs_spark.operators.novelty import _grams_expr
    g = (
        _docs(spark, rows)
        .select(F.explode(F.expr(_grams_expr("text", 3))).alias("g"))
        .select(_hash60(F.col("g")).alias("h"))
        .distinct()
        .toPandas()
    )
    assert merged == sorted(g["h"].tolist())[:k]


def test_oracle_parity_and_partitioning(spark, tmp_path):
    rows = []
    for d in range(60):
        src = f"s{d % 5}"
        words = " ".join(
            f"w{(d * 7 + j) % 97} t{j % 13} u{(d + j) % 29}"
            for j in range(20)
        )
        rows.append((d, src, words))
    path = str(tmp_path / "docs.parquet")
    _docs(spark, rows).write.parquet(path)
    df = spark.read.parquet(path)
    cols = ["src_a", "src_b"]
    a = (
        kmv_source_overlap(df.coalesce(1), k=32).toPandas()
        .sort_values(cols).reset_index(drop=True)
    )
    b = (
        kmv_source_overlap(df.repartition(13), k=32).toPandas()
        .sort_values(cols).reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(a, b)
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW kv_docs AS SELECT * FROM parquet_scan('{path}/*.parquet')"
    )
    want = (
        con.execute(kmv_overlap_oracle_sql("kv_docs", k=32)).df()
        .sort_values(cols).reset_index(drop=True)
    )
    num = ["n_k", "n_shared", "jaccard_bp", "d_hat_a", "d_hat_b"]
    pd.testing.assert_frame_equal(
        a.astype({c: "int64" for c in num}),
        want.astype({c: "int64" for c in num}),
    )
