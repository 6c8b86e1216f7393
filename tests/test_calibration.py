"""Reliability bins + ECE (operators/calibration.py)."""

import duckdb
import pandas as pd

from deepseek_ocr_rs_spark.operators.calibration import (
    calibration_bins,
    calibration_bins_oracle_sql,
)


def _scored(spark, rows):
    return spark.createDataFrame(rows, "score_bp long, label long")


def _by_bin(spark, rows, **kw):
    out = calibration_bins(_scored(spark, rows), **kw).collect()
    return {r.bin: (r.n, r.n_pos, r.mean_score_bp, r.acc_bp, r.gap_bp)
            for r in out}


def test_perfectly_calibrated_scores_read_zero_ece(spark):
    # bin [2000,3000): score 2500, exactly 1 of 4 positive -> acc 2500
    rows = [(2500, 1), (2500, 0), (2500, 0), (2500, 0)] * 5
    got = _by_bin(spark, rows)
    assert got[2] == (20, 5, 2500, 2500, 0)
    assert got[-1][4] == 0  # ECE


def test_overconfident_high_bin_gap(spark):
    # scorer says 9500 but only half are positive -> gap 4500
    rows = [(9500, 1), (9500, 0)] * 10
    got = _by_bin(spark, rows)
    assert got[9] == (20, 10, 9500, 5000, 4500)
    assert got[-1] == (20, 10, 9500, 5000, 4500)


def test_score_10000_lands_in_top_bin(spark):
    rows = [(10000, 1), (9999, 1), (0, 0)]
    got = _by_bin(spark, rows)
    assert got[9][0] == 2 and got[0][0] == 1


def test_ece_weights_bins_by_population(spark):
    # 90 rows with gap 250, 10 rows with gap 4750 -> weighted ECE
    rows = [(250, 0)] * 90 + [(9750, 0), (9750, 1)] * 5
    got = _by_bin(spark, rows)
    assert got[0][4] == 250        # |0 - 250|
    assert got[9][4] == 4750       # |5000 - 9750|
    assert got[-1][4] == (90 * 250 + 10 * 4750) // 100


def test_nulls_dropped(spark):
    df = spark.createDataFrame(
        [(1000, 1), (None, 1), (2000, None)], "score_bp long, label long"
    )
    out = calibration_bins(df).collect()
    assert {r.bin: r.n for r in out} == {1: 1, -1: 1}


def test_oracle_parity_and_partitioning(spark, tmp_path):
    rows = [
        ((d * 137 + 19) % 10001, 1 if (d * d) % 7 < 3 else 0)
        for d in range(400)
    ]
    path = str(tmp_path / "scored.parquet")
    _scored(spark, rows).write.parquet(path)
    df = spark.read.parquet(path)
    a = (
        calibration_bins(df.coalesce(1)).toPandas()
        .sort_values("bin").reset_index(drop=True)
    )
    b = (
        calibration_bins(df.repartition(13)).toPandas()
        .sort_values("bin").reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(a, b)
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW cb_sc AS SELECT * FROM parquet_scan('{path}/*.parquet')"
    )
    want = (
        con.execute(calibration_bins_oracle_sql("cb_sc")).df()
        .sort_values("bin").reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(a, want.astype("int64"))
