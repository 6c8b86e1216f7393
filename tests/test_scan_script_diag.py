"""Scan-balance profiler and Unicode script profile
(operators/scanbalance.py, operators/unicodescript.py)."""

import duckdb
import pandas as pd

from deepseek_ocr_rs_spark.operators.scanbalance import scan_balance
from deepseek_ocr_rs_spark.operators.unicodescript import (
    script_profile,
    script_profile_oracle_sql,
)


class TestScanBalance:
    def test_verdicts_fire_on_real_files(self, spark, tmp_path):
        # 12 single-file tables: ten mid files, one 3-row runt, one
        # 2000-row whale (heavy needs > 10x the mean, so it is only
        # reachable past ~11 files — by design: with few files no
        # file can dominate that hard)
        sizes = [100] * 10 + [3, 6000]
        scans = []
        for i, n in enumerate(sizes):
            p = str(tmp_path / f"t{i}.parquet")
            spark.range(n).coalesce(1).write.parquet(p)
            scans.append(spark.read.parquet(p))
        out = scan_balance(scans).toPandas()
        got = dict(zip(out.n_rows, out.verdict))
        tot = sum(sizes)  # 7003
        assert got[3] == "tiny"        # 3*12*10 = 360    < 7003
        assert got[6000] == "heavy"    # 6000*12 = 72000  > 70030
        assert got[100] == "ok"        # 100*12*10 = 12000 >= 7003
        assert out.n_rows.sum() == tot
        assert out.rows_bp.sum() <= 10000

    def test_single_file_reads_ok(self, spark, tmp_path):
        p = str(tmp_path / "one.parquet")
        spark.range(50).coalesce(1).write.parquet(p)
        out = scan_balance([spark.read.parquet(p)]).collect()
        assert len(out) == 1 and out[0].verdict == "ok"
        assert out[0].rows_bp == 10000


class TestScriptProfile:
    def test_counts_and_majority(self, spark):
        rows = [
            (1, "hello мир мир"),          # 5 latin, 6 cyrillic
            (2, "你好 test testing"),       # cjk 2, latin 11 -> latin
            (3, ""),
        ]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        got = {r.doc_id: r for r in script_profile(df).collect()}
        assert (got[1].n_latin, got[1].n_cyrillic) == (5, 6)
        assert got[1].major_script == "cyrillic"
        assert got[1].major_bp == 5454
        assert got[2].major_script == "latin"
        assert got[3].major_script == "none" and got[3].major_bp is None

    def test_priority_tie_break(self, spark):
        # equal latin and cyrillic mass: latin wins by fixed priority
        df = spark.createDataFrame(
            [(1, "abc где")], "doc_id long, text string"
        )
        r = script_profile(df).collect()[0]
        assert r.n_latin == r.n_cyrillic == 3
        assert r.major_script == "latin"

    def test_other_letters_floor(self, spark):
        # Turkish dotless/extended letters: \p{L} but in no named range
        df = spark.createDataFrame(
            [(1, "şğü abc")], "doc_id long, text string"
        )
        r = script_profile(df).collect()[0]
        assert r.n_other_letters == 3 and r.n_latin == 3

    def test_oracle_parity_and_partitioning(self, spark, tmp_path):
        rows = [
            (d, ["pure ascii text", "смешанный mixed текст",
                 "日本語のテスト deep", "نص عربي قصير",
                 "ελληνικα και λατινικα abc"][d % 5] + f" tail{d}")
            for d in range(100)
        ]
        path = str(tmp_path / "docs.parquet")
        spark.createDataFrame(
            rows, "doc_id long, text string"
        ).write.parquet(path)
        df = spark.read.parquet(path)
        a = (
            script_profile(df.coalesce(1)).toPandas()
            .sort_values("doc_id").reset_index(drop=True)
        )
        b = (
            script_profile(df.repartition(13)).toPandas()
            .sort_values("doc_id").reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(a, b)
        con = duckdb.connect()
        con.execute(
            f"CREATE VIEW usp_docs AS SELECT * FROM parquet_scan('{path}/*.parquet')"
        )
        want = (
            con.execute(script_profile_oracle_sql("usp_docs")).df()
            .sort_values("doc_id").reset_index(drop=True)
        )
        num = [c for c in a.columns if c.startswith("n_")] + [
            "doc_id", "major_bp"
        ]
        pd.testing.assert_frame_equal(
            a.astype({c: "int64" for c in num}),
            want.astype({c: "int64" for c in num}),
        )
