"""Content-defined chunking (operators/cdc.py)."""

import duckdb
import pandas as pd

from deepseek_ocr_rs_spark.operators.cdc import (
    cdc_chunks,
    cdc_chunks_oracle_sql,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_chunks_tile_the_document_exactly(spark):
    text = "The quick brown fox jumps over the lazy dog. " * 30
    out = (
        cdc_chunks(_docs(spark, [(1, text)]))
        .toPandas().sort_values("chunk_idx").reset_index(drop=True)
    )
    # coverage: consecutive, non-overlapping, sum of lengths == len
    assert out.loc[0, "start"] == 1
    for i in range(1, len(out)):
        assert out.loc[i, "start"] == (
            out.loc[i - 1, "start"] + out.loc[i - 1, "length"]
        )
    assert out["length"].sum() == len(text)
    assert len(out) > 1  # the boundary rule actually fires


def test_shift_resilience_is_the_point(spark):
    # an insertion at the front must only change the first chunk(s):
    # every later boundary re-aligns because it is local content.
    # APERIODIC base text — a periodic one would let even fixed-size
    # blocks coincide by coincidence of the period
    base = " ".join(
        f"sentence {i} has unique words alpha{i * 7} beta{i * 13}."
        for i in range(50)
    )
    rows = [(1, base), (2, "INSERTED EDIT " + base)]
    ch = cdc_chunks(_docs(spark, rows)).toPandas()
    s1 = set(ch[ch.doc_id == 1].chunk_md5)
    s2 = set(ch[ch.doc_id == 2].chunk_md5)
    assert len(s1) >= 3
    assert len(s1 & s2) >= len(s1) - 2
    # fixed-size chunking at the same granularity shares nothing:
    # every 64-char block of doc 2 is shifted by 14 chars
    blocks1 = {base[i:i + 64] for i in range(0, len(base), 64)}
    blocks2 = {("INSERTED EDIT " + base)[i:i + 64]
               for i in range(0, len(base) + 14, 64)}
    assert len(blocks1 & blocks2) == 0


def test_short_and_empty_docs(spark):
    rows = [(1, ""), (2, "tiny"), (3, "x" * 7)]
    out = cdc_chunks(_docs(spark, rows), w=8).toPandas()
    assert 1 not in set(out.doc_id)           # empty -> no chunks
    got = {r.doc_id: (r.start, r.length) for r in out.itertuples()}
    assert got[2] == (1, 4) and got[3] == (1, 7)  # sub-window: 1 chunk


def test_boundary_at_last_char_drops_empty_tail(spark):
    # construct a doc whose final position is a boundary by brute
    # force: scan a repeating alphabet for a prefix ending on one
    from deepseek_ocr_rs_spark.operators.cdc import _B, _M
    # aperiodic deterministic text (a periodic one can miss the
    # residue for every position in its cycle)
    alpha = "".join(chr(97 + (i * 7 + i * i % 11) % 26) for i in range(900))

    def roll(s, e, w=8):
        acc = 0
        for p in range(e - w, e):
            acc = (acc * _B + ord(s[p])) % _M
        return acc

    end = next(
        e for e in range(8, len(alpha)) if roll(alpha, e) % 64 == 63
    )
    text = alpha[:end]
    out = cdc_chunks(_docs(spark, [(1, text)])).toPandas()
    assert out["length"].sum() == len(text)
    assert (out["length"] > 0).all()


def test_oracle_parity_and_partitioning(spark, tmp_path):
    rows = [
        (d, f"doc {d} " + "lorem ipsum dolor sit amet " * (d % 9 + 4))
        for d in range(80)
    ] + [(80, ""), (81, "abc")]
    path = str(tmp_path / "docs.parquet")
    _docs(spark, rows).write.parquet(path)
    df = spark.read.parquet(path)
    cols = ["doc_id", "chunk_idx"]
    a = (
        cdc_chunks(df.coalesce(1)).toPandas()
        .sort_values(cols).reset_index(drop=True)
    )
    b = (
        cdc_chunks(df.repartition(13)).toPandas()
        .sort_values(cols).reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(a, b)
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW cdc_docs AS SELECT * FROM parquet_scan('{path}/*.parquet')"
    )
    want = (
        con.execute(cdc_chunks_oracle_sql("cdc_docs")).df()
        .sort_values(cols).reset_index(drop=True)
    )
    num = ["doc_id", "chunk_idx", "start", "length"]
    pd.testing.assert_frame_equal(
        a.astype({c: "int64" for c in num}),
        want.astype({c: "int64" for c in num}),
    )
