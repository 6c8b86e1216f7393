"""Mojibake / encoding-damage detection (operators/encoding.py)."""

import duckdb

from deepseek_ocr_rs_spark.operators.encoding import (
    MOJIBAKE_PATTERNS,
    mojibake_oracle_exprs,
    with_mojibake_signals,
)

CAFE = " caf\u00c3\u00a9"          # 'cafe'+accent UTF-8 bytes read as Latin-1
CURLY = " don\u00e2\u20ac\u2122t"  # curly apostrophe read as Windows-1252
NEL = " nel\u0085line"              # raw C1 control U+0085
REPL = " bad\ufffd"                 # replacement char


def _run(spark, texts):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    return {
        r.doc_id: (
            r.n_repl, r.n_a_hat, r.n_a_circ, r.n_c1,
            r.mojibake_bp, r.is_mojibake,
        )
        for r in with_mojibake_signals(df).collect()
    }


def test_each_family_counts_exactly(spark):
    out = _run(spark, [CAFE, CURLY, NEL, REPL, "clean ascii text."])
    assert out[0] == (0, 1, 0, 0, 10000 // len(CAFE), True)
    assert out[1] == (0, 0, 1, 0, 10000 // len(CURLY), True)
    assert out[2] == (0, 0, 0, 1, 10000 // len(NEL), True)
    assert out[3] == (1, 0, 0, 0, 10000 // len(REPL), True)
    assert out[4] == (0, 0, 0, 0, 0, False)


def test_boundary_cases(spark):
    out = _run(
        spark,
        [
            "",                       # empty: bp 0, not flagged
            "\u00c3",                 # trailing lone A-tilde: no second
                                      #   char in range -> not a_hat
            "\u00c3Z",                # followed by ASCII -> not a_hat
            "\u00c3\u00bf",           # range end U+00BF inclusive -> hit
            "\u009f\u0080",           # C1 range endpoints: 2 hits
            CAFE + CURLY + REPL * 3,  # multiple families in one doc
        ],
    )
    assert out[0] == (0, 0, 0, 0, 0, False)
    assert out[1][1] == 0 and not out[1][5]
    assert out[2][1] == 0
    assert out[3][1] == 1
    assert out[4][3] == 2
    assert out[5][0] == 3 and out[5][1] == 1 and out[5][2] == 1


def test_null_text_propagates_null(spark):
    df = spark.createDataFrame([(0, None)], "doc_id long, text string")
    row = with_mojibake_signals(df).collect()[0]
    assert row.n_repl is None and row.is_mojibake is None


def test_oracle_parity_adversarial(spark):
    texts = [
        "", CAFE, CURLY, NEL, REPL, "clean",
        "\u00c3" * 5,                 # run of lone lead chars: no hits
        "\u00e2\u20ac\u00e2\u20ac",  # back-to-back a_circ pairs
        "\u0081" + CAFE + "\u0090",   # C1 chars flanking a_hat
        "mixed " + REPL + NEL + " tail",
    ]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    got = sorted(
        tuple(r)
        for r in with_mojibake_signals(df)
        .select("doc_id", "n_repl", "n_a_hat", "n_a_circ", "n_c1",
                "mojibake_bp", "is_mojibake")
        .collect()
    )
    con = duckdb.connect()
    con.execute("CREATE TABLE mj (doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO mj VALUES (?, ?)", list(enumerate(texts)))
    ex = mojibake_oracle_exprs("text")
    cols = ", ".join(f"{v} AS {k}" for k, v in ex.items())
    want = sorted(
        tuple(r) for r in con.sql(f"SELECT doc_id, {cols} FROM mj").fetchall()
    )
    assert got == want


def test_patterns_are_pure_literals():
    # The cross-engine contract: patterns contain no escape SYNTAX (no
    # backslash) -- only literal codepoints both regex engines read alike.
    for pat in MOJIBAKE_PATTERNS.values():
        assert "\\" not in pat
