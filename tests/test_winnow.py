"""Winnowing fingerprints: parity vs a pure-Python reference (the paper's
algorithm transcribed literally), the coverage guarantee, edge cases, and
partitioning invariance."""

import hashlib

import pytest

from deepseek_ocr_rs_spark.operators.winnow import (
    winnow_fingerprints,
    winnow_matches,
)

K, W = 8, 16
_H_MOD = 1 << 39
_POS_MOD = 1 << 24


def _h(gram: str) -> int:
    return int(hashlib.md5(gram.encode("utf-8")).hexdigest()[:15], 16) % _H_MOD


def ref_winnow(text, k=K, w=W):
    """Literal Schleimer et al. winnowing: per full window of w k-gram
    hashes keep the minimum, rightmost on ties; return the distinct
    (pos, hash) set (1-based char positions)."""
    if text is None:
        return set()
    t = text.lower()
    n = len(t) - k + 1
    if n < 1:
        return set()
    hs = [(i, _h(t[i - 1:i - 1 + k])) for i in range(1, n + 1)
          if i < _POS_MOD]
    out = set()
    for s in range(0, len(hs) - w + 1):
        window = hs[s:s + w]
        mh = min(h for _, h in window)
        pos = max(i for i, h in window if h == mh)
        out.add((pos, mh))
    return out


CORPORA = [
    # template-ish prose with a repeated sentence (guarantee fodder)
    [
        (1, "The quick brown fox jumps over the lazy dog near the river "
            "bank while the rain keeps falling on the quiet town square."),
        (2, "Completely different opening words, yet the rain keeps "
            "falling on the quiet town square exactly as before."),
        (3, "short"),
        (4, None),
        (5, ""),
    ],
    # ties: a periodic string makes many equal k-gram hashes
    [
        (1, "abcabcabcabcabcabcabcabcabcabcabcabcabcabc"),
        (2, "a" * 60),
        (3, "ab" * 40),
    ],
    # unicode: multibyte codepoints shift nothing (both sides count chars)
    [
        (1, "héllo wörld héllo wörld héllo wörld héllo wörld été noël"),
        (2, "😀😀 emoji stream 😀😀 emoji stream 😀😀 emoji stream tail"),
    ],
]


@pytest.mark.parametrize("rows", CORPORA)
def test_fingerprints_match_reference(spark, rows):
    df = spark.createDataFrame(rows, "doc_id int, text string")
    got = {
        (r["doc_id"], r["fp_pos"], r["fp_hash"])
        for r in winnow_fingerprints(df, "doc_id", "text", k=K, w=W).collect()
    }
    want = {
        (i, pos, h) for i, t in rows for (pos, h) in ref_winnow(t)
    }
    assert got == want


def test_guarantee_shared_passage_shares_a_fingerprint(spark):
    # any shared substring of >= w + k - 1 chars must share a fingerprint
    shared = "x" + "the rain keeps falling on the quiet square" + "y"
    assert len(shared) >= W + K - 1
    rows = [
        (1, "AAAA " + shared + " BBBB trailing words here to pad length"),
        (2, "completely other prefix " + shared + " other suffix text"),
    ]
    df = spark.createDataFrame(rows, "doc_id int, text string")
    fps = winnow_fingerprints(df, "doc_id", "text", k=K, w=W).collect()
    h1 = {r["fp_hash"] for r in fps if r["doc_id"] == 1}
    h2 = {r["fp_hash"] for r in fps if r["doc_id"] == 2}
    assert h1 & h2


def test_short_null_and_subthreshold_docs_yield_nothing(spark):
    rows = [
        (1, None),
        (2, ""),
        (3, "tiny"),                      # < k chars: no k-grams
        (4, "x" * (W + K - 2)),           # k-grams exist but < w of them
    ]
    df = spark.createDataFrame(rows, "doc_id int, text string")
    assert winnow_fingerprints(df, "doc_id", "text", k=K, w=W).count() == 0


def test_partitioning_invariance(spark):
    rows = CORPORA[0] + [(10 + i, f"filler doc number {i} " * 5)
                         for i in range(8)]
    df = spark.createDataFrame(rows, "doc_id int, text string")
    a = set(map(tuple, winnow_fingerprints(df, "doc_id", "text").collect()))
    b = set(map(tuple,
                winnow_fingerprints(df.repartition(7, "text"),
                                    "doc_id", "text").collect()))
    assert a == b and a


def test_matches_finds_planted_copy_and_caps_boilerplate(spark):
    passage = "this exact paragraph was copied between two documents"
    boiler = " all rights reserved standard footer text common to all"
    rows = [(i, f"unique body {i} " * 3 + boiler) for i in range(1, 9)]
    rows += [
        (100, "alpha " + passage + " omega" + boiler),
        (200, "gamma " + passage + " delta" + boiler),
    ]
    df = spark.createDataFrame(rows, "doc_id int, text string")
    got = {
        (r["doc_a"], r["doc_b"]): r["n_shared"]
        for r in winnow_matches(df, "doc_id", "text", k=K, w=W,
                                min_shared=2, max_df=64).collect()
    }
    assert (100, 200) in got
    # with the cap at 1, the 10-doc boilerplate fingerprints drop out and
    # only the planted pair (if anything) can survive
    capped = {
        (r["doc_a"], r["doc_b"])
        for r in winnow_matches(df, "doc_id", "text", k=K, w=W,
                                min_shared=2, max_df=2).collect()
    }
    assert capped <= {(100, 200)}


def test_matches_empty_on_disjoint_corpus(spark):
    # per-doc unique repeated token: the digit inside every 8-char window
    # keeps any cross-doc common substring under k chars
    rows = [(i, f"doc{i}word{i} " * 8) for i in range(1, 6)]
    df = spark.createDataFrame(rows, "doc_id int, text string")
    assert winnow_matches(df, "doc_id", "text", min_shared=2).count() == 0


def test_fingerprints_kernel_matches_old_jvm_shape(spark):
    """The Arrow fingerprint kernel (md5 memo + sliding-window min) must
    be row-identical to the original explode+window JVM selection on
    hostile docs: NULL/empty, below-k, no-full-window, uniform, unicode,
    repetitive."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from deepseek_ocr_rs_spark.operators.winnow import (
        _H_MOD,
        _HEX_DIGITS,
        _POS_MOD,
        winnow_fingerprints,
    )

    k, w = 8, 16
    docs = [
        (1, None), (2, ""), (3, "short"), (4, "x" * 7), (5, "x" * 8),
        (6, "x" * 23), (7, "a" * 24), (8, "abcdefgh" * 40),
        (9, "Mixed CASE with UNICODE café née 中文 to fingerprint"),
        (10, "the and of is " * 30), (11, "\n\t ws\n doc \n" * 10),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    new = sorted(map(tuple, winnow_fingerprints(df, k=k, w=w).collect()))
    grams = (
        df.where(F.char_length(F.lower(F.col("text"))) >= k)
        .select(F.col("doc_id"), F.explode(F.expr(
            f"transform(sequence(1, char_length(lower(text)) - {k - 1}),"
            f" i -> struct(i AS pos, pmod(cast(conv(substring(md5("
            f"substring(lower(text), i, {k})), 1, {_HEX_DIGITS}), 16, 10)"
            f" AS bigint), {_H_MOD}L) AS h))")).alias("g"))
        .select("doc_id", "g.pos", "g.h")
        .where(F.col("pos") < _POS_MOD)
    )
    keyc = (F.col("h") * F.lit(_POS_MOD).cast("long")
            + (F.lit(_POS_MOD - 1) - F.col("pos")))
    frame = (Window.partitionBy("doc_id").orderBy("pos")
             .rowsBetween(Window.currentRow, w - 1))
    old = sorted(map(tuple, (
        grams.withColumn("_key", keyc)
        .withColumn("_sel", F.min("_key").over(frame))
        .withColumn("_n", F.max("pos").over(Window.partitionBy("doc_id")))
        .where(F.col("pos") + (w - 1) <= F.col("_n"))
        .select(
            "doc_id",
            (F.lit(_POS_MOD - 1) - F.col("_sel") % _POS_MOD)
            .cast("int").alias("fp_pos"),
            F.expr(f"_sel div {_POS_MOD}L").cast("long").alias("fp_hash"),
        )
        .distinct()
    ).collect()))
    assert new == old and len(new) > 0
    rep = sorted(map(tuple,
                     winnow_fingerprints(df.repartition(5), k=k, w=w)
                     .collect()))
    assert rep == new
