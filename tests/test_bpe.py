"""BPE vocabulary training: parity against a pure-Python reference
implementation (Sennrich's algorithm), exact DuckDB oracle parity for the
pair-count statistics, and partitioning invariance."""

import duckdb
import pytest
from pyspark.sql import functions as F

from deepseek_ocr_rs_spark.operators.bpe import (
    bpe_encode,
    bpe_pair_counts,
    bpe_pair_counts_oracle_sql,
    bpe_train,
    word_counts,
)


# ---------------------------------------------------------------- reference
def _ref_word_counts(texts):
    wc = {}
    for t in texts:
        for w in t.lower().split():
            wc[w] = wc.get(w, 0) + 1
    return wc


def _ref_apply(syms, left, right):
    out, i = [], 0
    while i < len(syms):
        if i + 1 < len(syms) and syms[i] == left and syms[i + 1] == right:
            out.append(left + right)
            i += 2
        else:
            out.append(syms[i])
            i += 1
    return out


def _ref_bpe(texts, n_merges, min_count=2):
    wc = _ref_word_counts(texts)
    vocab = {w: list(w) for w in wc}
    merges = []
    for step in range(n_merges):
        pc = {}
        for w, c in wc.items():
            s = vocab[w]
            for a, b in zip(s, s[1:]):
                pc[(a, b)] = pc.get((a, b), 0) + c
        if not pc:
            break
        (left, right), cnt = sorted(
            pc.items(), key=lambda kv: (-kv[1], kv[0])
        )[0]
        if cnt < min_count:
            break
        merges.append((step, left, right, cnt))
        vocab = {w: _ref_apply(s, left, right) for w, s in vocab.items()}
    return merges, {w: (wc[w], vocab[w]) for w in wc}


CORPORA = [
    # classic BPE textbook shape: shared prefixes/suffixes
    ["low lower lowest", "new newer newest", "low low new"],
    # repeated single char (greedy left-to-right fusion: aaaa -> aa aa)
    ["aaaa aaa aa a", "aaaa aaaa"],
    # unicode characters and mixed case collapse
    ["Héllo héllo HÉLLO wörld", "wörld wörld héllo"],
    # tie-heavy: every pair occurs the same number of times
    ["ab cd ef", "ab cd ef", "gh ij kl", "gh ij kl"],
    # single-char words only (no pairs at all -> zero merges)
    ["a b c", "a b c d"],
]


@pytest.mark.parametrize("texts", CORPORA)
def test_train_matches_reference(spark, texts):
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)],
                               "doc_id long, text string")
    merges_df, vocab_df = bpe_train(df, n_merges=6, min_count=2)
    got_merges = [(r["step"], r["left_sym"], r["right_sym"], r["pair_cnt"])
                  for r in merges_df.orderBy("step").collect()]
    got_vocab = {r["word"]: (r["cnt"], list(r["tokens"]))
                 for r in vocab_df.collect()}
    ref_merges, ref_vocab = _ref_bpe(texts, 6, min_count=2)
    assert got_merges == ref_merges
    assert got_vocab == ref_vocab


def test_train_partitioning_invariant(spark):
    texts = ["low lower lowest newest", "new newer lowest low low"] * 4
    df1 = spark.createDataFrame([(i, t) for i, t in enumerate(texts)],
                                "doc_id long, text string").repartition(1)
    df7 = spark.createDataFrame([(i, t) for i, t in enumerate(texts)],
                                "doc_id long, text string").repartition(7)
    m1, _ = bpe_train(df1, n_merges=5)
    m7, _ = bpe_train(df7, n_merges=5)
    assert m1.orderBy("step").collect() == m7.orderBy("step").collect()


def test_pair_counts_oracle_parity(spark, tmp_path):
    texts = ["the quick brown fox the the", "thé thé quick s",
             "aaaa ab ba aaaa", "mixed MIXED MiXeD case"]
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)],
                               "doc_id long, text string")
    p = str(tmp_path / "bpe.parquet")
    df.write.mode("overwrite").parquet(p)
    con = duckdb.connect()
    con.execute(f"CREATE VIEW bdocs AS SELECT * FROM '{p}/*.parquet'")
    oracle = [tuple(r) for r in con.sql(
        bpe_pair_counts_oracle_sql("bdocs", top_k=15)).fetchall()]
    got = [(r["left_sym"], r["right_sym"], r["pair_cnt"])
           for r in bpe_pair_counts(df, top_k=15).collect()]
    assert got == oracle


def test_word_counts_ignores_blank_tokens(spark):
    df = spark.createDataFrame([(0, "  a\t b \n a  "), (1, "")],
                               "doc_id long, text string")
    got = {r["word"]: r["cnt"] for r in word_counts(df).collect()}
    assert got == {"a": 2, "b": 1}


@pytest.mark.parametrize("texts", CORPORA[:3])
def test_encode_matches_reference(spark, texts):
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)],
                               "doc_id long, text string")
    ref_merges, ref_vocab = _ref_bpe(texts, 6, min_count=2)
    merges = [(l, r) for _, l, r, _ in ref_merges]
    got = {r["doc_id"]: (list(r["tokens"]), r["n_tokens"])
           for r in bpe_encode(df, merges).collect()}
    for i, t in enumerate(texts):
        expect = [tok for w in t.lower().split() if w
                  for tok in ref_vocab[w][1]]
        assert got[i] == (expect, len(expect)), f"doc {i}"


def test_encode_rank_order_equals_iterative_apply(spark):
    """The operator applies merges once each in rank order; the classic
    apply_bpe loop instead repeatedly merges the lowest-rank pair
    present.  They are equivalent BECAUSE training only ever creates a
    pair after its constituents exist (any adjacency a merge creates
    can only belong to a higher-rank pair) — pin that equivalence on
    cascading/overlapping words with the gate's pinned merge table."""
    from __spark_entry__ import _BPE_MERGES

    def iterative_apply(word, merges):
        ranks = {pair: i for i, pair in enumerate(merges)}
        syms = list(word)
        while True:
            pairs = [(ranks[p], i) for i, p in enumerate(zip(syms, syms[1:]))
                     if p in ranks]
            if not pairs:
                return syms
            best = min(pairs)[0]
            l, r = merges[best]
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == l and syms[i + 1] == r:
                    out.append(l + r)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            syms = out

    words = ["the", "thethe", "standing", "conditioner", "ththe",
             "ingin", "anand", "connnon", "strestre", "ouountt"]
    df = spark.createDataFrame(
        [(0, " ".join(words))], "doc_id long, text string"
    )
    got = list(bpe_encode(df, _BPE_MERGES).collect()[0]["tokens"])
    want = [t for w in words for t in iterative_apply(w, _BPE_MERGES)]
    assert got == want


def test_encode_oov_word_falls_back_to_chars(spark):
    # merges trained elsewhere; 'zq' never merges -> character sequence
    df = spark.createDataFrame([(0, "zq low")], "doc_id long, text string")
    got = bpe_encode(df, [("l", "o"), ("lo", "w")]).collect()[0]
    assert list(got["tokens"]) == ["z", "q", "low"]


def test_train_early_stops_below_min_count(spark):
    # every pair occurs exactly once -> min_count=2 stops before any merge
    df = spark.createDataFrame([(0, "ab cd ef gh")],
                               "doc_id long, text string")
    merges_df, vocab_df = bpe_train(df, n_merges=5, min_count=2)
    assert merges_df.count() == 0
    toks = {r["word"]: list(r["tokens"]) for r in vocab_df.collect()}
    assert toks == {"ab": ["a", "b"], "cd": ["c", "d"],
                    "ef": ["e", "f"], "gh": ["g", "h"]}
