"""Trained hashed n-gram classifier: learns separable vocab, oracle
parity, partition invariance, edge cases."""

import duckdb
import pandas as pd
import pytest

from deepseek_ocr_rs_spark.operators.hashclf import (
    hashclf_oracle_sql,
    hashed_ngram_predict,
    train_hashed_ngram_weights,
)


@pytest.fixture(scope="module")
def separable(spark):
    # two classes with disjoint vocabularies + shared stopwords: a
    # classifier that learns anything must get these right
    rows = []
    for i in range(60):
        rows.append((i, f"the apple banana cherry fruit sweet {i % 7}",
                     "fruit"))
        rows.append((100 + i, f"the bolt nut wrench steel torque {i % 7}",
                     "tool"))
    return spark.createDataFrame(rows, "doc_id bigint, text string,"
                                       " label string")


def test_learns_separable_classes(separable):
    tr = separable.where("doc_id % 2 = 0")
    pr = separable.where("doc_id % 2 = 1")
    w = train_hashed_ngram_weights(tr, "text", "label", n_buckets=1024)
    pred = hashed_ngram_predict(pr, "doc_id", "text", w, n_buckets=1024)
    truth = {r["doc_id"]: r["label"] for r in pr.collect()}
    got = {r["doc_id"]: r["pred_label"] for r in pred.collect()}
    assert len(got) == len(truth)
    acc = sum(got[d] == truth[d] for d in truth) / len(truth)
    assert acc == 1.0


def test_oracle_parity_and_partition_invariance(separable):
    con = duckdb.connect()
    con.register(
        "t",
        pd.DataFrame(
            [(r["doc_id"], r["text"], r["label"])
             for r in separable.collect()],
            columns=["doc_id", "text", "label"],
        ),
    )
    duck = sorted(con.sql(hashclf_oracle_sql(
        "SELECT * FROM t WHERE doc_id % 2 = 0",
        "SELECT * FROM t WHERE doc_id % 2 = 1",
        "doc_id", "text", "label", n_buckets=1024,
    )).fetchall())
    for n_parts in (1, 5):
        df = separable.repartition(n_parts)
        w = train_hashed_ngram_weights(
            df.where("doc_id % 2 = 0"), "text", "label", n_buckets=1024
        )
        got = sorted(
            tuple(r) for r in hashed_ngram_predict(
                df.where("doc_id % 2 = 1"), "doc_id", "text", w,
                n_buckets=1024,
            ).collect()
        )
        assert got == duck


def test_edge_cases(spark):
    w = train_hashed_ngram_weights(
        spark.createDataFrame([(1, "alpha beta", "x")],
                              "doc_id bigint, text string, label string"),
        "text", "label", n_buckets=64,
    )
    # single-word doc (no bigrams), unseen-vocab doc (absent from
    # output), NULL text (dropped), empty text (no features)
    pr = spark.createDataFrame(
        [(10, "alpha"), (11, "zzz qqq"), (12, None), (13, "")],
        "doc_id bigint, text string",
    )
    got = {r["doc_id"]: r["pred_label"] for r in
           hashed_ngram_predict(pr, "doc_id", "text", w,
                                n_buckets=64).collect()}
    assert got == {10: "x"}


def test_collisions_shared_deterministically(spark):
    # tiny bucket table forces collisions; predictions must still be
    # identical across runs and match the oracle
    rows = [(i, f"w{i} w{i + 1} w{i + 2}", f"c{i % 3}")
            for i in range(30)]
    df = spark.createDataFrame(rows, "doc_id bigint, text string,"
                                     " label string")
    w = train_hashed_ngram_weights(df, "text", "label", n_buckets=8)
    a = sorted(tuple(r) for r in
               hashed_ngram_predict(df, "doc_id", "text", w,
                                    n_buckets=8).collect())
    b = sorted(tuple(r) for r in
               hashed_ngram_predict(df, "doc_id", "text", w,
                                    n_buckets=8).collect())
    assert a == b
    con = duckdb.connect()
    con.register("t", pd.DataFrame(rows,
                                   columns=["doc_id", "text", "label"]))
    duck = sorted(con.sql(hashclf_oracle_sql(
        "SELECT * FROM t", "SELECT * FROM t",
        "doc_id", "text", "label", n_buckets=8,
    )).fetchall())
    assert a == duck


class TestReadability:
    def _run(self, spark, texts):
        from deepseek_ocr_rs_spark.operators.textstats import (
            with_readability,
        )

        df = spark.createDataFrame(
            [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
        )
        return {
            r.doc_id: (
                r.n_sentences, r.n_words, r.n_syllables, r.flesch_milli
            )
            for r in with_readability(df).collect()
        }

    def test_hand_computed_counts_and_score(self, spark):
        out = self._run(
            spark,
            [
                # 2 sentences ('.' and '!?' runs), 4 words, syllable
                # groups: the(1) cat(1) sat(1) down(1) = 4
                "the cat. sat down!?",
                "",             # empty: 0 words -> NULL score, 1 sentence
                "xyz 123",      # no vowels: syllables 0
            ],
        )
        s, w, y = 2, 4, 4
        want = 206835 - (1015 * w) // s - (84600 * y) // w
        assert out[0] == (2, 4, 4, want)
        assert out[1] == (1, 0, 0, None)
        assert out[2] == (1, 2, 1, 206835 - 1015 * 2 - (84600 * 1) // 2)

    def test_vowel_groups_not_letters(self, spark):
        # 'queue' = one vowel GROUP (ueue after q... 'ueue') -> 1;
        # 'aeiou' -> 1; 'rhythm' has y -> 1
        out = self._run(spark, ["queue aeiou rhythm"])
        assert out[0][2] == 3

    def test_oracle_parity(self, spark):
        import duckdb

        from deepseek_ocr_rs_spark.operators.textstats import (
            readability_oracle_exprs,
            with_readability,
        )

        texts = [
            "the cat. sat down!?",
            "",
            "xyz 123",
            "a. b. c. d. e!!! mixed CASE Words here? yes.",
            "   leading and trailing   ",
        ]
        df = spark.createDataFrame(
            [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
        )
        got = sorted(
            tuple(r)
            for r in with_readability(df).select(
                "doc_id", "n_sentences", "n_words", "n_syllables",
                "flesch_milli",
            ).collect()
        )
        con = duckdb.connect()
        con.execute("CREATE TABLE t_rd (doc_id BIGINT, text VARCHAR)")
        con.executemany(
            "INSERT INTO t_rd VALUES (?, ?)", list(enumerate(texts))
        )
        ex = readability_oracle_exprs("text")
        want = sorted(
            tuple(r)
            for r in con.sql(
                f"SELECT doc_id, {ex['n_sentences']}, {ex['n_words']},"
                f" {ex['n_syllables']}, {ex['flesch_milli']} FROM t_rd"
            ).fetchall()
        )
        assert got == want


class TestLexicalDiversity:
    def _run(self, spark, texts):
        from deepseek_ocr_rs_spark.operators.textstats import (
            with_lexical_diversity,
        )

        df = spark.createDataFrame(
            [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
        )
        return {
            r.doc_id: (r.n_tokens, r.n_types, r.n_hapax, r.ttr_bp, r.hapax_bp)
            for r in with_lexical_diversity(df).collect()
        }

    def test_hand_computed(self, spark):
        out = self._run(
            spark,
            [
                "the cat the dog the bird",  # 6 tokens, 4 types, 3 hapax
                "a a a a",                   # 4 tokens, 1 type, 0 hapax
                "all distinct words here",   # 4/4/4
                "",                          # zeros
                "   ",                       # whitespace-only: zeros
                "solo",                      # 1/1/1
            ],
        )
        assert out[0] == (6, 4, 3, 10000 * 4 // 6, 10000 * 3 // 6)
        assert out[1] == (4, 1, 0, 2500, 0)
        assert out[2] == (4, 4, 4, 10000, 10000)
        assert out[3] == (0, 0, 0, 0, 0)
        assert out[4] == (0, 0, 0, 0, 0)
        assert out[5] == (1, 1, 1, 10000, 10000)

    def test_case_folded_types(self, spark):
        # The/THE/the are one type; hapax counts respect folding
        out = self._run(spark, ["The THE the Cat"])
        assert out[0] == (4, 2, 1, 5000, 2500)

    def test_null_text_propagates(self, spark):
        from deepseek_ocr_rs_spark.operators.textstats import (
            with_lexical_diversity,
        )

        df = spark.createDataFrame([(0, None)], "doc_id long, text string")
        r = with_lexical_diversity(df).collect()[0]
        assert r.n_tokens is None and r.ttr_bp is None

    def test_oracle_parity_including_adjacent_sort_runs(self, spark):
        import duckdb

        from deepseek_ocr_rs_spark.operators.textstats import (
            lexical_diversity_oracle_sql,
            with_lexical_diversity,
        )

        texts = [
            "b a b a c",          # interleaved duplicates regroup on sort
            "z z z y y x",        # runs of 3, 2, 1
            "",
            "  spaced   out  ",
            None,
            "Unicode naive facade naive",
            ("tok%d " * 50) % tuple(range(50)) + "tok0 tok1",  # long tail
        ]
        df = spark.createDataFrame(
            [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
        )
        got = sorted(
            tuple(r)
            for r in with_lexical_diversity(df)
            .select("doc_id", "n_tokens", "n_types", "n_hapax",
                    "ttr_bp", "hapax_bp")
            .collect()
        )
        con = duckdb.connect()
        con.execute("CREATE TABLE ld (doc_id BIGINT, text VARCHAR)")
        con.executemany("INSERT INTO ld VALUES (?, ?)", list(enumerate(texts)))
        want = sorted(
            tuple(r)
            for r in con.sql(
                lexical_diversity_oracle_sql("SELECT doc_id, text FROM ld")
            ).fetchall()
        )
        assert got == want


def test_classify_language_batch_reduceat_matches_reference():
    """The reduceat-based script counting must equal the original
    astype+cumsum prefix-sum shape on empty docs, separators, boundary
    codepoints and mixed scripts."""
    import random

    import numpy as np

    from deepseek_ocr_rs_spark.operators import textstats as T

    def ref(texts):
        n_docs = len(texts)
        prefixes = [(t or "")[:400] for t in texts]
        joined = "\x00".join(prefixes)
        langs = [""] * n_docs
        if joined:
            cps = np.frombuffer(joined.encode("utf-32-le"), dtype=np.uint32)
            lens = np.fromiter((len(p) for p in prefixes), dtype=np.int64,
                               count=n_docs)
            bounds = np.concatenate(([0], np.cumsum(lens + 1)[:-1]))

            def seg_count(lo, hi):
                mask = ((cps >= lo) & (cps <= hi)).astype(np.int64)
                cs = np.concatenate(([0], np.cumsum(mask)))
                return cs[bounds + lens] - cs[bounds]

            cjk = seg_count(*T._CJK)
            kana = seg_count(*T._KANA)
            hangul = seg_count(*T._HANGUL)
            cyr = seg_count(*T._CYRILLIC)
            for i in range(n_docs):
                L = lens[i]
                if L == 0:
                    langs[i] = "und"
                elif cjk[i] > L * 0.2:
                    langs[i] = "zh"
                elif kana[i] > 0:
                    langs[i] = "ja"
                elif hangul[i] > 0:
                    langs[i] = "ko"
                elif cyr[i] > L * 0.2:
                    langs[i] = "ru"
        else:
            langs = ["und"] * n_docs
        for i in range(n_docs):
            if langs[i]:
                continue
            padded = " " + (texts[i] or "")[:4000].lower() + " "
            best, best_n = "und", 0
            for lang in sorted(T._LANG_MARKERS):
                n = sum(padded.count(m) for m in T._LANG_MARKERS[lang])
                if n > best_n:
                    best, best_n = lang, n
            langs[i] = best
        return langs

    random.seed(3)
    cases = ["", None, "a", "中" * 5, "これは", "한국", "русский " * 30,
             "the and of is", "der und die ist", "mixed 中文 the and",
             "\x00odd", "x" * 399 + "中", chr(0x4E00), chr(0x9FFF),
             chr(0x4DFF), chr(0xA000)]
    cases += ["".join(random.choice("abc 中こ한р")
                      for _ in range(random.randint(0, 500)))
              for _ in range(500)]
    assert T.classify_language_batch(cases) == ref(cases)
    assert T.classify_language_batch([]) == []
