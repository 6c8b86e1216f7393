"""Inverted index + BM25 retrieval (operators/search.py).

Hand-scored micro-corpus checks, determinism/partitioning invariance,
and the DuckDB-oracle parity the gate drives at sf0.001.
"""

import duckdb
import pandas as pd
import pytest

from deepseek_ocr_rs_spark.operators.search import (
    bm25_topk,
    bm25_topk_oracle_sql,
    posting_lists,
    posting_lists_oracle_sql,
)

CORPUS = [
    (1, "cat cat dog"),
    (2, "dog bird"),
    (3, "cat bird bird bird"),
    (4, "fish"),
    (5, ""),
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(
        pd.DataFrame(CORPUS, columns=["doc_id", "text"])
    )


def _ids(postings: str) -> list:
    """Decode the '-'-joined posting string back to the id list."""
    return [int(x) for x in postings.split("-")] if postings else []


class TestPostingLists:
    def test_hand_built_index(self, docs):
        got = {
            r.term: (r.df, _ids(r.postings))
            for r in posting_lists(docs, min_df=1).collect()
        }
        assert got == {
            "cat": (2, [1, 3]),
            "dog": (2, [1, 2]),
            "bird": (2, [2, 3]),
            "fish": (1, [4]),
        }

    def test_postings_numeric_order(self, spark):
        # ids 2 and 10 share a term: numeric sort gives 2-10, a
        # lexicographic (string) sort would give 10-2
        docs = spark.createDataFrame(
            pd.DataFrame(
                [(2, "shared"), (10, "shared")], columns=["doc_id", "text"]
            )
        )
        row = posting_lists(docs, min_df=2).collect()[0]
        assert row.postings == "2-10"

    def test_min_df_drops_hapax(self, docs):
        got = {r.term for r in posting_lists(docs, min_df=2).collect()}
        assert got == {"cat", "dog", "bird"}

    def test_postings_sorted_and_partition_invariant(self, spark, docs):
        a = sorted(
            (r.term, r.df, r.postings)
            for r in posting_lists(docs).collect()
        )
        b = sorted(
            (r.term, r.df, r.postings)
            for r in posting_lists(docs.repartition(7)).collect()
        )
        assert a == b
        for _, _, p in a:
            assert _ids(p) == sorted(_ids(p))

    def test_oracle_parity(self, spark, docs):
        con = duckdb.connect()
        con.register("documents", pd.DataFrame(CORPUS, columns=["doc_id", "text"]))
        d = sorted(
            con.sql(
                posting_lists_oracle_sql("documents", min_df=1)
            ).fetchall()
        )
        s = sorted(
            (r.term, r.df, r.postings)
            for r in posting_lists(docs, min_df=1).collect()
        )
        assert s == d


class TestBm25:
    def test_hand_scored(self, docs):
        # N=5, toks: d1=3 d2=2 d3=4 d4=1 (d5 empty), avgdl=10/5=2.0
        # query 'cat': df=2, idf=(5-2+0.5)/(2+0.5)=1.4
        # d1: tf=2, dl=3 -> tf_part=2*2.2/(2+1.2*(0.25+0.75*1.5))=4.4/3.65
        # d3: tf=1, dl=4 -> 2.2/(1+1.2*(0.25+0.75*2.0))=2.2/3.1
        rows = bm25_topk(docs, ["cat"], k=10).collect()
        got = {r.doc_id: (r.n_hit_terms, r.bm25) for r in rows}
        exp1 = round(1.4 * (4.4 / (2 + 1.2 * (0.25 + 0.75 * (3 / 2.0)))), 6)
        exp3 = round(1.4 * (2.2 / (1 + 1.2 * (0.25 + 0.75 * (4 / 2.0)))), 6)
        assert got == {1: (1, exp1), 3: (1, exp3)}
        assert [r.doc_id for r in rows] == [1, 3]  # ranked desc

    def test_multi_term_sums_and_ranks(self, docs):
        rows = bm25_topk(docs, ["cat", "dog"], k=10).collect()
        assert {r.doc_id for r in rows} == {1, 2, 3}
        d1 = next(r for r in rows if r.doc_id == 1)
        assert d1.n_hit_terms == 2
        # doc1 matches both terms; its score strictly exceeds its
        # single-term 'cat' score
        single = bm25_topk(docs, ["cat"], k=10).collect()
        assert d1.bm25 > next(r.bm25 for r in single if r.doc_id == 1)

    def test_query_dedup_and_case(self, docs):
        a = [tuple(r) for r in bm25_topk(docs, ["CAT", "cat", "Cat"], k=5).collect()]
        b = [tuple(r) for r in bm25_topk(docs, ["cat"], k=5).collect()]
        assert a == b

    def test_no_match_returns_empty(self, docs):
        assert bm25_topk(docs, ["zebra"], k=5).count() == 0

    def test_empty_query_raises(self, docs):
        with pytest.raises(ValueError):
            bm25_topk(docs, [], k=5)

    def test_oracle_parity(self, spark, docs):
        con = duckdb.connect()
        con.register("documents", pd.DataFrame(CORPUS, columns=["doc_id", "text"]))
        q = ["cat", "dog", "bird", "fish"]
        s = [tuple(r) for r in bm25_topk(docs, q, k=10).collect()]
        d = [tuple(x) for x in con.sql(
            bm25_topk_oracle_sql("documents", q, k=10)).fetchall()]
        assert s == d

    def test_partitioning_invariance(self, spark, docs):
        a = [tuple(r) for r in bm25_topk(docs, ["cat", "bird"], k=10).collect()]
        b = [tuple(r) for r in bm25_topk(docs.repartition(5), ["cat", "bird"], k=10).collect()]
        assert a == b


class TestPhraseMatch:
    def _pm(self, spark, rows, phrase):
        from deepseek_ocr_rs_spark.operators.search import phrase_match

        df = spark.createDataFrame(
            pd.DataFrame(rows, columns=["doc_id", "text"])
        )
        return {
            r.doc_id: (r.n_matches, r.first_pos)
            for r in phrase_match(df, phrase).collect()
        }

    def test_hand_checked_matches(self, spark):
        rows = [
            (1, "the cat sat on the cat mat"),   # "the cat" at 0 and 4
            (2, "cat the"),                       # reversed: no match
            (3, "THE   Cat"),                     # case + multi-space: pos 0
            (4, "the dog"),                       # partial: no match
            (5, "the cat the cat the cat"),       # 3 matches
        ]
        out = self._pm(spark, rows, "the cat")
        assert out == {1: (2, 0), 3: (1, 0), 5: (3, 0)}

    def test_repeated_phrase_words(self, spark):
        # phrase "a a a": doc "a a a a" has two anchors (0 and 1)
        out = self._pm(spark, [(1, "a a a a"), (2, "a b a a")], "a a a")
        assert out == {1: (2, 0)}

    def test_single_word_phrase_counts_occurrences(self, spark):
        out = self._pm(spark, [(1, "x y x"), (2, "y")], "x")
        assert out == {1: (2, 0)}

    def test_oracle_parity_on_gate_corpus(self, spark):
        from deepseek_ocr_rs_spark.operators.search import (
            phrase_match,
            phrase_match_oracle_sql,
        )

        sf = "/root/testdata/sf0.001"
        got = sorted(
            tuple(r)
            for r in phrase_match(
                spark.read.parquet(f"{sf}/documents.parquet"), "table hash"
            ).collect()
        )
        con = duckdb.connect()
        con.execute(
            "CREATE VIEW documents AS SELECT * FROM"
            f" '{sf}/documents.parquet'"
        )
        want = sorted(
            tuple(r)
            for r in con.sql(
                phrase_match_oracle_sql("documents", "table hash")
            ).fetchall()
        )
        assert got == want and len(got) > 0

    def test_rejects_empty_phrase(self, spark):
        from deepseek_ocr_rs_spark.operators.search import (
            phrase_match,
            phrase_match_oracle_sql,
        )

        df = spark.createDataFrame(
            pd.DataFrame([(1, "x")], columns=["doc_id", "text"])
        )
        with pytest.raises(ValueError):
            phrase_match(df, "   ")
        with pytest.raises(ValueError):
            phrase_match_oracle_sql("documents", "")


class TestPostingsCompression:
    def test_hand_sized_gaps(self, spark):
        # term 'x' in docs 1, 2, 130: gaps 1, 1, 128 -> varbyte 1+1+2
        docs = spark.createDataFrame(
            pd.DataFrame(
                [(1, "x"), (2, "x"), (130, "x")], columns=["doc_id", "text"]
            )
        )
        from deepseek_ocr_rs_spark.operators.search import (
            postings_compression,
        )

        row = postings_compression(docs, min_df=2).collect()[0]
        assert (row.term, row.df, row.raw_bytes, row.varbyte_bytes,
                row.max_gap) == ("x", 3, 24, 4, 128)

    def test_varbyte_thresholds_exact(self, spark):
        # successive ids chosen so each gap lands exactly on a varbyte
        # boundary (last value below / first value at each byte width)
        gaps = [127, 128, 16383, 16384, 2097151, 2097152,
                268435455, 268435456, 34359738367, 34359738368]
        sizes = [1, 2, 2, 3, 3, 4, 4, 5, 5, 6]
        ids, acc = [], 0
        for g in gaps:
            acc += g
            ids.append(acc)
        docs = spark.createDataFrame(
            pd.DataFrame([(i, "t") for i in ids],
                         columns=["doc_id", "text"])
        )
        from deepseek_ocr_rs_spark.operators.search import (
            postings_compression,
        )

        row = postings_compression(docs, min_df=2).collect()[0]
        assert row.varbyte_bytes == sum(sizes)
        assert row.max_gap == max(gaps)
        assert row.raw_bytes == 8 * len(gaps)

    def test_min_df_and_tokenization_shared_with_index(self, docs):
        from deepseek_ocr_rs_spark.operators.search import (
            posting_lists,
            postings_compression,
        )

        terms_pc = {r.term for r in
                    postings_compression(docs, min_df=2).collect()}
        terms_pl = {r.term for r in posting_lists(docs, min_df=2).collect()}
        assert terms_pc == terms_pl == {"cat", "dog", "bird"}

    def test_oracle_parity_and_invariance(self, spark, docs):
        from deepseek_ocr_rs_spark.operators.search import (
            postings_compression,
            postings_compression_oracle_sql,
        )

        con = duckdb.connect()
        con.register(
            "documents", pd.DataFrame(CORPUS, columns=["doc_id", "text"])
        )
        want = sorted(
            tuple(x)
            for x in con.sql(
                postings_compression_oracle_sql("documents", min_df=1)
            ).fetchall()
        )
        got = sorted(
            tuple(r)
            for r in postings_compression(docs, min_df=1).collect()
        )
        got7 = sorted(
            tuple(r)
            for r in postings_compression(
                docs.repartition(7), min_df=1
            ).collect()
        )
        assert got == want
        assert got7 == got
