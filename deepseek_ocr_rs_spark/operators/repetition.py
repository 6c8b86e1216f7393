"""Word-n-gram repetition signals and benchmark decontamination.

Two curation operators a 100 TB training-data pipeline runs alongside the
dedup/quality tiers (SURVEY §6; same family as operators/textstats.py):

* ``ngram_repetition_signals`` — the Gopher-style repetition family:
  per document, the mass fraction of the single most frequent word n-gram
  (n=2,3) and the fraction of n-gram occurrences that are duplicates
  (n=5).  Boilerplate and spam have high top-2-gram mass; templated spin
  has high duplicate-5-gram mass.
* ``ngram_decontaminate`` — benchmark contamination scoring: the fraction
  of a document's distinct word n-grams (n=5) that also occur in a
  benchmark/eval set.  Train/test leakage control.

Both are pure JVM expression pipelines (split -> lambda transform ->
explode -> aggregate): no Python, map-side partial aggregation, and the
shuffle key is (doc_id, gram) — high cardinality, naturally balanced.  The
benchmark gram set is broadcast (eval sets are tiny next to a corpus), so
decontamination adds NO extra shuffle beyond the per-doc distinct.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _tokens_expr(text_col: str) -> str:
    return f"filter(split({text_col}, '\\\\s+'), x -> x != '')"


def _ngrams_expr(text_col: str, n: int) -> str:
    """SQL expression: array of space-joined word n-grams (empty if too short)."""
    toks = _tokens_expr(text_col)
    return (
        f"CASE WHEN size({toks}) >= {n} THEN "
        f"transform(sequence(0, size({toks}) - {n}), "
        f"i -> array_join(slice({toks}, i + 1, {n}), ' ')) "
        f"ELSE cast(array() AS array<string>) END"
    )


def ngram_repetition_signals(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    top_ns: Sequence[int] = (2, 3),
    dup_ns: Sequence[int] = (5,),
) -> DataFrame:
    """Per-doc repetition fractions, 6dp.

    ``top{n}_frac`` = occurrences of the most frequent n-gram / total
    n-grams; ``dup{n}_frac`` = occurrences belonging to n-grams seen more
    than once / total.  Documents shorter than n tokens score 0.0.

    r06 kernel note: these are PER-DOCUMENT statistics — the old
    explode -> groupBy(id, n, gram) -> groupBy(id, n) -> join pipeline
    shuffled every gram occurrence as a materialized string (29.1 s at
    sf1.0, dominated by interpreted slice+array_join per gram) for
    counts that never leave the document.  One mapInPandas pass now
    produces the exact integer (top, dup, total) triplets per n with
    ZERO shuffles (guide §2.4/§4.2); the fractions and 6dp rounding stay
    in the JVM, so emitted values are bit-identical (integer inputs,
    same division, same round).  Tokenization matches the JVM
    split('\\s+') via re.ASCII (Java \\s is ASCII-only).
    """
    import re

    import pandas as pd

    all_ns = sorted(set(top_ns) | set(dup_ns))
    id_type = dict(df.dtypes)[id_col]
    ws = re.compile(r"\s+", re.ASCII)

    def stats(batches):
        from collections import Counter

        for pdf in batches:
            rows = []
            for did, text in zip(pdf[id_col], pdf[text_col]):
                toks = [t for t in ws.split(text or "") if t]
                rec = [did]
                for n in all_ns:
                    if len(toks) >= n:
                        c = Counter(
                            tuple(toks[i:i + n])
                            for i in range(len(toks) - n + 1)
                        )
                        total = len(toks) - n + 1
                        top = max(c.values())
                        dup = sum(v for v in c.values() if v > 1)
                    else:
                        total = top = dup = 0
                    rec.extend((top, dup, total))
                rows.append(rec)
            cols = [id_col]
            for n in all_ns:
                cols.extend((f"_top{n}", f"_dup{n}", f"_tot{n}"))
            yield pd.DataFrame(rows, columns=cols)

    schema = f"{id_col} {id_type}, " + ", ".join(
        f"_top{n} long, _dup{n} long, _tot{n} long" for n in all_ns
    )
    from deepseek_ocr_rs_spark.operators.rebalance import (
        rebalance_for_arrow,
    )

    counted = rebalance_for_arrow(df.select(id_col, text_col)).mapInPandas(
        stats, schema=schema
    )

    def frac(num: str, n: int):
        # guard the 0/0 of sub-n-token docs (ANSI division) — the old
        # left-join produced NULL there, coalesced to 0.0
        return F.round(
            F.when(
                F.col(f"_tot{n}") > 0, F.col(num) / F.col(f"_tot{n}")
            ).otherwise(F.lit(0.0)),
            6,
        )

    out = [frac(f"_top{n}", n).alias(f"top{n}_frac") for n in top_ns]
    out += [frac(f"_dup{n}", n).alias(f"dup{n}_frac") for n in dup_ns]
    return counted.select(F.col(id_col), *out)


def ngram_decontaminate(
    corpus: DataFrame,
    benchmark: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 5,
) -> DataFrame:
    """Per-corpus-doc contamination vs a benchmark set, 6dp.

    ``contamination_frac`` = |distinct n-grams ∩ benchmark n-grams| /
    |distinct n-grams|.  The benchmark gram set is broadcast — eval sets
    are MBs against a corpus of TBs, so the probe is shuffle-free on the
    corpus side.

    r06 kernel note: the old shape shuffled every distinct (doc, gram)
    STRING pair for the per-doc distinct + probe join (26.2 s at sf1.0,
    dominated by interpreted gram construction).  The benchmark texts
    are a bounded collect (the same size class the broadcast hash
    relation already materialized driver-side); gram sets build in
    Python with the identical ASCII \\s+ tokenizer, and the per-doc
    probe is a set intersection inside ONE mapInPandas pass — ZERO
    shuffles, exact integer outputs, fractions + 6dp round unchanged in
    the JVM.
    """
    import re

    import pandas as pd

    ws = re.compile(r"\s+", re.ASCII)

    def grams_of(text: str) -> set:
        toks = [t for t in ws.split(text or "") if t]
        return {
            tuple(toks[i:i + n]) for i in range(len(toks) - n + 1)
        } if len(toks) >= n else set()

    bench_set = set()
    for r in benchmark.select(text_col).collect():
        bench_set |= grams_of(r[0])
    sc = corpus.sparkSession.sparkContext
    bc = sc.broadcast(bench_set)
    id_type = dict(corpus.dtypes)[id_col]

    def score(batches):
        bs = bc.value
        for pdf in batches:
            rows = []
            for did, text in zip(pdf[id_col], pdf[text_col]):
                g = grams_of(text)
                rows.append((did, len(g), len(g & bs) if g else 0))
            yield pd.DataFrame(
                rows, columns=[id_col, "total_grams", "matched_grams"]
            )

    from deepseek_ocr_rs_spark.operators.rebalance import (
        rebalance_for_arrow,
    )

    counted = rebalance_for_arrow(
        corpus.select(id_col, text_col)
    ).mapInPandas(
        score,
        schema=f"{id_col} {id_type}, total_grams long, matched_grams long",
    )
    return counted.select(
        id_col,
        "total_grams",
        "matched_grams",
        F.round(
            F.when(
                F.col("total_grams") > 0,
                F.col("matched_grams") / F.col("total_grams"),
            ).otherwise(F.lit(0.0)),
            6,
        ).alias("contamination_frac"),
    )
