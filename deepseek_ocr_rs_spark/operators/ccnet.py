"""CCNet-style per-language quality bucketing (the curation capstone).

CCNet (Wenzek et al. 2020, public) is the canonical web-curation recipe:
split every document into paragraphs, deduplicate paragraphs across the
WHOLE corpus (keeping the first occurrence), rebuild documents from the
surviving paragraphs, score each rebuilt document with a per-language
language model, and cut each language's score distribution into
head / middle / tail buckets so downstream training can sample by
quality tier.  This module re-expresses that pipeline Spark-first and
cross-engine exact; the reference's analog is its strict corpus-level
equality discipline (benchsuite/orchestrator.py:456-521) — every stage
here is a deterministic pure function of corpus content, so the DuckDB
oracle replicates the full chain bit-for-bit.

Stages and their 100 TB posture:

1. **Paragraph split** — the corpus here is single-line text, so
   "paragraphs" are consecutive non-overlapping ``span_words``-word
   chunks (same chunker as operators/spandedup.py, where the C4 variant
   lives).  Pure lambda expressions, no Python, map-side only.
2. **Corpus-wide keep-first dedup** — one window over
   ``md5(paragraph)`` ordered by (doc_id, pos): the first occurrence
   survives, every later copy (boilerplate, license footers, chrome)
   drops.  The shuffle is keyed on the hash — high cardinality,
   naturally balanced; the comparator sees a 32-char digest plus two
   ints, never the paragraph text.
3. **Rebuild** — groupBy(doc_id), surviving paragraphs re-joined in
   original order via a sorted struct array (no second sort exchange:
   the aggregation itself carries the order).
4. **Per-language bigram LM** — the operators/lm.py integer-exact
   fluency model, with ``lang`` added to every model key: corpus-wide
   counts c2(lang, w1, w2), left-context c1(lang, w1), per-bigram score
   ``(SCALE * c2) div c1`` (floor division of non-negative integers —
   engine-independent), per-doc integer sum.  Two hash aggregations and
   one equi-join, all map-side partial-combinable.
5. **Head/middle/tail cut** — CCNet cuts each language at the 1/3 and
   2/3 quantiles of the score distribution.  A per-doc ntile would be a
   global sort per language; instead the scores are already EXACT
   integers in [0, BINS] (``bin = (BINS * ssum) div (n_bigrams *
   SCALE)``), so the cut runs over the bounded per-language histogram:
   cumulative counts over at most BINS+1 rows per language, thresholds
   ``t_lo = min bin with 3*cdf >= n`` and ``t_hi = min bin with
   3*cdf >= 2n``, then one broadcast join of the per-language threshold
   row back onto the docs.  Docs in a threshold bin share a bucket
   (ties never straddle), so the result is partitioning-invariant.

Documents whose rebuilt text has < 2 words carry no bigram and drop out
(CCNet likewise drops empty-after-dedup docs).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from deepseek_ocr_rs_spark.operators.spandedup import _spans_expr

SCALE = 1_000_000
BINS = 10_000


def ccnet_buckets(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    lang_col: str = "lang",
    span_words: int = 12,
) -> DataFrame:
    """Paragraph-dedup + per-language LM-score + head/middle/tail cut.

    Returns (id, lang, n_paras, n_kept, n_bigrams, lm_score, bucket)
    for every doc with >= 2 surviving words; ``lm_score`` is the 4dp
    fluency (1.0 = every transition deterministic in its language's
    corpus), ``bucket`` the CCNet tier (head = most fluent third).
    """
    # r06 kernel: span chunking and bigram counting move to Arrow
    # passes (the interpreted chunker + pair-struct transform were most
    # of the 6.9 s at sf1.0); the keep-first window, rebuild aggregate,
    # and the model/quantile joins are unchanged.
    import re

    import pandas as pd

    from deepseek_ocr_rs_spark.operators.rebalance import (
        rebalance_for_arrow,
    )

    id_type = dict(df.dtypes)[id_col]
    k = span_words

    def chunk(batches):
        for pdf in batches:
            ids, langs, poss, spans_out = [], [], [], []
            for did, lang, text in zip(
                pdf[id_col], pdf[lang_col], pdf[text_col]
            ):
                toks = [t for t in (text or "").split(" ") if t]
                for i0, i in enumerate(range(0, len(toks), k)):
                    ids.append(did)
                    langs.append(lang)
                    poss.append(i0)
                    spans_out.append(" ".join(toks[i:i + k]))
            yield pd.DataFrame(
                {id_col: ids, "lang": langs, "pos": poss,
                 "span": spans_out}
            )

    spans = rebalance_for_arrow(
        df.select(id_col, lang_col, text_col)
    ).mapInPandas(
        chunk,
        schema=f"{id_col} {id_type}, lang string, pos int, span string",
    ).persist()  # branches: n_paras count AND the keep-first window
    n_paras = spans.groupBy(id_col).agg(F.count("*").alias("n_paras"))

    w = Window.partitionBy(F.md5("span")).orderBy(id_col, "pos")
    kept = (
        spans.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .drop("rn")
    )
    rebuilt = kept.groupBy(id_col, "lang").agg(
        F.count("*").alias("n_kept"),
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "span"))),
                lambda s: s["span"],
            ),
            " ",
        ).alias("text2"),
    )

    # per-language bigram LM (operators/lm.py discipline, lang-keyed);
    # per-doc Counter emits the already-grouped counts map-side
    ws = re.compile(r"\s+", re.ASCII)

    def bigrams(batches):
        from collections import Counter

        for pdf in batches:
            ids, langs, nks, w1s, w2s, cnts = [], [], [], [], [], []
            for did, lang, nk, text2 in zip(
                pdf[id_col], pdf["lang"], pdf["n_kept"], pdf["text2"]
            ):
                w = [t for t in ws.split((text2 or "").lower()) if t]
                if len(w) < 2:
                    continue
                for (a, b), n in Counter(zip(w, w[1:])).items():
                    ids.append(did)
                    langs.append(lang)
                    nks.append(nk)
                    w1s.append(a)
                    w2s.append(b)
                    cnts.append(n)
            yield pd.DataFrame(
                {id_col: ids, "lang": langs, "n_kept": nks,
                 "w1": w1s, "w2": w2s, "cnt": cnts}
            )

    bg = rebuilt.mapInPandas(
        bigrams,
        schema=f"{id_col} {id_type}, lang string, n_kept long, "
               f"w1 string, w2 string, cnt long",
    ).persist()
    model = bg.groupBy("lang", "w1", "w2").agg(F.sum("cnt").alias("c2"))
    c1 = model.groupBy("lang", "w1").agg(F.sum("c2").alias("c1"))
    model = model.join(c1, ["lang", "w1"]).withColumn(
        "s", F.expr(f"({SCALE}L * c2) div c1")
    )
    scored = (
        bg.join(model, ["lang", "w1", "w2"])
        .groupBy(id_col, "lang", "n_kept")
        .agg(
            F.sum("cnt").cast("long").alias("n_bigrams"),
            F.sum(F.col("cnt") * F.col("s")).cast("long").alias("_ssum"),
        )
        .withColumn(
            "bin",
            F.expr(f"({BINS}L * _ssum) div (n_bigrams * {SCALE}L)"),
        )
        # branches: the histogram/quantile cut AND the output join — an
        # unpersisted scored would re-run the model join + aggregate per
        # branch (guide §1.2); one row per (doc, lang), tiny
        .persist()
    )

    # bounded per-language histogram -> 1/3 and 2/3 quantile bins
    hist = scored.groupBy("lang", "bin").agg(F.count("*").alias("c"))
    wl = (
        Window.partitionBy("lang")
        .orderBy("bin")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cuts = (
        hist.withColumn("cdf", F.sum("c").over(wl))
        .withColumn("n", F.sum("c").over(Window.partitionBy("lang")))
        .groupBy("lang")
        .agg(
            F.min(F.when(3 * F.col("cdf") >= F.col("n"), F.col("bin")))
            .alias("t_lo"),
            F.min(F.when(3 * F.col("cdf") >= 2 * F.col("n"), F.col("bin")))
            .alias("t_hi"),
        )
    )

    return (
        scored.join(F.broadcast(cuts), "lang")
        .join(n_paras, id_col)
        .select(
            id_col,
            "lang",
            "n_paras",
            "n_kept",
            "n_bigrams",
            F.round(
                F.col("_ssum")
                / (F.col("n_bigrams").cast("double") * F.lit(float(SCALE))),
                4,
            ).alias("lm_score"),
            F.when(F.col("bin") <= F.col("t_lo"), F.lit("tail"))
            .when(F.col("bin") <= F.col("t_hi"), F.lit("middle"))
            .otherwise(F.lit("head"))
            .alias("bucket"),
        )
    )


def ccnet_oracle_sql(
    table: str = "documents",
    id_col: str = "doc_id",
    text_col: str = "text",
    lang_col: str = "lang",
    span_words: int = 12,
) -> str:
    """DuckDB SQL replicating ``ccnet_buckets`` bit-for-bit: same span
    chunking, same keep-first window, same integer floor-division LM,
    same histogram-quantile cut."""
    k = span_words
    return f"""
        WITH toks0 AS (
          SELECT {id_col}, {lang_col} AS lang,
                 list_filter(string_split({text_col}, ' '), x -> x <> '')
                   AS w
          FROM {table}
        ),
        spans AS (
          SELECT {id_col}, lang, CAST(i AS INT) AS pos,
                 array_to_string(w[i * {k} + 1 : i * {k} + {k}], ' ')
                   AS span
          FROM toks0,
               LATERAL unnest(range(0,
                 CAST(ceil(len(w) / {float(k)!r}) AS BIGINT))) AS t(i)
          WHERE len(w) > 0
        ),
        n_paras AS (
          SELECT {id_col}, count(*) AS n_paras FROM spans GROUP BY 1
        ),
        kept AS (
          SELECT {id_col}, lang, pos, span FROM (
            SELECT *, row_number() OVER (PARTITION BY md5(span)
                                         ORDER BY {id_col}, pos) AS rn
            FROM spans
          ) WHERE rn = 1
        ),
        rebuilt AS (
          SELECT {id_col}, lang, count(*) AS n_kept,
                 string_agg(span, ' ' ORDER BY pos) AS text2
          FROM kept GROUP BY 1, 2
        ),
        toks AS (
          SELECT {id_col}, lang, n_kept,
                 list_filter(string_split_regex(lower(text2), '\\s+'),
                             x -> x <> '') AS w
          FROM rebuilt
        ),
        bg AS (
          SELECT {id_col}, lang, n_kept, w[i] AS w1, w[i + 1] AS w2,
                 count(*) AS cnt
          FROM toks, LATERAL unnest(range(1, len(w))) AS t(i)
          GROUP BY 1, 2, 3, 4, 5
        ),
        model AS (
          SELECT lang, w1, w2, sum(cnt) AS c2 FROM bg GROUP BY 1, 2, 3
        ),
        c1 AS (SELECT lang, w1, sum(c2) AS c1 FROM model GROUP BY 1, 2),
        mscored AS (
          SELECT m.lang, m.w1, m.w2, ({SCALE} * m.c2) // u.c1 AS s
          FROM model m JOIN c1 u USING (lang, w1)
        ),
        docs AS (
          SELECT b.{id_col}, b.lang, b.n_kept,
                 CAST(sum(b.cnt) AS BIGINT) AS n_bigrams,
                 CAST(sum(b.cnt * s.s) AS BIGINT) AS ssum
          FROM bg b
          JOIN mscored s ON b.lang = s.lang AND b.w1 = s.w1
                        AND b.w2 = s.w2
          GROUP BY 1, 2, 3
        ),
        binned AS (
          SELECT *, ({BINS} * ssum) // (n_bigrams * {SCALE}) AS bin
          FROM docs
        ),
        hist AS (
          SELECT lang, bin, count(*) AS c FROM binned GROUP BY 1, 2
        ),
        cdfs AS (
          SELECT lang, bin,
                 sum(c) OVER (PARTITION BY lang ORDER BY bin
                              ROWS UNBOUNDED PRECEDING) AS cdf,
                 sum(c) OVER (PARTITION BY lang) AS n
          FROM hist
        ),
        cuts AS (
          SELECT lang,
                 min(CASE WHEN 3 * cdf >= n THEN bin END) AS t_lo,
                 min(CASE WHEN 3 * cdf >= 2 * n THEN bin END) AS t_hi
          FROM cdfs GROUP BY 1
        )
        SELECT b.{id_col}, b.lang, p.n_paras, b.n_kept, b.n_bigrams,
               round(CAST(b.ssum AS BIGINT)
                     / (CAST(b.n_bigrams AS DOUBLE) * {float(SCALE)!r}),
                     4) AS lm_score,
               CASE WHEN b.bin <= c.t_lo THEN 'tail'
                    WHEN b.bin <= c.t_hi THEN 'middle'
                    ELSE 'head' END AS bucket
        FROM binned b
        JOIN cuts c USING (lang)
        JOIN n_paras p USING ({id_col})
    """
