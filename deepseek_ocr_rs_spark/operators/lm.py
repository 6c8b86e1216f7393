"""Corpus-trained bigram LM fluency scoring (the perplexity-filter tier).

Production curation stacks (CCNet, RedPajama, Dolma) filter documents by
language-model perplexity: train a small LM on the corpus (or a trusted
slice), score each document, drop the tails.  The reference's analog is
its sampling discipline — every token-level score is a deterministic pure
function of explicit counts (crates/core/src/sampling.rs:104-118), never
of ambient float state.

``lm_score`` is that filter re-expressed Spark-first AND cross-engine
exact:

* Train: corpus-wide bigram counts ``c2(w1, w2)`` and left-context
  unigram counts ``c1(w1) = sum_w2 c2(w1, w2)`` — two hash aggregations,
  both map-side partial-combinable.  Because the model is trained on the
  corpus being scored, every observed bigram has ``c2 >= 1``: no
  smoothing term, no OOV branch.
* Score: each document's per-bigram fluency is the conditional
  frequency ``c2/c1`` held in EXACT INTEGER form as
  ``(SCALE * c2) div c1`` (floor division, SCALE = 10^6).  Floor
  division of non-negative integers is engine-independent — no libm, no
  double-rounding — so the per-doc sum is a bigint both engines agree on
  bit-for-bit.  The only float op is the final single IEEE division
  ``sum / n`` (correctly rounded, hence also bit-exact), displayed at
  4dp per the repo's rounding contract.

Design for 100 TB:
- Documents collapse to DISTINCT (doc, w1, w2, cnt) rows before any
  join, so the model join carries one row per distinct bigram per doc,
  not one per token position.
- The model join is a plain hash equi-join on (w1, w2) — co-partitioned
  by the same key the model aggregation just produced, so AQE reuses the
  exchange; skewed stop-word bigrams spread because the key is the PAIR.
- ``c1`` derives from the model itself (vocabulary-sized, second tiny
  aggregation) — the corpus is never re-scanned.
- No collect, no window over a global sort, no Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SCALE = 1_000_000


def _doc_bigrams(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, w1, w2, cnt): distinct adjacent lowercase-word pairs per doc.

    Empty tokens are filtered BEFORE pairing so adjacency means
    "consecutive non-empty words" — identical to the oracle's
    list_filter-then-index construction.  Docs with < 2 words produce no
    rows (the CASE guard avoids sequence(1, 0), which would descend).
    """
    # r06 kernel: the interpreted pair-struct transform + the
    # (id, w1, w2) groupBy shuffle are replaced by ONE Arrow pass whose
    # per-doc Counter emits the already-grouped counts map-side (every
    # doc sits whole inside its batch) — exact integers, identical
    # lower/\s+ ASCII tokenization (guide §4.2/§2.4).
    import re

    import pandas as pd

    from deepseek_ocr_rs_spark.operators.rebalance import (
        rebalance_for_arrow,
    )

    ws = re.compile(r"\s+", re.ASCII)
    id_type = dict(df.dtypes)[id_col]

    def bigrams(batches):
        from collections import Counter

        for pdf in batches:
            ids, w1s, w2s, cnts = [], [], [], []
            for did, text in zip(pdf[id_col], pdf[text_col]):
                w = [t for t in ws.split((text or "").lower()) if t]
                if len(w) < 2:
                    continue
                c = Counter(zip(w, w[1:]))
                for (a, b), n in c.items():
                    ids.append(did)
                    w1s.append(a)
                    w2s.append(b)
                    cnts.append(n)
            yield pd.DataFrame(
                {id_col: ids, "w1": w1s, "w2": w2s, "cnt": cnts}
            )

    return rebalance_for_arrow(df.select(id_col, text_col)).mapInPandas(
        bigrams, schema=f"{id_col} {id_type}, w1 string, w2 string, cnt long"
    )


def lm_score(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Score every document >= 2 words by self-trained bigram fluency.

    Returns (id, n_bigrams, lm_score): n_bigrams = token positions with a
    successor; lm_score = avg over positions of
    ``floor(SCALE * c2 / c1) / SCALE`` rounded to 4dp — 1.0 means every
    transition is deterministic in the corpus, small values mean the doc
    walks rare transitions (boilerplate scores high, shuffled text low).
    """
    # bg feeds both the model aggregation and the final scoring join;
    # persist so the tokenize/count pass runs once (r06)
    bg = _doc_bigrams(df, id_col, text_col).persist()
    model = bg.groupBy("w1", "w2").agg(F.sum("cnt").alias("c2"))
    c1 = model.groupBy("w1").agg(F.sum("c2").alias("c1"))
    model = model.join(c1, "w1").withColumn(
        "s", F.expr(f"({SCALE}L * c2) div c1")
    )
    return (
        bg.join(model, ["w1", "w2"])
        .groupBy(id_col)
        .agg(
            F.sum("cnt").cast("long").alias("n_bigrams"),
            F.sum(F.col("cnt") * F.col("s")).cast("long").alias("_ssum"),
        )
        .select(
            id_col,
            "n_bigrams",
            F.round(
                F.col("_ssum")
                / (F.col("n_bigrams").cast("double") * F.lit(float(SCALE))),
                4,
            ).alias("lm_score"),
        )
    )


def lm_score_oracle_sql(
    table: str, id_col: str = "doc_id", text_col: str = "text"
) -> str:
    """DuckDB SQL replicating ``lm_score`` bit-for-bit: same integer
    floor-division per bigram, same single final double division."""
    return f"""
        WITH toks AS (
          SELECT {id_col},
                 list_filter(string_split_regex(lower({text_col}), '\\s+'),
                             x -> x <> '') AS w
          FROM {table}
        ),
        bg AS (
          SELECT {id_col}, w[i] AS w1, w[i + 1] AS w2, count(*) AS cnt
          FROM toks, LATERAL unnest(range(1, len(w))) AS t(i)
          GROUP BY 1, 2, 3
        ),
        model AS (
          SELECT w1, w2, sum(cnt) AS c2 FROM bg GROUP BY 1, 2
        ),
        c1 AS (SELECT w1, sum(c2) AS c1 FROM model GROUP BY 1),
        scored AS (
          SELECT m.w1, m.w2, ({SCALE} * m.c2) // u.c1 AS s
          FROM model m JOIN c1 u USING (w1)
        )
        SELECT b.{id_col},
               CAST(sum(b.cnt) AS BIGINT) AS n_bigrams,
               round(CAST(sum(b.cnt * s.s) AS BIGINT)
                     / (CAST(sum(b.cnt) AS DOUBLE) * {float(SCALE)!r}),
                     4) AS lm_score
        FROM bg b JOIN scored s ON b.w1 = s.w1 AND b.w2 = s.w2
        GROUP BY b.{id_col}
    """
