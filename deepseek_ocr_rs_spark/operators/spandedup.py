"""C4-style cross-corpus span deduplication (boilerplate removal).

The C4 pipeline (Raffel et al. 2020, public) removed any three-sentence
span occurring more than once in the corpus; modern web curation stacks
keep a variant of it next to whole-document dedup (operators/dedup.py)
because navigation chrome, cookie banners and licence footers repeat
across *different* documents that are nowhere near whole-doc duplicates.
Same discipline family as the reference's strict corpus-level equality
gates (SURVEY §6); there is no single-document analog in the reference —
this is corpus infrastructure the 100 TB pipeline needs.

``span_dedup`` chunks each document's token stream into consecutive
non-overlapping ``span_words``-word spans, bans every span that occurs in
at least ``min_docs`` DISTINCT documents, and reassembles each document
from its surviving spans in original order.

100 TB posture:
* tokenize + chunk are map-side lambda expressions (no Python, no UDF);
* the span-frequency count is a two-phase hash aggregate with map-side
  partial ``count distinct`` — the only full shuffle, keyed on the span
  text (high cardinality, naturally balanced);
* the banned set is the tiny threshold-crossing tail of the frequency
  distribution, so the removal join is a BROADCAST left-anti — the corpus
  side never shuffles for it.  If a corpus ever produced a banned set too
  big to broadcast, drop the ``F.broadcast`` hint and it degrades to a
  plain shuffled anti-join with identical semantics;
* reassembly groups by doc_id — same key the corpus is usually already
  laid out on.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _spans_expr(text_col: str, k: int) -> str:
    """SQL expr: array<struct<pos:int, span:string>> of consecutive
    non-overlapping k-word spans (ragged tail kept as a short span)."""
    toks = f"filter(split({text_col}, ' '), x -> x != '')"
    n = f"cast(ceil(size({toks}) / cast({k} as double)) as int)"
    return (
        f"CASE WHEN size({toks}) > 0 THEN "
        f"transform(sequence(0, {n} - 1), i -> named_struct("
        f"'pos', cast(i as int), "
        f"'span', array_join(slice({toks}, i * {k} + 1, {k}), ' '))) "
        f"ELSE cast(array() as array<struct<pos:int, span:string>>) END"
    )


def span_dedup(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    span_words: int = 3,
    min_docs: int = 4,
) -> DataFrame:
    """Remove every ``span_words``-word span occurring in >= ``min_docs``
    distinct documents; returns (id, clean_text, n_spans, n_removed).

    Deterministic and partitioning-invariant: the banned set is a pure
    function of corpus content, and reassembly sorts surviving spans by
    their original position.

    r06 kernel (guide §2.4/§4.2): the old pipeline exploded the
    interpreted span chunker THREE times (banned / kept / totals each
    re-ran the lineage) and shuffled every span row twice more for the
    per-doc reassembly — 12.3 s at sf1.0.  Now ONE Arrow pass emits the
    per-doc DISTINCT spans for the frequency count (the only shuffle
    left), the threshold tail collapses to a driver-side set (exactly
    the bytes the old F.broadcast hash relation shipped), and a second
    Arrow pass re-chunks each doc and reassembles map-side — counts and
    strings all exact.
    """
    import pandas as pd

    from deepseek_ocr_rs_spark.operators.rebalance import (
        rebalance_for_arrow,
    )

    k = span_words
    id_type = dict(df.dtypes)[id_col]

    def chunks_of(text):
        toks = [t for t in (text or "").split(" ") if t]
        return [
            " ".join(toks[i:i + k]) for i in range(0, len(toks), k)
        ]

    def distinct_spans(batches):
        for pdf in batches:
            ids, spans_out = [], []
            for did, text in zip(pdf[id_col], pdf[text_col]):
                s = set(chunks_of(text))
                ids.extend([did] * len(s))
                spans_out.extend(s)
            yield pd.DataFrame({id_col: ids, "span": spans_out})

    pruned = rebalance_for_arrow(df.select(id_col, text_col))
    # one row per (doc, span) by construction -> count(*) IS the
    # distinct-doc count; map-side partial agg absorbs the Zipf head
    banned_rows = (
        pruned.mapInPandas(
            distinct_spans, schema=f"{id_col} {id_type}, span string"
        )
        .groupBy("span")
        .agg(F.count(F.lit(1)).alias("_d"))
        .where(F.col("_d") >= min_docs)
        .select("span")
        .collect()
    )
    banned_set = {r[0] for r in banned_rows}
    bc = df.sparkSession.sparkContext.broadcast(banned_set)

    def reassemble(batches):
        bs = bc.value
        for pdf in batches:
            rows = []
            for did, text in zip(pdf[id_col], pdf[text_col]):
                spans = chunks_of(text)
                kept = [s for s in spans if s not in bs]
                rows.append(
                    (did, " ".join(kept), len(spans),
                     len(spans) - len(kept))
                )
            yield pd.DataFrame(
                rows,
                columns=[id_col, "clean_text", "n_spans", "n_removed"],
            )

    return (
        pruned.mapInPandas(
            reassemble,
            schema=f"{id_col} {id_type}, clean_text string, "
                   f"n_spans long, n_removed long",
        )
        .select(
            id_col,
            "clean_text",
            "n_spans",
            F.col("n_removed")
            .cast("long")
            .alias("n_removed"),
        )
    )


def span_dedup_oracle_sql(
    table: str = "documents",
    id_col: str = "doc_id",
    text_col: str = "text",
    span_words: int = 3,
    min_docs: int = 4,
) -> str:
    """DuckDB SQL replicating ``span_dedup`` exactly (same chunking, same
    ragged-tail handling, same threshold, same in-order reassembly)."""
    k = span_words
    return f"""
        WITH t AS (
          SELECT {id_col},
                 list_filter(string_split({text_col}, ' '),
                             x -> x <> '') AS toks
          FROM {table}
        ), s AS (
          SELECT {id_col}, CAST(i AS INT) AS pos,
                 array_to_string(
                   list_slice(toks, i * {k} + 1, i * {k} + {k}), ' ') AS span
          FROM t, UNNEST(range(0, CAST(ceil(len(toks) / {k}.0) AS BIGINT)))
               AS u(i)
          WHERE len(toks) > 0
        ), banned AS (
          SELECT span FROM s GROUP BY span
          HAVING count(DISTINCT {id_col}) >= {min_docs}
        ), kept AS (
          SELECT {id_col},
                 string_agg(span, ' ' ORDER BY pos) AS clean_text,
                 count(*) AS n_kept
          FROM s ANTI JOIN banned USING (span)
          GROUP BY {id_col}
        ), tot AS (
          SELECT {id_col}, count(*) AS n_spans FROM s GROUP BY {id_col}
        )
        SELECT d.{id_col},
               coalesce(kept.clean_text, '') AS clean_text,
               CAST(coalesce(tot.n_spans, 0) AS BIGINT) AS n_spans,
               CAST(coalesce(tot.n_spans, 0)
                    - coalesce(kept.n_kept, 0) AS BIGINT) AS n_removed
        FROM {table} d
        LEFT JOIN tot USING ({id_col})
        LEFT JOIN kept USING ({id_col})
    """


def host_template_spans(
    df: DataFrame,
    id_col: str = "doc_id",
    host_col: str = "source",
    text_col: str = "text",
    span_words: int = 3,
    min_pct: int = 30,
    min_docs: int = 3,
) -> DataFrame:
    """Site-level template detection: spans that repeat across a large
    FRACTION of one host's pages are that site's chrome (nav bars,
    cookie banners, footers) — the cross-page boilerplate signal
    Trafilatura-class extractors use that single-document DOM heuristics
    (functions/classify.py) cannot see, and that corpus-GLOBAL span
    dedup (:func:`span_dedup`) misses when a template is unique to one
    site.  Returns ``(host, span, n_docs, n_docs_host)`` — one row per
    flagged template span per host, where

        flag iff  n_docs * 100 >= min_pct * n_docs_host
             and  n_docs >= min_docs

    (the integer cross-multiplication avoids a float ratio — exact on
    every engine; ``min_docs`` guards tiny hosts where one repeat
    already clears any percentage).

    100 TB plan shape: chunking is the map-side lambda chunker shared
    with :func:`span_dedup`; the per-(host, span) distinct-doc count is
    a two-phase hash aggregate keyed on (host, span) — high cardinality,
    naturally balanced; per-host page totals are a tiny second aggregate
    broadcast back.  No Python, no window, two exchanges total.
    """
    # r06 kernel: chunking moves to the same Arrow chunker span_dedup
    # uses (interpreted slice+array_join was the 8.7 s wall at sf1.0);
    # one row per (doc, host, span) by per-doc set construction, so
    # count(*) IS the distinct-doc count.
    import pandas as pd

    from deepseek_ocr_rs_spark.operators.rebalance import (
        rebalance_for_arrow,
    )

    k = span_words

    def distinct_spans(batches):
        for pdf in batches:
            hosts, spans_out = [], []
            for host, text in zip(pdf[host_col], pdf[text_col]):
                toks = [t for t in (text or "").split(" ") if t]
                s = {
                    " ".join(toks[i:i + k])
                    for i in range(0, len(toks), k)
                }
                hosts.extend([host] * len(s))
                spans_out.extend(s)
            yield pd.DataFrame({"host": hosts, "span": spans_out})

    per_span = (
        rebalance_for_arrow(df.select(host_col, text_col))
        .mapInPandas(distinct_spans, schema="host string, span string")
        .groupBy("host", "span")
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )
    per_host = df.groupBy(F.col(host_col).alias("host")).agg(
        F.countDistinct(id_col).alias("n_docs_host")
    )
    return (
        per_span.join(F.broadcast(per_host), "host")
        .where(
            (F.col("n_docs") * 100 >= F.lit(min_pct) * F.col("n_docs_host"))
            & (F.col("n_docs") >= min_docs)
        )
        .select(
            "host",
            "span",
            F.col("n_docs").cast("long").alias("n_docs"),
            F.col("n_docs_host").cast("long").alias("n_docs_host"),
        )
    )


def host_template_spans_oracle_sql(
    table: str = "documents",
    id_col: str = "doc_id",
    host_col: str = "source",
    text_col: str = "text",
    span_words: int = 3,
    min_pct: int = 30,
    min_docs: int = 3,
) -> str:
    """DuckDB SQL replicating ``host_template_spans`` exactly (same
    chunker as ``span_dedup_oracle_sql``, same integer threshold)."""
    k = span_words
    return f"""
        WITH t AS (
          SELECT {id_col}, {host_col} AS host,
                 list_filter(string_split({text_col}, ' '),
                             x -> x <> '') AS toks
          FROM {table}
        ), s AS (
          SELECT {id_col}, host,
                 array_to_string(
                   list_slice(toks, i * {k} + 1, i * {k} + {k}), ' ') AS span
          FROM t, UNNEST(range(0, CAST(ceil(len(toks) / {k}.0) AS BIGINT)))
               AS u(i)
          WHERE len(toks) > 0
        ), per_span AS (
          SELECT host, span, count(DISTINCT {id_col}) AS n_docs
          FROM s GROUP BY host, span
        ), per_host AS (
          SELECT {host_col} AS host, count(DISTINCT {id_col}) AS n_docs_host
          FROM {table} GROUP BY 1
        )
        SELECT p.host, p.span,
               CAST(p.n_docs AS BIGINT) AS n_docs,
               CAST(h.n_docs_host AS BIGINT) AS n_docs_host
        FROM per_span p JOIN per_host h USING (host)
        WHERE p.n_docs * 100 >= {min_pct} * h.n_docs_host
          AND p.n_docs >= {min_docs}
    """
