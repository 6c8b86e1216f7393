"""Rule-based web-text cleanup: C4 line filters + Gopher quality rules.

The two canonical heuristic filter suites every large-scale text
pipeline runs before model-based scoring (both public):

* **C4** (Raffel et al. 2020 §2.2): keep only lines that end in a
  terminal punctuation mark and have enough words; drop any line
  mentioning javascript; drop whole pages that contain "lorem ipsum"
  or a curly brace, or that retain too few lines.
* **Gopher** (Rae et al. 2021, appendix A1.1): document-level bounds —
  word count window, mean word length window, symbol-to-word ratios
  (hash and ellipsis), bullet-line and ellipsis-line caps, and a
  minimal stop-word requirement.

Both are pure per-row JVM expression chains — no shuffle, no Python —
so they fuse into the scan stage and cost one pass at any corpus size.
The repetition-signal family (operators/repetition.py) covers Gopher's
OTHER table (A1.2, repetition caps); this module is the A1.1 column.

Verdicts are emitted as (keep boolean, reason string) for EVERY input
row rather than filtering, so downstream can audit drop rates per rule
— reason is the FIRST failed rule in documented order, NULL when kept.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_TERMINALS = (".", "!", "?", '"')


def _words(col: Column) -> Column:
    return F.filter(F.split(col, " "), lambda w: w != F.lit(""))


def c4_line_filters(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_words_per_line: int = 3,
    min_kept_lines: int = 3,
) -> DataFrame:
    """C4 line-level cleanup.  One row per input doc:
    ``(id, keep boolean, reason string, n_lines int, n_lines_kept int,
    clean_text string)`` — clean_text is the kept lines rejoined with
    newlines (NULL when the page is dropped).

    Line keep rule: trimmed line ends in ``. ! ? "`` AND has at least
    ``min_words_per_line`` words AND does not mention javascript
    (case-insensitive).  Page drop rules, in reason order:
    ``lorem_ipsum`` > ``brace`` > ``too_few_lines``.
    """
    lines = F.split(F.col(text_col), "\n")
    trimmed = F.transform(lines, F.trim)
    kept = F.filter(
        trimmed,
        lambda l: F.substring(l, -1, 1).isin(*_TERMINALS)
        & (F.size(_words(l)) >= min_words_per_line)
        & ~F.lower(l).contains("javascript"),
    )
    low = F.lower(F.col(text_col))
    reason = (
        F.when(low.contains("lorem ipsum"), "lorem_ipsum")
        .when(F.col(text_col).contains("{"), "brace")
        .when(F.size(kept) < min_kept_lines, "too_few_lines")
    )
    return df.select(
        id_col,
        reason.isNull().alias("keep"),
        reason.alias("reason"),
        F.size(lines).alias("n_lines"),
        F.size(kept).alias("n_lines_kept"),
        F.when(reason.isNull(), F.array_join(kept, "\n")).alias("clean_text"),
    )


# Gopher A1.1 stop words: the paper requires >= 2 of these to appear
_GOPHER_STOPS = ["the", "be", "to", "of", "and", "that", "have", "with"]


def gopher_quality_filters(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_words: int = 50,
    max_words: int = 100_000,
    min_mean_word_len: int = 3,
    max_mean_word_len: int = 10,
    max_hash_ratio_pct: int = 10,
    max_ellipsis_ratio_pct: int = 30,
    max_bullet_line_pct: int = 90,
    min_stop_words: int = 2,
) -> DataFrame:
    """Gopher document-level quality rules (A1.1), integer-exact.

    One row per input doc: ``(id, keep boolean, reason string,
    n_words int, sum_word_chars long, n_hash int, n_ellipsis int,
    n_stop_hits int)``.  Ratio rules compare cross-multiplied integers
    (``100 * n_hash <= max_pct * n_words``) so the oracle needs no
    float semantics.  Reason order: word-count window > mean word
    length window > hash ratio > ellipsis ratio > bullet lines >
    stop words.
    """
    # r06 kernel: the per-doc counters ran as interpreted HOFs (word
    # fold, line transform/filter, stop-word probes) — 8.4 s at sf1.0.
    # One Arrow pass emits the exact integer counters; the rule/reason
    # chain below is unchanged JVM logic over those ints.
    import pandas as pd

    from deepseek_ocr_rs_spark.operators.rebalance import (
        rebalance_for_arrow,
    )

    id_type = dict(df.dtypes)[id_col]
    stops = list(_GOPHER_STOPS)

    def counters(batches):
        for pdf in batches:
            rows = []
            for did, text in zip(pdf[id_col], pdf[text_col]):
                t = text or ""
                words_l = [w for w in t.split(" ") if w != ""]
                wset = set(words_l)
                lines_l = [ln.strip(" ") for ln in t.split("\n")]
                rows.append((
                    did,
                    len(words_l),
                    sum(len(w) for w in words_l),
                    t.count("#"),
                    t.count("..."),
                    len(lines_l),
                    sum(1 for ln in lines_l
                        if ln.startswith(("-", "*", "\u2022"))),
                    sum(1 for s_ in stops if s_ in wset),
                ))
            yield pd.DataFrame(
                rows,
                columns=[id_col, "_nw", "_sc", "_nh", "_ne", "_nl",
                         "_nb", "_ns"],
            )

    df = rebalance_for_arrow(df.select(id_col, text_col)).mapInPandas(
        counters,
        schema=f"{id_col} {id_type}, _nw int, _sc long, _nh int, "
               f"_ne int, _nl int, _nb int, _ns int",
    )
    n_words = F.col("_nw")
    sum_chars = F.col("_sc")
    n_hash = F.col("_nh")
    n_ellipsis = F.col("_ne")
    n_lines = F.col("_nl")
    n_bullet = F.col("_nb")
    n_stops = F.col("_ns")
    # mean word length window, cross-multiplied:
    #   min <= sum_chars / n_words <= max
    mean_low = sum_chars >= F.lit(min_mean_word_len) * n_words
    mean_high = sum_chars <= F.lit(max_mean_word_len) * n_words
    reason = (
        F.when(
            (n_words < min_words) | (n_words > max_words), "word_count"
        )
        .when(~mean_low | ~mean_high, "mean_word_length")
        .when(
            F.lit(100) * n_hash > F.lit(max_hash_ratio_pct) * n_words,
            "hash_ratio",
        )
        .when(
            F.lit(100) * n_ellipsis
            > F.lit(max_ellipsis_ratio_pct) * n_words,
            "ellipsis_ratio",
        )
        .when(
            F.lit(100) * n_bullet > F.lit(max_bullet_line_pct) * n_lines,
            "bullet_lines",
        )
        .when(n_stops < min_stop_words, "stop_words")
    )
    return df.select(
        id_col,
        reason.isNull().alias("keep"),
        reason.alias("reason"),
        n_words.alias("n_words"),
        sum_chars.alias("sum_word_chars"),
        n_hash.alias("n_hash"),
        n_ellipsis.alias("n_ellipsis"),
        n_stops.cast("int").alias("n_stop_hits"),
    )


def c4_filters_oracle_sql(
    table: str = "documents",
    id_col: str = "doc_id",
    text_col: str = "text",
    min_words_per_line: int = 3,
    min_kept_lines: int = 3,
) -> str:
    """DuckDB replica of :func:`c4_line_filters`."""
    kept = f"""
        list_filter(
          list_transform(string_split({text_col}, chr(10)), x -> trim(x)),
          l -> right(l, 1) IN ('.', '!', '?', '"')
               AND len(list_filter(string_split(l, ' '), w -> w <> ''))
                   >= {min_words_per_line}
               AND NOT contains(lower(l), 'javascript'))
    """
    return f"""
        WITH base AS (
          SELECT {id_col}, {text_col} AS t, {kept} AS kept
          FROM {table}
        ),
        verdict AS (
          SELECT {id_col}, t, kept,
                 CASE WHEN contains(lower(t), 'lorem ipsum')
                        THEN 'lorem_ipsum'
                      WHEN contains(t, '{{') THEN 'brace'
                      WHEN len(kept) < {min_kept_lines}
                        THEN 'too_few_lines'
                 END AS reason
          FROM base
        )
        SELECT {id_col},
               reason IS NULL AS keep,
               reason,
               CAST(len(string_split(t, chr(10))) AS INT) AS n_lines,
               CAST(len(kept) AS INT) AS n_lines_kept,
               CASE WHEN reason IS NULL
                    THEN array_to_string(kept, chr(10)) END AS clean_text
        FROM verdict
    """


def gopher_filters_oracle_sql(
    table: str = "documents",
    id_col: str = "doc_id",
    text_col: str = "text",
    min_words: int = 50,
    max_words: int = 100_000,
    min_mean_word_len: int = 3,
    max_mean_word_len: int = 10,
    max_hash_ratio_pct: int = 10,
    max_ellipsis_ratio_pct: int = 30,
    max_bullet_line_pct: int = 90,
    min_stop_words: int = 2,
) -> str:
    """DuckDB replica of :func:`gopher_quality_filters`."""
    stops = ", ".join(f"'{s}'" for s in _GOPHER_STOPS)
    return f"""
        WITH base AS (
          SELECT {id_col}, {text_col} AS t,
                 list_filter(string_split({text_col}, ' '), w -> w <> '')
                   AS words,
                 list_transform(string_split({text_col}, chr(10)),
                                x -> trim(x)) AS lines
          FROM {table}
        ),
        m AS (
          SELECT {id_col},
                 len(words) AS n_words,
                 COALESCE(list_sum(list_transform(words, w ->
                   CAST(length(w) AS BIGINT))), 0) AS sum_chars,
                 length(t) - length(replace(t, '#', '')) AS n_hash,
                 (length(t) - length(replace(t, '...', ''))) // 3
                   AS n_ellipsis,
                 len(lines) AS n_lines,
                 len(list_filter(lines, l ->
                   l LIKE '-%' OR l LIKE '*%' OR l LIKE chr(8226) || '%'))
                   AS n_bullet,
                 len(list_filter([{stops}], s -> list_contains(words, s)))
                   AS n_stops
          FROM base
        ),
        v AS (
          SELECT *,
                 CASE WHEN n_words < {min_words} OR n_words > {max_words}
                        THEN 'word_count'
                      WHEN sum_chars < {min_mean_word_len} * n_words
                        OR sum_chars > {max_mean_word_len} * n_words
                        THEN 'mean_word_length'
                      WHEN 100 * n_hash > {max_hash_ratio_pct} * n_words
                        THEN 'hash_ratio'
                      WHEN 100 * n_ellipsis >
                           {max_ellipsis_ratio_pct} * n_words
                        THEN 'ellipsis_ratio'
                      WHEN 100 * n_bullet >
                           {max_bullet_line_pct} * n_lines
                        THEN 'bullet_lines'
                      WHEN n_stops < {min_stop_words} THEN 'stop_words'
                 END AS reason
          FROM m
        )
        SELECT {id_col},
               reason IS NULL AS keep,
               reason,
               CAST(n_words AS INT) AS n_words,
               CAST(sum_chars AS BIGINT) AS sum_word_chars,
               CAST(n_hash AS INT) AS n_hash,
               CAST(n_ellipsis AS INT) AS n_ellipsis,
               CAST(n_stops AS INT) AS n_stop_hits
        FROM v
    """
