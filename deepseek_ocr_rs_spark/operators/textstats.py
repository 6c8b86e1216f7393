"""Text-analysis operators over a document corpus.

These are the training-data-pipeline companions of the extraction engine:
language ID (n-gram/stopword heuristic), quality scoring (length / punct /
stopword ratios), token counting (whitespace + BPE-ish regex), and document
fingerprinting (rolling polynomial hash).  Everything that CAN be a built-in
JVM expression IS one (whole-stage codegen, no Python); only the n-gram
language model and the rolling hash live in Arrow-batched pandas UDFs.

Scale notes: all of these are per-row map operations — zero shuffle, full
predicate pushdown, safe at any corpus size.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import DoubleType, LongType, StringType

# ---------------------------------------------------------------- tokens

# BPE-ish pre-tokenization: word pieces, numbers, or single non-space symbols
# (the public GPT-2 pre-tokenizer shape, simplified to RE2-safe syntax)
BPE_ISH_REGEX = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"


def token_count_cols(text: Column):
    """(n_ws_tokens, n_bpe_tokens, n_chars) as JVM-side expressions."""
    trimmed = F.trim(text)
    n_ws = F.when(trimmed == "", F.lit(0)).otherwise(
        F.size(F.split(trimmed, r"\s+"))
    )
    n_bpe = F.size(F.regexp_extract_all(text, F.lit(BPE_ISH_REGEX), 0))
    return n_ws.cast("long"), n_bpe.cast("long"), F.length(text).cast("long")


def with_token_counts(df: DataFrame, text_col: str = "text") -> DataFrame:
    from deepseek_ocr_rs_spark.operators.rebalance import rebalance_for_arrow

    # regex token counting is CPU-bound per row; spread a single-split
    # local scan (no-op at cluster scale)
    df = rebalance_for_arrow(df)
    n_ws, n_bpe, n_chars = token_count_cols(F.col(text_col))
    return df.withColumns(
        {"n_ws_tokens": n_ws, "n_bpe_tokens": n_bpe, "n_chars_calc": n_chars}
    )


# ---------------------------------------------------------------- quality

_STOPWORDS = ("the", "a", "of", "and", "to", "in", "is", "on", "for", "it")


def quality_cols(text: Column):
    """Deterministic quality features, all JVM-side (no UDF):
    punct_ratio, stopword_ratio, mean_word_len — rounded to 6dp so the
    DuckDB oracle hashes identically."""
    trimmed = F.trim(text)
    n_chars = F.length(trimmed).cast("double")
    n_punct = (
        n_chars - F.length(F.regexp_replace(trimmed, r"[^\w\s]", ""))
    ).cast("double")
    n_words = F.when(trimmed == "", F.lit(0)).otherwise(
        F.size(F.split(trimmed, r"\s+"))
    ).cast("double")
    stop_pattern = r"\b(" + "|".join(_STOPWORDS) + r")\b"
    n_stop = F.size(
        F.regexp_extract_all(F.lower(trimmed), F.lit(stop_pattern), 0)
    ).cast("double")
    safe = F.greatest(n_chars, F.lit(1.0))
    safe_w = F.greatest(n_words, F.lit(1.0))
    return (
        F.round(n_punct / safe, 6).alias("punct_ratio"),
        F.round(n_stop / safe_w, 6).alias("stopword_ratio"),
        F.round(
            F.length(F.regexp_replace(trimmed, r"\s+", "")).cast("double")
            / safe_w,
            6,
        ).alias("mean_word_len"),
    )


# ---------------------------------------------------------------- lang id

# per-language marker sets for the n-gram heuristic (public-knowledge
# stopword/charclass approach; deterministic, no model download)
_LANG_MARKERS = {
    "en": (" the ", " and ", " of ", " is "),
    "de": (" der ", " und ", " die ", " ist "),
    "fr": (" le ", " la ", " et ", " est "),
    "es": (" el ", " de la ", " que ", " es "),
}


# char-class ranges for the script-detection stage (codepoint intervals)
_CJK = (0x4E00, 0x9FFF)       # 一 .. 鿿
_KANA = (0x3040, 0x30FF)      # ぀ .. ヿ
_HANGUL = (0xAC00, 0xD7AF)    # 가 .. 힯
_CYRILLIC = (0x0400, 0x04FF)  # Ѐ .. ӿ


def classify_language_batch(texts) -> list:
    """Batch language-ID with zero per-character Python.

    Stage 1 (script detection) runs as ONE numpy pass over the utf-32 view
    of the batch's 400-char prefixes (vectorized range masks + segmented
    counts); stage 2 (stopword-marker voting) uses C-level ``str.count``
    per marker.  Deterministic tie-break by language code."""
    n_docs = len(texts)
    prefixes = [(t or "")[:400] for t in texts]
    joined = "\x00".join(prefixes)
    langs = [""] * n_docs
    if joined:
        # trailing sentinel keeps every reduceat index < len(cps)
        cps = np.frombuffer(
            (joined + "\x00").encode("utf-32-le"), dtype=np.uint32
        )
        lens = np.fromiter((len(p) for p in prefixes), dtype=np.int64,
                           count=n_docs)
        bounds = np.concatenate(([0], np.cumsum(lens + 1)[:-1]))
        # [start0, end0, start1, end1, ...] — segment sums land at the
        # even reduceat outputs; the odd outputs (separator gaps) drop
        seg_idx = np.empty(2 * n_docs, dtype=np.int64)
        seg_idx[0::2] = bounds
        seg_idx[1::2] = bounds + lens
        empty = lens == 0

        def seg_count(lo: int, hi: int) -> np.ndarray:
            # one reduceat over the bool mask: same exact counts as the
            # old astype(int64)+cumsum prefix-sum trick but without the
            # two full-length int64 temporaries (3x less memory traffic
            # on a ~100M-char batch).  reduceat at an empty segment
            # (start == end) returns mask[start], so zero those after.
            mask = (cps >= lo) & (cps <= hi)
            c = np.add.reduceat(mask, seg_idx, dtype=np.int64)[0::2]
            c[empty] = 0
            return c

        cjk = seg_count(*_CJK)
        kana = seg_count(*_KANA)
        hangul = seg_count(*_HANGUL)
        cyr = seg_count(*_CYRILLIC)
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

    marker_langs = sorted(_LANG_MARKERS)
    for i in range(n_docs):
        if langs[i]:
            continue
        padded = " " + (texts[i] or "")[:4000].lower() + " "
        best, best_n = "und", 0
        count = padded.count
        for lang in marker_langs:
            n = 0
            for m in _LANG_MARKERS[lang]:
                n += count(m)
            if n > best_n:
                best, best_n = lang, n
        langs[i] = best
    return langs


def lang_id_udf():
    """Arrow-batched language-ID: CJK/Cyrillic char classes first, then
    stopword-marker voting, deterministic tie-break by language code."""

    @F.pandas_udf(StringType())
    def _lang(batch: pd.Series) -> pd.Series:
        return pd.Series(classify_language_batch(batch.tolist()))

    return _lang


# ------------------------------------------------------------- fingerprint

_FP_BASE = np.uint64(1099511628211)      # FNV-ish polynomial base
_FP_OFFSET = np.uint64(14695981039346656037)


def fingerprint_batch(texts) -> np.ndarray:
    """fp(t) = ((sum_i cp_i * BASE^(n-1-i)) mod 2^64 + OFFSET) mod 2^63,
    for a WHOLE Arrow batch in one numpy pass (no per-document Python):
    one utf-32 encode of the joined batch, ONE shared powers table
    (cumprod to the max doc length; uint64 wrap-around gives mod 2^64 for
    free), a flat exponent vector (doc_len - 1 - offset, the same
    segmented construction as dedup's _batch_word_hashes), then a
    segmented ``np.add.reduceat``.  None/empty docs fingerprint to 0.
    Exactly replicable in DuckDB HUGEINT SQL (``fingerprint_oracle_sql``),
    which is the driver's oracle."""
    n_docs = len(texts)
    out = np.zeros(n_docs, dtype=np.int64)
    if n_docs == 0:
        return out
    strs = [(t or "") for t in texts]
    joined = "".join(strs)
    if not joined:
        return out
    cps = np.frombuffer(joined.encode("utf-32-le"), dtype=np.uint32
                        ).astype(np.uint64)
    lens = np.fromiter((len(t) for t in strs), dtype=np.int64, count=n_docs)
    present = np.flatnonzero(lens)
    plens = lens[present]
    with np.errstate(over="ignore"):
        pw = np.full(int(plens.max()), _FP_BASE, dtype=np.uint64)
        pw[0] = np.uint64(1)
        np.cumprod(pw, out=pw)  # BASE^0..BASE^(max-1), wrapping mod 2^64
        starts = np.cumsum(plens) - plens
        off = np.arange(cps.size, dtype=np.int64) - np.repeat(starts, plens)
        exp = np.repeat(plens, plens) - 1 - off
        terms = cps * pw[exp]
        h = np.add.reduceat(terms, starts) + _FP_OFFSET
    out[present] = (h & np.uint64(0x7FFFFFFFFFFFFFFF)).astype(np.int64)
    return out


def rolling_fingerprint(t) -> int:
    """Single-doc convenience wrapper over the batch kernel."""
    return int(fingerprint_batch([t])[0])


_TWO64 = 1 << 64


def fingerprint_oracle_sql(table: str = "documents", id_col: str = "doc_id",
                           text_col: str = "text") -> str:
    """DuckDB SQL computing ``rolling_fingerprint`` exactly: a recursive CTE
    materializes BASE^i mod 2^64; per-char terms reduce in HUGEINT.  Viable
    at oracle scale (chars x docs ops), never meant for the cluster path."""
    return f"""
        WITH RECURSIVE pw(i, v) AS (
          SELECT 0, CAST(1 AS HUGEINT)
          UNION ALL
          SELECT i + 1, (v * {int(_FP_BASE)}) % {_TWO64}::HUGEINT FROM pw
          WHERE i < (SELECT coalesce(max(length({text_col})), 1) FROM {table})
        ), pl AS (
          SELECT list(v ORDER BY i) AS l FROM pw
        )
        SELECT {id_col} AS doc_id,
               CAST(CASE WHEN {text_col} IS NULL OR length({text_col}) = 0
                 THEN 0
                 ELSE (list_sum(list_transform(range(length({text_col})), i ->
                          (CAST(unicode(substr({text_col},
                                 CAST(i + 1 AS INT), 1)) AS HUGEINT)
                           * pl.l[CAST(length({text_col}) - i AS INT)])
                          % {_TWO64}::HUGEINT))
                        % {_TWO64}::HUGEINT
                        + {int(_FP_OFFSET)}::HUGEINT)
                       % {_TWO64}::HUGEINT % {1 << 63}::HUGEINT
                 END AS BIGINT) AS fingerprint
        FROM {table}, pl
    """


def fingerprint_udf():
    """Arrow-batched rolling-hash fingerprint; int64 (63-bit) output.
    The whole batch vectorizes through ``fingerprint_batch`` — no
    per-document Python in the UDF body."""

    @F.pandas_udf(LongType())
    def _fp(batch: pd.Series) -> pd.Series:
        return pd.Series(fingerprint_batch(batch.tolist()))

    return _fp


def document_profile(df: DataFrame, id_col: str = "doc_id",
                     text_col: str = "text") -> DataFrame:
    """One-pass per-document profile: counts + quality + lang + fingerprint."""
    n_ws, n_bpe, n_chars = token_count_cols(F.col(text_col))
    punct, stop, mwl = quality_cols(F.col(text_col))
    return df.select(
        F.col(id_col),
        n_ws.alias("n_ws_tokens"),
        n_bpe.alias("n_bpe_tokens"),
        n_chars.alias("n_chars_calc"),
        punct,
        stop,
        mwl,
        lang_id_udf()(F.col(text_col)).alias("lang_pred"),
        fingerprint_udf()(F.col(text_col)).alias("fingerprint"),
    )


# ------------------------------------------------------- readability

def readability_cols(text: Column):
    """Flesch reading-ease count signals as exact integers:
    ``(n_sentences, n_words, n_syllables)``.

    The classic curation heuristic (C4 and friends gate on it) made
    deterministic: sentences = runs of ``[.!?]`` (floored at 1 so the
    ratio is total), words = whitespace tokens, syllables = vowel
    GROUPS ``[aeiouy]+`` over the lowercased text (the standard
    approximation; vowel-less tokens contribute 0 — documented, and
    identical in both engines).  Pure JVM regexp/size expressions —
    per-row map, zero shuffles.
    """
    trimmed = F.trim(text)
    n_words = F.when(trimmed == "", F.lit(0)).otherwise(
        F.size(F.split(trimmed, r"\s+"))
    ).cast("long")
    n_sent = F.greatest(
        F.lit(1),
        F.size(F.regexp_extract_all(text, F.lit(r"[.!?]+"), 0)),
    ).cast("long")
    n_syl = F.size(
        F.regexp_extract_all(F.lower(text), F.lit(r"[aeiouy]+"), 0)
    ).cast("long")
    return n_sent, n_words, n_syl


def with_readability(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Attach readability columns + the Flesch score in exact
    MILLI-units: ``206835 - (1015*W) div S - (84600*Y) div W`` —
    Flesch's ``206.835 - 1.015 W/S - 84.6 Y/W`` carried in integer
    division so the oracle hash is exact (NULL for word-less docs).
    The score expression references the count columns by name (integer
    div needs SQL ``div``), so counts are materialized first.
    """
    n_sent, n_words, n_syl = readability_cols(F.col(text_col))
    out = df.withColumns(
        {"_rd_s": n_sent, "_rd_w": n_words, "_rd_y": n_syl}
    )
    flesch = F.when(
        F.col("_rd_w") == 0, F.lit(None).cast("long")
    ).otherwise(
        F.lit(206835)
        - F.expr("(1015 * _rd_w) div _rd_s")
        - F.expr("(84600 * _rd_y) div _rd_w")
    )
    return out.withColumn("flesch_milli", flesch).withColumnsRenamed(
        {"_rd_s": "n_sentences", "_rd_w": "n_words", "_rd_y": "n_syllables"}
    )


def readability_oracle_exprs(text_expr: str = "text") -> dict:
    """DuckDB expressions replicating :func:`with_readability`."""
    trimmed = f"trim({text_expr})"
    words = (
        f"CAST(CASE WHEN {trimmed} = '' THEN 0 ELSE"
        f" len(regexp_split_to_array({trimmed}, '\\s+')) END AS BIGINT)"
    )
    sents = (
        f"CAST(GREATEST(1, len(regexp_extract_all({text_expr},"
        f" '[.!?]+'))) AS BIGINT)"
    )
    syls = (
        f"CAST(len(regexp_extract_all(lower({text_expr}),"
        f" '[aeiouy]+')) AS BIGINT)"
    )
    flesch = (
        f"CASE WHEN ({words}) = 0 THEN NULL ELSE"
        f" 206835 - (1015 * ({words})) // ({sents})"
        f" - (84600 * ({syls})) // ({words}) END"
    )
    return {
        "n_sentences": sents,
        "n_words": words,
        "n_syllables": syls,
        "flesch_milli": flesch,
    }


# ------------------------------------------------ lexical diversity (TTR)

def with_lexical_diversity(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Type-token ratio and hapax-legomenon ratio, exact integers.

    Lexical diversity is a standard curation signal (low TTR = template /
    boilerplate / keyword-stuffed spam; high hapax share on long docs =
    OCR noise or gibberish).  Computed WITHOUT a token-stream shuffle:
    one ``aggregate()`` fold over the per-row SORTED token array counts
    distinct types and run-lengths-of-1 (hapaxes) in a single O(n log n)
    per-row pass that stays inside whole-stage codegen — at 100 TB this
    is a map-only stage, vs the explode + two-level groupBy shape that
    would shuffle every token.  The DuckDB oracle deliberately uses the
    OTHER algorithm (unnest + GROUP BY) so the two engines cross-check
    semantics, not a shared implementation.

    Output columns: ``n_tokens, n_types, n_hapax, ttr_bp, hapax_bp``
    (basis points, exact integer div; 0 for token-less docs, NULL for
    NULL text).
    """
    from deepseek_ocr_rs_spark.operators.rebalance import rebalance_for_arrow

    # the sort+fold per row is CPU-bound; spread a single-split local
    # scan over the session's cores (no-op at cluster scale)
    df = rebalance_for_arrow(df)
    toks = F.when(
        F.trim(F.col(text_col)) == "", F.array().cast("array<string>")
    ).otherwise(F.split(F.trim(F.lower(F.col(text_col))), r"\s+"))
    out = df.withColumn("_ld_toks", toks)
    fold = """
    aggregate(
      array_sort(_ld_toks),
      struct(CAST(NULL AS STRING) AS prev, CAST(0 AS BIGINT) AS types,
             CAST(0 AS BIGINT) AS hapax, CAST(0 AS BIGINT) AS run),
      (acc, x) -> IF(acc.prev IS NULL OR x != acc.prev,
        struct(x AS prev, acc.types + 1L AS types,
               acc.hapax + IF(acc.run = 1L, 1L, 0L) AS hapax, 1L AS run),
        struct(x AS prev, acc.types AS types, acc.hapax AS hapax,
               acc.run + 1L AS run)),
      acc -> struct(acc.types AS types,
                    acc.hapax + IF(acc.run = 1L, 1L, 0L) AS hapax))
    """
    out = (
        out.withColumn("_ld_agg", F.expr(fold))
        .withColumn("n_tokens", F.size("_ld_toks").cast("long"))
        .withColumn("n_types", F.col("_ld_agg.types"))
        .withColumn("n_hapax", F.col("_ld_agg.hapax"))
    )
    def _bp(num: str) -> Column:
        return F.when(F.col("n_tokens") == 0, F.lit(0).cast("long")).otherwise(
            F.expr(f"(10000 * {num}) div n_tokens")
        )
    return (
        out.withColumn("ttr_bp", _bp("n_types"))
        .withColumn("hapax_bp", _bp("n_hapax"))
        .drop("_ld_toks", "_ld_agg")
    )


def lexical_diversity_oracle_sql(docs_sql: str, id_col: str = "doc_id",
                                 text_col: str = "text") -> str:
    """DuckDB replica of :func:`with_lexical_diversity` by the OTHER
    algorithm (unnest + GROUP BY); ``ld_``-prefixed CTEs."""
    return f"""
WITH ld_docs AS ({docs_sql}),
ld_tok AS (
  SELECT {id_col} AS ld_id,
         unnest(regexp_split_to_array(trim(lower({text_col})), '\\s+'))
           AS tok
  FROM ld_docs
  WHERE {text_col} IS NOT NULL AND trim({text_col}) <> ''
),
ld_counts AS (
  SELECT ld_id, tok, COUNT(*) AS c FROM ld_tok GROUP BY ld_id, tok
),
ld_stats AS (
  SELECT ld_id,
         CAST(SUM(c) AS BIGINT) AS n_tokens,
         COUNT(*) AS n_types,
         CAST(SUM(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_hapax
  FROM ld_counts GROUP BY ld_id
)
SELECT d.{id_col},
       CASE WHEN d.{text_col} IS NULL THEN NULL
            ELSE COALESCE(s.n_tokens, 0) END AS n_tokens,
       CASE WHEN d.{text_col} IS NULL THEN NULL
            ELSE COALESCE(s.n_types, 0) END AS n_types,
       CASE WHEN d.{text_col} IS NULL THEN NULL
            ELSE COALESCE(s.n_hapax, 0) END AS n_hapax,
       CASE WHEN d.{text_col} IS NULL THEN NULL
            WHEN COALESCE(s.n_tokens, 0) = 0 THEN 0
            ELSE (10000 * s.n_types) // s.n_tokens END AS ttr_bp,
       CASE WHEN d.{text_col} IS NULL THEN NULL
            WHEN COALESCE(s.n_tokens, 0) = 0 THEN 0
            ELSE (10000 * s.n_hapax) // s.n_tokens END AS hapax_bp
FROM ld_docs d LEFT JOIN ld_stats s ON d.{id_col} = s.ld_id
"""


# ------------------------------------------------ code-switching detection


def code_switching(
    segments: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-document language-consistency rollup over pre-segmented text:
    ``segments`` has one row per (document, segment); each segment is
    language-identified by the REAL Arrow-batched classifier
    (:func:`lang_id_udf`) and the rollup reports

      (id, n_segments, n_langs, major_lang, major_bp)

    where ``major_lang`` is the most frequent segment language (ties
    broken by SMALLEST language code — the classifier's own tie-break
    discipline) and ``major_bp`` its share in integer basis points
    (10000 * n_major div n_segments, floor).  Mixed-language pages
    (code-switching, boilerplate in a second language, wrong-language
    embeds) are the FineWeb/CCNet-class filter target: a monolingual
    page scores 10000, a 50/50 bilingual page 5000.

    100 TB plan shape: ONE ArrowEvalPython stage (the shared lang-ID
    batch kernel, no per-row Python) feeding two hash aggregates —
    (id, lang) counts, then the per-id argmax via min(struct(-n, lang))
    (the t_best_supplier argmin discipline, no window, no self-join).
    """
    from deepseek_ocr_rs_spark.operators.rebalance import rebalance_for_arrow

    # the classifier batch kernel inherits the scan's split count; a
    # single-split local scan would starve it (no-op at cluster scale)
    segments = rebalance_for_arrow(segments)
    seg_langs = segments.select(
        F.col(id_col), lang_id_udf()(F.col(text_col)).alias("lang")
    )
    per_lang = seg_langs.groupBy(id_col, "lang").agg(
        F.count(F.lit(1)).alias("n_seg")
    )
    return (
        per_lang.groupBy(id_col)
        .agg(
            F.sum("n_seg").cast("long").alias("n_segments"),
            F.count(F.lit(1)).cast("long").alias("n_langs"),
            F.min(F.struct((-F.col("n_seg")).alias("neg"), "lang")).alias(
                "_m"
            ),
        )
        .select(
            F.col(id_col),
            "n_segments",
            "n_langs",
            F.col("_m.lang").alias("major_lang"),
            F.expr("cast((10000 * -_m.neg) div n_segments as bigint)").alias(
                "major_bp"
            ),
        )
    )
