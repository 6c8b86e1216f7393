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


def lang_id_udf():
    """Arrow-batched language-ID: CJK/Cyrillic char classes first, then
    stopword-marker voting, deterministic tie-break by language code."""

    @F.pandas_udf(StringType())
    def _lang(batch: pd.Series) -> pd.Series:
        import pandas as pd

        def classify(t):
            if not t:
                return "und"
            sample = t[:4000]
            cjk = sum(1 for c in sample[:400] if "一" <= c <= "鿿")
            if cjk > len(sample[:400]) * 0.2:
                return "zh"
            kana = sum(1 for c in sample[:400] if "぀" <= c <= "ヿ")
            if kana > 0:
                return "ja"
            hangul = sum(1 for c in sample[:400] if "가" <= c <= "힯")
            if hangul > 0:
                return "ko"
            cyr = sum(1 for c in sample[:400] if "Ѐ" <= c <= "ӿ")
            if cyr > len(sample[:400]) * 0.2:
                return "ru"
            padded = " " + sample.lower() + " "
            best, best_n = "und", 0
            for lang in sorted(_LANG_MARKERS):
                n = sum(padded.count(m) for m in _LANG_MARKERS[lang])
                if n > best_n:
                    best, best_n = lang, n
            return best

        return batch.map(classify)

    return _lang


# ------------------------------------------------------------- fingerprint

_FP_BASE = np.uint64(1099511628211)      # FNV-ish polynomial base
_FP_OFFSET = np.uint64(14695981039346656037)


def rolling_fingerprint(t) -> int:
    """fp(t) = (sum_i byte_i * BASE^(n-1-i)) mod 2^64, masked to 63 bits.

    Additive polynomial rolling hash — fully vectorized (one numpy cumprod +
    dot per document, uint64 wrap-around gives the mod for free)."""
    if t is None:
        return 0
    b = np.frombuffer(t.encode("utf-8"), dtype=np.uint8).astype(np.uint64)
    n = b.size
    if n == 0:
        return 0
    with np.errstate(over="ignore"):
        p = np.full(n, _FP_BASE, dtype=np.uint64)
        p[0] = np.uint64(1)
        powers = np.cumprod(p)  # BASE^0..BASE^(n-1), wrapping mod 2^64
        h = np.sum(b * powers[::-1], dtype=np.uint64) + _FP_OFFSET
    return int(h & np.uint64(0x7FFFFFFFFFFFFFFF))


def fingerprint_udf():
    """Arrow-batched rolling-hash fingerprint; int64 (63-bit) output."""

    @F.pandas_udf(LongType())
    def _fp(batch: pd.Series) -> pd.Series:
        return batch.map(rolling_fingerprint)

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
