"""Encoding-damage (mojibake) detection over document text.

A web-scale training corpus always contains double-decoded text — UTF-8
bytes read as Latin-1/Windows-1252 ("cafÃ©", "donâ€™t"), raw C1 control
codepoints, and U+FFFD replacement characters from lossy transcoding.
Curation pipelines (ftfy, CCNet's "bad unicode" gate) score and drop such
documents before training.  The reference's tokenizer is byte-exact UTF-8
(``crates/server/src/conversation.rs`` renders templates over validated
UTF-8 strings), so any mojibake in a transcript corpus is upstream damage
worth surfacing — this operator makes that gate a first-class, exactly
testable query.

Signal families (each an exact regex-match COUNT, not a heuristic score):

  n_repl    U+FFFD replacement characters — a transcoder already gave up.
  n_a_hat   'Ã' followed by a char in U+0080-U+00BF: the signature of a
            two-byte UTF-8 sequence (lead byte 0xC3) decoded as Latin-1
            ('é' -> 'Ã©', 'ü' -> 'Ã¼', ...).
  n_a_circ  'â€' pairs: a three-byte UTF-8 punctuation sequence (lead
            0xE2 0x80) decoded as Windows-1252 ('’' -> 'â€™', '—' ->
            'â€”', ...).
  n_c1      raw C1 control codepoints U+0080-U+009F — valid in no text
            encoding's repertoire; classic Latin-1-decode residue.

The patterns are built from LITERAL codepoints (Python ``\\u`` escapes
resolved before either engine sees the pattern), so Java regex (Spark)
and RE2 (DuckDB) interpret identical character ranges — no escape-syntax
divergence between engines.

Verdict: ``mojibake_bp`` — damaged-signal count per 10,000 codepoints in
integer basis points (``div``, exact), and ``is_mojibake`` (any signal).

Scale posture: a per-row projection — no shuffle, whole-stage codegen,
runs inside whatever scan partitioning the caller already has.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "MOJIBAKE_PATTERNS",
    "with_mojibake_signals",
    "mojibake_oracle_exprs",
]

# Literal-codepoint patterns shared verbatim by both engines.
MOJIBAKE_PATTERNS: dict[str, str] = {
    "n_repl": "\ufffd",
    "n_a_hat": "\u00c3[\u0080-\u00bf]",
    "n_a_circ": "\u00e2\u20ac",
    "n_c1": "[\u0080-\u009f]",
}

_SIGNALS = list(MOJIBAKE_PATTERNS)


def _count(text: Column, pattern: str) -> Column:
    return F.size(F.regexp_extract_all(text, F.lit(pattern), 0)).cast("long")


def with_mojibake_signals(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Attach the four signal counts plus ``mojibake_bp`` /
    ``is_mojibake`` (see module docstring).  ``mojibake_bp`` is 0 for
    empty text (nothing to damage); NULL text yields NULL signals, the
    same NULL-in/NULL-out both engines apply."""
    text = F.col(text_col)
    out = df.withColumns(
        {name: _count(text, pat) for name, pat in MOJIBAKE_PATTERNS.items()}
    )
    total = sum(F.col(n) for n in _SIGNALS)
    n_chars = F.length(text)
    bp = F.when(n_chars == 0, F.lit(0).cast("long")).otherwise(
        F.expr(
            "(10000 * ({total})) div char_length({c})".format(
                total=" + ".join(_SIGNALS), c=text_col
            )
        )
    )
    return out.withColumn("mojibake_bp", bp).withColumn(
        "is_mojibake", total > 0
    )


def mojibake_oracle_exprs(text_expr: str = "text") -> dict:
    """DuckDB expressions replicating :func:`with_mojibake_signals`.

    RE2 receives the SAME literal-codepoint patterns; counts use
    ``len(regexp_extract_all(...))`` and the rate uses integer ``//``.
    """
    counts = {
        name: (
            f"CAST(len(regexp_extract_all({text_expr},"
            f" '{pat}')) AS BIGINT)"
        )
        for name, pat in MOJIBAKE_PATTERNS.items()
    }
    total = " + ".join(f"({c})" for c in counts.values())
    bp = (
        f"CASE WHEN length({text_expr}) = 0 THEN 0"
        f" ELSE (10000 * ({total})) // length({text_expr}) END"
    )
    return {
        **counts,
        "mojibake_bp": bp,
        "is_mojibake": f"({total}) > 0",
    }
