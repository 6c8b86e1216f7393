"""PII redaction over a document corpus (C4/FineWeb-style scrubbing).

Every production training-data pipeline scrubs personally identifying
strings before packing: emails, US-style SSNs, IPv4 addresses, and phone
numbers are replaced with typed placeholder tokens, and the per-document
redaction counts are kept as curation metadata (a doc with hundreds of
redactions is usually a scraped directory page, not prose — downstream
quality filters key on the counts).

The reference's discipline here is exact text normalization before
comparison (crates/core/src/streaming.rs:43-62 keeps text byte-exact
through the pipeline); the analog for a scrubber is that redaction must be
a pure deterministic string function so the same document always produces
the same scrubbed bytes on every engine and every retry.

Design for 100 TB:
- Entirely JVM-side ``regexp_replace`` / ``regexp_extract_all`` chains —
  whole-stage codegen, zero Python, zero shuffle, full pushdown: a pure
  per-row map at any corpus size.
- Patterns are written in the common Java-regex / RE2 subset (character
  classes, bounded repetition, ASCII ``\\b``) so the DuckDB oracle
  (``redaction_oracle_exprs``) is the *identical* automaton, and the
  scrubbed text hashes equal cross-engine.
- Counts are taken on the text as it existed *before that pattern's own
  replacement* (patterns are applied in a fixed sequence), so
  ``n_<type>`` always equals the number of substitutions actually made.
"""

from __future__ import annotations

from typing import List, Tuple

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# (name, pattern, replacement) applied IN THIS ORDER.  Email first (emails
# contain dots and digits that the later patterns could chew on), then SSN
# (3-2-4 digits), then IPv4 (which a dotted phone must not shadow), then
# phone (3-3-4 digits with - or . separators).
PII_PATTERNS: List[Tuple[str, str, str]] = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ssn", r"\b[0-9]{3}-[0-9]{2}-[0-9]{4}\b", "<SSN>"),
    ("ipv4", r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b", "<IP>"),
    ("phone", r"\b[0-9]{3}[-.][0-9]{3}[-.][0-9]{4}\b", "<PHONE>"),
]


def redact_pii(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Add ``text_redacted`` plus one ``n_<type>`` count per PII pattern.

    Pure JVM expression chain (no UDF): each pattern counts its matches on
    the running text, then replaces them, and the next pattern sees the
    already-scrubbed text.  Placeholders contain no digits or ``@``, so
    redaction is idempotent: ``redact(redact(x)) == redact(x)``.
    """
    running: Column = F.col(text_col)
    counts = {}
    for name, pat, repl in PII_PATTERNS:
        counts[f"n_{name}"] = F.size(
            F.regexp_extract_all(running, F.lit(pat), 0)
        ).cast("long")
        running = F.regexp_replace(running, pat, repl)
    return df.withColumns({**counts, "text_redacted": running})


def redaction_oracle_exprs(text_expr: str = "text") -> Tuple[str, List[str]]:
    """DuckDB SQL replicating ``redact_pii`` exactly.

    Returns ``(redacted_text_expr, [count_expr AS n_<type>, ...])`` built
    from the same pattern sequence; DuckDB's RE2 and Spark's Java regex
    agree on this ASCII subset, and both count on the pre-replacement text
    of each stage.
    """
    running = text_expr
    count_exprs: List[str] = []
    for name, pat, repl in PII_PATTERNS:
        sql_pat = pat
        count_exprs.append(
            f"CAST(len(regexp_extract_all({running}, '{sql_pat}')) AS BIGINT)"
            f" AS n_{name}"
        )
        running = f"regexp_replace({running}, '{sql_pat}', '{repl}', 'g')"
    return running, count_exprs
