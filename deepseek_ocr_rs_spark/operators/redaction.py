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

import pandas as pd
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

    Each pattern counts its matches on the running text, then replaces
    them, and the next pattern sees the already-scrubbed text.
    Placeholders contain no digits or ``@``, so redaction is idempotent:
    ``redact(redact(x)) == redact(x)``.

    r06 kernel: the JVM expression chain evaluated the k-th count over
    the (k-1)-deep nested replace tree — O(P^2) regex passes per row,
    4.7 s at sf1.0.  One struct-returning Arrow UDF now runs the chain
    sequentially in Python (each regex once per row); the patterns are
    plain ASCII classes on which Java and Python `re` agree, and the
    parity suite tests/test_redaction.py pins behavior.  NULL text
    yields NULL counts and NULL redacted text, matching the old
    NULL-propagating expressions.
    """
    import re

    compiled = [
        (name, re.compile(pat), repl) for name, pat, repl in PII_PATTERNS
    ]
    fields = ", ".join(f"n_{name} long" for name, _, _ in PII_PATTERNS)

    @F.pandas_udf(f"{fields}, text_redacted string")
    def _scrub(s: pd.Series) -> pd.DataFrame:
        rows = []
        for t in s:
            if t is None:
                rows.append((None,) * (len(compiled) + 1))
                continue
            running = t
            rec = []
            for _, rx, repl in compiled:
                rec.append(len(rx.findall(running)))
                running = rx.sub(repl, running)
            rec.append(running)
            rows.append(tuple(rec))
        return pd.DataFrame(
            rows,
            columns=[f"n_{n}" for n, _, _ in compiled] + ["text_redacted"],
        )

    from deepseek_ocr_rs_spark.operators.rebalance import (
        rebalance_for_arrow,
    )

    out = rebalance_for_arrow(df).withColumn("_pii", _scrub(F.col(text_col)))
    for name, _, _ in PII_PATTERNS:
        out = out.withColumn(f"n_{name}", F.col(f"_pii.n_{name}"))
    return out.withColumn(
        "text_redacted", F.col("_pii.text_redacted")
    ).drop("_pii")


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


# ----------------------------------------------------- Luhn card scrub

CARD_CANDIDATE_RE = r"\b[0-9]{13,19}\b"


def luhn_sum_col(c: Column) -> Column:
    """Luhn checksum of a digit-string Column, as a pure JVM expression:
    fold right-to-left, doubling every second digit and folding >9 back
    (2d - 9).  No UDF — transform-with-index over the reversed chars."""
    return F.aggregate(
        F.transform(
            F.split(F.reverse(c), ""),
            lambda ch, i: F.when(
                i % 2 == 1,
                F.when(
                    (F.ascii(ch) - 48) * 2 > 9, (F.ascii(ch) - 48) * 2 - 9
                ).otherwise((F.ascii(ch) - 48) * 2),
            ).otherwise(F.ascii(ch) - 48),
        ),
        F.lit(0),
        lambda acc, d: acc + d,
    )


def luhn_sum_sql(expr: str) -> str:
    """DuckDB replica of :func:`luhn_sum_col` (range + substr fold)."""
    # the lambda variable is deliberately obscure: DuckDB lambda vars
    # SHADOW outer columns, so a plain "i ->" silently corrupts any
    # caller whose expr references a column named i (caught live by
    # tests/test_redaction_sharding_tfidf.py cross-engine check)
    v = "luhn_i_"
    return (
        f"list_sum(list_transform(range(0, length({expr})), {v} -> "
        f"CASE WHEN {v} % 2 = 1 THEN "
        f"CASE WHEN (ascii(substr(reverse({expr}), ({v} + 1)::INTEGER, 1))"
        f" - 48) * 2 > 9 "
        f"THEN (ascii(substr(reverse({expr}), ({v} + 1)::INTEGER, 1))"
        f" - 48) * 2 - 9 "
        f"ELSE (ascii(substr(reverse({expr}), ({v} + 1)::INTEGER, 1))"
        f" - 48) * 2 END "
        f"ELSE ascii(substr(reverse({expr}), ({v} + 1)::INTEGER, 1)) - 48"
        f" END))"
    )


def luhn_check_digit_col(base: Column) -> Column:
    """The digit making ``base || digit`` Luhn-valid (both engines use
    the append-'0' trick: sum the padded string, take (10 - s) mod 10)."""
    s = luhn_sum_col(F.concat(base, F.lit("0")))
    return F.pmod(F.lit(10) - F.pmod(s, F.lit(10)), F.lit(10))


def luhn_check_digit_sql(base_expr: str) -> str:
    s = luhn_sum_sql(f"({base_expr} || '0')")
    return f"((10 - ({s}) % 10) % 10)"


def luhn_scrub(
    df: DataFrame, text_col: str = "text", token: str = "<CARD>"
) -> DataFrame:
    """Detect candidate payment-card numbers (standalone 13-19 digit
    runs) and scrub the LUHN-VALID ones — the check that separates card
    numbers from order ids / timestamps, which a bare digit regex (the
    redact_pii tier) cannot.  Adds ``n_card_candidates``,
    ``n_valid_cards`` and ``text_cards_scrubbed``.

    All JVM higher-order expressions (split/transform/filter/aggregate)
    — zero Python, zero shuffle, a pure per-row map at any corpus size.
    The candidate regex uses RE2-safe ``\\b`` (no lookarounds, which the
    DuckDB oracle's RE2 lacks): digit runs embedded in longer digit runs
    or glued to letters are not candidates, matching both engines.
    Scrubbing folds ``replace`` over the valid candidates, so repeated
    occurrences of one card all scrub; the token contains no digits, so
    the scrub is idempotent.
    """
    cands = F.regexp_extract_all(
        F.col(text_col), F.lit(CARD_CANDIDATE_RE), 0
    )
    valid = F.filter(cands, lambda c: F.pmod(luhn_sum_col(c), F.lit(10)) == 0)
    return (
        df.withColumn("_cands", cands)
        .withColumn("_valid", valid)
        .withColumn("n_card_candidates", F.size("_cands").cast("long"))
        .withColumn("n_valid_cards", F.size("_valid").cast("long"))
        .withColumn(
            "text_cards_scrubbed",
            F.aggregate(
                F.col("_valid"),
                F.col(text_col),
                lambda acc, c: F.replace(acc, c, F.lit(token)),
            ),
        )
        .drop("_cands", "_valid")
    )


def luhn_scrub_oracle_exprs(
    text_expr: str = "text", token: str = "<CARD>"
) -> dict:
    """DuckDB expressions mirroring :func:`luhn_scrub` over
    ``text_expr``: keys n_card_candidates, n_valid_cards, scrubbed."""
    cands = f"regexp_extract_all({text_expr}, '{CARD_CANDIDATE_RE}')"
    valid = (
        f"list_filter({cands}, luhn_c_ ->"
        f" ({luhn_sum_sql('luhn_c_')}) % 10 = 0)"
    )
    scrubbed = (
        f"list_reduce(list_prepend({text_expr}, {valid}), "
        f"(luhn_a_, luhn_b_) -> replace(luhn_a_, luhn_b_, '{token}'))"
    )
    return {
        "n_card_candidates": f"CAST(len({cands}) AS BIGINT)",
        "n_valid_cards": f"CAST(len({valid}) AS BIGINT)",
        "scrubbed": scrubbed,
    }


# ------------------------------------------------- credential scrubbing

# (name, pattern, replacement) applied IN THIS ORDER — the code-corpus
# counterpart of PII_PATTERNS: leaked credentials in scraped repos /
# pastebins / notebooks, the scrub every code-data pipeline runs before
# training (public pattern corpus: the prefixes are the providers' own
# documented formats — AKIA..., ghp_..., xox?-..., AIza...; PEM blocks
# and JWTs are self-describing; the trailing hex rule is the
# deterministic charset+length approximation of the usual "high
# entropy string" heuristic, so the whole chain stays float-free and
# cross-engine exact).  PEM first (its body could contain anything),
# then JWT (dotted base64url), then the prefixed provider keys, then
# the bare-hex fallback LAST so provider formats win attribution.
SECRET_PATTERNS: List[Tuple[str, str, str]] = [
    (
        "pem",
        r"-----BEGIN [A-Z ]*PRIVATE KEY-----[\s\S]*?"
        r"-----END [A-Z ]*PRIVATE KEY-----",
        "<PEM_KEY>",
    ),
    (
        "jwt",
        r"\beyJ[A-Za-z0-9_-]{10,}\.[A-Za-z0-9_-]{10,}\.[A-Za-z0-9_-]{5,}",
        "<JWT>",
    ),
    ("aws", r"\bAKIA[0-9A-Z]{16}\b", "<AWS_KEY>"),
    ("github", r"\bghp_[A-Za-z0-9]{36}\b", "<GH_TOKEN>"),
    ("slack", r"\bxox[abprs]-[A-Za-z0-9-]{10,}\b", "<SLACK_TOKEN>"),
    ("gcp", r"\bAIza[0-9A-Za-z_-]{35}\b", "<GCP_KEY>"),
    ("hex", r"\b[0-9a-f]{40,64}\b", "<HEX_SECRET>"),
]


def scrub_secrets(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Add ``text_scrubbed`` plus one ``n_<type>`` count per credential
    pattern — same running-text/count-before-replace contract as
    ``redact_pii`` (placeholders match no pattern, so the scrub is
    idempotent).  Pure JVM regexp chain: shuffle-free per-row map."""
    from deepseek_ocr_rs_spark.operators.rebalance import rebalance_for_arrow

    # the regexp chain is CPU-bound per row; a single-split local scan
    # would run it on one core (no-op at cluster scale)
    df = rebalance_for_arrow(df)
    running: Column = F.col(text_col)
    counts = {}
    for name, pat, repl in SECRET_PATTERNS:
        counts[f"n_{name}"] = F.size(
            F.regexp_extract_all(running, F.lit(pat), 0)
        ).cast("long")
        running = F.regexp_replace(running, pat, repl)
    return df.withColumns({**counts, "text_scrubbed": running})


def secrets_oracle_exprs(text_expr: str = "text") -> Tuple[str, List[str]]:
    """DuckDB SQL replicating ``scrub_secrets`` exactly (same pattern
    sequence; the patterns sit in the shared Java-regex / RE2 subset —
    lazy quantifiers and ASCII word boundaries included)."""
    running = text_expr
    count_exprs: List[str] = []
    for name, pat, repl in SECRET_PATTERNS:
        sql_pat = pat.replace("'", "''")
        count_exprs.append(
            f"CAST(len(regexp_extract_all({running}, '{sql_pat}')) AS BIGINT)"
            f" AS n_{name}"
        )
        running = f"regexp_replace({running}, '{sql_pat}', '{repl}', 'g')"
    return running, count_exprs
