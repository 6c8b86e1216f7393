"""Unicode script profiling: which writing systems a document mixes.

Language-ID models answer "which language"; script profiling answers
the cheaper, earlier question "which WRITING SYSTEMS, in what
proportion" — the multilingual-curation signal that routes documents
to per-script tokenizer branches, flags transliteration/mojibake
mixtures the lang-ID kernel mislabels, and feeds the per-script
corpus card.  Pure codepoint-range arithmetic (the public Unicode
block assignments): no model, no Python, cross-engine exact.

Per document: codepoint counts for Latin, Cyrillic (U+0400-04FF),
CJK (Han U+4E00-9FFF + kana U+3040-30FF), Arabic (U+0600-06FF), and
Greek (U+0370-03FF); ``n_other_letters`` is the remaining \\p{L}
mass (floored at 0 — the named ranges contain a few combining marks
that are not letters); ``major_script`` is the largest bucket with a
fixed priority tie-break, ``major_bp`` its floor-bp share.

Counting is ``length(s) - length(regexp_replace(s, class, ''))`` —
both engines count BMP codepoints identically (Spark length() is
UTF-16 units, DuckDB's is codepoints; they agree on the Basic
Multilingual Plane, and every range above is BMP — supplementary-
plane scripts would need a codepoint-explode variant, documented
bound).

100 TB plan shape: a pure per-row projection — no shuffle, no
Python, whole-stage codegen throughout.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["script_profile", "script_profile_oracle_sql"]

# (name, regex character class) — shared Java/RE2 syntax
SCRIPT_CLASSES = [
    ("latin", "[A-Za-z]"),
    ("cyrillic", "[\\x{0400}-\\x{04FF}]"),
    ("cjk", "[\\x{3040}-\\x{30FF}\\x{4E00}-\\x{9FFF}]"),
    ("arabic", "[\\x{0600}-\\x{06FF}]"),
    ("greek", "[\\x{0370}-\\x{03FF}]"),
]


def _range_count(col: Column, cls: str) -> Column:
    return (
        F.length(col) - F.length(F.regexp_replace(col, cls, ""))
    ).cast("long")


def script_profile(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(id, n_latin, n_cyrillic, n_cjk, n_arabic, n_greek,
    n_other_letters, major_script, major_bp) per document."""
    from deepseek_ocr_rs_spark.operators.rebalance import rebalance_for_arrow

    # per-codepoint regexp counting is CPU-bound; spread a single-split
    # local scan over the session's cores (no-op at cluster scale)
    df = rebalance_for_arrow(df)
    t = F.col(text_col)
    counts = {
        f"n_{name}": _range_count(t, cls) for name, cls in SCRIPT_CLASSES
    }
    letters = _range_count(t, "\\p{L}")
    out = df.select(F.col(id_col), t.alias("_t"), *(
        c.alias(n) for n, c in counts.items()
    )).withColumn(
        "n_other_letters",
        F.greatest(
            F.lit(0).cast("long"),
            _range_count(F.col("_t"), "\\p{L}")
            - sum(F.col(f"n_{n}") for n, _ in SCRIPT_CLASSES),
        ),
    )
    names = [n for n, _ in SCRIPT_CLASSES] + ["other_letters"]
    top = F.greatest(*[F.col(f"n_{n}") for n in names])
    major = F.lit("none")
    for n in reversed(names):
        major = F.when(
            (top > 0) & (F.col(f"n_{n}") == top), F.lit(n)
        ).otherwise(major)
    denom = sum(F.col(f"n_{n}") for n in names)
    return out.select(
        id_col,
        *[F.col(f"n_{n}") for n in names],
        major.alias("major_script"),
        F.expr(
            "cast((10000 * greatest(n_latin, n_cyrillic, n_cjk, n_arabic,"
            " n_greek, n_other_letters)) div nullif(n_latin + n_cyrillic"
            " + n_cjk + n_arabic + n_greek + n_other_letters, 0)"
            " as bigint)"
        ).alias("major_bp"),
    )


def script_profile_oracle_sql(
    table: str, id_col: str = "doc_id", text_col: str = "text"
) -> str:
    """DuckDB SQL replicating ``script_profile`` exactly (same
    codepoint classes, same priority tie-break, same floor-bp)."""
    cnt = {
        name: (
            f"CAST(length({text_col}) - length(regexp_replace("
            f"{text_col}, '{cls}', '', 'g')) AS BIGINT)"
        )
        for name, cls in SCRIPT_CLASSES
    }
    letters = (
        f"CAST(length({text_col}) - length(regexp_replace("
        f"{text_col}, '\\p{{L}}', '', 'g')) AS BIGINT)"
    )
    names = [n for n, _ in SCRIPT_CLASSES] + ["other_letters"]
    cols = ", ".join(f"{cnt[n]} AS n_{n}" for n, _ in SCRIPT_CLASSES)
    top = "greatest(" + ", ".join(f"n_{n}" for n in names) + ")"
    denom = " + ".join(f"n_{n}" for n in names)
    major = "CASE "
    for n in names:
        major += f"WHEN {top} > 0 AND n_{n} = {top} THEN '{n}' "
    major += "ELSE 'none' END"
    return f"""
        WITH usp_c AS (
          SELECT {id_col}, {cols},
                 greatest(CAST(0 AS BIGINT),
                   {letters} - ({" + ".join(
                       f"{cnt[n]}" for n, _ in SCRIPT_CLASSES)}))
                   AS n_other_letters
          FROM {table}
        )
        SELECT {id_col},
               {", ".join(f"n_{n}" for n in names)},
               {major} AS major_script,
               CAST(10000 * {top} // nullif({denom}, 0) AS BIGINT)
                 AS major_bp
        FROM usp_c
    """
