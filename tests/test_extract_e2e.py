"""End-to-end golden-fixture gate (t1 smoke tier, FIXTURES.md §5).

Mirrors the reference's strict cross-engine gate
(benchsuite/orchestrator.py:456-521): engine output joined to the golden
fixtures on (conv_id, turn_idx); 100% per-turn text equality required, with
earliest-divergence reporting on mismatch (benchsuite/common.py:99-107).
"""

import pytest
from pyspark.sql import functions as F

from deepseek_ocr_rs_spark.functions.normalize import earliest_divergence
from deepseek_ocr_rs_spark.operators.extract import extract_turns, reassemble
from deepseek_ocr_rs_spark.sources.transcripts import generate_local

N_CONVS = 60  # ~600 turns; a skewed conv included via skew_every=50
SEED = 42


@pytest.fixture(scope="module")
def corpus(spark):
    transcripts, fixtures = generate_local(
        spark, N_CONVS, seed=SEED, skew_every=50, skew_turns=120
    )
    return transcripts.cache(), fixtures.cache()


def _report_mismatches(rows, col):
    lines = []
    for r in rows[:5]:
        div = earliest_divergence(r["actual"] or "", r["expected"] or "")
        lines.append(
            f"({r['conv_id']}, {r['turn_idx']}) {col} diverges at char {div}: "
            f"actual={((r['actual'] or '')[max(0, (div or 0) - 20):(div or 0) + 40])!r} "
            f"expected={((r['expected'] or '')[max(0, (div or 0) - 20):(div or 0) + 40])!r}"
        )
    return "\n".join(lines)


def test_full_fixture_equality(spark, corpus):
    transcripts, fixtures = corpus
    extracted = reassemble(extract_turns(transcripts, run_id="t1"), 4)

    joined = extracted.alias("a").join(
        fixtures.alias("e"), on=["conv_id", "turn_idx"], how="full_outer"
    )
    n_t = transcripts.count()
    assert joined.count() == n_t  # 1:1 join, no orphans on either side

    for col in ("text_md", "text_plain"):
        bad = (
            joined.where(~F.col(f"a.{col}").eqNullSafe(F.col(f"e.{col}")))
            .select(
                "conv_id",
                "turn_idx",
                F.col(f"a.{col}").alias("actual"),
                F.col(f"e.{col}").alias("expected"),
            )
            .orderBy("conv_id", "turn_idx")
            .collect()
        )
        assert not bad, (
            f"{len(bad)} turns mismatch on {col}:\n" + _report_mismatches(bad, col)
        )

    # payload_kind, counts and spans must match too
    bad = joined.where(
        ~F.col("a.payload_kind").eqNullSafe(F.col("e.payload_kind"))
        | ~F.col("a.n_blocks").eqNullSafe(F.col("e.n_blocks"))
        | ~F.col("a.n_chars").eqNullSafe(F.col("e.n_chars"))
        | ~F.col("a.spans").eqNullSafe(F.col("e.spans"))
    ).count()
    assert bad == 0


def test_span_invariants(spark, corpus):
    transcripts, _ = corpus
    extracted = extract_turns(transcripts).cache()
    exploded = extracted.select(
        "conv_id", "turn_idx", F.col("n_chars"), F.posexplode_outer("spans")
    )
    # 0 <= start < end <= n_chars, sorted, non-overlapping (FIXTURES §3)
    viol = exploded.where(
        F.col("col").isNotNull()
        & (
            (F.col("col.start") < 0)
            | (F.col("col.start") >= F.col("col.end"))
            | (F.col("col.end") > F.col("n_chars"))
        )
    ).count()
    assert viol == 0
    overlaps = (
        extracted.select(
            "conv_id",
            "turn_idx",
            F.expr(
                "CASE WHEN size(spans) > 1 THEN "
                "exists(transform(slice(spans, 1, size(spans) - 1), "
                "(s, i) -> s.end > spans[i + 1].start), x -> x) "
                "ELSE false END"
            ).alias("bad"),
        )
        .where(F.col("bad"))
        .count()
    )
    assert overlaps == 0
    extracted.unpersist()


def test_ordering_contract(spark, corpus):
    """Output order is (conv_id, turn_idx) after reassembly (W5)."""
    transcripts, _ = corpus
    out = reassemble(extract_turns(transcripts), 4)
    rows = out.select("conv_id", "turn_idx").collect()
    keys = [(r["conv_id"], r["turn_idx"]) for r in rows]
    assert keys == sorted(keys)


def test_partitioning_invariance(spark, corpus):
    """Identical output at different parallelism — the reference's
    device-matrix gate reinterpreted (SURVEY §5)."""
    transcripts, _ = corpus
    a = extract_turns(transcripts.repartition(2)).orderBy("conv_id", "turn_idx")
    b = extract_turns(transcripts.repartition(16)).orderBy("conv_id", "turn_idx")
    assert a.exceptAll(b).count() == 0
    assert b.exceptAll(a).count() == 0
