"""Cross-host mirror detection (operators/mirrors.py)."""

import duckdb
import pandas as pd
import pytest

from deepseek_ocr_rs_spark.operators.mirrors import (
    host_mirror_pairs,
    host_mirror_pairs_oracle_sql,
)


def _pairs(spark, rows, **kw):
    df = spark.createDataFrame(
        rows, "doc_id long, source string, text string"
    )
    return {
        (r.host_a, r.host_b): (r.n_shared, r.n_a, r.n_b)
        for r in host_mirror_pairs(df, **kw).collect()
    }


def test_shared_digests_flag_and_min_shared_guard(spark):
    # A and B share 2 of A's 3 pages -> flagged; C shares only 1 with A
    # -> blocked by min_shared=2 even though 1/2 = 50% clears the pct
    rows = [
        (1, "A", "page one"),
        (2, "A", "page two"),
        (3, "A", "page three"),
        (4, "B", "page one"),
        (5, "B", "page two"),
        (6, "B", "only on b"),
        (7, "C", "page one"),
        (8, "C", "only on c"),
    ]
    got = _pairs(spark, rows, min_shared=2, min_pct=30)
    assert got == {("A", "B"): (2, 3, 3)}


def test_within_host_repetition_never_inflates(spark):
    # host A serves the same page 3 times: counts ONCE per host, so the
    # pair count with B is 1 (then min_shared=1 admits it)
    rows = [
        (1, "A", "dup page"),
        (2, "A", "dup page"),
        (3, "A", "dup page"),
        (4, "B", "dup page"),
    ]
    got = _pairs(spark, rows, min_shared=1, min_pct=10)
    assert got == {("A", "B"): (1, 1, 1)}


def test_containment_of_smaller_host_exact_boundary(spark):
    # B (2 digests) fully inside A (10 digests): 2/10 of A is 20% but
    # 2/2 of B is 100% -> least() side flags it; exact-threshold check:
    # 3 shared of min(10, 10) at min_pct=30 admits (3*100 == 30*10),
    # min_pct=31 rejects
    rows = [(i, "A", f"a-page {i}") for i in range(8)] + [
        (8, "A", "common x"),
        (9, "A", "common y"),
        (10, "B", "common x"),
        (11, "B", "common y"),
    ]
    got = _pairs(spark, rows, min_shared=2, min_pct=30)
    assert got == {("A", "B"): (2, 10, 2)}

    rows10 = [(i, "A", f"a-page {i}") for i in range(7)] + [
        (7, "A", "c1"), (8, "A", "c2"), (9, "A", "c3"),
    ] + [(10 + i, "B", f"b-page {i}") for i in range(7)] + [
        (17, "B", "c1"), (18, "B", "c2"), (19, "B", "c3"),
    ]
    assert _pairs(spark, rows10, min_shared=2, min_pct=30) == {
        ("A", "B"): (3, 10, 10)
    }
    assert _pairs(spark, rows10, min_shared=2, min_pct=31) == {}


def test_stop_digest_cap_drops_boilerplate(spark):
    # an "empty page" digest served by 5 hosts squares into C(5,2)=10
    # pairs; cap=4 drops it entirely, cap=5 keeps it
    rows = [(i, f"h{i}", "parked domain page") for i in range(5)]
    assert _pairs(spark, rows, min_shared=1, min_pct=10,
                  max_hosts_per_digest=4) == {}
    got = _pairs(spark, rows, min_shared=1, min_pct=10,
                 max_hosts_per_digest=5)
    assert len(got) == 10
    # capped digests still count in the host totals (n_a = real size)
    assert got[("h0", "h1")] == (1, 1, 1)


def test_oracle_parity_and_invariance(spark):
    rows = []
    for i in range(60):
        host = f"h{i % 6}"
        # 7 is coprime to the host modulus, so each shared digest lands
        # on 3 different hosts (step 14 cycles i%6 by 2)
        text = (f"shared {i % 7}" if i % 2 == 0 else f"unique {i}")
        rows.append((i, host, text))
    pdf = pd.DataFrame(rows, columns=["doc_id", "source", "text"])
    df = spark.createDataFrame(pdf)

    con = duckdb.connect()
    con.register("docs_mir", pdf)
    want = sorted(
        tuple(x)
        for x in con.sql(
            host_mirror_pairs_oracle_sql(
                "docs_mir", min_shared=2, min_pct=15
            )
        ).fetchall()
    )
    got = sorted(
        tuple(r)
        for r in host_mirror_pairs(df, min_shared=2, min_pct=15).collect()
    )
    got8 = sorted(
        tuple(r)
        for r in host_mirror_pairs(
            df.repartition(8), min_shared=2, min_pct=15
        ).collect()
    )
    assert got == want
    assert got8 == got
    assert len(got) > 0
